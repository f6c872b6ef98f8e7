"""Shared `## `-section upsert for the evidence files.

SCALE_REHEARSAL.md accumulates appended sections from several tools
(skew rehearsals, output-fixed re-measures, targeted close waves).
Two write-path bugs have bitten: the base-report regeneration used to
clobber every appended section (fixed r7 via
scale_rehearsal.merge_preserving), and the marker-replace in the skew
tools truncated everything AFTER their marker too — silently deleting
later sections on a re-run. `upsert_section` replaces exactly the
marker's own section (marker line up to the next `## ` heading or
EOF), preserving everything else; if the marker is absent it appends.
Unit-tested in tests/test_ops.py.
"""

from __future__ import annotations


def upsert_section(text: str, marker: str, section: str) -> str:
    """Return ``text`` with the ``marker`` section replaced by
    ``section`` (which must start with the marker line); appends if
    the marker isn't present. Later sections are preserved."""
    if not section.startswith(marker):
        raise ValueError("section must start with its marker")
    base = text.rstrip()
    idx = base.find(marker)
    if idx == -1:
        return base + "\n\n" + section.rstrip() + "\n"
    tail = base[idx + len(marker):]
    nxt = tail.find("\n## ")
    after = "" if nxt == -1 else tail[nxt:].lstrip("\n")
    out = base[:idx].rstrip() + "\n\n" + section.rstrip() + "\n"
    if after:
        out += "\n" + after.rstrip() + "\n"
    return out
