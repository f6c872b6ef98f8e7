"""Guard the measured-evidence markdown files against clobbering.

SCALE_REHEARSAL.md has been truncated THREE times (r6, r7 pre-fix,
and r8 commit 1d8c5a2 — a hand write that bypassed
tools/md_sections.upsert_section and deleted the 106-query base
report plus every appended skew/output-fixed/SemDeDup section).
Nothing pinned the file's content, so the 800+-test suite could not
notice.  This test pins the base header, the known section markers,
and a floor on total size: any future regeneration that drops an
appended section (or the base table) fails the suite.

New sections may be appended freely — only REMOVING one of the pinned
markers (or shrinking the file below the floor) fails.
"""

from __future__ import annotations

import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent
SR = REPO / "SCALE_REHEARSAL.md"

# Every section that has ever carried a measurement.  Order-free:
# upsert_section appends new sections at the end, so position is not
# part of the contract.
PINNED_MARKERS = [
    "## Round-6 session-2 close wave",
    "## Zipf skew rehearsal",
    "## Hub-user skew rehearsal",
    "## Output-fixed 10x re-measure",
    "## Hub-customer join-agg skew rehearsal",
    "## Whale-document row-length skew rehearsal",
    "## SemDeDup nominal scaling",
    "## Base-report drift note",
]


def test_scale_rehearsal_base_header_present():
    text = SR.read_text()
    assert text.startswith("# SCALE REHEARSAL"), (
        "SCALE_REHEARSAL.md lost its base header — the base report "
        "was probably clobbered; restore from git history"
    )


def test_scale_rehearsal_sections_present():
    text = SR.read_text()
    missing = [m for m in PINNED_MARKERS if m not in text]
    assert not missing, (
        f"SCALE_REHEARSAL.md lost pinned sections {missing} — a write "
        "bypassed tools/md_sections.upsert_section; restore from git "
        "history and append via upsert_section only"
    )


def test_scale_rehearsal_base_table_floor():
    """The 106-query base report is a markdown table; pin a row floor
    so a truncated regeneration (10-line drift note only) fails."""
    text = SR.read_text()
    table_rows = re.findall(r"^\| \w", text, flags=re.M)
    assert len(table_rows) >= 100, (
        f"only {len(table_rows)} measurement rows — base report "
        "truncated"
    )
    assert len(text.splitlines()) >= 300
