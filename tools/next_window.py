#!/usr/bin/env python
"""Compose the next round's driver window (`registry._FRONT`).

The grading driver records CORRECTNESS rows for exactly the FIRST 50
``queries()`` entries, and the standing composition rule (registry
header) is: plan/oracle-changed entries first, then brand-new entries,
then the never-driver-sampled backlog in queue order. This tool does
the bookkeeping that was hand-rolled each round:

    python tools/next_window.py [--changed name1 name2 ...]

prints (1) the backlog = registered queries with no row in ANY
CORRECTNESS_r*.json, in registration order; (2) a ready-to-paste
50-name window = [--changed names] + backlog prefix; (3) the leftover
queue for the round after. Names passed via --changed that are also in
the backlog do double duty (counted once). Fails loudly on unknown
names.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    changed = sys.argv[2:] if len(sys.argv) > 1 and sys.argv[1] == "--changed" else []
    src = (REPO / "distributed_mapreduce_p2p_spark" / "registry.py").read_text()
    registered = re.findall(
        r'@register\(\s*\n?\s*["\']([a-z0-9_]+)["\']', src
    )
    reg_set = set(registered)
    unknown = [n for n in changed if n not in reg_set]
    if unknown:
        sys.exit(f"not registered: {unknown}")
    sampled: set[str] = set()
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        sampled |= set(json.loads(f.read_text()))
    backlog = [n for n in registered if n not in sampled]
    window = list(dict.fromkeys(changed))
    for n in backlog:
        if len(window) >= 50:
            break
        if n not in window:
            window.append(n)
    leftover = [n for n in backlog if n not in window]
    print(f"registered: {len(registered)}  driver-sampled ever: "
          f"{len(sampled & reg_set)}  backlog: {len(backlog)}")
    print(f"\nwindow ({len(window)}):")
    for n in window:
        print(f'    "{n}",')
    print(f"\nleftover backlog for the round after ({len(leftover)}):")
    print("  " + ", ".join(leftover))
    if len(window) < 50:
        print(f"\nNOTE: only {len(window)} candidates — pad with "
              "plan-stable holdovers (they keep their green rows).")


if __name__ == "__main__":
    main()
