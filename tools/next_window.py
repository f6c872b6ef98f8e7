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
    last: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f.name).group(1))
        for n in json.loads(f.read_text()):
            sampled.add(n)
            last[n] = max(last.get(n, 0), rnd)
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
    # post-backlog composition (r10 precedent): free slots REFRESH
    # the OLDEST driver evidence — fill with the registered queries
    # whose latest green row is oldest (registration order breaks
    # ties), so cumulative evidence age keeps shrinking. Only
    # plan-stable entries belong here; plan-changed ones must come
    # in via --changed (tools/plan_gate.py enforces that side).
    if len(window) < 50:
        refresh = sorted(
            (n for n in registered if n not in window),
            key=lambda n: (last.get(n, 0), registered.index(n)),
        )
        fill = refresh[: 50 - len(window)]
        window += fill
        print(
            f"\noldest-evidence refresh fill ({len(fill)}; last green "
            f"rows r{last.get(fill[0], 0)}-r{last.get(fill[-1], 0)}):"
        )
    print(f"\nwindow ({len(window)}):")
    for n in window:
        tag = f"  # last green r{last[n]}" if n in last else "  # new/changed"
        print(f'    "{n}",{tag}')
    if leftover:
        print(f"\nleftover backlog for the round after ({len(leftover)}):")
        print("  " + ", ".join(leftover))


if __name__ == "__main__":
    main()
