#!/usr/bin/env python3
"""Regenerate bench_floors.json from accepted bench artifacts.

The floor file is graft.Bench's cross-round memory (VERDICT r14): a
sustained contention wave inflates all of a query's in-sweep runs
equally, so the within-run disagreement recheck can't see it — but a
committed per-query floor can. Bench re-isolates (late in the drive)
any query whose min-of-runs exceeds 2x its floor.

Floors are CORE-COUNT-TAGGED (VERDICT r15 item 2a): keys are
"query@cpus", and Bench only applies floors recorded at the same core
count it is running with — an 8-core floor must not judge a 32-core
drive (at sf0.1 the 8-core readings run 1-3x faster across the board,
so an untagged comparison guarantees spurious rechecks).

Usage:
    python3 tools/update_floors.py bench.json [more_bench.json ...]

Each argument is a bench artifact (the full bench.json schema with a
"runs" map and, since r16, a "cpus" field; artifacts without "cpus"
are assumed 32-core — every pre-r16 official drive was). The new
floor per (query, cpus) = min(existing floor, min over every run in
every given artifact). Floors only ever DECREASE — a floor is the
best reading a clean box has ever reproduced, so a slow round must
never raise it (that would re-open the phantom window).
"""
import json
import sys

FLOORS = "bench_floors.json"

def main(argv):
    if not argv:
        print(__doc__)
        return 2
    try:
        floors = json.load(open(FLOORS))
    except FileNotFoundError:
        floors = {}
    # migrate any untagged legacy keys (pre-r16 floors: all 32-core)
    floors = {(k if "@" in k else f"{k}@32"): v for k, v in floors.items()}
    for path in argv:
        art = json.load(open(path))
        cpus = art.get("cpus", 32)
        for q, runs in art.get("runs", {}).items():
            if not runs:
                continue
            key = f"{q}@{cpus}"
            m = min(runs)
            if key not in floors or m < floors[key]:
                floors[key] = m
    floors = {q: round(v, 3) for q, v in sorted(floors.items())}
    json.dump(floors, open(FLOORS, "w"), indent=0, separators=(",", ":"))
    print(f"{FLOORS}: {len(floors)} entries")
    return 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
