#!/usr/bin/env python3
"""Regenerate bench_floors.json from accepted bench artifacts.

The floor file is graft.Bench's cross-round memory (VERDICT r14): a
sustained contention wave inflates all of a query's in-sweep runs
equally, so the within-run disagreement recheck can't see it — but a
committed per-query floor can. Bench re-isolates (late in the drive)
any query whose min-of-runs exceeds 2x its floor.

Usage:
    python3 tools/update_floors.py bench.json [more_bench.json ...]

Each argument is a bench artifact (the full bench.json schema with a
"runs" map). The new floor per query = min(existing floor, min over
every run in every given artifact). Queries new this round get their
first floor from the artifact. Floors only ever DECREASE — a floor is
the best reading a clean box has ever reproduced, so a slow round
must never raise it (that would re-open the phantom window).
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
    for path in argv:
        art = json.load(open(path))
        for q, runs in art.get("runs", {}).items():
            if not runs:
                continue
            m = min(runs)
            if q not in floors or m < floors[q]:
                floors[q] = m
    floors = {q: round(v, 3) for q, v in sorted(floors.items())}
    json.dump(floors, open(FLOORS, "w"), indent=0, separators=(",", ":"))
    print(f"{FLOORS}: {len(floors)} queries")
    return 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
