"""Compute driver-green staleness from the CORRECTNESS_r*.json history.

The driver verifies queries in registry order and may only reach the
first ~50 per round, so each round's registry front must be *computed*
from the history rather than narrated by hand (round-6 VERDICT "What's
wrong" #3: a hand-written comment claimed r1 staleness was cleared when
it was not).

Usage:
    python tools/staleness.py            # table: query -> last green round
    python tools/staleness.py --front    # emit the next-round front order
    python tools/staleness.py --summary  # per-round counts

"Green" means rows_match and schema_match and (hash_match is not False)
and no err — the same predicate the judge applies.  A query that appears
in a round's file but failed does NOT advance its last-green round.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match") is not False
        and not row.get("err")
    )


def last_green_rounds() -> dict[str, int]:
    """Map query name -> latest round with a green driver row (0 = never)."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if _green(row):
                out[name] = max(out.get(name, 0), rnd)
            else:
                out.setdefault(name, 0)
    return out


def registry_names() -> list[str]:
    sys.path.insert(0, REPO)
    from securities_data_pipeline_spark.registry import all_queries

    return list(all_queries())


def front_order(new_or_changed: list[str] | None = None) -> list[str]:
    """Next-round registry front: new/changed first, then least-recently-green.

    Ties within a staleness bucket break alphabetically (stable,
    reproducible).  Queries never driver-checked rank as round 0
    (most stale).
    """
    greens = last_green_rounds()
    names = registry_names()
    nc = list(new_or_changed or [])
    nc_rank = {n: i for i, n in enumerate(nc)}
    rest = [n for n in names if n not in nc_rank]
    rest.sort(key=lambda n: (greens.get(n, 0), n))
    return nc + rest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--front", action="store_true",
                    help="print the computed next-round front order")
    ap.add_argument("--summary", action="store_true",
                    help="print per-round staleness counts")
    ap.add_argument("--new", nargs="*", default=[],
                    help="new/changed query names to lead the front")
    args = ap.parse_args()

    greens = last_green_rounds()
    if args.summary:
        names = registry_names()
        counts: dict[int, int] = {}
        for n in names:
            counts[greens.get(n, 0)] = counts.get(greens.get(n, 0), 0) + 1
        for rnd in sorted(counts):
            label = f"r{rnd}" if rnd else "never"
            print(f"{label}: {counts[rnd]}")
        print(f"total registered: {len(names)}")
        return
    if args.front:
        for n in front_order(args.new):
            print(n)
        return
    for n in sorted(greens, key=lambda n: (greens[n], n)):
        print(f"{greens[n]:>2}  {n}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:
        pass

