"""Same-session drift check for flagged-but-untouched bench movers.

VERDICT r7 item 6: three queries moved >1.25x normalized between rounds
6 and 7 with ZERO Spark-side code diff (q18_large_volume_customer,
j_salted_skew_join, t_quality_logreg — verified: `git diff
6547d78..05e0e02` is empty for relational_tpch3.py and skew.py, and the
curation.py hunk touches only the DuckDB oracle text). A checkout-twin
A/B would therefore time the same plan twice; the discriminating
measurement is the query's STABLE normalized value today, compared to
both recorded readings. If today's normalized value sits at or below
the older round's, the newer reading was container drift the canary
under-corrected, not a regression.

Protocol: untimed sf0.001 warmup (JIT per plan shape), median-of-5 at
sf0.1 per query, canary bracket (bench.py's frozen r3 twins, 5 reps
each) before AND after, normalize by the bracket mean. Result recorded
in BASELINE.md §round-8 A/B. Usage::

    python tools/ab_movers.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

DEFAULT_QUERIES = (
    "q18_large_volume_customer",
    "j_salted_skew_join",
    "t_quality_logreg",
)


def _canary_ratio(spark, sf_dir: str) -> float:
    import bench

    ratios = []
    for name, fn in bench._CANARIES.items():
        samples = []
        for _ in range(5):
            t0 = time.time()
            fn(spark, sf_dir).count()
            samples.append(time.time() - t0)
        ratios.append(statistics.median(samples) / bench._CANARY_REF[name])
    return round(statistics.median(ratios), 3)


def main() -> int:
    import bench
    from securities_data_pipeline_spark.registry import all_queries
    from securities_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(DEFAULT_QUERIES)

    spark = get_spark("ab-movers")
    qs = all_queries()
    for n in names:  # warmup: JIT every shape before any timing
        qs[n](spark, "/root/testdata/sf0.001").count()
    for fn in bench._CANARIES.values():
        fn(spark, "/root/testdata/sf0.001").count()

    pre = _canary_ratio(spark, sf_dir)
    rows = {}
    for n in names:
        samples = []
        for _ in range(5):
            t0 = time.time()
            qs[n](spark, sf_dir).count()
            samples.append(time.time() - t0)
        rows[n] = round(statistics.median(samples), 3)
    post = _canary_ratio(spark, sf_dir)
    bracket = round((pre + post) / 2, 3)

    out = {
        "sf_dir": sf_dir,
        "canary_pre": pre,
        "canary_post": post,
        "bracket": bracket,
        "raw_medians": rows,
        "normalized": {n: round(v / bracket, 3) for n, v in rows.items()},
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
