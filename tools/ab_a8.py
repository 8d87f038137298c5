"""Same-session A/B for the a8_corr_moments zero-variance guard.

VERDICT r6 "What's wrong" #1: a8's driver bench moved 1.60×
canary-normalized in the round its code changed (the fuzz round added
two F.when guards over 3 post-aggregation rows), with no recorded
same-session A/B.  BASELINE.md's methodology says only a same-session
uncontended A/B median can attribute cause, so this script runs:

  guarded   = the live a8_corr_moments (plans/analytics.py)
  unguarded = identical plan with the two F.when guards removed
              (same scan helper, same decimal moment agg)

interleaved, median-of-5 each at sf0.1, bracketed by the frozen
canary_a8 twin before and after.  Usage:

    python tools/ab_a8.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPEATS = 5


def unguarded_a8(spark, sf_dir):
    """a8_corr_moments with the r6 zero-variance guards stripped.

    Everything else — scan helper, cent quantization, decimal(38,0)
    moments, cancellation-before-double — is byte-identical to the live
    query so the only variable is the two F.when wrappers.
    """
    from pyspark.sql import functions as F

    from securities_data_pipeline_spark.plans.analytics import _dec2
    from securities_data_pipeline_spark.sources.tables import table

    li = table(spark, sf_dir, "lineitem")
    xc = (_dec2("l_quantity") * 100).cast("decimal(38,0)")
    yc = (_dec2("l_extendedprice") * 100).cast("decimal(38,0)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xc).alias("sx"),
        F.sum(yc).alias("sy"),
        F.sum(xc * xc).alias("sxx"),
        F.sum(yc * yc).alias("syy"),
        F.sum(xc * yc).alias("sxy"),
    )
    n = F.col("n").cast("decimal(38,0)")
    sx, sy = F.col("sx"), F.col("sy")
    cov_n = (n * F.col("sxy") - sx * sy).cast("double")
    var_x_n = (n * F.col("sxx") - sx * sx).cast("double")
    var_y_n = (n * F.col("syy") - sy * sy).cast("double")
    slope = cov_n / var_x_n
    nd = F.col("n").cast("double")
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(cov_n / F.sqrt(var_x_n) / F.sqrt(var_y_n), 6).alias(
            "corr_qty_price"
        ),
        F.round(slope, 6).alias("beta"),
        F.round(
            (sy.cast("double") - slope * sx.cast("double")) / nd / F.lit(100.0),
            6,
        ).alias("intercept"),
    )


def median_time(fn, spark, sf_dir, repeats=REPEATS):
    samples = []
    for _ in range(repeats):
        t0 = time.time()
        fn(spark, sf_dir).count()
        samples.append(time.time() - t0)
    return statistics.median(samples), samples


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import bench
    from securities_data_pipeline_spark.plans.analytics import a8_corr_moments
    from securities_data_pipeline_spark.session import get_spark

    spark = get_spark("ab-a8")

    # warm-up: JIT both plan shapes once, untimed
    a8_corr_moments(spark, sf_dir).count()
    unguarded_a8(spark, sf_dir).count()
    bench._canary_a8(spark, sf_dir).count()

    can_before, _ = median_time(bench._canary_a8, spark, sf_dir)

    # interleaved samples so container drift hits both arms equally
    g_samples, u_samples = [], []
    for _ in range(REPEATS):
        t0 = time.time()
        a8_corr_moments(spark, sf_dir).count()
        g_samples.append(time.time() - t0)
        t0 = time.time()
        unguarded_a8(spark, sf_dir).count()
        u_samples.append(time.time() - t0)

    can_after, _ = median_time(bench._canary_a8, spark, sf_dir)

    g, u = statistics.median(g_samples), statistics.median(u_samples)
    print(f"canary_a8 before: {can_before:.3f}s  after: {can_after:.3f}s "
          f"(r3 ref {bench._CANARY_REF['canary_a8']}s)")
    print(f"guarded   median-of-{REPEATS}: {g:.3f}s  samples={[round(s,3) for s in g_samples]}")
    print(f"unguarded median-of-{REPEATS}: {u:.3f}s  samples={[round(s,3) for s in u_samples]}")
    print(f"guard cost ratio: {g / u:.3f}x")


if __name__ == "__main__":
    main()
