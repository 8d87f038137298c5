"""Scale-stress the relational/TPC-H surface beyond the largest driver SF.

Fourth member of the amplification harness family: replicate the
sf0.1 ``orders`` + ``lineitem`` fact tables N× with consistently
re-keyed orderkeys (lineitem rows follow their order), KEEPING the
dimension tables (region/nation/customer/supplier/part) — facts grow,
dimensions don't, which is how a real warehouse scales and exactly the
regime the broadcast-dimension join plans are designed for. Customer
keys repeat across replicas, so per-customer order counts densify N×
(stressing Q13's pre-aggregate and Q3/Q10's join fan-in); per-order
line structure is preserved (so Q21's per-order windows see realistic
groups).

Works strictly inside ``<scratch_root>/sdp_tpch_stress`` (only that
harness-owned subdirectory is ever deleted); unchanged dimension
tables are symlinked from the source sf_dir. Usage::

    python tools/stress_tpch.py [sf_dir] [factor] [scratch_root]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

DIMS = ("region", "nation", "customer", "supplier", "part")


def amplify_facts(spark, sf_dir: str, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from securities_data_pipeline_spark.sources.tables import table

    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    key_span = orders.agg(F.max("o_orderkey")).first()[0] * 10
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    (
        orders.crossJoin(F.broadcast(reps))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * F.lit(key_span))
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "orders.parquet"))
    )
    (
        li.crossJoin(F.broadcast(reps))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * F.lit(key_span))
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "lineitem.parquet"))
    )
    for t in DIMS:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.lexists(dst):
            os.symlink(os.path.join(sf_dir, f"{t}.parquet"), dst)


def main() -> int:
    from securities_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    scratch_root = sys.argv[3] if len(sys.argv) > 3 else "/tmp"
    scratch = os.path.join(scratch_root, "sdp_tpch_stress")

    spark = get_spark("tpch-stress")
    os.makedirs(scratch, exist_ok=True)
    t0 = time.time()
    amplify_facts(spark, sf_dir, factor, scratch)
    prep_s = time.time() - t0

    import __spark_entry__ as entry

    qs = entry.queries()
    names = [
        "q1_pricing_summary",
        "q3_top_revenue_orders",
        "q5_nation_revenue",
        "q7_nation_volume",
        "q9_profit_by_nation",
        "q10_returned_items",
        "q13_customer_distribution",
        "q19_disjunctive_revenue",
        "q21_waiting_suppliers",
        "sq_small_qty_revenue",
        "agg_salted_sum",
        "w2_moving_avg",
    ]
    n_li = spark.read.parquet(os.path.join(scratch, "lineitem.parquet")).count()
    results = {"sf_dir": sf_dir, "factor": factor, "n_lineitem": n_li,
               "prep_sec": round(prep_s, 2), "queries": {}}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"{name}: not registered, skipped", file=sys.stderr)
            continue
        t = time.time()
        rows = fn(spark, scratch).count()
        results["queries"][name] = {"rows": rows, "sec": round(time.time() - t, 2)}
        print(f"{name}: {rows} rows in {results['queries'][name]['sec']}s",
              file=sys.stderr)
    print(json.dumps(results))
    shutil.rmtree(scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
