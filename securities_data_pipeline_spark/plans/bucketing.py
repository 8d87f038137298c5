"""Bucketed-table co-located joins: the shuffle-free fact⋈fact path.

At 100 TB the dominant cost of a fact-to-fact join (orders⋈lineitem on
orderkey) is the shuffle: both sides re-hash and move over the network
every time the join runs. Hive-style bucketing amortizes that shuffle
into the WRITE: `bucketBy(n, key)` hash-partitions each table into a
fixed bucket layout once, and every subsequent join (or aggregation)
on the bucket key reads bucket i of both sides into the same task —
Catalyst elides the Exchange entirely (`reportsPartitioning` via
`HashPartitioning` on the bucket columns). This is the batch analog of
the reference warehouse's clustered tables, and the standard layout
for a training-data lake's hot join keys (doc_id, url_hash,
cluster_id).

Design rules encoded here:

- **Same bucket count on both sides.** Mismatched counts force a
  shuffle of one side (Spark picks the smaller to re-bucket); a lake
  should standardize bucket counts per key domain.
- **Bucket count sized to the target corpus, not the test corpus** —
  buckets are the unit of join parallelism AND the minimum read
  granularity. ~128 MB-512 MB of hot-key data per bucket at the
  production SF is the usual target; callers pass it explicitly.
- **`sortBy` the bucket key inside each bucket** so the sort-merge
  join's per-task Sort reads pre-sorted spills (and Parquet gets
  better RLE on the key).
- The one-time bucketed write IS a shuffle (hash to n buckets) — the
  point is paying it once instead of per-join.

Verification: `tests/test_bucketing.py` proves the physical plan of
the bucketed join contains ZERO Exchange nodes while the identical
plain-parquet join contains two, and that both produce identical rows.

Reference parity: the reference has no join engine at all (pandas
merges in-process, `py_pipeline/transform.py`); this is part of the
Spark-native scale surface (SURVEY §2.3 joins, §6 scale design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from securities_data_pipeline_spark.sources.tables import table


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: str | list[str],
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a parquet table bucketed (and by default
    per-bucket sorted) on ``bucket_cols``. ``name`` may be
    database-qualified; the database controls the storage location.
    Also re-exported through ``operators.skew`` (the skew-mitigation
    module lists bucketing as one of its strategies)."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *cols)
    )
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(name)


def bucket_facts(
    spark: SparkSession,
    sf_dir: str,
    database: str,
    location: str,
    n_buckets: int,
) -> None:
    """One-time layout job: write orders and lineitem bucketed on the
    orderkey into ``database`` (rooted at ``location``). Both tables
    share ``n_buckets`` so every orderkey join between them is
    co-located."""
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {database} LOCATION '{location}'"
    )
    write_bucketed(
        table(spark, sf_dir, "orders"), f"{database}.orders_b", "o_orderkey", n_buckets
    )
    write_bucketed(
        table(spark, sf_dir, "lineitem"),
        f"{database}.lineitem_b",
        "l_orderkey",
        n_buckets,
    )


def bucketed_order_lines(spark: SparkSession, database: str) -> DataFrame:
    """orders⋈lineitem on the bucket key — reads bucket i of both
    tables into one task, no Exchange. The merge hint pins sort-merge
    so the plan shape is stable regardless of size estimates (a
    broadcast choice would also be shuffle-free but wouldn't exercise
    the co-located path this module exists for)."""
    orders = spark.table(f"{database}.orders_b")
    lines = spark.table(f"{database}.lineitem_b")
    return orders.hint("merge").join(
        lines, orders.o_orderkey == lines.l_orderkey
    )


def n_exchanges(df: DataFrame) -> int:
    """Count Exchange operators in the (pre-execution) physical plan —
    the metric the bucketing contract is stated in."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )
