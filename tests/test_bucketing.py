"""Bucketed co-located join contract: bucketing must actually elide
the join shuffle, not just exist as API surface."""

import pytest
from pyspark.sql import functions as F

from securities_data_pipeline_spark.plans.bucketing import (
    bucket_facts,
    bucketed_order_lines,
    n_exchanges,
)
from securities_data_pipeline_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    db = "bdemo_test"
    loc = tmp_path_factory.mktemp("bucket_wh")
    bucket_facts(spark, SF, db, str(loc), n_buckets=4)
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_bucketed_join_has_zero_exchanges(spark, bucket_db):
    """The whole point: the co-located sort-merge join plans with NO
    Exchange, while the identical plain-parquet join shuffles both
    sides."""
    joined = bucketed_order_lines(spark, bucket_db)
    assert n_exchanges(joined) == 0, joined._jdf.queryExecution().executedPlan().toString()

    orders = table(spark, SF, "orders")
    lines = table(spark, SF, "lineitem")
    plain = orders.hint("merge").join(lines, orders.o_orderkey == lines.l_orderkey)
    assert n_exchanges(plain) >= 2


def test_bucketed_join_matches_plain_join(spark, bucket_db):
    """Layout must not change semantics: same per-order line counts
    and quantity sums from both paths."""
    agg = lambda df: sorted(
        (r.o_orderkey, r.n, r.q)
        for r in df.groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("q"),
        )
        .collect()
    )
    bucketed = agg(bucketed_order_lines(spark, bucket_db))
    orders = table(spark, SF, "orders")
    lines = table(spark, SF, "lineitem")
    plain = agg(orders.join(lines, orders.o_orderkey == lines.l_orderkey))
    assert bucketed == plain and len(bucketed) > 0


def test_bucketed_groupby_on_bucket_key_has_zero_exchanges(spark, bucket_db):
    """Bucketing also covers aggregation: a groupBy on the bucket key
    of one bucketed table needs no shuffle — partial and final
    aggregate run in the same task."""
    lines = spark.table(f"{bucket_db}.lineitem_b")
    agg = lines.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    assert n_exchanges(agg) == 0
