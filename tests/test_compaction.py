"""Incremental compaction contract: plans only what needs compacting,
preserves content exactly, converges, and is crash-visible."""

import os

import pytest
from pyspark.sql import functions as F

from securities_data_pipeline_spark.plans.compaction import (
    compact_small_files,
    leftover_stage,
    plan_compaction,
)

TARGET = 512 * 1024  # 512 KiB test target


@pytest.fixture()
def fragmented(spark, tmp_path):
    """A table written as many small files plus one above-target file
    that compaction must never touch."""
    path = str(tmp_path / "frag")
    spark.range(0, 20_000).withColumn("v", F.col("id") * 2).repartition(
        10
    ).write.parquet(path)
    # one big file appended: > target so it stays out of every plan
    spark.range(100_000, 400_000).withColumn("v", F.col("id") * 2).coalesce(
        1
    ).write.mode("append").parquet(path)
    return path


def _files(path):
    return sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )


def test_plan_only_packs_small_files(spark, fragmented):
    plan = plan_compaction(spark, fragmented, TARGET)
    assert plan, "fragmented table must yield a non-empty plan"
    sizes = {
        f: os.path.getsize(os.path.join(fragmented, f)) for f in _files(fragmented)
    }
    big = {f for f, sz in sizes.items() if sz >= TARGET}
    planned = {os.path.basename(p) for b in plan for p in b.files}
    assert planned.isdisjoint(big), "above-target files must never be planned"
    assert all(b.total_bytes <= TARGET for b in plan)
    assert all(len(b.files) > 1 for b in plan)
    # deterministic: same table, same plan
    assert plan == plan_compaction(spark, fragmented, TARGET)


def test_compaction_preserves_content_and_converges(spark, fragmented):
    before_rows = sorted(
        tuple(r) for r in spark.read.parquet(fragmented).collect()
    )
    n_before = len(_files(fragmented))
    executed = compact_small_files(spark, fragmented, TARGET)
    assert executed
    saved = sum(len(b.files) - 1 for b in executed)
    assert len(_files(fragmented)) == n_before - saved
    after_rows = sorted(
        tuple(r) for r in spark.read.parquet(fragmented).collect()
    )
    assert after_rows == before_rows
    assert leftover_stage(spark, fragmented) is None
    # converged: every remaining small file is alone in its would-be bin
    assert compact_small_files(spark, fragmented, TARGET) == []


def test_leftover_stage_blocks_planning(spark, fragmented):
    stage = os.path.join(fragmented, "__compact_stage")
    os.makedirs(stage)
    assert leftover_stage(spark, fragmented) is not None
    with pytest.raises(RuntimeError, match="unreconciled compaction stage"):
        plan_compaction(spark, fragmented, TARGET)
    os.rmdir(stage)
    assert plan_compaction(spark, fragmented, TARGET)


def test_partitioned_table_compacts_within_partitions(spark, tmp_path):
    """The partition-layout contract: bins never cross partition
    directories, compacted files land back inside their partition, and
    the partition column survives a post-compaction read."""
    path = str(tmp_path / "part")
    spark.range(0, 40_000).withColumn("ds", F.col("id") % 3).withColumn(
        "v", F.col("id") * 2
    ).repartition(6).write.partitionBy("ds").parquet(path)
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    plan = compact_small_files(spark, path, TARGET)
    assert plan
    # every bin's files share that bin's directory, which names a ds=
    for b in plan:
        assert "/ds=" in b.directory
        assert all(f.rsplit("/", 1)[0] == b.directory for f in b.files)
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before  # ds values intact, no row lost/duplicated
    assert compact_small_files(spark, path, TARGET) == []
