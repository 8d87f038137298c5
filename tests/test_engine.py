"""Engine facade + compaction maintenance job."""

import datetime as dt
import glob

from securities_data_pipeline_spark.engine import Engine
from securities_data_pipeline_spark.load import compact_table, load_prices

D = dt.date


def test_engine_facade(spark):
    eng = Engine(spark).open("/root/testdata/sf0.001")
    assert eng.sql("SELECT count(*) AS n FROM lineitem").first().n > 0
    assert "q1_pricing_summary" in eng.query_names()
    df = eng.query("a1_distinct")
    assert df.count() == 5


def test_compact_table_merges_small_files(spark, tmp_path):
    path = str(tmp_path / "prices")
    S = "date_stamp date, symbol string, close double"
    # two append writes → at least two files in the same partition
    for batch in (["AAA", "BBB"], ["CCC", "DDD"]):
        rows = [(D(2025, 1, 1), s, 1.0) for s in batch]
        spark.createDataFrame(rows, S).coalesce(1).write.partitionBy("date_stamp").mode(
            "append"
        ).parquet(path)
    before = spark.read.parquet(path).orderBy("symbol").collect()
    n_files_before = len(glob.glob(path + "/date_stamp=*/**/*.parquet", recursive=True))
    assert n_files_before >= 2
    compact_table(spark, path, partition_by=("date_stamp",))
    n_files_after = len(glob.glob(path + "/date_stamp=*/**/*.parquet", recursive=True))
    after = spark.read.parquet(path).orderBy("symbol").collect()
    assert n_files_after == 1
    assert [tuple(r) for r in before] == [tuple(r) for r in after]  # content unchanged
