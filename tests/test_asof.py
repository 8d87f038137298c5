"""As-of join semantics on controlled inputs."""

import datetime as dt

from pyspark.sql import functions as F

from securities_data_pipeline_spark.operators.asof import asof_join

TS = dt.datetime


def test_asof_backward_inclusive_and_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, "A", TS(2024, 1, 10)), (2, "A", TS(2024, 1, 20)), (3, "B", TS(2024, 1, 10))],
        "id long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [
            ("A", TS(2024, 1, 5), 100),
            ("A", TS(2024, 1, 10), 200),   # equal time → inclusive match for id=1
            ("A", TS(2024, 1, 10), 201),   # same time: greatest tiebreak wins
            ("A", TS(2024, 1, 15), 300),
            ("B", TS(2024, 1, 12), 400),   # after left's time → no match for id=3
        ],
        "k string, rt timestamp, val long",
    )
    out = {
        r.id: (r.val, r.rt)
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            payload_cols=["val", "rt"], tiebreak="val",
        ).collect()
    }
    assert out[1][0] == 201          # inclusive at equal time, max tiebreak
    assert out[2][0] == 300          # latest at/before 01-20
    assert out[3] == (None, None)    # nothing at/before → left row kept, nulls


def test_asof_no_row_explosion_columns_from_same_row(spark):
    """Payload travels as a struct: matched columns must come from the
    SAME right row (no tearing between val and rt)."""
    left = spark.createDataFrame([(1, "A", TS(2024, 2, 1))], "id long, k string, t timestamp")
    right = spark.createDataFrame(
        [("A", TS(2024, 1, 1), 10), ("A", TS(2024, 1, 2), 5)],
        "k string, rt timestamp, val long",
    )
    r = asof_join(left, right, "k", "t", "rt", ["val", "rt"], tiebreak="val").collect()[0]
    assert (r.val, r.rt) == (5, TS(2024, 1, 2))  # later time wins even with smaller val
