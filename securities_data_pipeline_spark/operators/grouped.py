"""Grouped-map Pandas UDF surface (applyInPandas).

The reference's per-symbol imperative logic (SURVEY §2.10: "custom
per-symbol logic at scale uses applyInPandas keyed by symbol") has no
example in its own code — this module supplies the canonical one: a
per-key least-squares trend fit. Each key's rows arrive as one pandas
DataFrame on an executor (Arrow-batched); the output is one small row
per key.

The UDF computes the same population-covariance slope as SQL
``regr_slope``, so the Python path is oracle-checked against the
warehouse aggregate — the pattern to follow whenever custom Python
must stay verifiable.

Scale: applyInPandas shuffles once on the grouping key; per-group data
must fit one executor's memory (true for per-symbol/per-user series;
for pathological keys pre-aggregate or window instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from securities_data_pipeline_spark.sources.tables import table


def g_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend of event values over time, entirely
    JVM-side: ``regr_slope`` is a built-in declarative aggregate, so
    the plan is scan → partial agg → final agg (one shuffle, no
    Python). This is the headline-bench path; the grouped-map Pandas
    variant below (``g_user_trend_udf``) computes the same thing and
    exists to exercise §2.10 — built-ins beat per-group Python by ~10×
    when groups are small (100k events / ~25k users: per-group Arrow
    batch + Python call overhead dominates)."""
    ev = table(spark, sf_dir, "events")
    t = F.unix_micros("ts") / F.lit(1e6)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.regr_slope(F.col("value"), t) * 86400.0, 6).alias("slope_per_day"),
    )


def g_user_trend_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend of event values over time (slope per
    day + mean), via grouped-map applyInPandas."""
    import pandas as pd

    ev = table(spark, sf_dir, "events").select(
        "user_id", (F.unix_micros("ts") / F.lit(1e6)).alias("t"), "value"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        t, y = pdf["t"], pdf["value"]
        tm, ym = t.mean(), y.mean()
        var = ((t - tm) ** 2).sum()
        slope = ((t - tm) * (y - ym)).sum() / var if var > 0 else None
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "slope_per_day": [round(slope * 86400.0, 6) if slope is not None else None],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        fit, schema="user_id long, n_events long, slope_per_day double"
    )


G_USER_TREND_SQL = """
SELECT user_id,
       COUNT(*) AS n_events,
       round(regr_slope(value, epoch(ts)) * 86400.0, 6) AS slope_per_day
FROM events
GROUP BY user_id
"""


GROUPED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "g_user_trend": g_user_trend,
    "g_user_trend_udf": g_user_trend_udf,
}

GROUPED_ORACLES: dict[str, str] = {
    "g_user_trend": G_USER_TREND_SQL,
    "g_user_trend_udf": G_USER_TREND_SQL,
}
