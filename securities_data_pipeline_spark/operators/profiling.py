"""Data-profiling operators: the first thing anyone runs against an
unfamiliar 100 TB table is "what's in it" — per-column null/distinct/
range stats and per-group exact percentiles. The reference validates
fixed schemas eagerly (pandera, `py_pipeline/validate.py:9-85`) but has
no discovery surface; at lake scale the profile IS the validation
input: you write the pandera-style contract *from* the profile.

Scale notes:
- ``t_profile_columns`` is ONE scan + ONE reduce. The multi-column
  COUNT(DISTINCT) aggregate plans as Spark's Expand operator (one
  duplicated stream per distinct column) — the standard exact plan; at
  100 TB you'd swap ``approx_count_distinct`` per column into the same
  single-pass shape (HLL sketches merge in the combiner), which drops
  Expand entirely. The exact version is kept here because the oracle
  gate hash-compares values.
- ``t_len_percentiles`` computes exact nearest-rank percentiles via a
  per-group sort window (one shuffle on lang). Nearest-rank on
  integers is chosen over interpolated percentiles deliberately: the
  result is a value FROM the data, integer-exact in both engines —
  interpolation (percentile_cont) is a float blend whose rounding is
  engine-specific. At 100 TB per-group sort is the exact path;
  the sketch path is ``approx_percentile`` in the same group-by shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from securities_data_pipeline_spark.sources.tables import table

#: (column, spark type is castable to string for min/max repr)
_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Single-pass column profile: (n_rows, col_name, n_null,
    n_distinct, min_repr, max_repr) — one row per profiled column.

    One aggregate computes every stat (count/distinct/min/max per
    column), then ``stack`` unpivots the single result row into the
    per-column report. min/max compare on the NATIVE type (numeric
    min, binary-collation string min — identical in Spark and DuckDB)
    and only the final repr casts to string.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).cast("long").alias(f"_c_{c}"),
            F.countDistinct(F.col(c)).cast("long").alias(f"_d_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _n - _c_{c}, _d_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return one.selectExpr(
        "_n AS n_rows",
        f"stack({len(cols)}, {stack_args}) "
        "AS (col_name, n_null, n_distinct, min_repr, max_repr)",
    )


def t_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile of the documents table — see module docstring."""
    return profile_columns(
        table(spark, sf_dir, "documents"), list(_PROFILE_COLS)
    )


def _sql_profile_columns() -> str:
    stats = ["COUNT(*) AS _n"]
    rows = []
    for c in _PROFILE_COLS:
        stats += [
            f"COUNT({c}) AS _c_{c}",
            f"COUNT(DISTINCT {c}) AS _d_{c}",
            f"CAST(MIN({c}) AS VARCHAR) AS _mn_{c}",
            f"CAST(MAX({c}) AS VARCHAR) AS _mx_{c}",
        ]
        rows.append(
            f"SELECT CAST(_n AS BIGINT) AS n_rows, '{c}' AS col_name, "
            f"CAST(_n - _c_{c} AS BIGINT) AS n_null, "
            f"CAST(_d_{c} AS BIGINT) AS n_distinct, "
            f"_mn_{c} AS min_repr, _mx_{c} AS max_repr FROM s"
        )
    return (
        "WITH s AS (SELECT " + ", ".join(stats) + " FROM documents)\n"
        + "\nUNION ALL ".join(rows)
    )


def t_len_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank p50/p90/p99 of document length per language
    — see module docstring for why nearest-rank, not interpolation.
    Rank targets use pure int64 ceilings (``(k·n + k) DIV d`` =
    ⌈k·n/d⌉ for d | 10^m), so the picked rank is engine-independent.
    """
    # NULL lengths are not order statistics — and unguarded they are
    # worse than wrong: Spark windows sort NULLS FIRST ascending,
    # DuckDB NULLS LAST, so every rank target silently shifts
    # (found by tools/fuzz_oracle.py on NULL-text documents)
    docs = (
        table(spark, sf_dir, "documents")
        .select("lang", "n_chars", "doc_id")
        .where(F.col("n_chars").isNotNull())
    )
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    wn = Window.partitionBy("lang")
    ranked = docs.select(
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def at(expr: str) -> F.Column:
        return F.max(F.when(F.col("rn") == F.expr(expr), F.col("n_chars"))).cast("long")

    return ranked.groupBy("lang").agg(
        F.max("n").cast("long").alias("n_docs"),
        at("(n + 1) DIV 2").alias("p50"),
        at("(9 * n + 9) DIV 10").alias("p90"),
        at("(99 * n + 99) DIV 100").alias("p99"),
    )


def _sql_len_percentiles() -> str:
    return """
WITH ranked AS (
  SELECT lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
  WHERE n_chars IS NOT NULL
)
SELECT lang,
       CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS BIGINT) AS p50,
       CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS BIGINT) AS p90,
       CAST(MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN n_chars END) AS BIGINT) AS p99
FROM ranked
GROUP BY lang
"""


PROFILING_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_profile_columns": t_profile_columns,
    "t_len_percentiles": t_len_percentiles,
}

PROFILING_ORACLES: dict[str, str] = {
    "t_profile_columns": _sql_profile_columns(),
    "t_len_percentiles": _sql_len_percentiles(),
}
