"""Dataset sampling / mixing operators for training-data pipelines.

A 100 TB corpus is never trained on verbatim: sources are sampled at
per-stratum rates (dataset mixing) and capped by token budgets
(curriculum sizing). Both operators here are **deterministic** — the
sampling decision is a pure function of the row key via the stable
md5-derived hash family (functions/hashing.py), so:

- resampling is reproducible across runs, engines, and cluster sizes
  (no RNG state, no partition-order dependence — Bernoulli sampling
  you can re-run byte-identically anywhere);
- the exact same selection is expressible in ANSI SQL → oracle-checked;
- at scale it's a narrow filter/window over the scan — no shuffle for
  rate sampling, one bounded shuffle per stratum for budgeting.

Reference tie-in: the dev-mode ``sample(5)`` (py_pipeline/
extract.py:62-63) is the degenerate case; P8's ordered-hash exact-N
sample generalizes to these corpus-scale forms.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from securities_data_pipeline_spark.functions.hashing import (
    stable_hash64,
    sql_stable_hash64,
)
from securities_data_pipeline_spark.sources.tables import table

# demo mixing rates per language stratum (per-mille, exact integers so
# both engines compare the same way)
LANG_RATES_PM: dict[str, int] = {"en": 900, "de": 500, "fr": 250, "es": 100}
DEFAULT_RATE_PM = 50

TOKEN_BUDGET = 2_000  # per-language token budget for the demo query


def hash_bernoulli(key: Column, rate_pm: Column | int) -> Column:
    """Deterministic Bernoulli trial: keep iff
    ``stable_hash64(key) % 1000 < rate_pm``. The hash is uniform on
    [0, 2^60), so the selection rate converges to rate_pm/1000 while
    staying a pure row-level predicate (re-runnable, engine-portable,
    pushable below joins)."""
    rate = F.lit(rate_pm) if isinstance(rate_pm, int) else rate_pm
    return F.pmod(stable_hash64(key), F.lit(1000)) < rate


def sample_stratified(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates_pm: dict[str, int],
    default_pm: int = DEFAULT_RATE_PM,
) -> DataFrame:
    """Per-stratum deterministic sampling (dataset mixing): each
    stratum keeps its configured fraction. One CASE + one hash per
    row, no shuffle; the predicate composes with pushdown."""
    rate = F.lit(default_pm)
    for s, pm in rates_pm.items():
        rate = F.when(F.col(stratum_col) == s, F.lit(pm)).otherwise(rate)
    return df.where(hash_bernoulli(F.col(key_col).cast("string"), rate))


def t_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked mixing query: language-stratified document
    sample with per-stratum keep counts."""
    docs = table(spark, sf_dir, "documents")
    kept = sample_stratified(docs, "doc_id", "lang", LANG_RATES_PM)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("sum_chars"),
    )


def _sql_rate_case() -> str:
    whens = " ".join(
        f"WHEN lang = '{s}' THEN {pm}" for s, pm in LANG_RATES_PM.items()
    )
    return f"CASE {whens} ELSE {DEFAULT_RATE_PM} END"


T_SAMPLE_STRATIFIED_SQL = f"""
SELECT lang, COUNT(*) AS n_kept, SUM(n_chars) AS sum_chars
FROM documents
WHERE {sql_stable_hash64("CAST(doc_id AS VARCHAR)")} % 1000 < {_sql_rate_case()}
GROUP BY lang
"""


def token_budget_filter(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Keep documents per stratum, in deterministic hash order, until
    the running token total exceeds ``budget`` (the first overflowing
    doc is kept so every non-empty stratum yields at least one doc).

    The hash order is an unbiased, reproducible shuffle; the cumsum is
    one window per stratum — a single bounded shuffle at scale, and
    the window spec is shared with any other per-stratum ordering.
    """
    h = stable_hash64(F.col(key_col).cast("string"))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.withColumn("_before", before).where(F.col("_before") < budget).drop("_before")


def t_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked budgeting query: whitespace-token budget of
    TOKEN_BUDGET per language, deterministic document order."""
    from securities_data_pipeline_spark.operators.textops import token_count

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count().alias("n_tokens")
    )
    kept = token_budget_filter(docs, "doc_id", "lang", "n_tokens", TOKEN_BUDGET)
    return kept.select("doc_id", "lang", "n_tokens")


def _sql_token_budget() -> str:
    from securities_data_pipeline_spark.operators.textops import _sql_words

    h = sql_stable_hash64("CAST(doc_id AS VARCHAR)")
    return f"""
WITH toks AS (
  SELECT doc_id, lang, len({_sql_words()}) AS n_tokens FROM documents
), ordered AS (
  SELECT doc_id, lang, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY {h} ASC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_sum
  FROM toks
)
SELECT doc_id, lang, n_tokens FROM ordered WHERE before_sum < {TOKEN_BUDGET}
"""


SAMPLING_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_sample_stratified": t_sample_stratified,
    "t_token_budget": t_token_budget,
}

SAMPLING_ORACLES: dict[str, str] = {
    "t_sample_stratified": T_SAMPLE_STRATIFIED_SQL,
    "t_token_budget": _sql_token_budget(),
}
