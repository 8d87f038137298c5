"""Exact duplicated-substring detection (training-data curation).

The method popularized by "Deduplicating Training Data Makes Language
Models Better" (Lee et al., 2022): find every maximal token span of
length >= K that occurs verbatim in at least two documents, so the
curation step can cut the span (not the whole document — most docs
sharing boilerplate are otherwise unique). Lee et al. build a corpus
suffix array; the standard *distributed* variant replaces it with
fixed-K anchor grams — every duplicated span of length >= K contains a
duplicated K-gram at each of its positions, so grouping K-grams and
merging consecutive duplicated positions recovers exactly the spans of
length >= K (shorter duplicates are below the detection threshold by
construction, same as the suffix-array variant's cutoff).

Spark-first shape (nothing here materializes document *pairs*):

1. one K-gram row per token position (`posexplode` of a
   `transform(sequence(...))` — all JVM-side, no Python),
2. duplicated grams = `groupBy(gram)` HAVING >= 2 distinct docs — ONE
   shuffle keyed on the gram hash; partial aggregation collapses
   per-partition repeats before the exchange,
3. a semi join back to positions (gram-keyed; AQE broadcasts the dup
   side when it is small, which it is at any realistic dup rate),
4. islands-and-gaps per document (`pos - row_number()` over a doc-keyed
   window) merges consecutive duplicated positions into maximal spans —
   one doc-keyed shuffle, each partition a single pass.

At 100 TB the gram table is ~one row per corpus token; every stage is
keyed (gram, then doc_id) with no cross-doc blowup — the dangerous
quantity in Lee et al. (total duplicated-pair volume) never appears.
A pathologically common gram ("the end of") makes step 2's key hot,
but count-distinct partials bound it; the semi join's dup side only
carries the gram hash, one row per duplicated gram.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from securities_data_pipeline_spark.operators.textops import _sql_words, words_col
from securities_data_pipeline_spark.sources.tables import spread, table

SUB_K = 5  # minimum duplicated span length, in tokens


def _gram_hashes(toks: Column, k: int) -> Column:
    """Array of md5 K-gram keys, one per 1-based token position
    1..n-k+1. md5 (not Spark's murmur hash) so the oracle computes the
    identical key — see functions/hashing.py's cross-engine rationale."""
    return F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1)),
        lambda i: F.md5(F.array_join(F.slice(toks, i, k), " ")),
    )


def duplicated_spans(docs: DataFrame, *, k: int = SUB_K) -> DataFrame:
    """Maximal duplicated token spans of length >= ``k``.

    Returns one row per (doc, span): ``span_start``/``span_end`` are
    1-based token indices (inclusive), ``span_tokens`` the span length,
    ``n_dup_grams`` how many duplicated K-grams the span merged.
    """
    w = docs.select("doc_id", words_col().alias("toks")).where(F.size("toks") >= k)
    grams = w.select(
        "doc_id",
        F.posexplode(_gram_hashes(F.col("toks"), k)).alias("pos0", "g"),
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "g")
    dup = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("g")
    )
    hit = grams.join(dup, "g", "left_semi")
    isl = hit.withColumn(
        "grp",
        F.col("pos") - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    return isl.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        (F.max("pos") - F.min("pos") + F.lit(k)).alias("span_tokens"),
        F.count(F.lit(1)).alias("n_dup_grams"),
    ).drop("grp")


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: duplicated-substring report over ``documents``."""
    # one md5 per k-gram position — per-row CPU; spread the single-
    # split scan (A/B sf0.1: 2.08 -> 1.14 s; no-op at cluster scale)
    return duplicated_spans(spread(table(spark, sf_dir, "documents")))


def _sql_substring_spans(k: int = SUB_K) -> str:
    return f"""
WITH w AS (
  SELECT doc_id, {_sql_words()} AS toks FROM documents
), grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(toks[i:i+{k - 1}], ' ')) AS g
  FROM w, unnest(range(1, len(toks) - {k - 2})) AS t(i)
  WHERE len(toks) >= {k}
), dup AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
), isl AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM grams WHERE g IN (SELECT g FROM dup)
)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + {k - 1} AS span_end,
       MAX(pos) - MIN(pos) + {k} AS span_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_dup_grams
FROM isl
GROUP BY doc_id, grp
"""


SUBSTRING_QUERIES = {"dedup_substring_spans": dedup_substring_spans}
SUBSTRING_ORACLES = {"dedup_substring_spans": _sql_substring_spans()}
