"""Similarity search over embedding columns (array<float>).

Two tiers over the ``embeddings`` table (64-dim float vectors):

- **Brute-force cosine top-k** — the correctness baseline: broadcast
  the (small) query set against the corpus, cosine via
  ``F.zip_with`` + ``F.aggregate`` (pure JVM array ops, no Python),
  rank with a per-query window. O(|Q|·n) with n scanned once.
- **IVF top-k** — the scale path: deterministic coarse centroids
  (every 100th vector), every corpus vector assigned to its nearest
  centroid (one broadcast join), queries probe only their centroid's
  bucket. At 100 TB this turns a full-corpus scan per query into a
  1/n_centroids partition probe; buckets are co-partitioned by
  centroid id so the probe is a partition-pruned join. (A production
  build would train centroids with k-means sampling; determinism here
  makes the operator oracle-checkable.)

Float determinism: cosine numerators/denominators are summed in array
order in both engines (``F.aggregate`` ↔ ``list_aggregate``, both
sequential left folds over 64 doubles), then rounded to 6 dp before
ranking; ranking ties break on vec_id. Hash-match proven against
DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from securities_data_pipeline_spark.sources.tables import table

N_QUERIES = 5  # vec_id < 5 are the demo query vectors
TOP_K = 10
CENTROID_STRIDE = 100  # vec_id % 100 == 0 → coarse centroid


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity rounded to 6 dp (cross-engine stable)."""
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    corpus = emb.select(F.col("vec_id"), F.col("embedding"), F.col("label"))
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "label",
            cosine(F.col("qvec"), F.col("embedding")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "label", "sim")
    )


_SQL_DOT = (
    "list_aggregate(list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')"
)
_SQL_NORM = (
    "sqrt(list_aggregate(list_transform({a}, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
)


def _sql_cosine(a: str, b: str) -> str:
    dot = _SQL_DOT.format(a=a, b=b)
    na, nb = _SQL_NORM.format(a=a), _SQL_NORM.format(a=b)
    return f"round({dot} / ({na} * {nb}), 6)"


SIM_BRUTEFORCE_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, e.vec_id, e.label,
         {_sql_cosine('q.qvec', 'e.embedding')} AS sim
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, label, sim FROM ranked WHERE rank <= {TOP_K}
"""


def assign_buckets(emb: DataFrame) -> DataFrame:
    """Assign every vector to its nearest deterministic centroid."""
    centroids = emb.where(F.col("vec_id") % CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    scored = F.broadcast(centroids).crossJoin(emb).select(
        "vec_id",
        "label",
        "embedding",
        "centroid_id",
        cosine(F.col("cvec"), F.col("embedding")).alias("csim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("r", F.row_number().over(w)).where(F.col("r") == 1).drop("r", "csim")
    )


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe: query searches only its own centroid bucket."""
    emb = table(spark, sf_dir, "embeddings")
    bucketed = assign_buckets(emb)
    queries = bucketed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("centroid_id").alias("qc"),
    )
    scored = (
        F.broadcast(queries)
        .join(bucketed, (F.col("centroid_id") == F.col("qc")) & (F.col("vec_id") != F.col("query_id")))
        .select("query_id", "vec_id", "label", cosine(F.col("qvec"), F.col("embedding")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "label", "sim")
    )


SIM_IVF_SQL = f"""
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings
  WHERE vec_id % {CENTROID_STRIDE} = 0
), assigned AS (
  SELECT e.vec_id, e.label, e.embedding, c.centroid_id,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_sql_cosine('c.cvec', 'e.embedding')} DESC, c.centroid_id ASC
         ) AS r
  FROM embeddings e CROSS JOIN cents c
), bucketed AS (
  SELECT vec_id, label, embedding, centroid_id FROM assigned WHERE r = 1
), q AS (
  SELECT vec_id AS query_id, embedding AS qvec, centroid_id AS qc
  FROM bucketed WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, b.vec_id, b.label,
         {_sql_cosine('q.qvec', 'b.embedding')} AS sim
  FROM q JOIN bucketed b ON b.centroid_id = q.qc AND b.vec_id <> q.query_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, label, sim FROM ranked WHERE rank <= {TOP_K}
"""


SIMILARITY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sim_bruteforce_topk": sim_bruteforce_topk,
    "sim_ivf_topk": sim_ivf_topk,
}

SIMILARITY_ORACLES: dict[str, str] = {
    "sim_bruteforce_topk": SIM_BRUTEFORCE_SQL,
    "sim_ivf_topk": SIM_IVF_SQL,
}
