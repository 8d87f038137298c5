"""Parquet table loaders for the synthetic star schema.

Mirrors the reference's named-table scans (dbt
``{{ source("raw", ...) }}`` — dw_transformer/models/staging/*.sql) as
plain ``spark.read.parquet`` scans registered as temp views, so both the
DataFrame API and ``spark.sql`` can address them.

Scans stay fully declarative: column pruning and predicate pushdown are
Catalyst's job (reference does this by hand via ``columns=``/``filters=``
arguments, py_pipeline/extract.py:88-95).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def pin_event_session_confs(spark: SparkSession) -> None:
    """DELIBERATE session-wide side effect, part of the engine's
    contract (shared by the batch scan AND the streaming source so the
    two reads of the same file can never diverge): every query surface
    in this package assumes UTC session semantics (the session factory
    pins it; the oracle gate and all to_date/window results depend on
    it), and a session not built by our factory would otherwise reject
    the TIMESTAMP(NANOS) parquet column outright while the ns→µs
    conversion is only wall-clock-stable under UTC (SURVEY §7 risk 7).
    Callers embedding this engine in a session that must keep a
    different timezone should scan events themselves."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """ts-column normalization shared by batch and streaming reads of
    the events table — one definition, so a future change to the ns→µs
    rounding or a new parquet type branch cannot desynchronize the two
    paths."""
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # integer division — `/` would go through double and lose
        # precision above 2^53 ns
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif isinstance(ts_type, T.TimestampNTZType):
        # parquet TIMESTAMP with isAdjustedToUTC=false infers as NTZ in
        # Spark 4; watermarks and unix_micros need TIMESTAMP (LTZ).
        # Under the pinned UTC session timezone this cast is a pure
        # reinterpretation — wall-clock values are unchanged.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism
    when the input arrives in FEWER partitions — for CPU-heavy per-row
    stages (minhash/hyperplane signatures, codebook argmins, pairwise
    cosines: interpreted higher-order-function projections whose cost
    is compute, not IO) that would otherwise pin one core on a small
    single-row-group file while the rest idle. At cluster scale the
    scan already arrives in more splits than cores and this is a
    no-op (the guard returns the input untouched), so the extra
    shuffle exists only in exactly the regime where it is ~free.
    Results must be partition-invariant upstream of any use (pure
    projections + total-order windows) — the invariance gate re-proves
    that for every registered consumer each round. Measured wins at
    sf0.1 (single-row-group files, local[32]): sim_ivfpq_rerank_topk
    3.58 → 2.19 s, dedup_semdedup 7.46 → 2.84 s, same-session A/B."""
    if df.isStreaming:  # .rdd is illegal on a streaming frame; a
        return df  # micro-batch is bounded by the trigger anyway
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def materialize(df: DataFrame, eager: bool = False) -> DataFrame:
    """THE choke point for the materialize-once pattern (optimization
    round 12, VERDICT r11 #7): every corpus-scale reused intermediate
    in the similarity/dedup families (gated corpora, signatures, band
    keys, per-arm assignments, component-loop round state) goes
    through here instead of calling ``localCheckpoint`` directly, so
    the local-vs-cluster storage decision lives in ONE place.

    Modes (``SPARK_GRAFT_MATERIALIZE``):

    - ``local`` (default) — ``localCheckpoint``: executor-local blocks,
      lineage truncated. The right choice on this harness and on any
      cluster where recomputing from parquet after an executor loss is
      acceptable (these are all intra-QUERY intermediates — a lost
      block fails the query, the retry recomputes from source).
    - ``reliable`` — ``DataFrame.checkpoint`` into
      ``SPARK_GRAFT_CHECKPOINT_DIR`` (shared storage): survives
      executor loss, the 100 TB choice when a trainer/certificate
      query runs long enough that mid-query executor churn is expected.
      Same lineage truncation, so the driver-loop operators keep their
      O(1)-plan-per-round property.

    ``persist(DISK_ONLY)`` is deliberately NOT offered here: it does
    not truncate lineage, so the iterative operators behind this choke
    point (Lloyd loops, star contraction, BPE rounds) would replan a
    growing tree every round — the exact pathology the checkpoints
    exist to prevent. Eager/lazy follows the call site: lazy whenever
    a downstream action (fixpoint count, first arm's job) materializes
    the frame anyway; eager only where the caller needs the state
    pinned before branching work.

    SCALE.md §materialize-once documents the rationale."""
    mode = os.environ.get("SPARK_GRAFT_MATERIALIZE", "local")
    if mode == "reliable":
        spark = df.sparkSession
        ckpt_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
        if ckpt_dir:
            spark.sparkContext.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def materialize_eager(df: DataFrame) -> DataFrame:
    """``materialize`` with eager=True — the ``DataFrame.transform``
    companion for call sites that must pin state before branching."""
    return materialize(df, eager=True)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Pure ``spark.read.parquet`` — no caching, no hints.

    TIMESTAMP(NANOS) parquet columns (the ``events.ts`` column) are read
    as nanos-since-epoch longs (``spark.sql.legacy.parquet.nanosAsLong``)
    and converted to microsecond timestamps at the scan, matching how
    warehouse engines downcast ns→us. Conversion is a cheap projection —
    pruning/pushdown on other columns is unaffected.
    """
    if name == "events":
        pin_event_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load tables and register each as a same-named temp view."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
