"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (BASELINE.json north star): image/audio/video travel as
``binary`` columns with a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched Pandas UDFs over
``mapInPandas``. The Spark-side plumbing here — schema, batching,
partition sizing — is real and tested; the actual codec calls are
STUBBED (this container has no image/audio libraries) behind
``decode_stub`` which either raises ``NotImplementedError`` (strict
mode) or produces a deterministic fake feature vector (test mode).

Scale notes: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` (not row count) governs partition
sizing; ``mapInPandas`` streams Arrow batches so a partition never
fully materializes in Python; metadata-only queries never touch the
blob column (columnar pruning — verified via ReadSchema in
``.explain``).

``mm_binary_meta`` is the oracle-checked query: byte length + sha256
of the payload — the metadata projection pattern.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from securities_data_pipeline_spark.sources.tables import table

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = "doc_id long, media_type string, n_bytes long, feature array<float>"

N_FAKE_FEATURES = 8


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media-shaped table from documents: text bytes stand in
    for an encoded payload (deterministic, schema-faithful)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, media_type: str, *, strict: bool = False) -> list[float]:
    """STUB for the real codec. In production this dispatches on
    media_type to PIL/ffmpeg/torchaudio; here it is a deterministic
    fake (byte-histogram moments) so the distributed plumbing is
    testable end-to-end."""
    if strict:
        raise NotImplementedError(
            f"no codec for {media_type}: decode libraries are not available in this environment"
        )
    n = max(len(payload), 1)
    return [
        float(sum(payload[i::N_FAKE_FEATURES]) % 1000) / n for i in range(N_FAKE_FEATURES)
    ]


def extract_features(media: DataFrame, *, strict: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    Batch shape: the UDF receives pandas DataFrames of
    (doc_id, media_type, payload, meta) and yields
    (doc_id, media_type, n_bytes, feature) — blob in, small vector
    out, so output batches are tiny regardless of payload size.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": [
                        decode_stub(p, m, strict=strict)
                        for p, m in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection over the binary column: byte length +
    sha256 — never decodes, prunes to the needed columns."""
    media = documents_as_media(spark, sf_dir)
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length(F.col("payload")).alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("digest"),
    )


MM_BINARY_META_SQL = """
SELECT doc_id,
       'text/plain' AS media_type,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS digest
FROM documents
"""


MULTIMODAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "mm_binary_meta": mm_binary_meta,
}

MULTIMODAL_ORACLES: dict[str, str] = {
    "mm_binary_meta": MM_BINARY_META_SQL,
}
