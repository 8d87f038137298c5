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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from securities_data_pipeline_spark.sources.tables import spread, table

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
    fake — the seeded stable hash of the payload (the same
    ``md5(seed || ':' || x)`` family as functions/hashing.py), reduced
    mod 1e5 so every feature is an integer-valued float (exact in
    float32 AND in a double-typed SQL oracle). That makes the whole
    mapInPandas path value-checkable against DuckDB, not just
    shape-checkable."""
    if strict:
        raise NotImplementedError(
            f"no codec for {media_type}: decode libraries are not available in this environment"
        )
    import hashlib

    return [
        float(
            int(hashlib.md5(f"{i}:".encode() + payload).hexdigest()[:15], 16) % 100000
        )
        for i in range(N_FAKE_FEATURES)
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
            # NULL payloads (a NULL source document) propagate as
            # 0-byte/NULL-feature rows instead of killing the task
            # (len(None) raises) — matching how every other operator
            # in this module treats NULL blobs
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"]
                    .map(lambda p: 0 if p is None else len(p))
                    .astype("int64"),
                    "feature": [
                        None if p is None else decode_stub(p, m, strict=strict)
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


def mm_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-level exact dedup: group media rows by payload sha256 —
    the first dedup tier every image/audio corpus runs (identical
    bytes across URLs/sources), upstream of any perceptual hash. Only
    (digest, doc_id) pairs shuffle — the payloads themselves never
    move, which is the entire point at 100 TB of media."""
    media = documents_as_media(spark, sf_dir)
    return (
        media.select("doc_id", F.sha2(F.col("payload"), 256).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


MM_PAYLOAD_DEDUP_SQL = """
SELECT sha256(text) AS digest,
       MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-checked decode path: the full binary→feature mapInPandas
    pipeline, exploded to (doc_id, feat_idx, feat_val) rows. The
    payload is UTF-8 text bytes and the stub feature is the seeded
    stable hash, so a pure-SQL oracle reproduces every value — proving
    the Arrow batch plumbing loses nothing."""
    media = documents_as_media(spark, sf_dir)
    feats = extract_features(media)
    return feats.select(
        "doc_id", "n_bytes", F.posexplode("feature").alias("feat_idx", "feat_val")
    ).select("doc_id", "n_bytes", "feat_idx", F.col("feat_val").cast("double").alias("feat_val"))


MM_FEATURE_EXTRACT_SQL = """
-- text IS NOT NULL mirrors the Spark side exactly: a NULL payload's
-- feature array is NULL, and posexplode of NULL emits no rows —
-- DuckDB's concat would instead treat the NULL as '' and fabricate
-- 8 rows the Spark plan never produces
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CAST(i AS INT) AS feat_idx,
       CAST(CAST(concat('0x', substring(md5(concat(CAST(i AS VARCHAR), ':', text)), 1, 15))
                 AS BIGINT) % 100000 AS DOUBLE) AS feat_val
FROM documents, unnest(range(0, 8)) AS t(i)
WHERE text IS NOT NULL
"""


RESIZE_BYTES = 128


def resize_stub(payload: bytes, media_type: str, target: int = RESIZE_BYTES) -> bytes:
    """STUB for image/audio resampling. In production: PIL resize /
    librosa resample dispatched on media_type. The fake is a
    deterministic truncate-or-cycle to ``target`` bytes — payload in,
    payload out, which is the plumbing shape that matters (binary →
    binary, row count preserved, meta updated)."""
    if not payload:
        return b"\x00" * target
    reps = -(-target // len(payload))
    return (payload * reps)[:target]


def resize_media(media: DataFrame, *, target: int = RESIZE_BYTES) -> DataFrame:
    """Binary→binary transform over mapInPandas: each payload replaced
    by its resized form, meta.width updated to the new size. Output
    rows = input rows; Arrow carries the blobs both ways so Python
    never sees more than one batch at a time."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                resize_stub(p, m, target) for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            # NULL meta structs (a real corpus has rows whose probe
            # step failed) coalesce to an all-NULL dict before the
            # width update — {**None} would kill the task (found by
            # tools/fuzz_media.py)
            empty = {"width": None, "height": None, "sample_rate": None, "n_frames": None}
            out["meta"] = [
                {
                    **(
                        empty
                        if m is None
                        else m
                        if isinstance(m, dict)
                        else m.asDict()
                        if hasattr(m, "asDict")
                        else dict(m)
                    ),
                    "width": target,
                }
                for m in pdf["meta"]
            ]
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked resize: digest of the resized payload per doc.
    The cycle-to-length fake is SQL-expressible (repeat + substring),
    so the binary round-trip through Arrow is value-checked.

    NB: the SQL twin slices VARCHAR *characters* while the stub slices
    payload *bytes* — equivalent only for ASCII text, which the
    synthetic corpus guarantees (a production resize consumes bytes;
    the oracle exists to check the Arrow plumbing, not codec
    semantics). Empty docs are excluded on both sides so the oracle's
    ceil-division is total."""
    media = documents_as_media(spark, sf_dir).where(F.octet_length("payload") > 0)
    resized = resize_media(media)
    return resized.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("digest"),
        F.col("meta.width").alias("width"),
    )


MM_RESIZE_SQL = f"""
SELECT doc_id,
       {RESIZE_BYTES} AS n_bytes,
       md5(substring(repeat(text, CAST(ceil({RESIZE_BYTES}.0 / len(text)) AS INT)),
                     1, {RESIZE_BYTES})) AS digest,
       {RESIZE_BYTES} AS width
FROM documents
WHERE len(text) > 0
"""


FRAME_BYTES = 64
FRAME_STRIDE = 3


def frame_sample(media: DataFrame, *, frame_bytes: int = FRAME_BYTES, stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame-sampling plumbing: one input blob → several sampled-frame
    rows (every ``stride``-th fixed-size slice), the row-exploding
    mapInPandas shape a video decoder needs (frame count is unknown to
    the planner; output batches are built per input batch). The digest
    stands in for the decoded frame tensor."""
    import hashlib

    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    # NULL blobs propagate as zero frames — the
                    # module-wide NULL policy (see extract_features);
                    # len(None) would kill the whole task instead
                    continue
                n_frames = -(-len(payload) // frame_bytes)
                for j in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(j)
                    digests.append(
                        hashlib.md5(payload[j * frame_bytes : (j + 1) * frame_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame_md5": pd.Series(digests, dtype="object")}
            )

    return media.mapInPandas(run, schema="doc_id long, frame_idx int, frame_md5 string")


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked frame sampling over the synthetic media table
    (empty docs excluded; ASCII corpus makes the char-based SQL twin
    byte-equivalent — see ``mm_resize``)."""
    media = documents_as_media(spark, sf_dir).where(F.octet_length("payload") > 0)
    return frame_sample(media)


MM_FRAME_SAMPLE_SQL = f"""
SELECT doc_id,
       CAST(j AS INT) AS frame_idx,
       md5(substring(text, CAST(j * {FRAME_BYTES} + 1 AS INT), {FRAME_BYTES})) AS frame_md5
FROM documents,
     unnest(range(0, CAST(ceil(len(text) / {FRAME_BYTES}.0) AS BIGINT), {FRAME_STRIDE})) AS t(j)
WHERE len(text) > 0
"""


MULTIMODAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "mm_binary_meta": mm_binary_meta,
    "mm_payload_dedup": mm_payload_dedup,
    "mm_feature_extract": mm_feature_extract,
    "mm_frame_sample": mm_frame_sample,
    "mm_resize": mm_resize,
}

MULTIMODAL_ORACLES: dict[str, str] = {
    "mm_binary_meta": MM_BINARY_META_SQL,
    "mm_payload_dedup": MM_PAYLOAD_DEDUP_SQL,
    "mm_feature_extract": MM_FEATURE_EXTRACT_SQL,
    "mm_frame_sample": MM_FRAME_SAMPLE_SQL,
    "mm_resize": MM_RESIZE_SQL,
}


#: 16-hex-char (8-byte) non-overlapping block grams of the hexed
#: payload, as ONE SQL string — term-for-term the py4j transform it
#: replaces. SQL-parsed lambdas keep their literal parameter names, so
#: the generated Java source is identical on every DataFrame build and
#: whole-stage codegen hits its source-keyed cache instead of
#: recompiling per invocation (see dedup._shingles_from_sql).
_MM_GRAMS_SQL = (
    "array_distinct(transform("
    "sequence(1, greatest(length(_hx) - 15, 1), 16), "
    "i -> substring(_hx, i, 16)))"
)

#: seeded 60-bit block hashes (seed 0) — SQL twin of
#: ``transform(_g, g -> seeded_hash64(g, 0))`` (functions/hashing.py),
#: same stable-lambda-name rationale as ``_MM_GRAMS_SQL``.
_MM_SWH_SQL = (
    "transform(_g, g -> "
    "CAST(conv(substring(md5(concat('0:', g)), 1, 15), 16, 10) AS BIGINT))"
)


def mm_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level NEAR-duplicate pairs over binary payloads — the
    multimodal counterpart to text SimHash: a 16-bit SimHash over the
    payload's distinct NON-OVERLAPPING 8-byte blocks (from its hex
    rendering, so no decode is needed — block sketching is a real
    file-level near-dup technique, not a stub), then the shared banded
    Hamming plan from ``simhash_hamming_pairs``. Catches re-encoded/
    truncated/metadata-tweaked payload variants that
    ``mm_payload_dedup``'s exact sha256 match cannot.

    Non-overlapping blocks (stride = width) cover every byte at 1/8th
    the hash count of sliding byte-grams — the first cut of this op
    slid a 4-byte window at every byte and spent ~2 000 md5s per
    payload (~8× this op's wall on the same corpus). The tradeoff is
    alignment sensitivity: a 1-byte insertion shifts every later
    block, where sliding grams would re-align. For payloads that is
    the right trade (media edits are overwrites/truncations/metadata
    patches, not single-byte insertions); for text the shift-robust
    tiers (shingle MinHash, winnowing) already exist.

    Plan: one narrow projection per payload (hex → block array →
    64-bit block hashes → sketch; the blob never shuffles), then the
    banded bucket expansion — identical shuffle structure to the text
    tier, so the 100 TB argument transfers verbatim.
    """
    from securities_data_pipeline_spark.operators.dedup import (
        simhash_col,
        simhash_hamming_pairs,
    )

    media = documents_as_media(spark, sf_dir)
    # ~250 block hashes per payload, all per-row — spread the single-
    # split scan (A/B sf0.1: 1.91 -> 1.38 s; no-op at cluster scale)
    hexed = spread(media).select("doc_id", F.hex(F.col("payload")).alias("_hx"))
    sig = (
        hexed.select("doc_id", F.expr(_MM_GRAMS_SQL).alias("_g"))
        .select("doc_id", F.expr(_MM_SWH_SQL).alias("_swh"))
        .select("doc_id", simhash_col().alias("simhash"))
    )
    return simhash_hamming_pairs(sig)


def _sql_mm_near_dedup() -> str:
    from securities_data_pipeline_spark.functions.hashing import sql_seeded_hash64
    from securities_data_pipeline_spark.operators.dedup import (
        SIMHASH_BITS,
        _sql_simhash_pairs,
    )

    h = sql_seeded_hash64("x", 0)
    terms = " + ".join(
        f"(CASE WHEN list_aggregate(list_transform(hs, "
        f"h -> ((h >> {b}) & 1) * 2 - 1), 'sum') > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    sig_sql = f"""
WITH g AS (
  SELECT doc_id,
         list_transform(
           list_distinct(list_transform(
             range(1, greatest(len(hx) - 15, 1) + 1, 16),
             i -> substring(hx, i, 16))),
           x -> {h}) AS hs
  FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents) t
)
SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM g
"""
    return _sql_simhash_pairs(sig_sql)


MULTIMODAL_QUERIES["mm_near_dedup"] = mm_near_dedup


#: bucket cap for the dup-burst-robust tier: the 16-bit demo sketch has
#: only 2^8 = 256 keys per band, so at dup-heavy corpora bucket
#: population grows O(n) and in-bucket pair expansion O(n²) — the 20×
#: stress run measured mm_near_dedup at 95× wall on 20× docs
#: (SCALE.md §5). The cap bounds any bucket's cost at cap²/2; real
#: near-dups also collide in rarer buckets and survive. Production
#: geometry (64-bit sketch, 4×16-bit bands) pushes the same cliff out
#: by 256×, but a cap is still the guard a 100 TB corpus needs.
MM_BUCKET_CAP = 64


def mm_near_dedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mm_near_dedup`` with the bucket-size cap — the tier to run on
    corpora with duplication bursts (mirror sites, boilerplate media):
    oversized (band, key) buckets are dropped whole before pair
    expansion, exactly like ``dedup_minhash_pairs_capped``. Cap
    semantics are deterministic, so the DuckDB twin pins them."""
    from securities_data_pipeline_spark.operators.dedup import (
        simhash_col,
        simhash_hamming_pairs,
    )

    media = documents_as_media(spark, sf_dir)
    hexed = spread(media).select("doc_id", F.hex(F.col("payload")).alias("_hx"))
    sig = (
        hexed.select("doc_id", F.expr(_MM_GRAMS_SQL).alias("_g"))
        .select("doc_id", F.expr(_MM_SWH_SQL).alias("_swh"))
        .select("doc_id", simhash_col().alias("simhash"))
    )
    return simhash_hamming_pairs(sig, max_bucket=MM_BUCKET_CAP)


def _sql_mm_near_dedup_capped() -> str:
    from securities_data_pipeline_spark.functions.hashing import sql_seeded_hash64
    from securities_data_pipeline_spark.operators.dedup import (
        SIMHASH_BITS,
        _sql_simhash_pairs,
    )

    h = sql_seeded_hash64("x", 0)
    terms = " + ".join(
        f"(CASE WHEN list_aggregate(list_transform(hs, "
        f"h -> ((h >> {b}) & 1) * 2 - 1), 'sum') > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    sig_sql = f"""
WITH g AS (
  SELECT doc_id,
         list_transform(
           list_distinct(list_transform(
             range(1, greatest(len(hx) - 15, 1) + 1, 16),
             i -> substring(hx, i, 16))),
           x -> {h}) AS hs
  FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents) t
)
SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM g
"""
    return _sql_simhash_pairs(sig_sql, max_bucket=MM_BUCKET_CAP)


MULTIMODAL_QUERIES["mm_near_dedup_capped"] = mm_near_dedup_capped
MULTIMODAL_ORACLES["mm_near_dedup_capped"] = _sql_mm_near_dedup_capped()


MM_KNN_QUERY_MOD = 100  # doc_id % 100 == 0 are the demo query docs
MM_KNN_K = 5


def mm_feature_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-family composition: decode binary payloads to feature
    vectors (the Arrow-batched ``extract_features`` path), then run
    cosine top-k over the DECODED features with the similarity tier's
    exact plan (broadcast queries × corpus, window top-k, ties broken
    by doc_id after 6-dp rounding) — the perceptual-retrieval shape
    (CLIP-feature nearest neighbors) with the codec stubbed.

    The feature values are integer-valued floats < 1e5 (exact in
    float32 AND double), so dot products and norms are bit-identical
    across engines and the whole two-stage pipeline — mapInPandas
    decode INTO JVM-side window ranking — is value-checked by one SQL
    oracle. Scale shape: features are 8 floats per blob, so the
    broadcast+crossJoin tier costs what ``sim_bruteforce_topk`` costs —
    at real scale the IVF/LSH tiers take over on the same vectors."""
    media = documents_as_media(spark, sf_dir)
    from securities_data_pipeline_spark.operators.similarity import _dot, _norm

    from pyspark.sql import Window

    # query side: the doc_id % MOD filter commutes with the row-wise
    # decode, so it sits BELOW the Python boundary — the broadcast side
    # ships 1/MOD of the corpus through mapInPandas instead of decoding
    # everything and then discarding 99% (guide §4.1: cross the
    # JVM↔Python boundary with only the rows/columns the function
    # needs). Norms are hoisted out of the pair loop onto each side
    # (the sim_bruteforce_topk shape): per-vector sqrt once, not per
    # pair, with the identical dot/(qn*en) grouping cosine() uses.
    queries = (
        extract_features(
            media.where(F.pmod(F.col("doc_id"), F.lit(MM_KNN_QUERY_MOD)) == 0)
        )
        .where(F.col("feature").isNotNull())
        .select(
            F.col("doc_id").alias("query_id"),
            F.col("feature").alias("qvec"),
            _norm("feature").alias("qn"),
        )
    )
    feats = (
        extract_features(spread(media))
        .where(F.col("feature").isNotNull())
        .select("doc_id", "feature", _norm("feature").alias("en"))
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(feats)
        .where(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            F.round(
                _dot("qvec", "feature") / (F.col("qn") * F.col("en")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= MM_KNN_K)
        .select("query_id", "rank", "doc_id", "sim")
    )


def _sql_mm_feature_knn() -> str:
    feat = (
        "[CAST(CAST(concat('0x', substring(md5(concat(CAST(i AS VARCHAR), ':', text)), 1, 15)) "
        "AS BIGINT) % 100000 AS DOUBLE) FOR i IN range(0, 8)]"
    )
    dot = (
        "list_aggregate(list_transform(list_zip(q.qvec, f.feature), "
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')"
    )
    norm_q = (
        "sqrt(list_aggregate(list_transform(q.qvec, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )
    norm_f = (
        "sqrt(list_aggregate(list_transform(f.feature, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )
    return f"""
WITH f AS MATERIALIZED (
  SELECT doc_id, {feat} AS feature
  FROM documents WHERE text IS NOT NULL
), q AS (
  SELECT doc_id AS query_id, feature AS qvec FROM f
  WHERE doc_id % {MM_KNN_QUERY_MOD} = 0
), scored AS (
  SELECT q.query_id, f.doc_id,
         round({dot} / ({norm_q} * {norm_f}), 6) AS sim
  FROM q, f WHERE f.doc_id <> q.query_id
), ranked AS (
  SELECT query_id, doc_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, doc_id) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, doc_id, sim
FROM ranked WHERE rank <= {MM_KNN_K}
"""


MULTIMODAL_QUERIES["mm_feature_knn"] = mm_feature_knn
MULTIMODAL_ORACLES["mm_feature_knn"] = _sql_mm_feature_knn()
MULTIMODAL_ORACLES["mm_near_dedup"] = _sql_mm_near_dedup()


def mm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality DATASET CARD — the composition summary a curated
    multimodal corpus ships with (HF dataset cards, Datasheets for
    Datasets): per media type, document count, exact-duplicate payload
    share (distinct sha256 digests — the multimodal face of
    ``dedup_exact``'s fingerprint rule), total/min/max payload bytes,
    and the EXACT median payload size via rank arithmetic (the
    ``w10_conversion_cohorts`` median discipline: the middle one or
    two rows by ``(n_bytes, doc_id)`` rank, averaged — x.0/x.5
    doubles, identical on both engines, no dialect-specific
    percentile interpolation).

    Plan: metadata projection only (``octet_length`` + ``sha2`` — the
    payload is never decoded, the ``mm_binary_meta`` rule), one
    per-modality rank window feeding ONE hash aggregate: the median is
    a conditional aggregation over the middle-ranked rows, not a
    separate median frame joined back (the demo mapping's literal
    modality would constant-fold a join key away into a degenerate
    nested-loop join — plan-audit catch). At 100 TB each modality's
    rank rides its own shuffle partition set, and the card is
    O(modalities) rows forever. ``dup_ratio`` is the exact
    integer-family division (n_docs − n_distinct)/n_docs.

    NULL-payload policy (adversarial-media fuzz catch): a NULL payload
    is card-counted as an EMPTY payload (0 bytes, digest of b"") —
    without the coalesce, NULL byte-lengths sort FIRST in Spark but
    LAST in DuckDB and the median ranks land on different rows.
    """
    media = documents_as_media(spark, sf_dir)
    payload = F.coalesce(F.col("payload"), F.lit(b""))
    meta = media.select(
        "doc_id",
        "media_type",
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("digest"),
    )
    w = Window.partitionBy("media_type").orderBy("n_bytes", "doc_id")
    wn = Window.partitionBy("media_type")
    ranked = meta.select(
        "media_type",
        "n_bytes",
        "digest",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mid = (F.col("rn") == F.expr("(n + 1) div 2")) | (
        F.col("rn") == F.expr("(n + 2) div 2")
    )
    return (
        ranked.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("digest").cast("long").alias(
                "n_distinct_payloads"
            ),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.min("n_bytes").cast("long").alias("min_bytes"),
            F.max("n_bytes").cast("long").alias("max_bytes"),
            (
                F.sum(F.when(mid, F.col("n_bytes"))).cast("double")
                / F.sum(F.when(mid, 1)).cast("double")
            ).alias("median_bytes"),
        )
        .select(
            "media_type",
            "n_docs",
            "n_distinct_payloads",
            F.round(
                (F.col("n_docs") - F.col("n_distinct_payloads")).cast(
                    "double"
                )
                / F.col("n_docs"),
                6,
            ).alias("dup_ratio"),
            "total_bytes",
            "min_bytes",
            "max_bytes",
            "median_bytes",
        )
        .orderBy("media_type")
    )


MM_DATASET_CARD_SQL = """
WITH meta AS (
  -- NULL payloads are card-counted as EMPTY payloads (see the
  -- operator docstring: engine NULL-sort orders differ)
  SELECT doc_id, 'text/plain' AS media_type,
         octet_length(encode(COALESCE(text, ''))) AS n_bytes,
         sha256(COALESCE(text, '')) AS digest
  FROM documents
), ranked AS (
  SELECT media_type, n_bytes, digest,
         ROW_NUMBER() OVER (PARTITION BY media_type
                            ORDER BY n_bytes, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY media_type) AS n
  FROM meta
)
SELECT media_type,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_distinct_payloads,
       round(CAST(COUNT(*) - COUNT(DISTINCT digest) AS DOUBLE) / COUNT(*), 6)
         AS dup_ratio,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(n_bytes) AS BIGINT) AS min_bytes,
       CAST(MAX(n_bytes) AS BIGINT) AS max_bytes,
       CAST(SUM(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2
                     THEN n_bytes END) AS DOUBLE)
         / SUM(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2
               THEN 1 ELSE 0 END) AS median_bytes
FROM ranked
GROUP BY media_type
ORDER BY media_type
"""


MULTIMODAL_QUERIES["mm_dataset_card"] = mm_dataset_card
MULTIMODAL_ORACLES["mm_dataset_card"] = MM_DATASET_CARD_SQL
