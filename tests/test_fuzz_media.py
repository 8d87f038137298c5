"""Pinned root causes from the media fuzz axis (tools/fuzz_media.py).

One test per root cause, same shape as test_fuzz_events.py: the full
sweeps are tool runs; these pin the specific bug classes so they can
never regress silently.
"""

from __future__ import annotations

import pytest

from securities_data_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample,
    resize_media,
)


@pytest.fixture()
def garbage_media(spark):
    """NULL payload + NULL meta + empty + 1-byte + invalid-UTF-8 blobs
    — the classes a 100 TB media crawl contains on day one."""
    rows = [
        (0, "image/png", None, None),
        (1, "image/png", b"", {"width": 1, "height": 1, "sample_rate": None, "n_frames": None}),
        (2, "audio/wav", b"\xff", None),
        (3, "image/jpeg", b"\xc3\x28" * 40, None),  # invalid UTF-8
        (4, "video/mp4", b"\x00" * 193, None),  # embedded NULs
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_resize_survives_null_meta(garbage_media):
    """Root cause (r7 media fuzz): resize_media's meta update was
    ``{**m, ...}`` which raises TypeError on a NULL struct, killing
    the whole task — one corrupt probe row aborted the job."""
    out = {r.doc_id: r for r in resize_media(garbage_media).collect()}
    assert len(out) == 5  # every row survives, none dropped
    assert all(r.meta.width == 128 for r in out.values())
    # NULL payload resizes to the zero-filled blob, not a crash
    assert bytes(out[0].payload) == b"\x00" * 128


def test_null_payload_policy(garbage_media):
    """NULL blobs propagate (0 bytes / NULL feature / zero frames) —
    never a task death."""
    feats = {r.doc_id: r for r in extract_features(garbage_media).collect()}
    assert feats[0].n_bytes == 0 and feats[0].feature is None
    frames = frame_sample(garbage_media).collect()
    assert not any(r.doc_id == 0 for r in frames)


def test_arrow_batch_boundary_invariance(spark, garbage_media):
    """Results must not depend on where Arrow splits batches: run with
    maxRecordsPerBatch=2 (a split between every pair of rows) and
    compare to the default."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    default = spark.conf.get(key, "10000")

    def snap():
        return sorted(
            (r.doc_id, r.n_bytes, tuple(r.feature) if r.feature else None)
            for r in extract_features(garbage_media).collect()
        )

    ref = snap()
    try:
        spark.conf.set(key, "2")
        assert snap() == ref
    finally:
        spark.conf.set(key, default)


def test_capped_near_dedup_is_subset_with_small_buckets_preserved(spark, tmp_path):
    """Cap contract on a generated dup-burst corpus: the capped tier's
    pairs are a SUBSET of the uncapped tier's, and every pair whose
    band buckets are all within the cap survives untouched (the cap
    drops oversized buckets whole, never individual rows)."""
    import os
    import random

    from securities_data_pipeline_spark.operators.multimodal import (
        mm_near_dedup,
        mm_near_dedup_capped,
    )

    rng = random.Random(5)
    rows = []
    # a burst: 70 exact copies of one payload (crosses the 64 bucket
    # cap), plus an organic near-dup pair that must survive
    burst = "".join(rng.choice("abcdef ") for _ in range(200))
    for i in range(70):
        rows.append((i, burst, "en", "s0", len(burst)))
    organic = "".join(rng.choice("xyzuvw ") for _ in range(300))
    rows.append((100, organic, "en", "s1", len(organic)))
    rows.append((101, organic[:-3], "en", "s1", len(organic) - 3))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))

    capped = {
        (r.doc_a, r.doc_b) for r in mm_near_dedup_capped(spark, str(tmp_path)).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b) for r in mm_near_dedup(spark, str(tmp_path)).collect()
    }
    assert capped <= uncapped
    # the 70-copy burst saturates its buckets -> its pairs are dropped
    assert not any(a < 100 and b < 100 for a, b in capped)
    assert any(a < 100 and b < 100 for a, b in uncapped)
    # the organic near-dup pair lives in small buckets -> preserved
    assert (100, 101) in capped
