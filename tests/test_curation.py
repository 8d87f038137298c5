"""Curation-operator behavior on controlled inputs (the oracle gate
covers cross-engine parity; these pin semantics)."""

import pytest
from pyspark.sql import functions as F

from securities_data_pipeline_spark.operators.curation import (
    DECON_N,
    KMEANS_K,
    _assign,
    _gram_hashes,
)

DOCS = "doc_id long, text string, source string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS)


def test_gram_hashes_count_and_short_doc(spark):
    df = _docs(spark, [(1, " ".join(f"w{i}" for i in range(10)), "s"), (2, "a b c", "s")])
    out = {
        r.doc_id: r.g
        for r in df.select("doc_id", _gram_hashes(F.split("text", " ")).alias("g")).collect()
    }
    # 10 tokens → 10 - (N-1) = 3 distinct 8-grams
    assert len(out[1]) == 10 - (DECON_N - 1)
    # shorter than N tokens → no grams at all
    assert out[2] == []


def test_repetition_filter_flags_repeated_text(spark, tmp_path):
    rows = [
        (0, "spam spam spam spam spam spam spam spam spam spam", "s"),
        (1, " ".join(f"tok{i}" for i in range(20)), "s"),
    ]
    _docs(spark, rows).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from securities_data_pipeline_spark.operators.curation import t_repetition_filter

    out = {r.doc_id: r for r in t_repetition_filter(spark, str(tmp_path)).collect()}
    assert out[0].repetitive and out[0].dup_word_frac == pytest.approx(0.9)
    # the top bigram "spam spam" covers 9 of 10 bigram slots → 2*9/10
    assert out[0].top_bigram_frac == pytest.approx(1.8)
    assert not out[1].repetitive and out[1].dup_word_frac == 0.0


def test_decontaminate_flags_benchmark_overlap(spark, tmp_path):
    bench_text = " ".join(f"b{i}" for i in range(DECON_N))
    rows = [
        (0, bench_text, "src0"),  # the benchmark doc
        (1, "prefix " + bench_text, "src1"),  # contains the benchmark 8-gram
        (2, " ".join(f"c{i}" for i in range(12)), "src1"),  # clean
    ]
    _docs(spark, rows).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from securities_data_pipeline_spark.operators.curation import t_decontaminate

    out = {r.doc_id: r for r in t_decontaminate(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2}  # benchmark rows excluded from the output
    assert out[1].contaminated and out[1].n_shared == 1
    assert not out[2].contaminated and out[2].n_shared == 0


def test_quality_filter_keeps_at_least_half(spark, tmp_path):
    rows = [
        (i, " ".join(["the value fast"] * (2 + 3 * i)), "s") for i in range(6)
    ]
    _docs(spark, rows).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from securities_data_pipeline_spark.operators.curation import t_quality_filter

    kept = t_quality_filter(spark, str(tmp_path))
    assert kept.count() >= 3  # median threshold keeps the upper half
    assert set(kept.columns) == {"doc_id", "quality"}


def test_kmeans_assign_separates_obvious_clusters(spark):
    # two tight blobs far apart in 64-d; seeds 0..7 span both blobs
    def vec(base):
        return [float(base)] * 64

    rows = [(i, vec(0.0 if i % 2 == 0 else 100.0)) for i in range(16)]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = [
        (int(r["vec_id"]), list(r["v"]))
        for r in emb.where(F.col("vec_id") < KMEANS_K).collect()
    ]
    out = {r.vec_id: r.cid for r in _assign(emb, cents).collect()}
    # every even vector lands on an even (0-blob) seed, odd on odd —
    # and ties within a blob break to the LOWEST centroid id
    assert all(out[i] == 0 for i in range(0, 16, 2))
    assert all(out[i] == 1 for i in range(1, 16, 2))


def test_assemble_manifest_composes_the_standalone_operators(spark):
    from pyspark.sql import functions as F

    from securities_data_pipeline_spark.operators.assemble import t_assemble_manifest
    from securities_data_pipeline_spark.operators.curation import t_quality_filter
    from securities_data_pipeline_spark.operators.sampling import split_col
    from securities_data_pipeline_spark.operators.textops import fingerprint, token_count
    from securities_data_pipeline_spark.sources.tables import table

    SF = "/root/testdata/sf0.001"
    got = {r.split: (r.n_docs, r.n_tokens) for r in t_assemble_manifest(spark, SF).collect()}

    kept_ids = {r.doc_id for r in t_quality_filter(spark, SF).collect()}
    docs = table(spark, SF, "documents").select(
        "doc_id", fingerprint().alias("fp"), token_count().cast("long").alias("n_tok")
    )
    rows = [r for r in docs.collect() if r.doc_id in kept_ids]
    canon = {}
    for r in rows:
        if r.fp not in canon or r.doc_id < canon[r.fp].doc_id:
            canon[r.fp] = r
    surv = list(canon.values())
    split_of = {
        r.doc_id: r.split
        for r in docs.select(
            "doc_id", split_col(F.col("doc_id").cast("string")).alias("split")
        ).collect()
    }
    exp = {}
    for r in surv:
        s = split_of[r.doc_id]
        d, t = exp.get(s, (0, 0))
        exp[s] = (d + 1, t + r.n_tok)
    assert got == exp
    assert sum(d for d, _ in got.values()) == len(surv)


def test_bloom_decontaminate_no_false_negatives(spark):
    """Bloom tier vs exact tier on the real corpus: every doc the exact
    op flags must be bloom-flagged (one-sided error), and false
    positives stay a small sliver (the re-check budget)."""
    from securities_data_pipeline_spark.operators.curation import (
        t_decontaminate,
        t_decontaminate_bloom,
    )

    SF = "/root/testdata/sf0.01"
    exact = {r.doc_id: r.contaminated for r in t_decontaminate(spark, SF).collect()}
    bloom = {
        r.doc_id: r.maybe_contaminated
        for r in t_decontaminate_bloom(spark, SF).collect()
    }
    assert set(exact) == set(bloom)
    fn = [d for d, c in exact.items() if c and not bloom[d]]
    assert fn == []  # a contaminated doc NEVER clears the bloom
    fp = sum(1 for d, c in exact.items() if not c and bloom[d])
    clean = sum(1 for c in exact.values() if not c)
    assert fp <= max(5, 0.02 * clean), (fp, clean)  # re-check budget is tiny


def test_bloom_probe_plan_zero_shuffle(spark):
    """The probe must be a single whole-stage-codegen projection: no
    exchange, no join, no Python eval."""
    from securities_data_pipeline_spark.operators.curation import (
        t_decontaminate_bloom,
    )

    df = t_decontaminate_bloom(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cluster_sample_quota_and_determinism(spark):
    from securities_data_pipeline_spark.operators.curation import (
        BALANCED_PER_CLUSTER,
        sim_cluster_sample,
        sim_kmeans_assign,
    )

    SF = "/root/testdata/sf0.001"
    a = {(r.vec_id, r.cluster, r.pick_rank) for r in sim_cluster_sample(spark, SF).collect()}
    b = {(r.vec_id, r.cluster, r.pick_rank) for r in sim_cluster_sample(spark, SF).collect()}
    assert a == b  # hash-priority selection is run-stable
    per = {}
    for _, c, _ in a:
        per[c] = per.get(c, 0) + 1
    sizes: dict[int, int] = {}
    for r in sim_kmeans_assign(spark, SF).collect():
        sizes[r.cluster] = sizes.get(r.cluster, 0) + 1
    # every cluster fills its quota exactly (or its whole population
    # when the cluster is smaller than the quota)
    assert set(per) == set(sizes)
    for c, n in per.items():
        assert n == min(BALANCED_PER_CLUSTER, sizes[c]), (c, n, sizes[c])


def test_sliding_chunker_overlap_and_tail(spark):
    """50% overlap: chunk j starts at j*stride; the tail chunk is kept
    short (no text dropped); a doc shorter than one window yields
    exactly one chunk covering it all."""
    from securities_data_pipeline_spark.operators.boilerplate import (
        SLIDE_STRIDE,
        SLIDE_W,
        t_chunk_sliding,
    )

    out = t_chunk_sliding(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        # contiguous indices from 0
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        # derive the doc's word count from the tail, then every
        # chunk's length must satisfy the window law exactly:
        # n_tokens(j) = min(W, n_words - j*stride), > 0
        n_words = (len(chunks) - 1) * SLIDE_STRIDE + chunks[-1].n_tokens
        for c in chunks:
            want = min(SLIDE_W, n_words - c.chunk_idx * SLIDE_STRIDE)
            assert c.n_tokens == want > 0, (doc, c, n_words)


def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    """A short document fully embedded in a much longer one scores
    containment 1.0 but a low Jaccard — the asymmetric-duplication
    case the containment tier exists for."""
    from securities_data_pipeline_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"word{i} item{i} thing{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short, "s"), (2, short + " " + filler, "s"), (3, filler, "s")],
        "doc_id long, text string, source string",
    )
    cont = {(r.doc_a, r.doc_b): r.containment for r in containment_pairs(docs).collect()}
    jac = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(docs).collect()}
    assert cont[(1, 2)] == 1.0          # short doc fully contained
    assert (1, 2) not in jac            # union-normalized score misses it
    assert (2, 3) in cont               # filler is most of doc 2 too


def test_repetition_filter_survives_one_token_and_empty_docs(spark):
    """F.sequence(1, 0) is DESCENDING [1, 0]: without the size>=2 guard
    a one-token (or empty) document crashed the whole query with
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT."""
    from securities_data_pipeline_spark.operators import curation

    docs = spark.createDataFrame(
        [(1, "hello", "en", "s", 5), (2, "a b a b a b", "en", "s", 11),
         (3, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = curation.table
    curation.table = lambda s, d, n: docs
    try:
        rows = {
            r.doc_id: (r.dup_word_frac, r.top_bigram_frac, r.repetitive)
            for r in curation.t_repetition_filter(spark, "x").collect()
        }
    finally:
        curation.table = orig
    assert rows[1] == (0.0, 0.0, False)   # one token: no bigrams, no dups
    assert rows[2][2] is True             # genuinely repetitive doc flags
    assert rows[3] == (0.0, 0.0, False)   # empty text: no crash, no flag


def test_source_cap_limits_and_is_deterministic(spark):
    from securities_data_pipeline_spark.operators.curation import (
        SOURCE_CAP,
        t_source_cap,
    )

    sf = "/root/testdata/sf0.01"
    out = t_source_cap(spark, sf).collect()
    per_source = {}
    for r in out:
        per_source.setdefault(r.source, []).append(r.doc_id)
        assert 1 <= r.slot <= SOURCE_CAP
    assert all(len(v) <= SOURCE_CAP for v in per_source.values())
    # hash priority is deterministic: a second run keeps the same docs
    again = {(r.source, r.doc_id) for r in t_source_cap(spark, sf).collect()}
    assert again == {(r.source, r.doc_id) for r in out}


def test_curation_funnel_counts_are_monotone(spark):
    from securities_data_pipeline_spark.operators.curation import t_curation_funnel

    rows = sorted(
        t_curation_funnel(spark, "/root/testdata/sf0.01").collect(),
        key=lambda r: r.stage,
    )
    assert [r.stage for r in rows] == [
        "1_language", "2_length", "3_quality", "4_repetition",
    ]
    # survivors only shrink, and each stage's input is the previous output
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_in == prev.n_out
        assert cur.n_out <= cur.n_in
    assert rows[0].n_in == 500  # full corpus enters
    assert rows[-1].n_out > 0  # and something survives


def test_fuzzy_decontamination_catches_what_exact_misses(spark, tmp_path):
    """The fuzzy tier's reason to exist: a benchmark copy edited every
    7th word contains NO verbatim 8-gram (exact decon is blind to it)
    but keeps ~4/7 of its 3-word shingles (Jaccard ≈ 0.42 ≥ τ)."""
    words = [f"w{i}" for i in range(24)]
    # positions every 7th word (no unedited 8-run survives), chosen so
    # the pair also collides on a MinHash band with the fixed md5
    # family — the collision is deterministic, not probabilistic
    edited = [f"x{i}" if i in (6, 13, 20) else w for i, w in enumerate(words)]
    rows = [
        (0, " ".join(words), "src0"),  # benchmark
        (1, " ".join(edited), "src1"),  # adversarial near-copy
        (2, " ".join(f"c{i}" for i in range(24)), "src1"),  # clean
    ]
    _docs(spark, rows).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from securities_data_pipeline_spark.operators.curation import (
        t_decontaminate,
        t_decontaminate_fuzzy,
    )

    exact = {r.doc_id: r for r in t_decontaminate(spark, str(tmp_path)).collect()}
    assert not exact[1].contaminated  # every 8-gram spans an edit
    fuzzy = {r.doc_id: r for r in t_decontaminate_fuzzy(spark, str(tmp_path)).collect()}
    assert set(fuzzy) == {1, 2}  # benchmark rows excluded
    # 3 edits kill 9 of 22 shingles: j = 13 / (22 + 22 - 13)
    assert fuzzy[1].contaminated and fuzzy[1].n_eval_near == 1
    assert fuzzy[1].max_jaccard == pytest.approx(13 / 31, abs=1e-6)
    assert not fuzzy[2].contaminated and fuzzy[2].max_jaccard == 0.0


def test_semdedup_keep_first_invariant(spark):
    """SemDeDup contract on the real test corpus: every cluster's
    lowest vec_id is kept (it can have no lower-id duplicate), pruned
    rows always have a kept lower-id member in their cluster, and the
    clustering agrees with sim_kmeans_assign."""
    from securities_data_pipeline_spark.operators.curation import (
        dedup_semdedup,
        sim_kmeans_assign,
    )

    sf = "/root/testdata/sf0.001"
    out = dedup_semdedup(spark, sf).collect()
    assert len(out) == 500
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, []).append(r)
    for rows in by_cluster.values():
        lowest = min(rows, key=lambda r: r.vec_id)
        assert not lowest.pruned
        kept = {r.vec_id for r in rows if not r.pruned}
        for r in rows:
            if r.pruned:
                assert any(k < r.vec_id for k in kept)
    assign = {r.vec_id: r.cluster for r in sim_kmeans_assign(spark, sf).collect()}
    assert all(assign[r.vec_id] == r.cluster for r in out)


def test_dsir_weights_sign_tracks_target_affinity(spark, tmp_path):
    """DSIR contract on a crafted corpus: a doc in the target split's
    vocabulary gets a positive importance weight, one in raw-only
    vocabulary a negative weight, and counts/rows cover every doc."""
    rows = [
        (0, "alpha beta alpha beta gamma", "src1"),   # the target split
        (1, "alpha beta gamma alpha beta", "src2"),   # target-like raw doc
        (2, "zeta eta theta zeta eta theta", "src3"), # raw-only vocab
    ]
    _docs(spark, rows).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from securities_data_pipeline_spark.operators.curation import t_dsir_weights

    out = {r.doc_id: r for r in t_dsir_weights(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1, 2}
    assert out[1].target_like and out[1].log_weight > 0
    assert not out[2].target_like and out[2].log_weight < 0
    assert out[0].log_weight > out[2].log_weight
    assert out[1].n_tokens == 5 and out[2].n_tokens == 6
