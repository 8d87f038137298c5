"""Tests for the round-5 curation additions: duplicated-substring
spans (Lee et al. 2022 style), Efraimidis–Spirakis weighted sampling,
and the hashed-n-gram linear quality classifier."""

import hashlib
import math

from pyspark.sql import functions as F

from securities_data_pipeline_spark.operators.sampling import (
    ES_SEED,
    _ES_U_BITS,
    weighted_sample_topk,
)
from securities_data_pipeline_spark.operators.substring import SUB_K, duplicated_spans
from securities_data_pipeline_spark.operators.textops import hashed_linear_score

from tests.conftest import rows


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_duplicated_spans_finds_planted_span_and_merges_runs(spark):
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens -> 2 dup 5-grams
    docs = _docs(
        spark,
        [
            f"unique one two three {shared} tail0",
            f"other prefix words here {shared} tail1",
            "совершенно unrelated text with no overlap at all",
        ],
    )
    got = rows(duplicated_spans(docs), "doc_id", "span_start")
    # doc 0: tokens 1-4 unique, shared at 5-10 -> one span [5, 10], 2 grams
    # doc 1: shared at 5-10 as well; doc 2: nothing
    assert got == [(0, 5, 10, 6, 2), (1, 5, 10, 6, 2)]


def test_duplicated_spans_requires_k_tokens(spark):
    # 4 shared tokens < SUB_K=5: below the detection threshold
    docs = _docs(spark, ["a b c d x1 y1 z1 w1 v1", "a b c d x2 y2 z2 w2 v2"])
    assert duplicated_spans(docs).count() == 0
    # exactly K shared tokens: one span of exactly K
    docs5 = _docs(spark, ["a b c d e x1 y1 z1 w1", "a b c d e x2 y2 z2 w2"])
    got = rows(duplicated_spans(docs5), "doc_id")
    assert got == [(0, 1, 5, 5, 1), (1, 1, 5, 5, 1)]


def test_duplicated_spans_two_separate_islands(spark):
    s1, s2 = "p q r s t", "k l m n o"
    docs = _docs(
        spark,
        [f"{s1} mid1a mid1b {s2}", f"{s1} two words here also {s2} trail"],
    )
    got = rows(duplicated_spans(docs), "doc_id", "span_start")
    assert [(r[0], r[3]) for r in got] == [(0, 5), (0, 5), (1, 5), (1, 5)]
    assert SUB_K == 5


def _es_key(doc_id: int, weight: int) -> float:
    h = int(hashlib.md5(f"{ES_SEED}:{doc_id}".encode()).hexdigest()[:15], 16)
    u = (h % (1 << _ES_U_BITS) + 1) / float(1 << _ES_U_BITS)
    return math.log(u) / weight


def test_weighted_sample_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, 10 + (i * 7) % 90) for i in range(200)], "doc_id long, w long"
    )
    got = rows(weighted_sample_topk(df, "doc_id", "w", k=10), "rank")
    expect = sorted(
        ((i, 10 + (i * 7) % 90) for i in range(200)),
        key=lambda t: (-_es_key(t[0], t[1]), t[0]),
    )[:10]
    assert [(r[1], r[2]) for r in got] == expect
    assert [r[0] for r in got] == list(range(1, 11))


def test_weighted_sample_boundary_margin_at_sf001(spark):
    """The one float in the E-S path is ln(u); engines may differ by
    1 ulp. The selection only flips if the k-th and (k+1)-th keys sit
    within that — assert the sf0.01 boundary gap is astronomically
    wider, so the oracle comparison is load-bearing, not lucky."""
    import duckdb

    tbl = duckdb.sql(
        "SELECT doc_id, n_chars FROM '/root/testdata/sf0.01/documents.parquet'"
    ).fetchall()
    keys = sorted((_es_key(d, w) for d, w in tbl), reverse=True)
    gap = keys[49] - keys[50]
    assert gap > abs(keys[49]) * 1e-9, f"boundary gap {gap} too tight for 1-ulp noise"


def test_weighted_sample_prefers_heavy_weights(spark):
    # one doc carries ~all the mass: it must be sampled (rank exists),
    # and P(top-1) ~ w/(w+eps) -> with w=10^9 vs 199 others at w=1 the
    # heavy doc winning top-1 is a 1-in-10^9-miss determinism check
    df = spark.createDataFrame(
        [(i, 1_000_000_000 if i == 7 else 1) for i in range(200)],
        "doc_id long, w long",
    )
    got = rows(weighted_sample_topk(df, "doc_id", "w", k=5), "rank")
    assert got[0][1] == 7


def test_hashed_linear_score_deterministic_and_bounded(spark):
    df = _docs(spark, ["the quick brown fox", "the quick brown fox", "single"])
    n, score = hashed_linear_score()
    got = rows(df.select("doc_id", n.alias("n"), score.alias("s")), "doc_id")
    # 4 tokens -> 4 unigrams + 3 bigrams
    assert got[0][1] == 7 and got[1][1] == 7
    assert got[0][2] == got[1][2]  # identical text, identical score
    assert got[2][1] == 1  # single token: no bigrams (sequence guard)
    for r in got:
        assert -1.0 <= r[2] <= 1.0
        assert round(r[2], 6) == r[2]  # exactly 6 dp


def test_bpe_train_matches_pure_python_trainer(spark):
    """t_bpe_train's merge table must equal a from-scratch Python BPE
    trainer over the same word-frequency table, applying the operator's
    documented semantics exactly: weighted position-exact pair counts,
    argmax by (count desc, pair asc), one non-overlapping left-to-right
    boundary-space replace per round."""
    import re
    from collections import Counter

    from securities_data_pipeline_spark.operators.textops import (
        N_BPE_MERGES,
        t_bpe_train,
        table,
        token_stream,
    )

    sf = "/root/testdata/sf0.001"
    freqs = Counter()
    for r in token_stream(table(spark, sf, "documents")).collect():
        if re.fullmatch(r"[a-z]+", r.token):
            freqs[r.token] += 1

    state = {w: " ".join(w) + " _" for w in freqs}
    expected = []
    for rank in range(1, N_BPE_MERGES + 1):
        counts = Counter()
        for w, rep in state.items():
            syms = rep.split(" ")
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += freqs[w]
        if not counts:
            break
        (s1, s2), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((rank, s1, s2, s1 + s2, cnt))
        pat, rep_ = f" {s1} {s2} ", f" {s1}{s2} "
        state = {
            w: (" " + r + " ").replace(pat, rep_).strip()
            for w, r in state.items()
        }

    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in t_bpe_train(spark, sf).collect()
    ]
    assert got == expected


def test_bpe_apply_matches_pure_python_encoder(spark):
    """t_bpe_apply's certificate metrics must equal a from-scratch
    Python recomputation: train the merges (the pinned trainer
    semantics), encode the word table under them, and recompute every
    token-budget metric — so the certificate fails if the encode pass
    or any metric drifts from the documented semantics. sf0.001 text
    is ASCII-only (verified), so ``re.ASCII`` matches the Java-regex
    defaults of the registered baseline."""
    import re
    from collections import Counter

    from securities_data_pipeline_spark.operators.textops import (
        BPE_PATTERN,
        N_BPE_MERGES,
        t_bpe_apply,
        table,
        token_stream,
    )

    sf = "/root/testdata/sf0.001"
    freqs = Counter()
    for r in token_stream(table(spark, sf, "documents")).collect():
        if re.fullmatch(r"[a-z]+", r.token):
            freqs[r.token] += 1

    state = {w: " ".join(w) + " _" for w in freqs}
    merges = []
    for _rank in range(1, N_BPE_MERGES + 1):
        counts = Counter()
        for w, rep in state.items():
            syms = rep.split(" ")
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += freqs[w]
        if not counts:
            break
        (s1, s2), _ = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append(s1 + s2)
        pat, rep_ = f" {s1} {s2} ", f" {s1}{s2} "
        state = {
            w: (" " + r + " ").replace(pat, rep_).strip()
            for w, r in state.items()
        }

    top1 = merges[0]
    occ = sum(freqs.values())
    tok_char = sum(freqs[w] * (len(w) + 1) for w in state)
    tok_tr = sum(freqs[w] * len(r.split(" ")) for w, r in state.items())
    tok_merged = sum(
        freqs[w] * sum(1 for s in r.split(" ") if len(s) > 1)
        for w, r in state.items()
    )
    top1_occ = sum(
        freqs[w] for w, r in state.items() if f" {top1} " in f" {r} "
    )
    texts = [
        r.text
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    ]
    n_docs = len(texts)
    tok_regex = sum(
        len(re.findall(BPE_PATTERN, t.lower(), re.ASCII))
        for t in texts
        if t is not None
    )

    expected = {
        "bpe_compression_ratio": round(tok_tr / tok_char, 6),
        "merged_token_share": round(tok_merged / tok_tr, 6),
        "n_distinct_words": float(len(state)),
        "n_docs": float(n_docs),
        "tokens_char_baseline": float(tok_char),
        "tokens_per_doc_regex": round(tok_regex / n_docs, 6),
        "tokens_per_doc_trained": round(tok_tr / n_docs, 6),
        "tokens_regex_baseline": float(tok_regex),
        "tokens_trained": float(tok_tr),
        "top1_merge_coverage": round(top1_occ / occ, 6),
        "word_occurrences": float(occ),
    }
    got = {r.metric: r.value for r in t_bpe_apply(spark, sf).collect()}
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-6, (k, got[k], v)
    # training must actually compress: fewer trained tokens than the
    # character baseline, and the top merge covers a nonzero share
    assert got["tokens_trained"] < got["tokens_char_baseline"]
    assert got["top1_merge_coverage"] > 0
    assert 0 < got["merged_token_share"] < 1


def test_bpe_apply_empty_alphabet_guards(spark, tmp_path):
    """A corpus with no ^[a-z]+$ words (digits/punct/NULL only) must
    degrade deterministically: zero word-side counts, NULL guarded
    ratios, and the regex baseline still counted — on BOTH the Spark
    side (empty 1-row crossJoin arm) and the oracle's (NULL scalar
    subquery arm); this pins the Spark half."""
    from securities_data_pipeline_spark.operators.textops import t_bpe_apply

    spark.createDataFrame(
        [(1, "123 456"), (2, "!!! ???"), (3, None)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.metric: r.value for r in t_bpe_apply(spark, str(tmp_path)).collect()}
    # regex baseline: '123','456' + 6 punct marks = 8 tokens; NULL text -> 0
    assert got["n_docs"] == 3.0
    assert got["tokens_regex_baseline"] == 8.0
    assert got["tokens_per_doc_regex"] == round(8 / 3, 6)
    # tokens_per_doc_trained divides by n_docs (3 > 0), so it reads an
    # exact 0.0 rather than NULL — only the word-side denominators
    # (tok_char, tok_tr, occ) are zero here and NULL-guard their ratios
    for k in ("n_distinct_words", "word_occurrences", "tokens_trained",
              "tokens_char_baseline", "tokens_per_doc_trained"):
        assert got[k] == 0.0, k
    for k in ("bpe_compression_ratio", "merged_token_share",
              "top1_merge_coverage"):
        assert got[k] is None, k


def test_pmi_cooccurrence_hand_math(spark, tmp_path):
    """PMI against hand arithmetic: tokens arranged so the attracted
    pair co-occurs more than independence predicts (pmi > 0) and the
    repelled pair less (pmi < 0), with exact ln values."""
    import math

    from securities_data_pipeline_spark.operators.textops import (
        t_pmi_cooccurrence,
    )

    docs = [
        (0, "aa xx yy f0"),
        (1, "aa xx yy f1"),
        (2, "aa bb xx yy f2"),
        (3, "aa bb xx f3"),
        (4, "aa bb f4"),
        (5, "bb f5"),
        (6, "bb f6"),
        (7, "f7"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r.token_a, r.token_b): (r.c_ab, r.pmi)
        for r in t_pmi_cooccurrence(spark, str(tmp_path)).collect()
    }
    n = len(docs)
    # xx: 4 docs, yy: 3 docs, co-occur 3 > independence 12/8 -> attracted
    assert out[("xx", "yy")] == (3, round(math.log(3 * n / (4 * 3)), 6))
    # bb: 5, xx: 4, co-occur 2 -> below PMI_MIN_COOC=3, absent
    assert ("bb", "xx") not in out
    # aa: 5, bb: 5, co-occur 3 < independence 25/8 -> repelled (pmi < 0)
    assert out[("aa", "bb")] == (3, round(math.log(3 * n / (5 * 5)), 6))
    assert out[("aa", "bb")][1] < 0 < out[("xx", "yy")][1]
