"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()``
exposes every implemented operator from SURVEY.md §2 as
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the DuckDB
equivalent for the correctness gate. Registries live in the engine
package — this file only aggregates them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver checks queries in registry order and may only reach the first
# ~50 per round, so the registry rotates which family leads each round to
# guarantee every query is eventually driver-verified:
#   round 1: relational/TPC-H/window/agg families (natural order)
#   round 2: streaming, dedup, similarity, securities, grouped-UDF
#   round 3: the 33 queries never sampled in rounds 1-2 plus round-3 adds.
#   round 4: round-3 hash-fails + never-sampled + round-4 additions.
#   round 5 (this file — all 161 prior queries have been driver-green at
#     least once, so the policy becomes: CHANGED/NEW first, then
#     LEAST-RECENTLY-GREEN): the 5 new + 3 changed queries lead, then the
#     33 queries last driver-checked in round 1, then the 36 last checked
#     in round 2 — the ~50-query window covers new/changed + all r1-stale
#     + the head of r2-stale; round 6 fronts the remainder.
#   round 6: same policy (changed/new first, then least-recently-green).
#     After r5, last-driver-green rounds are: r5=50, r4=48, r3=38, r2=36,
#     r1=5. The front is: 6 new queries (TPC-H Q17/Q18/Q22, triangle
#     census, column profiler, exact percentiles) + the 8 queries touched
#     by this round's advisory fixes (MMR quantization, E-S weight guard,
#     star-contraction convergence probe) + the 5 r1-stale + the 36
#     r2-stale — 55 entries, so the driver's ~50-query window clears all
#     r1 staleness and most of r2; the rest + the r3 block front round 7.
_ROUND6_FRONT = (
    # new in round 6 (late additions first — never driver-sampled)
    "t_bm25_topk", "dedup_link_prediction", "j_salted_skew_join",
    "t_split_leakage_free", "t_quality_logreg", "sec_macd", "sec_bollinger",
    "sec_atr", "sec_stochastic",
    "dedup_banding_curve", "j_bloom_prefilter",
    # new in round 6
    "q17_small_qty_revenue", "q18_large_volume_customer",
    "q22_global_sales_opportunity", "dedup_triangle_stats",
    "t_profile_columns", "t_len_percentiles", "mm_near_dedup",
    "dedup_incremental", "s_stream_dedup_vs_corpus", "dedup_components_rcte",
    "f_variant_parse", "f_sql_udf_revenue", "f_pipe_syntax",
    "f_param_query",
    # changed in round 6, advisory fixes (tie-free MMR quantization;
    # zero-weight guard; star-contraction convergence probe +
    # soft-weights checkpoint — every star-contraction consumer
    # re-verifies)
    "sim_mmr_rerank", "t_sample_weighted", "dedup_soft_weights",
    "dedup_components_star", "dedup_components", "dedup_cluster_stats",
    "dedup_resolve", "dedup_pagerank",
    # changed in round 6, fuzz program (tools/fuzz_oracle.py /
    # fuzz_embeddings.py / fuzz_events.py): admission gates + guarded
    # oracles + NULL-shingle fix — every query whose plan or oracle
    # text changed re-verifies, highest-risk rewrites first
    "f_json_extract", "dedup_minhash_pairs", "dedup_minhash_signature",
    "dedup_minhash_estimate", "dedup_minhash_pairs_wide",
    "dedup_minhash_pairs_capped", "dedup_ngram_jaccard",
    "dedup_containment", "w1_ffill", "w4_session_windows", "w5_lead_lag",
    "w7_interval_range", "w8_pattern_match", "m_scd2_intervals",
    "g_user_trend", "g_user_trend_udf", "g_weighted_mean_udaf",
    "sec_vwap", "sec_ewma", "sec_sharpe", "sec_stg_ffill", "sec_drawdown",
    "sec_rsi", "sec_calendar_spine", "s_stream_daily_rollup",
    "s_stream_session_rollup", "s_stream_dedup_within_watermark",
    "s_stream_join_attrib", "sim_lsh_topk", "sim_quantize",
    "f_array_stats", "t_winnow_fingerprint", "dedup_semdedup",
    "sim_kmeans_assign",
    # same fuzz changes, lower rewrite risk (shared gate/oracle wrap
    # verified by the entries above) — covered when the window is wide
    "sec_weekly_bars", "sec_rolling_vol", "sec_rolling_beta",
    "sec_sma_crossover", "s_stream_sliding_rollup", "s_stream_dedup_keys",
    "s_stream_enrich_static", "s_stream_join_attrib_outer",
    "s_stream_join_attrib_full", "s_stream_weekly_from_daily",
    "s_stream_user_stats_stateful", "s_stream_topk_transform_state",
    "sim_bruteforce_topk", "sim_range_search", "sim_label_centroid_dist",
    "sim_ivf_topk", "sim_knn_graph", "sim_ivf_recall", "sim_lsh_recall",
    "sim_pq_recall", "sim_pq_topk", "sim_pq_rerank_topk",
    "sim_ivfpq_rerank_topk", "dedup_embedding_cosine",
    "dedup_embedding_resolve", "sim_cluster_sample", "dedup_simhash",
    "dedup_simhash_pairs", "dedup_ngram_jaccard_capped",
)

_FRONT_RANK = {name: i for i, name in enumerate(_ROUND6_FRONT)}


def _prioritized(entries: dict) -> dict:
    def rank(name: str) -> int:
        return _FRONT_RANK.get(name, len(_FRONT_RANK))

    return dict(
        sorted(entries.items(), key=lambda kv: (rank(kv[0]), kv[0]))
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-style pricing summary at sf0.001."""
    from securities_data_pipeline_spark.plans.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from securities_data_pipeline_spark.registry import all_queries

    return _prioritized(all_queries())


def oracle_sql() -> dict[str, str]:
    from securities_data_pipeline_spark.registry import all_oracles

    return _prioritized(all_oracles())
