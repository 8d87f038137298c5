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
    # new in round 6
    "q17_small_qty_revenue", "q18_large_volume_customer",
    "q22_global_sales_opportunity", "dedup_triangle_stats",
    "t_profile_columns", "t_len_percentiles", "mm_near_dedup",
    "dedup_incremental", "s_stream_dedup_vs_corpus", "dedup_components_rcte",
    "f_variant_parse", "f_sql_udf_revenue",
    # changed in round 6 (tie-free MMR quantization; zero-weight guard;
    # star-contraction convergence probe + soft-weights checkpoint —
    # every star-contraction consumer re-verifies)
    "sim_mmr_rerank", "t_sample_weighted", "dedup_soft_weights",
    "dedup_components_star", "dedup_components", "dedup_cluster_stats",
    "dedup_resolve", "dedup_pagerank",
    # last driver-green in round 1 (5)
    "w1_ffill", "w2_moving_avg", "w3_topn_per_group", "w6_rank_surface",
    "w7_interval_range",
    # last driver-green in round 2 (36)
    "g_cohort_retention", "g_funnel_conversion", "g_user_trend",
    "g_user_trend_udf", "g_weighted_mean_udaf", "s_stream_daily_rollup",
    "s_stream_dedup_keys", "s_stream_dedup_within_watermark",
    "s_stream_enrich_static", "s_stream_session_rollup",
    "s_stream_sliding_rollup", "s_stream_user_stats_stateful",
    "sec_calendar_spine", "sec_drawdown", "sec_rolling_beta",
    "sec_rolling_vol", "sec_rsi", "sec_sma_crossover", "sec_stg_ffill",
    "sec_weekly_bars", "sim_bruteforce_topk", "sim_cluster_sample",
    "sim_ivf_topk", "sim_kmeans_assign", "sim_knn_graph", "sim_lsh_topk",
    "sim_quantize", "t_assemble_manifest", "t_bigram_logprob",
    "t_chunk_dedup", "t_decontaminate", "t_fingerprint", "t_global_shuffle",
    "t_heavy_hitters", "t_idf_top_terms", "udtf_token_positions",
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
