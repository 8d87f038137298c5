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
#   round 3 (this file): the 33 queries never sampled in rounds 1-2
#     (mm_*, sq_*, the t_* tail, w4/w5, j_asof/j_range_*, q11, q20,
#     agg_salted_sum) plus queries newly added this round.
# After round 3 the union of driver-verified queries covers the registry;
# later rounds re-front-load whatever is oldest-verified or newest-added.
_ROUND3_FRONT = (
    # never sampled by the driver in rounds 1-2
    "t_lang_id", "t_pack_sequences", "t_pii_scan", "t_quality",
    "t_quality_filter", "t_redact_terms", "t_repetition_filter",
    "t_sample_stratified", "t_span_corruption", "t_temperature_mix",
    "t_token_bpe", "t_token_budget", "t_token_stats", "t_train_split",
    "t_unigram_logprob", "t_vocab", "t_winnow_fingerprint",
    "agg_salted_sum", "j_asof_latest_order", "j_range_band", "j_range_bin",
    "mm_binary_meta", "mm_feature_extract", "mm_frame_sample", "mm_resize",
    "q11_important_parts", "q20_excess_suppliers", "sq_exists_discount",
    "sq_large_orders", "sq_rich_inactive_customers", "sq_small_qty_revenue",
    "w4_session_windows", "w5_lead_lag",
    # new in round 3
    "dedup_minhash_pairs_wide", "dedup_components_star",
    "s_stream_join_attrib_outer", "s_stream_join_attrib_full",
    "t_chunk_sliding", "q4_order_priority", "sim_range_search",
    "m_scd2_intervals", "j_asof_next_order", "sim_label_centroid_dist",
    "dedup_embedding_resolve", "t_fluency_buckets", "dedup_source_priority",
    "dedup_cluster_stats", "mm_payload_dedup", "p9_bernoulli_sample",
    "sec_sharpe", "t_doc_len_hist", "t_tfidf_doc_terms",
    # registered only where protobuf installs (no-op here)
    "s_stream_topk_transform_state",
)
_FRONT_RANK = {name: i for i, name in enumerate(_ROUND3_FRONT)}


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
    from securities_data_pipeline_spark.plans.analytics import ANALYTICS_QUERIES
    from securities_data_pipeline_spark.plans.maintenance import MAINTENANCE_QUERIES
    from securities_data_pipeline_spark.plans.relational import RELATIONAL_QUERIES
    from securities_data_pipeline_spark.plans.relational_ext import RELATIONAL_EXT_QUERIES
    from securities_data_pipeline_spark.plans.relational_tpch2 import TPCH2_QUERIES
    from securities_data_pipeline_spark.plans.relational_tpch3 import TPCH3_QUERIES
    from securities_data_pipeline_spark.plans.subqueries import SUBQUERY_QUERIES

    from securities_data_pipeline_spark.plans.securities_demo import SECURITIES_QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(RELATIONAL_QUERIES)
    out.update(ANALYTICS_QUERIES)
    out.update(MAINTENANCE_QUERIES)
    out.update(RELATIONAL_EXT_QUERIES)
    out.update(TPCH2_QUERIES)
    out.update(TPCH3_QUERIES)
    out.update(SUBQUERY_QUERIES)
    out.update(SECURITIES_QUERIES)
    try:
        from securities_data_pipeline_spark.operators import EXTENSION_QUERIES

        out.update(EXTENSION_QUERIES)
    except ImportError:
        pass
    try:
        from securities_data_pipeline_spark.streaming import STREAMING_QUERIES

        out.update(STREAMING_QUERIES)
    except ImportError:
        pass
    return _prioritized(out)


def oracle_sql() -> dict[str, str]:
    from securities_data_pipeline_spark.plans.analytics import ANALYTICS_ORACLES
    from securities_data_pipeline_spark.plans.maintenance import MAINTENANCE_ORACLES
    from securities_data_pipeline_spark.plans.relational import RELATIONAL_ORACLES
    from securities_data_pipeline_spark.plans.relational_ext import RELATIONAL_EXT_ORACLES
    from securities_data_pipeline_spark.plans.relational_tpch2 import TPCH2_ORACLES
    from securities_data_pipeline_spark.plans.relational_tpch3 import TPCH3_ORACLES
    from securities_data_pipeline_spark.plans.subqueries import SUBQUERY_ORACLES

    from securities_data_pipeline_spark.plans.securities_demo import SECURITIES_ORACLES

    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLES)
    out.update(ANALYTICS_ORACLES)
    out.update(MAINTENANCE_ORACLES)
    out.update(RELATIONAL_EXT_ORACLES)
    out.update(TPCH2_ORACLES)
    out.update(TPCH3_ORACLES)
    out.update(SUBQUERY_ORACLES)
    out.update(SECURITIES_ORACLES)
    try:
        from securities_data_pipeline_spark.operators import EXTENSION_ORACLES

        out.update(EXTENSION_ORACLES)
    except ImportError:
        pass
    try:
        from securities_data_pipeline_spark.streaming import STREAMING_ORACLES

        out.update(STREAMING_ORACLES)
    except ImportError:
        pass
    return _prioritized(out)
