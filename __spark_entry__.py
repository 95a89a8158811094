"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query over /root/testdata/sf0.001.
queries()     -> one entry per implemented operator (SURVEY.md §2 analogs +
                 training-data-pipeline ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()  -> DuckDB twin per query (tables pre-registered as views).

Implementations live in codegraphcontext_spark/queries/driver_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from codegraphcontext_spark.queries.driver_queries import (  # noqa: E402
    ORACLE_SQL,
    SPARK_QUERIES,
    flagship,
)
import codegraphcontext_spark.queries.graph_queries  # noqa: E402,F401  (registers kg_graph_*)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: who-references ('spark') over sf0.001 documents."""
    return flagship(spark, "/root/testdata/sf0.001")


# The driver's correctness sweep covers a bounded window of ~50 entries in
# dict order. Round-4 rotation policy (BASELINE.md "sweep rotation"): FIRST
# the 11 names with no all-green driver row yet (8 never swept in r01–r03 +
# the 3 r03 hash-fails whose oracle SUM casts are fixed this round), then
# anything NEW this round, then backfill with the stalest names (last swept
# in CORRECTNESS_r02) — so every name converges to at least one all-green
# CORRECTNESS_r*.json row across rounds. The rotated-out tail all holds
# green rows in CORRECTNESS_r03.
_SWEEP_FIRST = (
    # new this session (round-4 continuation): never had a driver row
    "curate_uncertain_batch",
    "text_df_drift",
    "embed_kmeans_purity",
    "events_markov2_acc",
    "kg_graph_conductance",
    "kg_graph_random_robustness",
    "kg_graph_robustness",
    "kg_ner_context_export",
    "embed_hubness",
    "embed_intrinsic_dim",
    "kg_link_predict_eval",
    "dedup_minhash_calibration",
    "curate_source_profile",
    "text_lang_mixing",
    "curate_dup_quality_xtab",
    "orders_basket_rules",
    "events_markov_acc",
    "kg_graph_npmi",
    "events_survival",
    "text_heaps_law",
    "events_entropy_rate",
    "kg_graph_degree_gini",
    "kg_crosslingual_pairs",
    "events_seasonality",
    "kg_graph_powerlaw",
    "text_fertility",
    "kg_search_proximity",
    "events_cuped",
    "events_srm",
    "lineitem_discount_revenue",
    "part_brand_disjunctive_revenue",
    "nation_trade_volume",
    "events_cusum",
    "text_source_overlap",
    "kg_pred_cooccurrence",
    "events_markov_stationary",
    "mm_phash_dedup",
    "kg_rule_mining",
    "kg_path_rules",
    "events_attribution",
    "events_power_curve",
    "events_rfm",
    "events_interarrival",
    "curate_dedup_sweep",
    "er_pair_features",
    "embed_covariance",
    "embed_pca_power",
    # never-green: never swept r01-r03
    "embed_pq_rerank",
    "orders_priority_exists",
    "customer_order_dist",
    "part_supplier_counts",
    "returned_item_customers",
    "events_user_type_sets",
    "events_salted_enrich",
    "embed_ann_lsh_wide",
    # never-green: r03 hash-fails, oracle CAST fixed this round
    "kg_graph_top_entities",
    "kg_graph_page_richness",
    "kg_graph_pred_stats",
    # new this round
    "kg_doc_entity_salience",
    "events_stickiness",
    "kg_entity_hash_embed",
    "events_rate_ci",
    "mm_caption_pairs",
    "embed_ann_eval",
    "text_langid_eval",
    "events_bot_flag",
    "embed_binary_rerank",
    "embed_binary_hamming",
    "dedup_cluster_stats",
    "events_lag_features",
    "curate_budget_select",
    "events_forecast_eval",
    "search_fuzzy_eval",
    "events_abtest",
    "events_scd2",
    "embed_drift",
    "sample_temperature",
    "kg_graph_richclub",
    "text_zipf",
    "curate_calibration",
    "embed_quantize",
    "kg_search_fuzzy",
    "kg_incremental_pred_counts",
    "kg_graph_fuzzy_names",
    "kg_search_stem",
    "kg_incremental_delete_counts",
    "dedup_substr_spans",
    "embed_ivfpq",
    "dedup_substr_coverage",
    "kg_search_fuzzy_idx",
    "kg_graph_schema_summary",
    "kg_graph_triads",
    "kg_graph_closeness",
    "kg_graph_weighted_path",
    "events_heavy_hitters",
    "kg_graph_truss",
    "kg_triple_pr",
    "er_blocking_quality",
    "kg_graph_clustering",
    "kg_conjunctive_star",
    "kg_random_walks",
    "kg_entity_churn",
    "kg_graph_assortativity",
    "kg_entity_features",
    "kg_metapath_census",
    "curate_train_labels",
    "events_markov_transitions",
    "search_hybrid_rrf",
    "kg_domain_graph",
    "events_cms_topk",
    "events_quantile_sample",
    "kg_graph_modularity",
    "kg_graph_scc",
    "curate_clf_score",
    "kg_graph_edge_timeline",
    "kg_graph_lpa",
    "kg_graph_katz",
    "events_bloom_prune",
    "dedup_containment",
    "sample_dsir",
    # never-green overflow (window is ~50): queue for round 5's sweep
    "events_top_paths",
    "events_drift",
    "embed_outliers",
    "curate_rho",
    "text_diversity",
    "curate_canonical",
    "kg_edge_confidence",
    "kg_fact_conflicts",
    "kg_transitive_reduction",
    "kg_type_check",
    "embed_label_separation",
    "kg_qa_pairs",
    "kg_asof_facts",
    "kg_search_expanded",
    "curate_chunk",
    "kg_qa_2hop",
    "kg_graph_diff",
    "kg_linking_tier_accuracy",
    "kg_graph_bridges",
    "kg_alias_table",
    "kg_kge_train_pairs",
    "kg_pred_drift",
    "kg_verbalize",
    "kg_entity_lifespan",
    "kg_template_stats",
    "events_json_props",
    "kg_graph_eigenvector",
    "kg_gnn_export",
    # stalest (last driver row: CORRECTNESS_r02)
    "kg_term_stats",
    "kg_top_terms",
    "kg_mentions",
    "kg_cooccurrence",
    "kg_who_references",
    "kg_doc_references",
    "kg_most_referenced",
    "kg_dead_terms",
    "kg_search_content",
    "kg_rank_fusion",
    "kg_sources_of_term",
    "kg_usage_scope",
    "kg_term_adjacency",
    "kg_closure_from_spark",
    "dedup_exact_hash",
    "dedup_shingle_pairs",
    "dedup_minhash_sig",
    "dedup_lsh_buckets",
    "dedup_simhash",
    "embed_norms",
    "embed_topk_cosine",
    "text_stats",
    "text_langid",
    "text_fingerprint",
    "events_by_type",
    "events_top_users",
    "lineitem_pricing",
    "orders_topk_revenue",
    "events_asof_join",
    "events_range_join",
)


def _ordered(src: dict) -> dict:
    head = {n: src[n] for n in _SWEEP_FIRST if n in src}
    return head | {n: v for n, v in src.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(SPARK_QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLE_SQL))
