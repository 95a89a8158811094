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
# dict order. Queries without a driver-recorded row yet (round 2's late
# additions — the graph-native layer — plus everything new this round) are
# surfaced FIRST so CORRECTNESS_r03 records them; the rotated-out tail all
# holds green rows in CORRECTNESS_r02.
_SWEEP_FIRST = (
    "text_winnow",
    "kg_graph_link_predict",
    "events_kmv_daily",
    "text_dedup_spans",
    "embed_kmeans",
    "embed_pq",
    "events_distinct_kmv",
    "supplier_nation_revenue",
    "part_type_revenue",
    "kg_graph_ppr",
    "kg_graph_reciprocity",
    "text_repetition",
    "text_lm_score",
    "text_pii_scrub",
    "events_anomaly",
    "dedup_semantic",
    "sample_mixture",
    "kg_graph_degree_dist",
    "kg_graph_kcore",
    "kg_graph_hits",
    "kg_graph_label_prop",
    "curate_pack_tokens",
    "events_retention",
    "text_keywords",
    "kg_graph_components",
    "kg_graph_edge_sentences",
    "kg_graph_lang_stats",
    "kg_graph_who_references",
    "kg_graph_top_entities",
    "kg_graph_cooccurrence",
    "kg_graph_dead_entities",
    "kg_graph_hierarchy",
    "kg_graph_top_domains",
    "kg_graph_entities_by_type",
    "kg_graph_closure",
    "kg_graph_ambiguous_names",
    "kg_graph_page_richness",
    "kg_graph_pred_stats",
    "kg_graph_call_chain",
    "kg_graph_pagerank",
    "kg_graph_overrides",
    "kg_graph_entity_complexity",
    "kg_graph_triangles",
    "kg_graph_similar_entities",
    "kg_search_tfidf",
    "dedup_cc_clusters",
    "curate_split",
    "text_contamination",
    "sample_stratified",
    "events_daily",
)


def _ordered(src: dict) -> dict:
    head = {n: src[n] for n in _SWEEP_FIRST if n in src}
    return head | {n: v for n, v in src.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(SPARK_QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLE_SQL))
