"""Physical-plan regression guards: the 100 TB properties that make the
flagship queries scale are structural (pushdown reached the scan, top-k
compiled to TakeOrderedAndProject, a narrow map stayed exchange-free) —
pin them so a future edit can't silently trade a broadcast for a
sort-merge or a top-k for a global sort. Plans are inspected at sf0.001;
plan SHAPE does not depend on the scale factor."""

import pytest

from codegraphcontext_spark.queries import graph_queries  # noqa: F401  (registers kg_graph_*)
from codegraphcontext_spark.queries.driver_queries import SPARK_QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = SPARK_QUERIES[name](spark, SF_DIR)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize(
    "name",
    ["orders_topk_revenue", "kg_top_terms", "embed_topk_cosine", "kg_search_tfidf"],
)
def test_topk_compiles_to_take_ordered(spark, name):
    # a LIMIT over ORDER BY must never plan as a global sort
    assert "TakeOrderedAndProject" in _plan(spark, name)


def test_orders_topk_pushdown_and_join_strategy(spark):
    df = SPARK_QUERIES["orders_topk_revenue"](spark, SF_DIR)
    # the customer side grows with SF — it must NOT be hint-forced
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the segment filter must reach the customer parquet scan
    assert "EqualTo(c_mktsegment,BUILDING)" in p, p
    # the date filter must reach the orders scan
    assert "LessThan(o_orderdate" in p, p
    # at this scale planner stats still pick broadcast on their own; the
    # fact table is never sort-merge shuffled
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_curate_split_is_exchange_free(spark):
    # split assignment is a narrow map: ZERO shuffles, ZERO broadcasts
    assert "Exchange" not in _plan(spark, "curate_split")


@pytest.mark.parametrize(
    "name",
    [
        "events_funnel",
        "kg_graph_triangles",
        "kg_graph_similar_entities",
        "kg_dead_terms",
    ],
)
def test_unbounded_sides_not_hint_forced(spark, name):
    """Per-user stage tables, degree tables, name dimensions, and a hub
    anchor's neighbor set are O(users)/O(|V|)/O(vocab) — unbounded at web
    scale — so they must NOT carry a forced broadcast hint (a hint OOMs at
    100 TB); at test scale AQE/stats must still pick broadcast joins on
    their own."""
    from codegraphcontext_spark.queries import graph_queries  # noqa: F401

    df = SPARK_QUERIES[name](spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, name
    df.collect()  # let AQE finalize the plan
    final = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in final, final
    assert "SortMergeJoin" not in final, final


def test_lineitem_pricing_partial_aggregates(spark):
    # map-side combine: partial + final HashAggregate pair around one shuffle
    p = _plan(spark, "lineitem_pricing")
    assert p.count("HashAggregate") >= 2, p


def test_text_repetition_is_exchange_free(spark):
    # the Gopher repetition filter computes duplicate-ngram fractions
    # entirely inside array HOFs — one row per doc at scan speed. The only
    # allowed Exchange is _fan_out's round-robin scan repartition (a
    # single-file-testdata artifact); a hashpartitioning Exchange means
    # someone reintroduced explode+groupBy
    p = _plan(spark, "text_repetition")
    assert "hashpartitioning" not in p, p


def test_events_anomaly_stats_join_not_forced(spark):
    # the per-type stats side is tiny; AQE should pick broadcast at this
    # scale, but nothing may FORCE it (the type cardinality is unbounded)
    p = _plan(spark, "events_anomaly")
    assert "SortMergeJoin" not in p


def test_embed_pq_topk_and_single_scan_pass(spark):
    # PQ encode + ADC must fuse into one projected pass over the vectors
    # with a TakeOrderedAndProject top-k — never a global sort, never a
    # join back to full-precision embeddings
    p = _plan(spark, "embed_pq")
    assert "TakeOrderedAndProject" in p, p
    assert "SortMergeJoin" not in p, p


def test_supplier_nation_revenue_pushdown_and_joins(spark):
    p = _plan(spark, "supplier_nation_revenue")
    # region + date predicates must reach their scans
    assert "EqualTo(r_name,ASIA)" in p, p
    assert "GreaterThanOrEqual(o_orderdate" in p, p
    # constant-bounded dims broadcast
    assert "BroadcastHashJoin" in p, p


def test_part_type_revenue_pushdown_no_forced_broadcast(spark):
    # the ship-date window must reach the lineitem scan; the part join is
    # hint-free (unbounded dim at 100 TB — AQE decides)
    df = SPARK_QUERIES["part_type_revenue"](spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "GreaterThanOrEqual(l_shipdate" in p, p


def test_kmv_sketch_partial_distinct(spark):
    # the distinct over (event_type, h) must partial-aggregate map-side
    # before the shuffle (the 'local K minima' scale story's first half)
    p = _plan(spark, "events_distinct_kmv")
    assert p.count("HashAggregate") >= 2, p


def test_shingle_array_is_let_bound(spark):
    """Interpreted HOF lambdas re-evaluate outer expression SUBTREES once
    per element — a lambda body that references split(text) directly makes
    shingling O(n^2) in document length (measured 2.7x on the winnow stage
    at sf0.1, and unbounded on real web docs). Pin the let-binding shape:
    the tokenizer output is bound via transform(array(...)) so every
    element access reads a lambda variable, never the split subtree."""
    from pyspark.sql import functions as F

    from codegraphcontext_spark.queries.driver_queries import _shingle_array

    df = (
        spark.range(1)
        .select(F.lit("a b c d").alias("text"))
        .select(_shingle_array(F.split("text", " ")).alias("sh"))
    )
    s = df._jdf.queryExecution().analyzed().toString()
    # the binding wrapper is present ...
    assert "transform(array(split(" in s, s
    # ... and the per-shingle accesses read the bound lambda variable
    assert "element_at(lambda" in s, s
    assert df.collect()[0]["sh"] == ["a b c", "b c d"]


def test_orders_priority_exists_semi_join_pushdown(spark):
    df = SPARK_QUERIES["orders_priority_exists"](spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # the lineitem probe side grows with SF — it must never be hint-forced
    assert "ResolvedHint" not in analyzed
    p = _plan(spark, "orders_priority_exists")
    # EXISTS must stay a semi join (one hit per order), never join+distinct
    assert "LeftSemi" in p, p
    # both predicates reach their scans
    assert "GreaterThanOrEqual(l_shipdate" in p, p
    assert "GreaterThanOrEqual(o_orderdate" in p, p
    assert "SortMergeJoin" not in p


def test_customer_order_dist_outer_join_pushdown(spark):
    p = _plan(spark, "customer_order_dist")
    # the priority filter is applied scan-side, not inside the outer join
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in p, p
    assert "SortMergeJoin" not in p


def test_part_supplier_counts_anti_join(spark):
    df = SPARK_QUERIES["part_supplier_counts"](spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # the flagged-supplier set is unbounded — exclusion must be a plain
    # anti join with no forced broadcast
    assert "ResolvedHint" not in analyzed
    p = _plan(spark, "part_supplier_counts")
    assert "LeftAnti" in p, p
    # brand/size predicates reach the part scan
    assert "Not(EqualTo(p_brand,Brand#1))" in p, p


def test_returned_item_customers_topk_pushdown(spark):
    p = _plan(spark, "returned_item_customers")
    # top-20 compiles to per-partition heaps, never a global sort
    assert "TakeOrderedAndProject" in p, p
    # returnflag and date window reach their scans
    assert "EqualTo(l_returnflag,R)" in p, p
    assert "GreaterThanOrEqual(o_orderdate" in p, p


def test_fuzzy_search_scoring_is_broadcast_narrow(spark):
    """fuzzy_rank's needle side must broadcast (never a shuffled join with
    the candidate table), and scoring adds no extra aggregate shuffle: the
    plan carries exactly the vocab groupBy exchange plus the per-needle
    window exchange over thresholded rows."""
    p = _plan(spark, "kg_search_fuzzy")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p
    assert "SortMergeJoin" not in p


def test_fuzzy_graph_names_never_explodes_tokens(spark):
    """kg_graph_fuzzy_names scores the dictionary-sized Entity dimension
    directly — no token explode (Generate) may appear in its plan."""
    p = _plan(spark, "kg_graph_fuzzy_names")
    assert "Generate" not in p, p
    assert "SortMergeJoin" not in p


def test_stem_search_dedups_in_row_before_explode(spark):
    """kg_search_stem's stem+dedup runs inside the array HOF before the
    explode, so the plan has ONE Generate and the needle join broadcasts."""
    import re

    p = _plan(spark, "kg_search_stem")
    # formatted plans list each node twice (tree + numbered detail); count
    # the numbered detail entries
    assert len(re.findall(r"^\(\d+\) Generate", p, re.M)) == 1, p
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p


def test_heavy_hitters_candidate_pass_shuffle_free(spark):
    """Pass 1 (the Misra-Gries candidate scan) must stay narrow: no
    Exchange may appear below the MapInPandas node — the whole point of
    the sketch is that the full stream is never shuffled by key. Pass 2's
    exact count joins the bounded candidate set via broadcast (semi), and
    only candidate rows reach the final aggregate's exchange."""
    p = _plan(spark, "events_heavy_hitters")
    # the MG scan sits directly on the parquet scan: in the plan tree,
    # everything below the MapInPandas node (deeper indentation) is just
    # the null filter and the scan — no Exchange in its subtree
    tree = p.split("\n\n")[0].splitlines()
    (mi,) = [i for i, ln in enumerate(tree) if "MapInPandas" in ln]
    depth = tree[mi].index("+-")
    below = []
    for ln in tree[mi + 1:]:
        if "+-" in ln and ln.index("+-") <= depth:
            break
        below.append(ln)
    assert below and all("Exchange" not in ln for ln in below), below
    assert any("Scan parquet" in ln for ln in below), below
    # candidate set joined broadcast, never sort-merge
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p and "LeftSemi" in p


def test_train_labels_balance_is_window_free(spark):
    """curate_train_labels class-balances via a broadcast two-scalar count
    + narrow hash filter. The trap it must never regress into is exact
    per-class row_number capping — a Window over corpus rows that
    serializes onto two partitions at 100 TB. Pin: no Window operator in
    the plan, and the scalar count side is broadcast, not sort-merged."""
    p = _plan(spark, "curate_train_labels")
    assert "Window" not in p, p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_cms_sketch_partial_agg_and_broadcast_probe(spark):
    """The CMS grid build must partial-aggregate map-side (each task emits
    <= D*W rows — the 'per-partition grid' scale story), the estimate join
    must probe the grid as a broadcast (192 rows, never a shuffle side),
    and the top-k must compile to TakeOrderedAndProject."""
    p = _plan(spark, "events_cms_topk")
    assert p.count("HashAggregate") >= 2, p
    assert "BroadcastHashJoin" in p, p
    assert "TakeOrderedAndProject" in p, p


def test_quantile_sample_windows_are_group_partitioned(spark):
    """Both quantile legs window PARTITION BY event_type — a global
    (unpartitioned) window would plan Exchange SinglePartition and
    serialize the whole table through one task."""
    p = _plan(spark, "events_quantile_sample")
    assert "SinglePartition" not in p, p
    assert "hashpartitioning(event_type" in p, p


def test_modularity_single_row_cross_join_is_broadcast(spark):
    """The m-count cross join must ride a broadcast nested loop (1-row
    side), never a CartesianProduct over data rows."""
    from codegraphcontext_spark.queries import graph_queries  # noqa: F401

    p = _plan(spark, "kg_graph_modularity")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" in p, p


def test_clf_score_weight_table_is_broadcast(spark):
    """Inference probes the <=256-row weight table as a broadcast (never
    a shuffle side) and no Window appears anywhere in the train+score
    plan — both legs are pure aggregates."""
    p = _plan(spark, "curate_clf_score")
    assert "BroadcastHashJoin" in p, p
    assert "Window" not in p, p


def test_bloom_probe_joins_are_broadcast(spark):
    """The fact scan probes the <=128-word Bloom table via broadcast
    joins — the 100 TB side is never shuffled for the membership check,
    and nothing degenerates into a cartesian product."""
    p = _plan(spark, "events_bloom_prune")
    assert p.count("BroadcastHashJoin") >= 2, p
    assert "CartesianProduct" not in p, p


def test_katz_and_timeline_topk_take_ordered(spark):
    """Both new graph top-ks compile to TakeOrderedAndProject, never a
    global sort."""
    from codegraphcontext_spark.queries import graph_queries  # noqa: F401

    assert "TakeOrderedAndProject" in _plan(spark, "kg_graph_katz")
    assert "TakeOrderedAndProject" in _plan(spark, "kg_graph_edge_timeline")


def test_dsir_score_table_is_broadcast(spark):
    """The 256-row bucket-score table must probe as a broadcast; the
    resampler has no Window anywhere — both legs are aggregates plus a
    narrow hash filter."""
    p = _plan(spark, "sample_dsir")
    assert "BroadcastHashJoin" in p, p
    assert "Window" not in p, p


def test_embed_outliers_topk_and_no_vector_shuffle(spark):
    p = _plan(spark, "embed_outliers")
    # the bottom-k compiles to TakeOrderedAndProject, never a global sort
    assert "TakeOrderedAndProject" in p, p
    # scoring is a narrow Arrow pass: the only exchanges in the plan are
    # the 64-row per-dimension rollup and the top-k singleton — no
    # hash/range exchange carries the embedding column
    for line in p.splitlines():
        if "Exchange" in line and "embedding" in line:
            raise AssertionError(f"vector rode a shuffle: {line}")


def test_curate_canonical_windows_share_one_exchange(spark):
    p = _plan(spark, "curate_canonical")
    # both windows (row_number pick + cluster-size count) key on
    # cluster_id; the second must REUSE the first's partitioning — exactly
    # one cluster_id hash exchange in the whole plan
    # (the cc subtree's corpus-scale pair/label joins may legitimately
    # sort-merge — only the window stage's exchange reuse is pinned here)
    n = p.count("hashpartitioning(cluster_id")
    assert n == 1, f"expected 1 cluster_id exchange, saw {n}:\n{p}"


def test_transitive_reduction_filter_pushdown(spark):
    p = _plan(spark, "kg_transitive_reduction")
    # the pred filter must reach the edge parquet scan on every branch
    assert "EqualTo(pred,LOCATED_IN)" in p, p
    assert "CartesianProduct" not in p


def test_fact_conflicts_no_cartesian_and_pred_pushdown(spark):
    p = _plan(spark, "kg_fact_conflicts")
    assert "CartesianProduct" not in p
    # the functional-pred filter prunes the provenance scan
    assert "In(pred" in p or "EqualTo(pred" in p, p


def test_text_diversity_single_doc_keyed_shuffle(spark):
    p = _plan(spark, "text_diversity")
    # tokenize+count+moments collapse to doc-keyed exchanges; the raw
    # text column itself never rides a hash exchange
    for line in p.splitlines():
        if "hashpartitioning" in line and "text#" in line:
            raise AssertionError(f"text rode a shuffle: {line}")


def test_pred_functionality_partial_agg_no_join(spark):
    from codegraphcontext_spark.queries import graph_queries  # noqa: F401

    p = _plan(spark, "kg_pred_functionality")
    # distinct + countDistinct expand to partial/final aggregate pairs
    assert p.count("HashAggregate") >= 2, p
    assert "Join" not in p, p
    assert "CartesianProduct" not in p


def test_entity_summary_window_partitioned_and_broadcast_names(spark):
    p = _plan(spark, "kg_entity_summary")
    # the top-3 window partitions per subject, never one global partition
    assert "hashpartitioning(subj" in p, p
    assert "BroadcastHashJoin" in p, p


def test_rdf_ntriples_broadcast_name_resolution(spark):
    p = _plan(spark, "kg_rdf_ntriples")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p


def test_shacl_and_qa_unanswerable_use_anti_join(spark):
    for name in ("kg_shacl_lite", "kg_qa_unanswerable"):
        p = _plan(spark, name)
        # the violation probe must plan as LeftAnti, never a NOT IN scan
        assert "LeftAnti" in p, (name, p)
        assert "CartesianProduct" not in p, name


def test_kge_hard_negatives_broadcast_pool_and_anti_filter(spark):
    p = _plan(spark, "kg_kge_hard_negatives")
    # the capped candidate pool rides a broadcast into the expansion join
    assert "BroadcastHashJoin" in p, p
    # the filtered setting is a LeftAnti against the positive set
    assert "LeftAnti" in p, p
    # the argmin window partitions per positive triple
    assert "hashpartitioning(subj_id" in p, p


def test_hopping_counts_partial_agg_no_join(spark):
    p = _plan(spark, "events_hopping_counts")
    assert p.count("HashAggregate") >= 2, p
    assert "Join" not in p, p


def test_text_complexity_text_never_shuffled(spark):
    p = _plan(spark, "text_complexity")
    for line in p.splitlines():
        if "hashpartitioning" in line and "text#" in line:
            raise AssertionError(f"text rode a shuffle: {line}")


def test_fact_sources_triple_keyed_agg_broadcast_names(spark):
    p = _plan(spark, "kg_fact_sources")
    assert "hashpartitioning(subj_id" in p, p
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p


def test_gnn_sample_fanout_window_per_source(spark):
    p = _plan(spark, "kg_gnn_neighbor_sample")
    # the fan-out rank partitions per source node (hub bound), and name
    # resolution is broadcast; the seed window alone may be single-
    # partition (dictionary-sized by construction)
    assert "hashpartitioning(src" in p, p
    assert "BroadcastHashJoin" in p, p


def test_pipeline_lineage_metadata_only_joins(spark):
    p = _plan(spark, "kg_pipeline_lineage")
    # 1-row x 1-row stage rows: every cross join is a broadcast nested
    # loop over single-row sides, never a data-scale CartesianProduct
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p, p


def test_entity_subgraph_broadcast_reach_probes(spark):
    p = _plan(spark, "kg_entity_subgraph")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p, p


def test_mrl_overlap_topk_take_ordered(spark):
    p = _plan(spark, "embed_mrl_overlap")
    # both ranking legs compile to top-k, never a global sort of scores
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p


def test_triple_pr_by_pred_partial_agg(spark):
    from codegraphcontext_spark.queries import graph_queries  # noqa: F401

    p = _plan(spark, "kg_triple_pr_by_pred")
    # the per-pred rollup partial-aggregates map-side after the full outer
    assert p.count("HashAggregate") >= 2, p
    assert "CartesianProduct" not in p


def test_hard_negatives_window_per_query_and_broadcast_weights(spark):
    p = _plan(spark, "search_hard_negatives")
    # the rank window partitions per query term, never one global sort
    assert "hashpartitioning(query" in p or "hashpartitioning(term" in p, p
    assert "BroadcastHashJoin" in p, p


def test_butterflies_wedge_doc_keyed_topk(spark):
    p = _plan(spark, "kg_graph_butterflies")
    # the wedge self-join shuffles on the bounded-degree DOC side, the pair
    # aggregate partial-aggregates map-side, and top-k never global-sorts
    assert "hashpartitioning(d#" in p, p
    assert p.count("HashAggregate") >= 2, p
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p


def test_brokerage_wedge_anti_join_topk(spark):
    p = _plan(spark, "kg_graph_brokerage")
    # the sigma and per-w rollups partial-aggregate and top-k never
    # global-sorts (the direct-edge anti-join sits upstream of the
    # checkpointed open-wedge frame, outside this plan)
    assert p.count("HashAggregate") >= 2, p
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p


def test_bowtie_classification_no_closure_no_cartesian(spark):
    p = _plan(spark, "kg_graph_bowtie")
    # round-5 rewrite: IN/OUT are precomputed frontier-BFS node SETS
    # (never closure pair rows); the final plan is label-join +
    # classification + a 4-group rollup. No Cartesian anywhere, and no
    # broadcast ASSERTION either — at web scale the reach sets are
    # dictionary-sized, so forcing them broadcast would be the bug (AQE
    # picks the strategy from runtime sizes).
    assert "CartesianProduct" not in p
    assert "HashAggregate" in p, p  # the cls rollup partial-aggregates


def test_novelty_two_groupbys_no_self_join(spark):
    p = _plan(spark, "text_novelty")
    # credit assignment is per-shingle MIN + two per-doc aggregates — the
    # plan must contain a shingle-keyed exchange but NO inverted-index
    # self-join (no doc-x-doc comparison anywhere)
    assert "hashpartitioning(shingle" in p, p
    assert p.count("HashAggregate") >= 4, p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p or "doc_id" in p


def test_anchor_texts_windows_partitioned_topk(spark):
    p = _plan(spark, "kg_anchor_texts")
    # the latest-snapshot window partitions per url, the dominant-anchor
    # window per domain — never a global sort; top-k compiles to top-k
    assert "hashpartitioning(url" in p, p
    assert "hashpartitioning(domain" in p, p
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p


def test_postings_per_term_window_topk(spark):
    p = _plan(spark, "search_postings")
    # the posting-head window ranks per term over its own posting list
    # (hub terms never force a global sort); final top-k is top-k
    assert "hashpartitioning(term" in p, p
    assert "TakeOrderedAndProject" in p, p
    assert p.count("HashAggregate") >= 2, p
    assert "CartesianProduct" not in p


def test_bpe_pair_count_partial_agg_no_text_reshuffle(spark):
    p = _plan(spark, "text_bpe_merges")
    # after the one corpus-sized word-type groupBy, every BPE round runs
    # over the checkpointed vocabulary table; the final 3-row frame must
    # never re-touch the documents scan
    assert "documents" not in p.lower() or "parquet" not in p.lower(), p


def test_scd2_shuffles_only_on_user(spark):
    """SCD2's two windows and the island groupBy must all reuse ONE
    user_id hash partitioning (hashpartitioning(user_id) satisfies the
    (user_id, version) aggregate and the LEAD window); the only other
    exchange is the final presentation-sort rangepartitioning over the
    already-collapsed interval table."""
    p = _plan(spark, "events_scd2")
    assert p.count("hashpartitioning(") == 1, p
    assert p.count("rangepartitioning(") <= 1, p


def test_embed_quantize_minmax_is_partial_agg(spark):
    """Per-dim min/max must map-side combine (partial_min/partial_max
    before the exchange) and the probe side must broadcast."""
    p = _plan(spark, "embed_quantize")
    assert "partial_min" in p and "partial_max" in p, p
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_richclub_sweep_joins_histograms_not_edges(spark):
    """The k-sweep must run as broadcast nested loops over the HISTOGRAM
    tables; the edge list is never cartesian-joined with the thresholds."""
    p = _plan(spark, "kg_graph_richclub")
    assert "BroadcastNestedLoopJoin" in p, p
    assert "CartesianProduct" not in p, p


def test_abtest_is_two_aggregates_no_join(spark):
    """A/B readout = groupBy(user) + one global rollup: no join anywhere,
    both aggregates map-side combine."""
    p = _plan(spark, "events_abtest")
    assert "Join" not in p, p
    assert "partial_max" in p or "partial_sum" in p, p


def test_binary_hamming_is_topk_over_broadcast_probe(spark):
    """The packed-word scan must end in TakeOrderedAndProject against a
    broadcast 1-row query side — no cartesian, no sort-merge."""
    p = _plan(spark, "embed_binary_hamming")
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p, p


def test_budget_select_never_globally_sorts_the_corpus(spark):
    """Threshold-from-histogram: the only doc-grain ordering is the
    boundary-bucket window (hash-partitioned by qual after a broadcast
    semi-restriction); thresholds reach docs via broadcast joins and the
    single rangepartitioning is the histogram-sized presentation sort."""
    p = _plan(spark, "curate_budget_select")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert p.count("rangepartitioning(") <= 1, p


def test_lag_features_shuffle_once_on_user(spark):
    """The whole lag/rolling family must reuse ONE user_id hash
    partitioning; the only other exchange is the presentation sort."""
    p = _plan(spark, "events_lag_features")
    assert p.count("hashpartitioning(") == 1, p
    assert p.count("rangepartitioning(") <= 1, p


def test_rule_mining_body_counts_ride_broadcast(spark):
    """Both rule legs self-join the checkpointed fact table on the entity
    pair; the P-row body-size table must join back by BROADCAST, and the
    final top-30 must compile to TakeOrderedAndProject, not a global sort."""
    p = _plan(spark, "kg_rule_mining")
    assert "BroadcastHashJoin" in p, p
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p, p


def test_path_rules_joins_broadcast_and_topk(spark):
    """The capped 2-hop body is materialized behind a checkpoint (the
    per-(z, pred) row_number caps run eagerly there; their SEMANTICS are
    pinned by the DuckDB twin, which applies the same caps); the visible
    tail must be broadcast joins of the body against the P-row size table
    and the fact table, ending in TakeOrderedAndProject — never a
    sort-merge or cartesian over the pair table."""
    p = _plan(spark, "kg_path_rules")
    assert "BroadcastHashJoin" in p, p
    assert "TakeOrderedAndProject" in p, p
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_attribution_no_join_single_user_exchange_for_windows(spark):
    """Both attribution windows ride the user_id partitioning and the
    credit rollup is one groupBy: no join operator of any kind, and at
    most two hash exchanges (window key + channel rollup)."""
    p = _plan(spark, "events_attribution")
    assert "Join" not in p, p
    assert p.count("hashpartitioning(") <= 2, p


def test_power_curve_ranks_reduced_user_table(spark):
    """The decile ranking must run over the groupBy(user) rollup (partial
    aggregation present), with the 1-row total joined by broadcast —
    never a sort-merge join."""
    p = _plan(spark, "events_power_curve")
    assert "partial_count" in p or "partial_sum" in p, p
    assert "BroadcastNestedLoopJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_rfm_anchor_is_broadcast_over_user_rollup(spark):
    """RFM scores rank the |users|-row rollup; the recency anchor is a
    1-row broadcast; no sort-merge join anywhere."""
    p = _plan(spark, "events_rfm")
    assert "partial_count" in p or "partial_sum" in p, p
    assert "BroadcastNestedLoopJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_interarrival_two_keyed_exchanges_only(spark):
    """Gap extraction shuffles once on (user, type), rank-select once on
    type; the presentation sort is the only range exchange."""
    p = _plan(spark, "events_interarrival")
    assert p.count("hashpartitioning(") == 2, p
    assert p.count("rangepartitioning(") <= 1, p
    assert "Join" not in p, p


def test_dedup_sweep_thresholds_join_reduced_doc_table(spark):
    """One pair computation serves all 5 thresholds: the sweep is a
    broadcast nested-loop against the per-doc MAX table — the corpus
    shingle scan must appear ONCE (one fan-out repartition), not once
    per threshold."""
    p = _plan(spark, "curate_dedup_sweep")
    assert "BroadcastNestedLoopJoin" in p, p
    assert p.count("Scan parquet") <= 3, p  # docs (shingles) + docs (count)


def test_er_pair_features_topk_no_forced_dim_broadcast(spark):
    """The documents metadata joins must not be hint-forced (corpus-sized
    dim) and the head-50 must compile to TakeOrderedAndProject."""
    df = SPARK_QUERIES["er_pair_features"](spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    p = _plan(spark, "er_pair_features")
    assert "TakeOrderedAndProject" in p, p


def test_embed_covariance_shuffles_gram_not_vectors(spark):
    """The mapInPandas stage must collapse each batch to its partial Gram
    before any exchange, and the merged O(dim^2) moment table is
    checkpointed so its four consumers read it instead of re-running the
    corpus pass: past the checkpoint the plan holds NO hash exchange,
    only broadcast glue joins and the presentation sort."""
    p = _plan(spark, "embed_covariance")
    assert p.count("hashpartitioning(") == 0, p
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert p.count("Scan ExistingRDD") >= 3, p  # consumers share the checkpoint


def test_phash_dedup_no_pair_join_topk(spark):
    """Bucketing by the 16-bit fingerprint is a groupBy, never a pair
    join; the candidate-group head is TakeOrderedAndProject."""
    p = _plan(spark, "mm_phash_dedup")
    assert "Join" not in p, p
    assert "TakeOrderedAndProject" in p, p


def test_pred_cooccurrence_broadcast_glue_topk(spark):
    """The pair join is subject-keyed over the checkpointed (subject,
    pred) projection; count glue joins broadcast; top-30 is
    TakeOrderedAndProject, no sort-merge."""
    p = _plan(spark, "kg_pred_cooccurrence")
    assert "BroadcastHashJoin" in p, p
    assert "TakeOrderedAndProject" in p, p
    assert "SortMergeJoin" not in p, p


def test_cusum_single_corpus_pass_grammar_windows(spark):
    """The only corpus-scale aggregate is the (type, day) count (partial
    aggregation present); the CUSUM + argmax windows run on the reduced
    days-x-types table."""
    p = _plan(spark, "events_cusum")
    assert "partial_count" in p, p
    assert "SortMergeJoin" not in p, p


def test_discount_revenue_all_predicates_reach_scan(spark):
    """Q6's value IS the pushdown: the date window, discount band, and
    quantity cap must all appear as pushed parquet filters, and the plan
    holds no join or shuffle beyond the 1-row global aggregate."""
    p = _plan(spark, "lineitem_discount_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in p, p
    assert "LessThan(l_shipdate" in p, p
    assert "GreaterThanOrEqual(l_discount" in p, p
    assert "LessThan(l_quantity" in p, p
    assert "Join" not in p, p


def test_disjunctive_revenue_or_residuals_prune_scans(spark):
    """Q19's disjunction: the extracted single-table residuals (the
    l_quantity hull on lineitem, the p_brand Or-set on part) must reach
    their scans; the join stays a partkey hash join, never nested-loop."""
    p = _plan(spark, "part_brand_disjunctive_revenue")
    # part scan: per-arm (brand AND size-cap) conjuncts survive as an OR
    assert "And(EqualTo(p_brand,Brand#12),LessThanOrEqual(p_size,15))" in p, p
    # lineitem scan: the quantity hull of the three arms is pushed
    assert "GreaterThanOrEqual(l_quantity,1.0)" in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_trade_volume_constant_dims_broadcast_date_pushed(spark):
    """Q7: the 25-row nation dims broadcast; the order-year window is
    pushed to the orders scan; top-25 is TakeOrderedAndProject."""
    p = _plan(spark, "nation_trade_volume")
    assert "GreaterThanOrEqual(o_orderdate" in p, p
    assert "BroadcastHashJoin" in p, p
    assert "TakeOrderedAndProject" in p, p


def test_fertility_is_scan_fused_single_rollup(spark):
    """Both token counts are array-length expressions on the scan: no
    explode (Generate), and the only exchange is the |langs|-row rollup
    plus the presentation sort."""
    p = _plan(spark, "text_fertility")
    assert "Generate" not in p, p
    assert p.count("hashpartitioning(") == 1, p


def test_proximity_no_explode_no_join_topk(spark):
    """Needle positions and the min pairwise distance are computed
    entirely inside array HOFs: no Generate, no Join; top-20 compiles to
    TakeOrderedAndProject."""
    p = _plan(spark, "kg_search_proximity")
    assert "Generate" not in p, p
    assert "Join" not in p, p
    assert "TakeOrderedAndProject" in p, p
