"""Behavioral pins for the round-4i wave (this session's operators):
properties the oracle equality can't see — monotonicity, bounds, and
cross-operator consistency."""

import pytest

from codegraphcontext_spark.queries import graph_queries  # noqa: F401
from codegraphcontext_spark.queries.driver_queries import SPARK_QUERIES

SF = "/root/testdata/sf0.001"


def test_rule_mining_confidence_bounds_and_body_consistency(spark):
    rows = SPARK_QUERIES["kg_rule_mining"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.conf_x1000 <= 1000
        assert r.n_support <= r.n_body
        assert r.direction in ("same", "inv")


def test_path_rules_support_bounded_by_body(spark):
    rows = SPARK_QUERIES["kg_path_rules"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 2 <= r.n_support <= r.n_body
        assert 0 <= r.conf_x1000 <= 1000


def test_attribution_credits_bounded_by_purchases(spark):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_purch = ev.where(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).count()
    rows = SPARK_QUERIES["events_attribution"](spark, SF).collect()
    assert sum(r.n_last_touch for r in rows) <= n_purch
    assert sum(r.n_first_touch for r in rows) <= n_purch
    assert all(r.channel != "purchase" for r in rows)


def test_power_curve_monotone_and_complete(spark):
    rows = SPARK_QUERIES["events_power_curve"](spark, SF).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    shares = [r.cum_share_ppm for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] == 1_000_000
    # heavy head: top decile holds more than 1/10 of events
    assert shares[0] > 100_000


def test_rfm_cells_partition_users(spark):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_users = (
        ev.where(F.col("user_id").isNotNull())
        .select("user_id").distinct().count()
    )
    rows = SPARK_QUERIES["events_rfm"](spark, SF).collect()
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5
        assert 1 <= r.m_score <= 5


def test_interarrival_percentiles_ordered(spark):
    rows = SPARK_QUERIES["events_interarrival"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.p50_s <= r.p90_s <= r.max_s


def test_dedup_sweep_monotone_in_threshold(spark):
    rows = SPARK_QUERIES["curate_dedup_sweep"](spark, SF).collect()
    kept = [r.n_kept for r in rows]
    assert kept == sorted(kept)  # higher threshold removes fewer docs
    for r in rows:
        assert r.n_kept + r.n_removed == rows[0].n_kept + rows[0].n_removed


def test_covariance_diagonal_nonnegative_and_pca_unit_scale(spark):
    cov = SPARK_QUERIES["embed_covariance"](spark, SF).collect()
    diag = {r.i: r.cov_x1e6 for r in cov if r.i == r.j}
    assert len(diag) == 64
    assert all(v >= 0 for v in diag.values())
    pc = SPARK_QUERIES["embed_pca_power"](spark, SF).collect()
    comps = [r.v_x1000 for r in pc]
    assert len(comps) == 64
    assert max(abs(c) for c in comps) == 1000  # max-abs normalized


def test_markov_stationary_sums_to_one(spark):
    rows = SPARK_QUERIES["events_markov_stationary"](spark, SF).collect()
    tot = sum(r.pi_x1e6 for r in rows)
    assert 1_000_000 - len(rows) <= tot <= 1_000_000  # truncation slack
    assert all(r.pi_x1e6 > 0 for r in rows)


def test_cusum_peak_within_observed_days(spark):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF}/events.parquet")
    days = ev.agg(
        F.expr(
            "MIN(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000)"
        ).alias("lo"),
        F.expr(
            "MAX(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000)"
        ).alias("hi"),
    ).collect()[0]
    for r in SPARK_QUERIES["events_cusum"](spark, SF).collect():
        assert days.lo <= r.cp_day <= days.hi
        assert r.s_abs_max >= 0


def test_cuped_reduces_or_keeps_arm_gap_sane(spark):
    row = SPARK_QUERIES["events_cuped"](spark, SF).collect()[0]
    assert row.n_a + row.n_b > 0
    # adjusted means stay in the metric's neighborhood (no runaway theta)
    for raw, adj in (
        (row.mean_y_a_x1e6, row.adj_y_a_x1e6),
        (row.mean_y_b_x1e6, row.adj_y_b_x1e6),
    ):
        assert abs(adj - raw) <= max(abs(raw), 1_000_000)


def test_srm_parity_split_is_balanced_here(spark):
    row = SPARK_QUERIES["events_srm"](spark, SF).collect()[0]
    assert row.n_a + row.n_b > 0
    assert row.srm_flag in (0, 1)
    # the synthetic corpus assigns users uniformly; parity must not SRM
    assert row.srm_flag == 0


def test_phash_dedup_groups_have_at_least_two(spark):
    rows = SPARK_QUERIES["mm_phash_dedup"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_docs >= 2
        assert 0 <= r.phash < (1 << 16)


def test_source_overlap_symmetric_range(spark):
    rows = SPARK_QUERIES["text_source_overlap"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.src_a < r.src_b
        assert 0 <= r.jaccard_x1e6 <= 1_000_000


def test_proximity_distances_ordered_and_within_window(spark):
    rows = SPARK_QUERIES["kg_search_proximity"](spark, SF).collect()
    assert rows
    dists = [r.min_dist for r in rows]
    assert dists == sorted(dists)
    assert all(1 <= d <= 10 for d in dists)


def test_fertility_at_least_one_token_per_word(spark):
    rows = SPARK_QUERIES["text_fertility"](spark, SF).collect()
    assert {r.lang for r in rows} == {"en", "de", "fr", "es", "zh"}
    for r in rows:
        # the BPE-ish rule splits punctuation off, so tokens >= words
        assert r.fertility_x1000 >= 1000


def test_seasonality_chi2_nonnegative_flags_binary(spark):
    rows = SPARK_QUERIES["events_seasonality"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.chi2_x1e6 >= 0
        assert r.seasonal_flag in (0, 1)


def test_powerlaw_alpha_in_heavy_tail_band(spark):
    rows = SPARK_QUERIES["kg_graph_powerlaw"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.xmin == 4 and r.n_tail > 0
    # any connected real-world-ish graph lands in a sane exponent band
    assert 1_000 <= r.alpha_x1000 <= 10_000


def test_crosslingual_pairs_are_truly_crosslingual(spark):
    rows = SPARK_QUERIES["kg_crosslingual_pairs"](spark, SF).collect()
    for r in rows:
        assert r.lang_a != r.lang_b
        assert r.n_shared >= 2
        assert r.jaccard_x1e6 >= 500_000


def test_heaps_growth_monotone_and_beta_sane(spark):
    rows = SPARK_QUERIES["text_heaps_law"](spark, SF).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    toks = [r.n_tokens for r in rows]
    vocab = [r.vocab for r in rows]
    assert toks == sorted(toks) and vocab == sorted(vocab)
    # the synthetic corpus draws from a FIXED vocab that saturates in
    # the first decile, so beta ~ 0 here; natural text gives 0.4-0.6
    assert 0 <= rows[0].beta_x1000 <= 1000  # sublinear growth

def test_entropy_rate_bounded_by_log_states(spark):
    import math
    r = SPARK_QUERIES["events_entropy_rate"](spark, SF).collect()[0]
    assert 0 <= r.entropy_rate_x1e6 <= int(math.log(r.n_states) * 1e6) + 1

def test_degree_gini_in_unit_interval(spark):
    r = SPARK_QUERIES["kg_graph_degree_gini"](spark, SF).collect()[0]
    assert 0 <= r.gini_x1e6 < 1_000_000
    assert r.n_nodes > 0 and r.sum_deg >= r.n_nodes


def test_npmi_bounded_and_floor_respected(spark):
    rows = SPARK_QUERIES["kg_graph_npmi"](spark, SF).collect()
    assert rows
    for r in rows:
        assert -1_000_000 <= r.npmi_x1e6 <= 1_000_000
        assert r.n_pages >= 3

def test_survival_monotone_nonincreasing(spark):
    rows = SPARK_QUERIES["events_survival"](spark, SF).collect()
    ppm = [r.survival_ppm for r in rows]
    assert ppm == sorted(ppm, reverse=True)
    assert all(0 <= p <= 1_000_000 for p in ppm)


def test_basket_rules_counts_consistent(spark):
    rows = SPARK_QUERIES["orders_basket_rules"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_orders >= 3
        assert 0 < r.conf_a_to_b_x1000 <= 1000
        assert 0 < r.conf_b_to_a_x1000 <= 1000

def test_markov_acc_beats_uniform_floor(spark):
    r = SPARK_QUERIES["events_markov_acc"](spark, SF).collect()[0]
    assert r.n_correct <= r.n_transitions
    # majority-class accuracy can never be below 1/|states| (5 types)
    assert r.accuracy_ppm >= 1_000_000 // 5 - 1


def test_lang_mixing_counts_partition(spark):
    r = SPARK_QUERIES["text_lang_mixing"](spark, SF).collect()[0]
    assert 0 <= r.n_mixed <= r.n_docs
    assert 0 <= r.n_unknown <= r.n_docs
    assert 0 <= r.mixed_ppm <= 1_000_000

def test_dup_quality_xtab_partitions_corpus(spark):
    rows = SPARK_QUERIES["curate_dup_quality_xtab"](spark, SF).collect()
    n_docs = (
        spark.read.parquet(f"{SF}/documents.parquet").count()
    )
    assert sum(r.n_docs for r in rows) == n_docs
    assert {(r.is_dup, r.hi_quality) for r in rows} <= {
        (0, 0), (0, 1), (1, 0), (1, 1)
    }


def test_minhash_calibration_monotone_mean_truth(spark):
    rows = SPARK_QUERIES["dedup_minhash_calibration"](spark, SF).collect()
    assert rows
    means = [r.mean_j_x1e6 for r in sorted(rows, key=lambda r: r.n_match)]
    # more agreeing hashes -> higher mean true Jaccard (the estimator works)
    assert means == sorted(means)
    for r in rows:
        assert 0 <= r.n_match <= 4

def test_source_profile_covers_all_sources(spark):
    rows = SPARK_QUERIES["curate_source_profile"](spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.dup_ppm <= 1_000_000
        assert r.mean_quality_x1e6 > 0


def test_link_predict_eval_rates_consistent(spark):
    r = SPARK_QUERIES["kg_link_predict_eval"](
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    assert r.n_hits <= min(r.n_holdout, r.k)
    assert 0 <= r.recall_ppm <= 1_000_000
    assert 0 <= r.precision_ppm <= 1_000_000
    assert r.n_holdout > 0


def test_intrinsic_dim_within_ambient(spark):
    r = SPARK_QUERIES["embed_intrinsic_dim"](spark, SF).collect()[0]
    assert r.n_points > 0
    # near-random 64-d embeddings: ID positive, bounded by ~ambient*2
    assert 0 < r.id_x1000 <= 128_000


def test_hubness_counts_bounded_by_population(spark):
    rows = SPARK_QUERIES["embed_hubness"](spark, SF).collect()
    assert rows
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    for r in rows:
        assert 1 <= r.n_rev <= n - 1
    counts = [r.n_rev for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_robustness_fragmentation_monotone(spark):
    rows = SPARK_QUERIES["kg_graph_robustness"](spark, SF).collect()
    assert [r.k_removed for r in rows] == [0, 1, 2, 4, 8]
    shares = [r.largest_share_ppm for r in rows]
    # removing hubs never GROWS the giant component's share... unless a
    # small component's hub removal shrinks n_nodes faster; allow slack
    assert shares[0] >= shares[-1]
    for r in rows:
        assert 0 < r.largest_share_ppm <= 1_000_000
        assert r.n_components >= 1

def test_ner_context_windows_bounded(spark):
    rows = SPARK_QUERIES["kg_ner_context_export"](spark, SF).collect()
    assert rows
    for r in rows:
        assert len(r.left_ctx.split()) <= 2 if r.left_ctx else True
        assert len(r.right_ctx.split()) <= 2 if r.right_ctx else True
        assert r.pos >= 1


def test_random_robustness_gentler_than_targeted(spark):
    targ = {
        r.k_removed: r.largest_share_ppm
        for r in SPARK_QUERIES["kg_graph_robustness"](spark, SF).collect()
    }
    rand = {
        r.k_removed: r.largest_share_ppm
        for r in SPARK_QUERIES["kg_graph_random_robustness"](
            spark, SF
        ).collect()
    }
    assert set(targ) == set(rand) == {0, 1, 2, 4, 8}
    # at the deepest removal, random failure must not fragment MORE than
    # the targeted attack (the scale-free asymmetry, allowing equality)
    assert rand[8] >= targ[8]


def test_conductance_in_unit_interval_and_consistent(spark):
    rows = SPARK_QUERIES["kg_graph_conductance"](spark, SF).collect()
    for r in rows:
        assert 0 <= r.conductance_ppm <= 1_000_000
        assert r.n_cut <= r.volume
        assert r.n_members >= 2


def test_kmeans_purity_partitions_population(spark):
    rows = SPARK_QUERIES["embed_kmeans_purity"](spark, SF).collect()
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r.n_vecs for r in rows) == n
    for r in rows:
        assert 0 < r.n_top <= r.n_vecs
        assert 0 < r.purity_ppm <= 1_000_000

def test_markov2_acc_consistent_with_order1(spark):
    r = SPARK_QUERIES["events_markov2_acc"](spark, SF).collect()[0]
    assert r.lift_ppm == r.acc2_ppm - r.acc1_ppm
    assert 0 <= r.acc1_ppm <= 1_000_000
    assert 0 <= r.acc2_ppm <= 1_000_000


def test_df_drift_floor_and_rates(spark):
    rows = SPARK_QUERIES["text_df_drift"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.df_a + r.df_b >= 10
        assert -1_000_000 <= r.drift_ppm <= 1_000_000


def test_uncertain_batch_margins_sorted_from_zero(spark):
    rows = SPARK_QUERIES["curate_uncertain_batch"](spark, SF).collect()
    assert len(rows) == 20
    margins = [r.margin for r in rows]
    assert margins == sorted(margins)
    assert margins[0] == 0  # the median doc itself is in the batch
