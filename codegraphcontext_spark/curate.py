"""End-to-end corpus curation: the training-data composition the individual
``dedup_*`` / ``text_*`` operators exist for, as one resumable batch job.

    documents --> exact dedup --> near-dup dedup (MinHash-LSH + CC)
              --> quality threshold --> repetition ceiling
              --> language allowlist --> source balancing (optional)
              --> PII redaction --> curated parquet

Each filter is a pure DataFrame transform; the only driver-side loop is the
connected-components labeling shared with the canonicalizer
(``pipeline/canon.py``). Stage semantics:

* **exact**: one survivor per distinct text md5 — the smallest doc_id wins
  (deterministic under any partitioning).
* **near-dup**: 3-gram token shingles (document frequency capped, the
  round-1 lesson: an uncapped common shingle is quadratic), banded-minhash
  LSH blocking, exact-Jaccard verification at >= ``jaccard``, then
  min-label connected components so A~B~C collapses to ONE survivor even
  when A,C never collide directly.
* **quality**: the integer-stable score of ``text_quality`` must reach
  ``min_quality``.
* **repetition**: the duplicate-trigram character fraction of
  ``text_repetition`` (Gopher repetition-removal rule) must stay at or
  below ``max_rep3`` per-mille — drops template/boilerplate-heavy pages
  that score fine on the length/alpha heuristics. Computed shuffle-free
  inside array HOFs (scan-speed at any corpus size).
* **lang**: optional allowlist.
* **balance** (optional): each source down-sampled toward the mean source
  size (temperature alpha->0 mixture composition) by the deterministic
  md5-nibble rule shared with the oracle-checked ``sample_mixture`` query.
* **pii**: emails/phones/IPv4s redacted IN PLACE with typed tags
  (``functions/pii.py``, C4-style) — a rewrite, not a filter; the stats
  record how many surviving docs were touched.

At 100 TB every stage is shuffle-bounded by design: the exact stage
shuffles 16-byte hashes, the LSH band join shuffles bare (key, band) keys
(never the per-doc shingle arrays) with bucket sizes hard-capped at
``BAND_BUCKET_CAP`` on top of the df cap, grams re-attach only to the
surviving candidate pairs, and components run on the pair set only
(pairs, not corpus, scale).

Reference analog: CodeGraphContext dedups by MERGE on unique keys
(graph_builder.py:69-75); this is that semantics upgraded to fuzzy content
identity, per the task's training-data addendum.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .pipeline.canon import connected_components

SHINGLE_DF_CAP = 20
N_MINHASH = 8
N_BANDS = 4  # r = 2
# Max docs per LSH band bucket admitted to the pair join: a hot bucket (a
# boilerplate template family shared by millions of pages at web scale) is
# EXCLUDED rather than exploded into C(n,2) pairs — the same cap discipline
# as dedup_cc_clusters (queries/driver_queries.py `_CC_BUCKET_CAP`).
BAND_BUCKET_CAP = 64

DEFAULT_JACCARD = 0.8
DEFAULT_MIN_QUALITY = 600
# Gopher-ish ceiling: drop docs with > 18% of characters inside duplicated
# word trigrams (Rae et al. 2021 use 0.18 for the dup-3gram fraction).
DEFAULT_MAX_REP3 = 180


def _doc_key(col):
    """Zero-padded doc_id so string min-label == numeric min doc_id."""
    return F.lpad(col.cast("string"), 12, "0")


def _shingles(docs: DataFrame) -> DataFrame:
    """(key, shingle) distinct word-3-gram shingles, df-capped. Shares the
    ONE let-bound shingling rule (`_shingle_array`): the tokenizer runs once
    per row, not once per shingle position (interpreted HOF lambdas
    re-evaluate outer subtrees per element — quadratic in doc length)."""
    from .queries.driver_queries import _shingle_array

    out = (
        docs.select(
            "key", F.explode(_shingle_array(F.split("text", " "))).alias("shingle")
        )
        .distinct()
    )
    w = out.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    # Drop the OVER-cap shingles via anti-join: that side is only the
    # boilerplate head (small at any corpus size, AQE will broadcast it),
    # whereas the keep-set is nearly every distinct shingle in the corpus —
    # broadcasting it would OOM the driver at 100 TB.
    over = w.where(F.col("_df") > SHINGLE_DF_CAP).select("shingle")
    return out.join(over, on="shingle", how="left_anti").select(
        "key", "shingle"
    )


def _near_dup_pairs(docs: DataFrame, jaccard: float) -> DataFrame:
    """(a, b) verified near-dup pairs, a < b, via banded minhash LSH.

    Scale shape: the band self-join carries ONLY (key, band) — the per-doc
    shingle arrays (≈ the document itself) never enter the 4-way band
    explode or the shuffle. Band buckets are size-capped (a hot template
    family can't emit C(n,2) pairs), and grams are re-attached to the
    surviving candidate pairs only, for the exact-Jaccard verification.
    """
    sh = _shingles(docs)
    # grams feeds the signatures AND both sides of the pair verification —
    # materialize it once.
    grams = (
        sh.groupBy("key")
        .agg(F.collect_set("shingle").alias("grams"))
        .localCheckpoint(eager=True)
    )
    r = N_MINHASH // N_BANDS
    sigs = grams.select(
        "key",
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.array_min(
                            F.transform(
                                "grams",
                                lambda g, s=k * r + j: F.md5(
                                    F.concat(F.lit(f"{s}:"), g)
                                ),
                            )
                        )
                        for j in range(r)
                    ],
                )
            ).alias(f"b{k}")
            for k in range(N_BANDS)
        ],
    )
    bands = sigs.select(
        "key",
        F.explode(
            F.array(*[
                F.concat(F.lit(f"{k}:"), F.col(f"b{k}"))
                for k in range(N_BANDS)
            ])
        ).alias("band"),
    )
    bsz = bands.groupBy("band").agg(F.count(F.lit(1)).alias("_n"))
    bok = (
        bands.join(bsz, on="band")
        .where(F.col("_n").between(2, BAND_BUCKET_CAP))
        .select("key", "band")
        .localCheckpoint(eager=True)
    )
    a, b = bok.alias("a"), bok.alias("b")
    pairs = (
        a.join(b, on="band")
        .where(F.col("a.key") < F.col("b.key"))
        .select(F.col("a.key").alias("a"), F.col("b.key").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    cand = pairs.join(
        grams.select(F.col("key").alias("a"), F.col("grams").alias("ga")),
        on="a",
    ).join(
        grams.select(F.col("key").alias("b"), F.col("grams").alias("gb")),
        on="b",
    )
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size("ga") + F.size("gb") - inter
    return cand.where(
        (union > 0) & (inter / union >= F.lit(jaccard))
    ).select("a", "b")


def curate_documents(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    jaccard: float = DEFAULT_JACCARD,
    min_quality: int = DEFAULT_MIN_QUALITY,
    max_rep3: int = DEFAULT_MAX_REP3,
    langs: list[str] | None = None,
    redact_pii: bool = True,
    balance_sources: bool = False,
) -> dict:
    """Run the full curation chain; write curated parquet + stats json.

    docs must carry (doc_id, text, lang). Returns the stats dict."""
    n_in = docs.count()

    # 1. exact dedup: min doc_id per content hash
    keyed = docs.withColumn("key", _doc_key(F.col("doc_id"))).withColumn(
        "_md5", F.md5("text")
    )
    winners = keyed.groupBy("_md5").agg(F.min("key").alias("key"))
    exact = keyed.join(winners, on=["_md5", "key"], how="left_semi").drop(
        "_md5"
    ).localCheckpoint(eager=True)
    n_exact = exact.count()

    # 2. near-dup dedup: survivors = component labels (min key per cluster)
    pairs = _near_dup_pairs(exact.select("key", "text"), jaccard)
    comp = connected_components(
        exact.select(F.col("key").alias("surface")),
        pairs.select(F.col("a").alias("a"), F.col("b").alias("b")),
    )
    survivors = comp.where(F.col("surface") == F.col("label")).select(
        F.col("surface").alias("key")
    )
    near = exact.join(survivors, on="key", how="left_semi").localCheckpoint(
        eager=True
    )
    n_near = near.count()

    # 3+4+5. quality / repetition / language, ONE annotation pass.
    # Stages 3-5 are pure per-doc predicates; computing them as separate
    # count()ed DataFrames replays the token explode+groupBy and the
    # trigram array_sort once PER STAGE COUNT (4-5 full recomputes — the
    # round-3 bench showed the chain at 27x its round-2 wall from exactly
    # this). Instead: annotate every near-dup survivor with both scores in
    # one job, checkpoint the annotated table, and read every stage count
    # out of ONE conditional aggregation. The sequential-filter accounting
    # is preserved exactly: repetition removals are counted among quality
    # passers, language removals among quality+repetition passers.
    toks = near.select(
        "key", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    from .queries.driver_queries import (
        STOPWORDS,
        _rep_spark_expr,
        _shingle_array,
    )

    m = toks.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("term").isin(STOPWORDS).cast("int")).alias("stops"),
        F.sum(F.col("term").rlike("^[A-Za-z]+$").cast("int")).alias("alpha"),
    )
    scored = m.select(
        "key",
        F.expr(
            "CAST(LEAST(n_tokens, 200) * 2 + alpha * 300 DIV n_tokens "
            "+ CASE WHEN stops * 100 DIV n_tokens BETWEEN 2 AND 40 "
            "THEN 300 ELSE 0 END AS BIGINT)"
        ).alias("quality_x1000"),
    )
    ann = (
        near.join(scored, on="key", how="left")
        .withColumn(
            "_s3", F.array_sort(_shingle_array(F.split("text", " ")))
        )
        .withColumn("_rep3", F.expr(_rep_spark_expr("_s3")))
        .drop("_s3")
        # a doc with no non-empty tokens has no quality row -> always fails,
        # REGARDLESS of min_quality (a numeric sentinel would leak token-less
        # docs through for any caller passing min_quality <= sentinel)
        .withColumn("_scored", F.col("quality_x1000").isNotNull())
        .withColumn("_q", F.coalesce(F.col("quality_x1000"), F.lit(0)))
        .drop("quality_x1000")
        .localCheckpoint(eager=True)
    )
    q_ok = F.col("_scored") & (F.col("_q") >= min_quality)
    r_ok = F.col("_rep3") <= max_rep3
    l_ok = F.col("lang").isin(langs) if langs else F.lit(True)
    counts = ann.agg(
        F.count(F.when(q_ok, 1)).alias("n_qual"),
        F.count(F.when(q_ok & r_ok, 1)).alias("n_rep"),
        F.count(F.when(q_ok & r_ok & l_ok, 1)).alias("n_lang"),
    ).collect()[0]
    n_qual, n_rep, n_lang = counts["n_qual"], counts["n_rep"], counts["n_lang"]
    kept = ann.where(q_ok & r_ok & l_ok).drop("_q", "_rep3", "_scored")

    # 6. source balancing (mixture composition, optional): down-sample each
    # source toward the mean source size with the SAME deterministic
    # md5-nibble rule as the oracle-checked sample_mixture query — keep-rate
    # = min(1, mean/n_s) in 1/4096 granularity, reproducible under any
    # partitioning. The rate table is |sources| rows (AQE broadcasts it);
    # the keep predicate fuses into the scan — no window, no driver state.
    if balance_sources:
        if "source" not in kept.columns:
            raise ValueError(
                "balance_sources=True needs a 'source' column on docs"
            )
        n = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
        s = n.agg(
            F.sum("n_docs").alias("tot"), F.count(F.lit(1)).alias("k")
        )
        rates = n.crossJoin(s).select(
            "source",
            F.expr("LEAST(4096, ((tot DIV k) * 4096) DIV n_docs)").alias(
                "_rate"
            ),
        )
        h3 = F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 3, 3), 16, 10) "
            "AS BIGINT)"
        )
        kept = (
            kept.join(rates, on="source")
            .where(h3 < F.col("_rate"))
            .drop("_rate")
        )
    n_out = kept.count()

    # 7. PII redaction (C4-style, in place — a rewrite, not a filter)
    n_pii = 0
    if redact_pii:
        from .functions.pii import pii_redact

        kept = kept.withColumn("_red", pii_redact(F.col("text")))
        kept = kept.localCheckpoint(eager=True)
        n_pii = kept.where(F.col("_red") != F.col("text")).count()
        kept = kept.drop("text").withColumnRenamed("_red", "text")

    kept.drop("key").write.mode("overwrite").parquet(
        os.path.join(out_dir, "curated.parquet")
    )
    stats = {
        "n_in": n_in,
        "removed_exact_dup": n_in - n_exact,
        "removed_near_dup": n_exact - n_near,
        "removed_low_quality": n_near - n_qual,
        "removed_repetition": n_qual - n_rep,
        "removed_lang": n_rep - n_lang,
        "removed_balance": n_lang - n_out,
        "pii_redacted_docs": n_pii,
        "n_out": n_out,
        "jaccard": jaccard,
        "min_quality": min_quality,
        "max_rep3": max_rep3,
        "langs": langs,
        "balance_sources": balance_sources,
    }
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats, f)
    return stats
