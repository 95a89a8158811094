"""Corpus curation chain: exact dedup, LSH near-dup (transitive), quality
threshold, language allowlist — stage accounting and determinism."""

from __future__ import annotations

import json
import os

import pytest

from codegraphcontext_spark.curate import curate_documents

# A deliberately structured corpus:
#  0/1: exact duplicates (survivor = 0)
#  2/3/4: near-dup chain (2~3 and 3~4 highly similar; 2~4 only via 3) —
#         component collapse must keep ONLY doc 2
#  5: unique good document
#  6: junk (no letters, no stopword band) -> low quality
#  7: good but German -> removed by lang allowlist
_BASE_A = (
    "the quick brown fox jumps over a lazy dog while the patient crow "
    "watches from a tall oak tree near the river bank and the wind "
    "carries a faint smell of rain across the quiet valley floor "
)
_BASE_B = (
    "a narrow path winds up the granite ridge where the climbers rest "
    "beside a cold spring and the morning light spills across the "
    "meadow while a distant bell rings from the village below "
)


def _docs(spark):
    rows = [
        (0, _BASE_A + "alpha ending one", "en"),
        (1, _BASE_A + "alpha ending one", "en"),
        (2, _BASE_B + "beta ending two three four five", "en"),
        (3, _BASE_B + "beta ending two three four nine", "en"),
        (4, _BASE_B + "beta ending two three eight nine", "en"),
        (5, "the crows assemble at dusk and a thousand wings darken "
            "the sky over the harbor while the fishermen haul a heavy "
            "catch onto the pier and the lamps begin to glow", "en"),
        (6, "0 1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6 7 8 9", "en"),
        (7, _BASE_A.replace("the", "der") + "gamma ende", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def curated(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curated"))
    stats = curate_documents(
        spark, _docs(spark), out, jaccard=0.5, min_quality=400, langs=["en"]
    )
    return out, stats


def test_stage_accounting(spark, curated):
    out, stats = curated
    assert stats["n_in"] == 8
    assert stats["removed_exact_dup"] == 1     # doc 1
    assert stats["removed_near_dup"] == 2      # docs 3, 4 (via chain)
    assert stats["removed_low_quality"] == 1   # doc 6
    assert stats["removed_lang"] == 1          # doc 7
    assert stats["n_out"] == 3
    # stats.json written and identical
    with open(os.path.join(out, "stats.json")) as f:
        assert json.load(f) == stats


def test_survivors_are_min_ids(spark, curated):
    out, _ = curated
    kept = spark.read.parquet(os.path.join(out, "curated.parquet"))
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == [0, 2, 5]
    # no exact dups remain
    assert kept.count() == kept.select("text").distinct().count()


def test_curate_deterministic(spark, tmp_path):
    a = curate_documents(
        spark, _docs(spark), str(tmp_path / "a"),
        jaccard=0.5, min_quality=400, langs=["en"],
    )
    b = curate_documents(
        spark, _docs(spark), str(tmp_path / "b"),
        jaccard=0.5, min_quality=400, langs=["en"],
    )
    assert a == b
    ka = sorted(
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "a" / "curated.parquet"))
        .select("doc_id").collect()
    )
    kb = sorted(
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "b" / "curated.parquet"))
        .select("doc_id").collect()
    )
    assert ka == kb


def test_band_bucket_cap_bounds_pair_count(spark, monkeypatch):
    """A hot LSH band bucket (a template family larger than BAND_BUCKET_CAP)
    must be EXCLUDED from the pair join, not exploded into C(n,2) pairs —
    the web-scale guard in the style of test_canon's banding-selectivity
    test. A same-shape family under the cap still yields all its pairs.

    The df cap is lifted for this test so the bucket cap (the second-line
    defense: it also catches minhash collisions and df-cap config drift)
    is what's actually exercised."""
    from codegraphcontext_spark import curate
    from codegraphcontext_spark.curate import _doc_key, _near_dup_pairs
    from pyspark.sql import functions as F

    monkeypatch.setattr(curate, "SHINGLE_DF_CAP", 10**9)
    base = _BASE_A + _BASE_B

    def fam(n, tag):
        rows = [(i, f"{tag} {base}", "en") for i in range(n)]
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        ).withColumn("key", _doc_key(F.col("doc_id")))

    hot = fam(curate.BAND_BUCKET_CAP + 16, "hot")
    assert _near_dup_pairs(hot.select("key", "text"), 0.5).count() == 0

    small = fam(10, "small")
    n_small = _near_dup_pairs(small.select("key", "text"), 0.5).count()
    assert n_small == 10 * 9 // 2


def test_band_join_ships_keys_only(spark):
    """The band self-join must never shuffle the per-doc shingle arrays:
    no `grams` column may appear upstream of the band-key join — grams
    re-attach only to the surviving candidate pairs (two joins on a/b)."""
    from codegraphcontext_spark.curate import _doc_key, _near_dup_pairs
    from pyspark.sql import functions as F

    docs = _docs(spark).withColumn("key", _doc_key(F.col("doc_id")))
    pairs = _near_dup_pairs(docs.select("key", "text"), 0.5)
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    # The optimized plan joins on `band` with (key, band) inputs only; the
    # grams arrays enter exactly twice, via the post-candidate re-attach.
    band_joins = [
        ln for ln in plan.splitlines() if "Join" in ln and "band" in ln
    ]
    assert band_joins, plan
    for ln in band_joins:
        assert "grams" not in ln, ln


def test_cli_curate(spark, tmp_path, capsys):
    from codegraphcontext_spark import cli

    docs_path = str(tmp_path / "docs.parquet")
    _docs(spark).write.parquet(docs_path)
    rc = cli.main([
        "curate", "--docs", docs_path, "--out", str(tmp_path / "out"),
        "--jaccard", "0.5", "--min-quality", "400", "--langs", "en",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_out"] == 3


def test_repetition_and_pii_stages(spark, tmp_path):
    """Round-3 stages: a template-repetitive doc that sails through the
    length/alpha quality score is dropped by the Gopher repetition
    ceiling, and PII in a surviving doc is redacted in place (a rewrite,
    not a filter)."""
    from pyspark.sql import functions as F

    rows = [
        (0, _BASE_A + "alpha ending one", "en"),
        # passes quality (long, alpha, stopword band) but ~100% of its
        # chars sit in duplicated trigrams -> repetition removes it
        (1, ("the quick brown fox jumps over a lazy dog " * 10).strip(),
         "en"),
        (2, _BASE_B + "contact me at crow.keeper@harbor.example.org soon",
         "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = str(tmp_path / "c")
    stats = curate_documents(
        spark, docs, out, jaccard=0.5, min_quality=400, langs=["en"]
    )
    assert stats["removed_repetition"] == 1
    assert stats["pii_redacted_docs"] == 1
    assert stats["n_out"] == 2
    kept = spark.read.parquet(os.path.join(out, "curated.parquet"))
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == [0, 2]
    red = kept.where(F.col("doc_id") == 2).collect()[0].text
    assert "<EMAIL>" in red and "@" not in red


def test_pii_redaction_can_be_disabled(spark, tmp_path):
    rows = [(0, _BASE_A + "mail a@b.co now", "en")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = str(tmp_path / "nopii")
    stats = curate_documents(
        spark, docs, out, jaccard=0.5, min_quality=0, redact_pii=False
    )
    assert stats["pii_redacted_docs"] == 0
    kept = spark.read.parquet(os.path.join(out, "curated.parquet"))
    assert "a@b.co" in kept.collect()[0].text


def test_balance_sources_stage(spark, tmp_path):
    """Source balancing down-samples each source toward the mean source
    size with the md5-nibble rule — pinned against a pure-Python
    recomputation of the keep set (deterministic, partitioning-free)."""
    import hashlib

    from pyspark.sql import functions as F

    rows = [
        (i, f"alpha beta gamma delta epsilon zeta eta theta {i}", "en",
         "crawlA")
        for i in range(40)
    ] + [
        (i, f"one two three four five six seven eight {i}", "en", "crawlB")
        for i in range(40, 45)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    stats = curate_documents(
        spark, docs, str(tmp_path / "o"),
        jaccard=0.99, min_quality=0, max_rep3=1000,
        langs=None, redact_pii=False, balance_sources=True,
    )
    # rule: mean = (45 DIV 2) = 22; rate_s = min(4096, 22*4096 DIV n_s);
    # keep doc when int(md5(doc_id)[2:5], 16) < rate_s  (1-based substr 3,3)
    def h3(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[2:5], 16)

    rate = {"crawlA": min(4096, 22 * 4096 // 40),
            "crawlB": min(4096, 22 * 4096 // 5)}
    exp_a = sum(1 for i in range(40) if h3(i) < rate["crawlA"])
    exp_b = sum(1 for i in range(40, 45) if h3(i) < rate["crawlB"])
    assert stats["removed_balance"] == 45 - exp_a - exp_b
    assert stats["n_out"] == exp_a + exp_b
    out = spark.read.parquet(str(tmp_path / "o" / "curated.parquet"))
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {"crawlA": exp_a, "crawlB": exp_b}


def test_balance_sources_requires_source_column(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "a b c d e f", "en")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="source"):
        curate_documents(
            spark, docs, str(tmp_path / "o"),
            redact_pii=False, balance_sources=True,
        )
