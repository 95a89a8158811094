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
