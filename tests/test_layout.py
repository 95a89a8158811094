"""Z-order layout: the scan-pruning contract.

The operator's whole value is a storage-side property — written files carry
tight min/max stats on EVERY layout column — so the tests measure exactly
that, from the parquet footers (``overlap_fraction``), against the two
counterfactual layouts: a single-column sort (tight on one dim, useless on
the other) and an unsorted write (useless on both)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from codegraphcontext_spark.pipeline.layout import (
    overlap_fraction,
    zorder_layout,
    zorder_value,
)

SF_DIR = "/root/testdata/sf0.01"
N_FILES = 32

USER_LO, USER_HI = 100, 120  # ~1.4% of the 0..1499 user range
DAY_LO = datetime.datetime(2024, 1, 10)
DAY_HI = datetime.datetime(2024, 1, 11)  # 1 of 30 days


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def layouts(spark, events, tmp_path_factory):
    base = tmp_path_factory.mktemp("layouts")
    n = events.count()
    paths = {k: str(base / k) for k in ("zorder", "sort_user", "unsorted")}
    zorder_layout(
        events, ["user_id", "ts"], paths["zorder"],
        target_rows_per_file=max(1, n // N_FILES),
    )
    (
        events.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(paths["sort_user"])
    )
    events.repartition(N_FILES).write.mode("overwrite").parquet(
        paths["unsorted"]
    )
    return paths


def _fingerprint(df):
    # order-independent: xor of row hashes + row count
    return df.agg(
        F.expr(
            "bit_xor(xxhash64(event_id, ts, user_id, event_type, value, props))"
        ),
        F.count("*"),
    ).collect()[0]


def test_zorder_roundtrip_exact(spark, events, layouts):
    # layout rewrites rows, never values
    assert _fingerprint(spark.read.parquet(layouts["zorder"])) == _fingerprint(
        events
    )


def test_zorder_prunes_both_dimensions(layouts):
    u = overlap_fraction(layouts["zorder"], "user_id", USER_LO, USER_HI)
    t = overlap_fraction(layouts["zorder"], "ts", DAY_LO, DAY_HI)
    # each dimension's narrow predicate must skip a large share of row
    # groups (with ~32 files the z-curve allots ~sqrt(32) bands per
    # dimension, so per-dim overlap lands near 1/sqrt(files) + boundary
    # effects — the contract is "prunes BOTH", not a specific ratio)
    assert u < 0.6, u
    assert t < 0.6, t


def test_single_sort_is_blind_on_second_dimension(layouts):
    # the counterfactual the operator exists to beat: sorting by user_id
    # prunes user_id but reads EVERYTHING for a time predicate
    u = overlap_fraction(layouts["sort_user"], "user_id", USER_LO, USER_HI)
    t = overlap_fraction(layouts["sort_user"], "ts", DAY_LO, DAY_HI)
    assert u < 0.5, u
    assert t == pytest.approx(1.0), t


def test_unsorted_is_blind_on_both(layouts):
    assert (
        overlap_fraction(layouts["unsorted"], "user_id", USER_LO, USER_HI)
        > 0.9
    )


def test_zorder_value_deterministic(spark, events):
    a = events.select(zorder_value(events, ["user_id", "ts"])).collect()
    b = events.select(zorder_value(events, ["user_id", "ts"])).collect()
    assert a == b


def test_zorder_value_bit_budget_guard(spark, events):
    with pytest.raises(ValueError, match="exceeds int64"):
        zorder_value(events, ["user_id"] * 6, bits=12)


def test_zorder_handles_string_and_constant_columns(spark, events, tmp_path):
    # string columns rank by xxhash64; a constant column contributes zero
    # bits instead of dividing by zero
    df = events.withColumn("const", F.lit(7))
    out = str(tmp_path / "zs")
    zorder_layout(df, ["event_type", "const"], out, target_rows_per_file=5000)
    got = spark.read.parquet(out)
    assert got.count() == events.count()


def test_zorder_stream_sink(spark, tmp_path):
    import glob

    from codegraphcontext_spark.pipeline.layout import zorder_stream_sink

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    q = zorder_stream_sink(
        stream, ["user_id", "ts"], out, ckpt, target_rows_per_file=500
    )
    q.awaitTermination(180)
    got = spark.read.option("basePath", out).parquet(out)
    # every row landed exactly once
    assert got.count() == ev.count()
    # each batch directory is clustered: the narrow user band skips most
    # row groups inside it
    bdirs = sorted(glob.glob(out + "/batch=*"))
    assert bdirs
    for b in bdirs:
        assert overlap_fraction(b, "user_id", USER_LO, USER_HI) < 0.6


def test_zorder_dominance_monotone(spark):
    """Morton codes are monotone under coordinate dominance: if a row is
    <= another in EVERY layout dimension, its z-value is <= too (bit
    interleaving is order-preserving per coordinate). This is the property
    that makes range predicates on any single dimension map to bounded
    z-ranges — the basis of the pruning the other tests measure."""
    import itertools
    import random

    rnd = random.Random(42)
    rows = [(rnd.randrange(0, 10_000), rnd.randrange(0, 10_000)) for _ in range(120)]
    df = spark.createDataFrame(rows, "a long, b long")
    from codegraphcontext_spark.pipeline.layout import zorder_value

    got = {
        (r["a"], r["b"]): r["__z"]
        for r in df.select("a", "b", zorder_value(df, ["a", "b"])).collect()
    }
    for (p, q) in itertools.combinations(rows, 2):
        lo, hi = (p, q) if (p[0] <= q[0] and p[1] <= q[1]) else (q, p)
        if lo[0] <= hi[0] and lo[1] <= hi[1]:
            assert got[lo] <= got[hi], (lo, hi, got[lo], got[hi])


def test_compact_small_files_binpacks(spark, tmp_path):
    """A fragmented write (64 tiny files) compacts to the byte-target file
    count with zero row loss and identical content; a second compaction at
    a huge target is a no-op single file. The op must never EXPAND the
    file count (coalesce path only shrinks)."""
    from codegraphcontext_spark.pipeline.layout import compact_small_files

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "tight")
    df = spark.range(0, 20_000).withColumn(
        "payload", F.md5(F.col("id").cast("string"))
    )
    df.repartition(64).write.parquet(src)

    stats = compact_small_files(spark, src, dst, target_bytes=256 * 1024)
    assert stats["files_before"] == 64
    assert stats["files_after"] == stats["n_files_target"]
    assert stats["files_after"] < 64
    out = spark.read.parquet(dst)
    assert out.count() == 20_000
    assert out.agg(F.sum("id")).first()[0] == 20_000 * 19_999 // 2

    dst2 = str(tmp_path / "one")
    stats2 = compact_small_files(spark, dst, dst2, target_bytes=1 << 40)
    assert stats2["files_after"] == 1
