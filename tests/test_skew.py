"""Salted-skew operators: result-identity with the unsalted operation (the
whole contract — salting may only change physical distribution), salt
spreading on a whale key, and the streaming case AQE can't handle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphcontext_spark.functions.skew import (
    salt_column,
    salted_collect_set,
    salted_join,
)

N_SALTS = 8


@pytest.fixture(scope="module")
def whale_events(spark):
    # user 7 is a whale: 2000 of 2600 rows
    rows = [(i, 7 if i < 2000 else i % 60, f"e{i % 13}") for i in range(2600)]
    return spark.createDataFrame(rows, "event_id long, user_id long, etype string")


@pytest.fixture(scope="module")
def dims(spark):
    rows = [(u, f"seg{u % 5}") for u in range(60)]
    return spark.createDataFrame(rows, "user_id long, segment string")


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_identical_to_plain_inner(spark, whale_events, dims):
    plain = whale_events.join(dims, "user_id")
    salted = salted_join(
        whale_events, dims, "user_id", spread_cols=["event_id"], n_salts=N_SALTS
    )
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_identical_to_plain_left(spark, whale_events, dims):
    # users >= 60 in the tail have no dim row; left join must keep them
    ev = whale_events.withColumn(
        "user_id", F.when(F.col("event_id") % 50 == 0, F.lit(999)).otherwise(F.col("user_id"))
    )
    plain = ev.join(dims, "user_id", "left")
    salted = salted_join(ev, dims, "user_id", ["event_id"], N_SALTS, "left")
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_rejects_outer(whale_events, dims):
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(whale_events, dims, "user_id", ["event_id"], how="full")


def test_salt_spreads_the_whale(spark, whale_events):
    # the whale key's rows must occupy every salt bucket, not one
    n = (
        whale_events.where("user_id = 7")
        .select(salt_column(["event_id"], N_SALTS).alias("s"))
        .distinct()
        .count()
    )
    assert n == N_SALTS


def test_salt_is_deterministic(spark, whale_events):
    a = whale_events.select("event_id", salt_column(["event_id"], N_SALTS).alias("s"))
    b = whale_events.select("event_id", salt_column(["event_id"], N_SALTS).alias("s"))
    assert _sorted_rows(a) == _sorted_rows(b)


def test_salted_collect_set_identical_to_plain(spark, whale_events):
    plain = (
        whale_events.groupBy("user_id")
        .agg(F.sort_array(F.array_distinct(F.collect_list("etype"))).alias("values"))
    )
    salted = salted_collect_set(
        whale_events, ["user_id"], "etype", spread_cols=["event_id"], n_salts=N_SALTS
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_works_on_stream(spark, whale_events, dims, tmp_path):
    # the niche AQE cannot serve: a stream-static shuffle join with a
    # whale stream key — salted_join must run inside a streaming query
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    whale_events.write.parquet(src)
    stream = (
        spark.readStream.schema("event_id long, user_id long, etype string")
        .format("parquet")
        .load(src)
    )
    joined = salted_join(stream, dims, "user_id", ["event_id"], N_SALTS)
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    plain = whale_events.join(dims, "user_id")
    assert _sorted_rows(got.select(*plain.columns)) == _sorted_rows(plain)
