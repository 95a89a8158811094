"""Randomized cross-check of the as-of join's window composition against a
brute-force Python reference — guards the at-or-before/left-join semantics
on adversarial layouts (users with no clicks, clicks after every error,
interleaved bursts) beyond the fixed testdata corpus. Timestamps are unique
per corpus, matching the operator's documented precondition (ties would make
ANY asof implementation's pick among equal timestamps arbitrary)."""

import datetime as dt
import random

import pandas as pd
import pytest

from codegraphcontext_spark.queries.driver_queries import SPARK_QUERIES


def _brute_force(rows):
    out = []
    for r in rows:
        if r["event_type"] != "error":
            continue
        prior = [
            c
            for c in rows
            if c["event_type"] == "click"
            and c["user_id"] == r["user_id"]
            and c["ts"] <= r["ts"]
        ]
        if prior:
            best = max(prior, key=lambda c: c["ts"])
            d = r["ts"] - best["ts"]  # exact integer micros, no float round
            gap = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
            out.append((r["event_id"], r["user_id"], best["event_id"], gap))
        else:
            out.append((r["event_id"], r["user_id"], -1, -1))
    return sorted(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_join_matches_brute_force(spark, tmp_path, seed):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    # unique timestamps by construction (distinct microsecond offsets)
    offsets = rng.sample(range(10_000_000), 400)
    rows = [
        {
            "event_id": i,
            "ts": base + dt.timedelta(microseconds=off),
            "user_id": rng.randrange(8),  # few users -> dense interleaving
            "event_type": rng.choice(["error", "click", "view"]),
            "value": 1.0,
            "props": "{}",
        }
        for i, off in enumerate(offsets)
    ]
    sf_dir = tmp_path / f"sf_rand{seed}"
    sf_dir.mkdir()
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark rejects NANOS parquet
    pdf.to_parquet(sf_dir / "events.parquet")
    got = sorted(
        tuple(r)
        for r in SPARK_QUERIES["events_asof_join"](spark, str(sf_dir)).collect()
    )
    assert got == _brute_force(rows)
