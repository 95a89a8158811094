"""Explicit salted-key skew mitigation for the joins AQE cannot fix.

Where the engine relies on the runtime (and says so): batch equi-joins get
AQE's skew-join partition splitting, and algebraic aggregations (sum/count/
min/max) are absorbed map-side by partial aggregation — neither needs manual
salting, and the pipeline deliberately leaves them to the optimizer
(``session.py`` enables AQE + skewJoin; ``pipeline/canon.py`` documents the
partial-agg argument for the CC min-label loop).

What the runtime does NOT fix — the two places a hub key still serializes
onto one task at 100 TB:

* **Stream-static shuffle joins.** AQE never re-plans a streaming stage. If
  the static side is too big to broadcast and one stream key is a whale
  (one user producing 30% of events; one boilerplate-heavy domain), every
  micro-batch funnels the whale through a single shuffle partition.
* **Holistic aggregations.** ``collect_set``/``collect_list`` have no
  map-side combiner worth the name: a hub key's whole value set travels to
  one reducer and materializes there.

Both are fixed the classic way: spread the hot key over ``n_salts``
sub-keys with an explicit salt column, do the work per (key, salt), then
merge. The salt is DETERMINISTIC — derived by hashing caller-named
high-entropy columns (an event id, a url), never ``rand()`` or partition
id — so results are reproducible across retries, partitionings, and the
DuckDB oracle. Results are row-identical to the unsalted operation; only
the physical distribution changes.

Reference analog: none (CodeGraphContext is single-process); north-star
requirement "salted keys for hub-entity skew".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["salt_column", "salted_join", "salted_collect_set"]


def salt_column(spread_cols: list[str], n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from high-entropy columns.

    ``spread_cols`` must (jointly) vary within a hot key's rows — an event
    id, a timestamp, a url — otherwise every hot-key row lands on the same
    salt and the operator degrades to the unsalted plan (correct, just not
    faster). xxhash64 is stable across Spark versions and partitionings."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in spread_cols]), F.lit(n_salts))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    spread_cols: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left[on]`` may contain whale keys: ``right`` is
    replicated ``n_salts`` times (explode over a literal salt sequence — a
    bounded, dimension-sized blowup), ``left`` rows pick one deterministic
    salt each, and the join keys on (on, salt) so a hot key's rows spread
    over ``n_salts`` shuffle partitions instead of one.

    Row-for-row identical to ``left.join(right, on, how)`` for ``inner``
    and ``left`` joins (each left row still meets each matching right row
    exactly once — at its own salt). The price is shipping the right side
    n_salts times; worth it exactly when the right side is far smaller
    than the hot key's row count and cannot be broadcast. Works unchanged
    when ``left`` is a streaming DataFrame (the use case AQE can't touch)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_left = left.withColumn("__salt", salt_column(spread_cols, n_salts))
    replicated = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    return salted_left.join(replicated, [on, "__salt"], how).drop("__salt")


def salted_collect_set(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    spread_cols: list[str],
    n_salts: int = 8,
) -> DataFrame:
    """``groupBy(key).agg(sort_array(collect_set(value)))`` that survives a
    hub key: phase 1 collects per (key, salt) — the whale's values spread
    over ``n_salts`` reducers and each partial set stays bounded — phase 2
    merges the ≤ n_salts partial sets per key with flatten + array_distinct
    + sort_array (one narrow, n_salts-bounded row group per key).

    Output column ``values`` is sorted, so the result is deterministic and
    identical to the unsalted aggregate regardless of partitioning."""
    phase1 = (
        df.withColumn("__salt", salt_column(spread_cols, n_salts))
        .groupBy(*key_cols, "__salt")
        .agg(F.collect_set(value_col).alias("__part"))
    )
    return (
        phase1.groupBy(*key_cols)
        .agg(
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("__part")))
            ).alias("values")
        )
    )
