"""Z-order data layout: multi-column clustering for scan pruning at scale.

At 100 TB the cheapest query is the one that never reads the data: parquet
row-group (and file) min/max statistics let a scan skip every chunk whose
[min, max] range cannot satisfy the pushed predicate. A single-column sort
makes those ranges tight for ONE column and useless for every other; Z-order
(Morton-order) interleaves the bits of several columns so that rows close in
the Z-curve are close in EVERY interleaved dimension — each written file then
covers a small rectangle of the key space and selective predicates on ANY of
the layout columns skip most chunks. This is the layout technique behind
Delta Lake's OPTIMIZE ZORDER BY; here it is expressed with stock Spark
primitives (no table format required):

    quantize each column to a fixed-width integer rank
      -> interleave bits into one Z-value (pure Catalyst bit arithmetic,
         whole-stage codegen — no UDF)
      -> repartitionByRange(z) + sortWithinPartitions(z)
      -> write parquet (row-group stats come for free)

Scale shape: one tiny min/max aggregate over the layout columns (a 2-value
model per column riding the driver, like the IVF centroids), then exactly one
range-exchange of the full data — the same shuffle any layout rewrite pays.
Nothing else touches the driver; file count scales with input size via
``target_rows_per_file``.

Reference analog: none (CodeGraphContext stores the graph in Neo4j and never
controls file layout); this is the warehouse-side completion of
``pipeline/warehouse.py``'s bucketing story — bucketing co-locates JOINS,
Z-order accelerates selective SCANS.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

# 12 bits/column keeps the interleaved value well inside int64 for up to
# 5 columns and gives 4096 distinct ranks per dimension — finer than any
# realistic row-group count, so rank granularity never limits pruning.
DEFAULT_BITS = 12


def _as_long(df: DataFrame, name: str) -> Column:
    """Lossless integer view of an orderable column for rank quantization.

    Timestamps become microseconds; strings hash to a stable 64-bit value
    (xxhash64 — rank order then reflects hash order, which still clusters
    equal values together, the property point-lookups need); numerics pass
    through. Floats are scaled to microunits, honest for the |value| < 9e12
    range the corpus uses."""
    col = F.col(name)
    t = df.schema[name].dataType.typeName()
    if t in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(col.cast("timestamp"))
    if t == "string":
        return F.xxhash64(col)
    if t in ("double", "float", "decimal"):
        return F.round(col * 1_000_000).cast("bigint")
    return col.cast("bigint")


def zorder_value(df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS) -> Column:
    """Z-value (Morton code) column over ``cols``.

    Each column is min/max-quantized to ``bits`` bits with pure integer
    arithmetic (one small agg job collects the 2-value bounds per column —
    a model, not data), then the bit planes are interleaved:
    bit b of column i lands at position b*len(cols)+i. The whole expression
    is Catalyst shifts/ands/ors inside one codegen stage."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds int64 range")
    longs = {c: _as_long(df, c) for c in cols}
    bounds = df.agg(
        *[F.min(longs[c]).alias(f"min_{c}") for c in cols],
        *[F.max(longs[c]).alias(f"max_{c}") for c in cols],
    ).collect()[0]
    planes: list[Column] = []
    top = (1 << bits) - 1
    for i, c in enumerate(cols):
        lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
        if lo is None or hi is None or hi == lo:
            q = F.lit(0).cast("bigint")  # constant/empty column: contributes 0
        else:
            # rank in [0, 2^bits): the subtraction runs in DOUBLE so a
            # full-range hash column (hi - lo ~ 2^64) can't overflow ANSI
            # int64 arithmetic; double rounding only blurs rank edges, and
            # a rank is a layout hint, not a correctness value. Clamp for
            # float-edge safety.
            span = float(hi) - float(lo)
            q = F.least(
                F.lit(top).cast("bigint"),
                F.greatest(
                    F.lit(0).cast("bigint"),
                    F.floor(
                        (longs[c].cast("double") - float(lo))
                        * float(top)
                        / span
                    ).cast("bigint"),
                ),
            )
        for b in range(bits):
            planes.append(
                F.shiftleft(
                    F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + i
                )
            )
    return reduce(lambda a, x: a.bitwiseOR(x), planes).alias("__z")


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    out_path: str,
    bits: int = DEFAULT_BITS,
    target_rows_per_file: int = 250_000,
) -> int:
    """Rewrite ``df`` to ``out_path`` clustered along the Z-curve of ``cols``.

    Returns the number of files written. One range exchange + in-partition
    sort; the written parquet's row-group min/max stats are tight on every
    layout column, so pushed predicates on ANY of them skip non-overlapping
    chunks at scan time (verify with ``overlap_fraction``)."""
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    z = zorder_value(df, cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return _count_part_files(df.sparkSession, out_path)


def _count_part_files(spark, out_path: str) -> int:
    """Count part files via the Hadoop FileSystem API, so the count is
    correct for ANY URI the write itself accepted (hdfs://, s3a://, local)
    — a local glob would silently report 0 on remote stores, which is
    exactly the 100 TB deployment this module targets."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(out_path)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return sum(
        1
        for st in fs.listStatus(path)
        if st.getPath().getName().startswith("part-")
    )


def overlap_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of row groups a scan with predicate col BETWEEN lo AND hi
    must read, judged purely from parquet min/max statistics — the same
    decision parquet-mr/DataSource V2 makes. The pruning quality metric:
    1.0 means the layout is useless for this column, ~selectivity means
    near-perfect skipping.

    LOCAL PATHS ONLY: this is a diagnostic that reads parquet footers with
    pyarrow's local filesystem; for remote stores, run it against a
    downloaded sample or use the engine's own scan metrics instead."""
    import glob
    import os

    import pyarrow.parquet as pq

    scheme = path.split("://", 1)[0] if "://" in path else ""
    if scheme not in ("", "file"):
        raise ValueError(
            f"overlap_fraction reads footers from the local filesystem; "
            f"got non-local path {path!r}"
        )
    if path.startswith("file://"):
        path = path[len("file://"):]

    total = overlapping = 0
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            row_group = meta.row_group(rg)
            stats = None
            for ci in range(row_group.num_columns):
                c = row_group.column(ci)
                if c.path_in_schema == col:
                    stats = c.statistics
                    break
            total += 1
            if (
                stats is None
                or not stats.has_min_max
                or not (stats.max < lo or stats.min > hi)
            ):
                overlapping += 1
    return overlapping / max(total, 1)


def zorder_stream_sink(
    stream_df,
    cols: list[str],
    out_dir: str,
    checkpoint_dir: str,
    bits: int = DEFAULT_BITS,
    target_rows_per_file: int = 250_000,
    once: bool = True,
    processing_time: str = "2 seconds",
):
    """Streaming ingestion with per-micro-batch Z-order clustering: each
    batch is written as its own ``batch=<id>`` partition directory, rows
    inside it range-partitioned and sorted along the Z-curve of ``cols``.

    The layout story for a stream: a plain ``writeStream.format("parquet")``
    appends files in arrival order, so row-group stats are tight on nothing
    and every later scan reads everything. Clustering at write time costs
    one in-batch range exchange (the batch is already in memory) and buys
    the same min/max skipping ``zorder_layout`` gives batch rewrites —
    without ever re-reading the table. Batches keep separate directories so
    the sink stays append-only (exactly-once via the checkpoint: a replayed
    batch overwrites ITS OWN directory, never another's — the idempotent
    foreachBatch pattern).

    Returns the StreamingQuery."""

    def _write_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        zorder_layout(
            batch_df,
            cols,
            f"{out_dir}/batch={batch_id}",
            bits=bits,
            target_rows_per_file=target_rows_per_file,
        )

    writer = (
        stream_df.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def compact_small_files(
    spark,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_bytes`` each — the maintenance job every long-running 100 TB
    table needs (streaming sinks and incremental appends fragment the
    layout; a scan over 10^6 tiny files pays task-scheduling and
    footer-read overhead that dwarfs the I/O; the NameNode/manifest pays
    the rest). This is the stock-Spark expression of Delta OPTIMIZE /
    Iceberg rewrite_data_files (bin-pack strategy).

    Shape: input size comes from the Hadoop FileSystem API (correct for
    hdfs:// and s3a://, not just local); the rewrite is ONE coalesce (no
    shuffle — compaction must not pay an exchange) when shrinking the file
    count, or a round-robin repartition only when the input is so skewed
    that one input split exceeds the target several times over. Row order
    within files is preserved per input split; min/max stats survive at
    row-group grain, so prior zorder_layout clustering is not destroyed.

    Returns {"files_before", "files_after", "bytes_total", "n_files_target"}.
    """
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    parts = [
        st
        for st in fs.listStatus(path)
        if st.getPath().getName().startswith("part-")
    ]
    files_before = len(parts)
    bytes_total = sum(st.getLen() for st in parts)
    n_target = max(1, -(-bytes_total // target_bytes))
    df = spark.read.parquet(in_path)
    out = df.coalesce(n_target) if n_target <= files_before else df
    out.write.mode("overwrite").parquet(out_path)
    return {
        "files_before": files_before,
        "files_after": _count_part_files(spark, out_path),
        "bytes_total": int(bytes_total),
        "n_files_target": int(n_target),
    }
