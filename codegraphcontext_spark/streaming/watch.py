"""Streaming surface — the reference's file-watcher (W1-W5) re-expressed as
Structured Streaming over the pages directory.

The reference watches a directory with OS events, debounces 2 s, then
re-parses the WHOLE repo per change (reference ``core/watcher.py:70-119``).
Here the debounce is the trigger interval, the "event" is a new parquet file
landing in the watched directory, and each micro-batch folds ONLY the new
pages into the committed workdir via the incremental builder
(O(delta + graph), see ``runner.run_incremental``).

``Trigger.AvailableNow`` (``once=True``) gives the reference's "initial scan
then catch up" semantics in batch form — the mode used in tests; a real
deployment passes ``processing_time`` (e.g. "2 seconds" — the reference's
debounce) and lets the query run forever. Checkpointing is Spark's own
streaming checkpoint (source offsets) layered on the pipeline's stage
manifests, so a killed watcher resumes exactly once per file.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..pipeline.runner import PipelineRunner

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def watch_pages(
    spark: SparkSession,
    watch_dir: str,
    base_pages: str,
    workdir: str,
    checkpoint_dir: str | None = None,
    once: bool = True,
    processing_time: str = "2 seconds",
    max_files_per_trigger: int | None = None,
):
    """Start a streaming query folding new page files into the graph.

    watch_dir: directory where new pages parquet files land (the watched
    tree); base_pages: the base build's input (must already be committed via
    ``PipelineRunner.run()``); workdir: that build's stage directory.
    Returns the StreamingQuery (caller owns ``awaitTermination``/``stop``).
    """
    checkpoint_dir = checkpoint_dir or os.path.join(workdir, "_stream_checkpoint")
    reader = (
        spark.readStream.schema(PAGES_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger is not None:  # W2 debounce-batching analog
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(watch_dir)

    def _fold(batch_df, batch_id: int) -> None:
        # foreachBatch hands us one micro-batch of new pages; persist it as a
        # delta snapshot (so the incremental fingerprint chain stays
        # inspectable) and fold it in.
        delta_path = os.path.join(workdir, f"_stream_delta/batch={batch_id}")
        batch_df.write.mode("overwrite").parquet(delta_path)
        runner = PipelineRunner(spark, base_pages, workdir)
        runner.run_incremental(delta_path)

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
