"""Command-line entry point — the ``spark-submit --py-files`` surface.

The reference is driven over MCP JSON-RPC (reference ``server.py:856-905``);
the batch engine is driven by spark-submit. One module, three subcommands:

    build        full pipeline pages -> nodes/edges (resumable; re-running
                 skips committed stages — the north rule's idempotent resume)
    incremental  fold a delta pages snapshot into a committed workdir
    query        run a read query over the materialized graph tables

Cluster launch (the --py-files path; locally the same module runs under
plain ``python -m codegraphcontext_spark.cli``):

    cd /root/repo && zip -qr /tmp/cgc.zip codegraphcontext_spark
    spark-submit --py-files /tmp/cgc.zip \
        --conf spark.sql.adaptive.enabled=true \
        -m codegraphcontext_spark.cli ... (or a thin driver .py)

On a real cluster, pass ``--master yarn/k8s`` etc.; the session config in
``session.py`` (AQE, skew join, Arrow) applies either way.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F


def _spark(args):
    from .session import get_spark

    return get_spark(
        app_name="codegraphcontext_spark",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )


def cmd_build(args) -> int:
    from .pipeline.runner import PipelineRunner

    spark = _spark(args)
    runner = PipelineRunner(spark, args.pages, args.workdir)
    t0 = time.time()
    out = runner.run()
    n_nodes, n_edges = out["nodes"].count(), out["edges"].count()
    print(json.dumps({
        "status": "ok", "wall_s": round(time.time() - t0, 2),
        "n_nodes": n_nodes, "n_edges": n_edges,
        "stages": {k: v for k, v in runner.metrics.items()},
    }))
    return 0


def cmd_incremental(args) -> int:
    from .pipeline.runner import PipelineRunner

    spark = _spark(args)
    runner = PipelineRunner(spark, args.pages, args.workdir)
    t0 = time.time()
    out = runner.run_incremental(args.delta)
    print(json.dumps({
        "status": "ok", "wall_s": round(time.time() - t0, 2),
        "n_nodes": out["nodes"].count(), "n_edges": out["edges"].count(),
    }))
    return 0


def cmd_query(args) -> int:
    """Read queries over a committed workdir's nodes/edges tables.

    who_references <name>  -> pages mentioning the entity (Q8 analog)
    neighbors <name>       -> 1-hop edges from/to the entity
    top_entities [k]       -> most-referenced entities (Q22-style top-k)
    """
    spark = _spark(args)
    nodes = spark.read.parquet(f"{args.workdir}/nodes/data")
    edges = spark.read.parquet(f"{args.workdir}/edges/data")
    name = (args.arg or "").lower()
    if args.query == "who_references":
        ent = nodes.where(
            (F.col("node_type") == "Entity") & (F.col("name") == name)
        ).select(F.col("node_id").alias("obj_id"))
        res = (
            edges.join(F.broadcast(ent), on="obj_id")
            .where(F.col("pred") == "MENTIONS")
            .select("subj_id", "n_occurrences")
            .orderBy(F.desc("n_occurrences"), F.asc("subj_id"))
            .limit(args.limit)
        )
    elif args.query == "neighbors":
        ent = nodes.where(
            (F.col("node_type") == "Entity") & (F.col("name") == name)
        ).select("node_id")
        ids = [r.node_id for r in ent.collect()]
        res = (
            edges.where(
                F.col("subj_id").isin(ids) | F.col("obj_id").isin(ids)
            )
            .select("subj_id", "pred", "obj_id", "n_occurrences")
            .orderBy("pred", "subj_id", "obj_id")
            .limit(args.limit)
        )
    elif args.query == "top_entities":
        res = (
            edges.where(F.col("pred") == "MENTIONS")
            .groupBy("obj_id")
            .agg(F.sum("n_occurrences").alias("n_refs"))
            .join(nodes.withColumnRenamed("node_id", "obj_id"), on="obj_id")
            .select("name", "etype", "n_refs")
            .orderBy(F.desc("n_refs"), F.asc("name"))
            .limit(args.limit)
        )
    else:
        print(f"unknown query {args.query!r}", file=sys.stderr)
        return 2
    for row in res.collect():
        print(json.dumps(row.asDict()))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="codegraphcontext_spark")
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="run the full KG pipeline")
    b.add_argument("--pages", required=True)
    b.add_argument("--workdir", required=True)
    b.set_defaults(fn=cmd_build)

    i = sub.add_parser("incremental", help="fold a delta snapshot in")
    i.add_argument("--pages", required=True, help="base pages path (of the committed build)")
    i.add_argument("--delta", required=True)
    i.add_argument("--workdir", required=True)
    i.set_defaults(fn=cmd_incremental)

    q = sub.add_parser("query", help="query the materialized graph")
    q.add_argument("--workdir", required=True)
    q.add_argument("query", choices=["who_references", "neighbors", "top_entities"])
    q.add_argument("arg", nargs="?", default="")
    q.add_argument("--limit", type=int, default=20)
    q.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
