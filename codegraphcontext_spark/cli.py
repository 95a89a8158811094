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


# Open relation predicates = everything except the closed containment /
# attribute preds.
_CLOSED_PREDS = ("MENTIONS", "LINKS_TO", "HAS_TYPE")

SUPPORTED_QUERIES = (
    "who_references", "neighbors", "top_entities",
    "class_hierarchy", "dead_entities", "cooccurrence",
)


def _entity_ids(nodes, name):
    return nodes.where(
        (F.col("node_type") == "Entity") & (F.col("name") == name)
    ).select("node_id")


def cmd_query(args) -> int:
    """Read queries over a committed workdir's nodes/edges tables — the
    relationship-query dispatcher (reference ``code_finder.py:588-723``
    routes 15 handler types; unknown types get the same error contract with
    ``supported_types``).

    who_references <name>  -> pages mentioning the entity (Q8 analog);
                              --lang filters referencing pages, and an empty
                              strict result retries WITHOUT the filter (the
                              reference's fallback relaxation,
                              code_finder.py:192-212)
    neighbors <name>       -> 1-hop edges from/to the entity
    top_entities           -> most-referenced entities (Q22-style top-k)
    class_hierarchy <name> -> typed-relation neighborhood, both directions
                              (Q12 analog, code_finder.py:336-391)
    dead_entities          -> entities never targeted by an open relation
                              (Q14 analog, code_finder.py:414-447)
    cooccurrence <name>    -> entities sharing pages with <name>
                              (Q18 analog, code_finder.py:522-553)
    """
    if args.query not in SUPPORTED_QUERIES:
        print(json.dumps({
            "error": f"unknown query type {args.query!r}",
            "supported_types": list(SUPPORTED_QUERIES),
        }), file=sys.stderr)
        return 2
    spark = _spark(args)
    nodes = spark.read.parquet(f"{args.workdir}/nodes/data")
    edges = spark.read.parquet(f"{args.workdir}/edges/data")
    name = (args.arg or "").lower()
    if args.query == "who_references":
        ent = _entity_ids(nodes, name).withColumnRenamed("node_id", "obj_id")
        base = (
            edges.join(F.broadcast(ent), on="obj_id")
            .where(F.col("pred") == "MENTIONS")
            .select("subj_id", "n_occurrences")
        )
        def _with_lang(df, lang):
            if not lang:
                return df
            pages = nodes.where(
                (F.col("node_type") == "Page") & (F.col("lang") == lang)
            ).select(F.col("node_id").alias("subj_id"))
            return df.join(pages, on="subj_id", how="left_semi")
        res = (
            _with_lang(base, args.lang)
            .orderBy(F.desc("n_occurrences"), F.asc("subj_id"))
            .limit(args.limit)
        )
        rows = res.collect()
        if not rows and args.lang:
            # fallback relaxation: the exact (filtered) query came back
            # empty — retry without the narrowing filter, as the reference
            # does for find_callers with a file filter
            rows = (
                base.orderBy(F.desc("n_occurrences"), F.asc("subj_id"))
                .limit(args.limit)
                .collect()
            )
            print(json.dumps({"note": f"no results for lang={args.lang!r}; "
                              "retried without the filter"}), file=sys.stderr)
        for row in rows:
            print(json.dumps(row.asDict()))
        return 0
    if args.query == "neighbors":
        # broadcast semi-join on each endpoint (NOT a driver-side
        # collect/isin — the point lookup stays distributed)
        ent = F.broadcast(_entity_ids(nodes, name))
        out_e = edges.join(
            ent.withColumnRenamed("node_id", "subj_id"), on="subj_id",
            how="left_semi",
        )
        in_e = edges.join(
            ent.withColumnRenamed("node_id", "obj_id"), on="obj_id",
            how="left_semi",
        )
        res = (
            out_e.unionByName(in_e)
            .select("subj_id", "pred", "obj_id", "n_occurrences")
            .dropDuplicates(["subj_id", "pred", "obj_id"])
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
    elif args.query == "class_hierarchy":
        ent = F.broadcast(_entity_ids(nodes, name))
        open_e = edges.where(~F.col("pred").isin(*_CLOSED_PREDS))
        names = nodes.select("node_id", F.col("name").alias("other"))
        out_e = (
            open_e.join(ent.withColumnRenamed("node_id", "subj_id"), on="subj_id")
            .join(names.withColumnRenamed("node_id", "obj_id"), on="obj_id")
            .select(F.lit("out").alias("direction"), "pred", "other",
                    "n_occurrences")
        )
        in_e = (
            open_e.join(ent.withColumnRenamed("node_id", "obj_id"), on="obj_id")
            .join(names.withColumnRenamed("node_id", "subj_id"), on="subj_id")
            .select(F.lit("in").alias("direction"), "pred", "other",
                    "n_occurrences")
        )
        res = (
            out_e.unionByName(in_e)
            .orderBy("direction", "pred", "other")
            .limit(args.limit)
        )
    elif args.query == "dead_entities":
        targets = (
            edges.where(~F.col("pred").isin(*_CLOSED_PREDS))
            .select(F.col("obj_id").alias("node_id"))
            .distinct()
        )
        res = (
            nodes.where(F.col("node_type") == "Entity")
            .join(targets, on="node_id", how="left_anti")
            .select("name", "etype")
            .orderBy("name")
            .limit(args.limit)
        )
    else:  # cooccurrence
        ent = F.broadcast(_entity_ids(nodes, name))
        m = edges.where(F.col("pred") == "MENTIONS").select(
            F.col("subj_id").alias("page"), "obj_id"
        )
        pages = m.join(
            ent.withColumnRenamed("node_id", "obj_id"), on="obj_id",
            how="left_semi",
        ).select("page").distinct()
        res = (
            m.join(F.broadcast(pages), on="page")
            .join(nodes.withColumnRenamed("node_id", "obj_id"), on="obj_id")
            .where(F.col("name") != name)
            .groupBy("name")
            .agg(F.countDistinct("page").alias("n_pages"))
            .orderBy(F.desc("n_pages"), F.asc("name"))
            .limit(args.limit)
        )
    for row in res.collect():
        print(json.dumps(row.asDict()))
    return 0


def cmd_delete(args) -> int:
    from .pipeline.runner import PipelineRunner

    spark = _spark(args)
    runner = PipelineRunner(spark, args.pages, args.workdir)
    t0 = time.time()
    out = runner.run_delete(args.prefix)
    print(json.dumps({
        "status": "ok", "wall_s": round(time.time() - t0, 2),
        "n_nodes": out["nodes"].count(), "n_edges": out["edges"].count(),
    }))
    return 0


def cmd_status(args) -> int:
    """Job-status surface (J5; reference ``server.py:700-772``
    check_job_status/list_jobs): read the per-stage manifests + lineage the
    runner commits — pure driver-side metadata, no Spark session needed."""
    import os

    stages = []
    for stage in sorted(os.listdir(args.workdir)):
        mpath = os.path.join(args.workdir, stage, "manifest.json")
        if not os.path.isfile(mpath):
            continue
        with open(mpath) as f:
            m = json.load(f)
        lineage = os.path.join(args.workdir, stage, "lineage")
        m["n_partitions"] = (
            len([p for p in os.listdir(lineage) if p.endswith(".parquet")])
            if os.path.isdir(lineage) else 0
        )
        stages.append(m)
    ingested_p = os.path.join(args.workdir, "_ingested.json")
    ingested = []
    if os.path.exists(ingested_p):
        with open(ingested_p) as f:
            ingested = json.load(f)
    print(json.dumps({
        "workdir": args.workdir,
        "n_stages_committed": len(stages),
        "ingested_deltas": len(ingested),
        "stages": stages,
    }))
    return 0


# Write/DDL keywords rejected by the read-only SQL surface (the reference's
# blocklist, server.py:332-345, applied after stripping string literals so a
# literal containing "delete" doesn't false-positive).
_SQL_WRITE_KEYWORDS = (
    "insert", "update", "delete", "drop", "create", "alter", "merge",
    "truncate", "replace", "grant", "revoke", "set", "refresh", "cache",
    "uncache", "load", "copy", "call", "analyze", "msck",
)


def _reject_non_select(sql: str) -> str | None:
    """Returns an error message for non-read-only SQL, else None."""
    import re

    stripped = re.sub(r"'[^']*'|\"[^\"]*\"|`[^`]*`", "''", sql)
    words = re.findall(r"[a-zA-Z_]+", stripped.lower())
    if not words or words[0] not in ("select", "with"):
        return "only SELECT/WITH queries are allowed"
    bad = sorted(set(words) & set(_SQL_WRITE_KEYWORDS))
    if bad:
        return f"write keywords not allowed: {', '.join(bad)}"
    return None


def cmd_sql(args) -> int:
    """Read-only SQL passthrough over the materialized graph (S9 analog;
    reference ``server.py:319-373`` execute_cypher_query with write-keyword
    blocklist). Views registered: nodes, edges, docs."""
    err = _reject_non_select(args.sql)
    if err:
        print(json.dumps({"error": err}), file=sys.stderr)
        return 2
    spark = _spark(args)
    spark.read.parquet(f"{args.workdir}/nodes/data").createOrReplaceTempView("nodes")
    spark.read.parquet(f"{args.workdir}/edges/data").createOrReplaceTempView("edges")
    docs_path = f"{args.workdir}/docs/data"
    import os

    if os.path.isdir(docs_path):
        spark.read.parquet(docs_path).createOrReplaceTempView("docs")
    res = spark.sql(args.sql)
    for row in res.limit(args.limit).collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


def cmd_dot(args) -> int:
    """DOT subgraph export (S8; reference
    ``examples/export_dot_subgraph.py:51-136``): seed entities matched by
    name substring, expanded 2 hops over the edge table, emitted as
    Graphviz. Each hop is a broadcast semi-join frontier expansion; the
    driver only streams the final bounded edge list (toLocalIterator)."""
    spark = _spark(args)
    nodes = spark.read.parquet(f"{args.workdir}/nodes/data")
    edges = spark.read.parquet(f"{args.workdir}/edges/data")
    seed = (
        nodes.where(
            (F.col("node_type") == "Entity")
            & F.col("name").contains((args.arg or "").lower())
        )
        .select("node_id")
    )
    frontier = seed
    member_ids = seed
    for _ in range(args.hops):
        touched = (
            edges.join(
                F.broadcast(frontier.withColumnRenamed("node_id", "subj_id")),
                on="subj_id", how="left_semi",
            )
            .select(F.col("obj_id").alias("node_id"))
            .unionByName(
                edges.join(
                    F.broadcast(frontier.withColumnRenamed("node_id", "obj_id")),
                    on="obj_id", how="left_semi",
                ).select(F.col("subj_id").alias("node_id"))
            )
            .distinct()
        )
        frontier = touched.join(member_ids, on="node_id", how="left_anti")
        member_ids = member_ids.unionByName(frontier).distinct().localCheckpoint()
    sub_edges = (
        edges.join(
            F.broadcast(member_ids.withColumnRenamed("node_id", "subj_id")),
            on="subj_id", how="left_semi",
        )
        .join(
            F.broadcast(member_ids.withColumnRenamed("node_id", "obj_id")),
            on="obj_id", how="left_semi",
        )
        .select("subj_id", "pred", "obj_id")
        .orderBy("subj_id", "pred", "obj_id")
        .limit(args.limit)
    )
    names = {
        r.node_id: (r.name, r.node_type)
        for r in nodes.join(
            F.broadcast(member_ids), on="node_id", how="left_semi"
        ).select("node_id", "name", "node_type").collect()
    }

    def q(s: str) -> str:
        return '"' + s.replace('"', r"\"") + '"'

    lines = ["digraph G {"]
    used = set()
    rows = list(sub_edges.toLocalIterator())
    for r in rows:
        used.add(r.subj_id)
        used.add(r.obj_id)
    for nid in sorted(used):
        label, ntype = names.get(nid, (nid, "?"))
        shape = {"Entity": "ellipse", "Page": "box", "Domain": "diamond"}.get(
            ntype, "ellipse"
        )
        lines.append(f"  {q(nid)} [label={q(label)} shape={shape}];")
    for r in rows:
        lines.append(f"  {q(r.subj_id)} -> {q(r.obj_id)} [label={q(r.pred)}];")
    lines.append("}")
    print("\n".join(lines))
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
    q.add_argument("query")
    q.add_argument("arg", nargs="?", default="")
    q.add_argument("--limit", type=int, default=20)
    q.add_argument("--lang", default=None,
                   help="who_references: restrict to pages of this lang "
                        "(empty strict result retries unfiltered)")
    q.set_defaults(fn=cmd_query)

    dl = sub.add_parser("delete", help="delete pages by url prefix (site/repo delete + GC)")
    dl.add_argument("--pages", required=True, help="base pages path (of the committed build)")
    dl.add_argument("--workdir", required=True)
    dl.add_argument("--prefix", required=True, help="url prefix to delete")
    dl.set_defaults(fn=cmd_delete)

    st = sub.add_parser("status", help="per-stage manifests + lineage summary")
    st.add_argument("--workdir", required=True)
    st.set_defaults(fn=cmd_status)

    sq = sub.add_parser("sql", help="read-only SQL over nodes/edges/docs views")
    sq.add_argument("--workdir", required=True)
    sq.add_argument("sql")
    sq.add_argument("--limit", type=int, default=100)
    sq.set_defaults(fn=cmd_sql)

    dt = sub.add_parser("dot", help="DOT subgraph export around seed entities")
    dt.add_argument("--workdir", required=True)
    dt.add_argument("arg", help="entity name substring (seed match)")
    dt.add_argument("--hops", type=int, default=2)
    dt.add_argument("--limit", type=int, default=200)
    dt.set_defaults(fn=cmd_dot)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
