"""End-to-end pipeline runner with per-stage checkpoints, lineage, and resume.

The reference tracks jobs in memory and loses them on restart (reference
``core/jobs.py:65-133``; ``server.py:713`` "jobs lost on restart"). The north
rule upgrades this to idempotent resume: every stage writes its output as
Parquet plus a ``manifest.json`` (stage name, input fingerprint, row count,
per-partition lineage rows, wall ms). A re-run skips any stage whose manifest
exists and whose input fingerprint matches — kill the job between stages and
rerun: identical result, no recompute of committed stages
(tests/test_resume.py).

Layout (the "Iceberg-snapshot" seam of SURVEY.md §7.3 — same contract, plain
Parquet + manifests since no Iceberg jars ship in this sandbox; swap TableIO
to Iceberg MERGE/snapshots on a real cluster):

    <workdir>/<stage>/data/...parquet
    <workdir>/<stage>/lineage/...parquet   (partition_id, n_rows)
    <workdir>/<stage>/manifest.json

Stage boundaries repartition by xxhash64(url) so partition->content mapping
is stable across runs and cluster sizes (north rule: per-partition lineage
rows are meaningful and resume is deterministic).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..extract import EXTRACTOR_VERSION, extract_stage
from .canon import canonicalize_entities
from .linking import build_dictionary, link_mentions, mentions_long
from .materialize import edges_from_occurrences, materialize_graph
from .segment import segment_stage
from ..sources import read_pages
from .triples import defs_stage, links_stage, patterns_df, triples_stage

STAGES = [
    "docs", "sentences", "triples", "defs", "links", "canon", "linked",
    "nodes", "edges", "edge_occurrences",
]

# Version of the PERSISTED stage layout (schemas + winner semantics), folded
# into every workdir fingerprint. Bump whenever a stage's written schema or
# its row-selection rule changes (e.g. round 2 added docs.snap_md5 and moved
# the snapshot tie-break to md5(html)) so a workdir committed by older code
# rebuilds instead of being resumed into an AnalysisException or silently
# serving rows chosen under the old rule. EXTRACTOR_VERSION covers only the
# html->text function; this covers everything downstream of it.
# v3: edge_occurrences provenance table added
# v4: sentences stage carries the page lang tag (per-language extraction)
PIPELINE_LAYOUT_VERSION = 4


# stages always committed, even under checkpoint="minimal": the expensive
# Python-extraction output, the linked mention table, and the graph itself.
_MINIMAL_COMMITS = frozenset({"docs", "linked", "nodes", "edges", "edge_occurrences"})


class PipelineRunner:
    def __init__(
        self,
        spark: SparkSession,
        pages_path: str,
        workdir: str,
        n_partitions: int | None = None,
        checkpoint: str = "all",
    ) -> None:
        """checkpoint: "all" commits every stage (finest resume granularity,
        the production default per the north rule) — "minimal" commits only
        docs/linked/nodes/edges and FUSES the narrow JVM stages (segment,
        triple/def/link extraction, canon) into their consumers' plans,
        roughly halving the job count and write barriers. Resume still works
        from each committed snapshot, just at coarser granularity.
        run_incremental requires an "all" build (it merges per-stage data)."""
        assert checkpoint in ("all", "minimal")
        self.spark = spark
        self.pages_path = pages_path
        self.workdir = workdir
        self.n_partitions = n_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        self.checkpoint = checkpoint
        self.metrics: dict[str, dict] = {}
        # delta signatures folded in by an in-flight run_incremental but not
        # yet durably recorded in _ingested.json — the fingerprint includes
        # them so manifests are written delta-inclusive, while the on-disk
        # record lands only after EVERY stage committed (crash anywhere in
        # between -> retry redoes the merge, which _swap_write tolerates;
        # recording first would silently drop the delta on crash).
        # A durable copy lives in _pending.json from the first directory
        # swap until _record_ingested: a crash inside that window otherwise
        # leaves manifests carrying a fingerprint no fresh runner can
        # reproduce, and a plain run() would silently rebuild from the BASE
        # pages — resurrecting deleted urls / dropping the delta.
        self._pending_sigs: list[str] = []
        self._heal_swaps()
        pend = self._pending()
        if pend:
            self._pending_sigs = [pend["sig"]]

    # -- checkpoint plumbing --------------------------------------------------
    def _dir(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    @staticmethod
    def _path_sig(path: str) -> str:
        try:
            if os.path.isdir(path):  # sharded corpus dir: fold every file in
                parts = sorted(os.listdir(path))
                stats = [os.stat(os.path.join(path, p)) for p in parts]
                tot = sum(s.st_size for s in stats)
                mt = max(
                    [os.stat(path).st_mtime_ns] + [s.st_mtime_ns for s in stats]
                )
                return f"{path}:{len(parts)}:{tot}:{mt}"
            stat = os.stat(path)
            return f"{path}:{stat.st_mtime_ns}:{stat.st_size}"
        except OSError:
            return path

    def _ingested(self) -> list[str]:
        """Signatures of delta snapshots already folded in via incremental."""
        p = os.path.join(self.workdir, "_ingested.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return []

    @staticmethod
    def _write_json_atomic(path: str, obj) -> None:
        """Crash-safe JSON write: a truncated record file would brick every
        later runner (they read these in __init__ / preconditions)."""
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, path)

    def _record_ingested(self, sig: str) -> None:
        sigs = self._ingested() + [sig]
        os.makedirs(self.workdir, exist_ok=True)
        self._write_json_atomic(
            os.path.join(self.workdir, "_ingested.json"), sigs
        )

    # -- in-flight mutation record (crash-safe retry) -------------------------
    def _pending_path(self) -> str:
        return os.path.join(self.workdir, "_pending.json")

    def _pending(self) -> dict | None:
        p = self._pending_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None

    def _begin_mutation(self, base_sig: str, kind: str, arg: str) -> str:
        """Open (or resume) a mutation. Returns the positional signature:
        ``base@<chain position>`` — unique per APPLICATION, so re-running the
        same mutation after an interleaved ingest re-applies instead of
        silently no-opping, while an exact crash-retry reuses the recorded
        pending signature and redoes the (idempotent) swaps."""
        pend = self._pending()
        if pend:
            if pend["base_sig"] != base_sig:
                raise RuntimeError(
                    f"an interrupted {pend['kind']} mutation "
                    f"({pend['arg']!r}) is pending in {self.workdir}; re-run "
                    "it to completion before starting a different mutation"
                )
            self._pending_sigs = [pend["sig"]]
            return pend["sig"]
        sig = f"{base_sig}@{len(self._ingested())}"
        os.makedirs(self.workdir, exist_ok=True)
        self._write_json_atomic(
            self._pending_path(),
            {"sig": sig, "base_sig": base_sig, "kind": kind, "arg": arg},
        )
        self._pending_sigs = [sig]
        return sig

    def _require_no_other_pending(self, base_sig: str) -> None:
        """Raise the accurate cross-mutation error when a DIFFERENT mutation
        is pending — before any precondition that would otherwise misfire
        (an interrupted mutation legitimately leaves mixed manifests, so
        the 'needs a base build' check would give the wrong diagnosis AND
        the wrong remedy)."""
        pend = self._pending()
        if pend is not None and pend["base_sig"] != base_sig:
            raise RuntimeError(
                f"an interrupted {pend['kind']} mutation "
                f"({pend['arg']!r}) is pending in {self.workdir}; re-run "
                "it to completion before starting a different mutation"
            )

    def _finish_mutation(self, sig: str) -> None:
        self._record_ingested(sig)
        os.remove(self._pending_path())
        self._pending_sigs = []

    def _applied_last(self, base_sig: str) -> bool:
        """True iff this mutation is the MOST RECENT durably-recorded one —
        the only case where re-running it is a guaranteed no-op (an
        interleaved ingest may have re-added urls a delete matched, or
        deleted urls a delta carried)."""
        ing = self._ingested()
        return bool(ing) and ing[-1].rsplit("@", 1)[0] == base_sig

    def _fingerprint(self) -> str:
        """Input fingerprint: pages path + mtime-ish + extractor version +
        pipeline layout version + every ingested delta snapshot. On Iceberg
        this is the input snapshot id chain."""
        base = (
            f"v{EXTRACTOR_VERSION}.L{PIPELINE_LAYOUT_VERSION}:"
            f"{self._path_sig(self.pages_path)}"
        )
        deltas = self._ingested() + self._pending_sigs
        return base + ("+" + "+".join(deltas) if deltas else "")

    def _committed(self, stage: str) -> bool:
        mpath = os.path.join(self._dir(stage), "manifest.json")
        if not os.path.exists(mpath):
            return False
        with open(mpath) as f:
            m = json.load(f)
        return m.get("input_fingerprint") == self._fingerprint()

    # Layout sort keys per stage: sortWithinPartitions before the write so
    # parquet row-group min/max statistics actually prune point lookups
    # (graph queries filter on node_id/subj_id; an unsorted row group spans
    # the whole key range and prunes nothing). A narrow in-partition sort,
    # no extra shuffle — at 100 TB this is the poor-man's Z-order.
    _LAYOUT_SORT = {
        "nodes": ["node_id"],
        "edges": ["subj_id", "pred", "obj_id"],
        "edge_occurrences": ["subj_id", "pred", "obj_id"],
    }

    def _commit(self, stage: str, df: DataFrame, by_url: bool = True) -> DataFrame:
        """Write stage output + lineage + manifest; return the re-read frame
        (so downstream lineage starts from the committed files)."""
        t0 = time.time()
        d = self._dir(stage)
        out = os.path.join(d, "data")
        if by_url and "url" in df.columns:
            df = df.repartition(self.n_partitions, F.xxhash64("url"))
        if stage in self._LAYOUT_SORT:
            df = df.sortWithinPartitions(*self._LAYOUT_SORT[stage])
        df.write.mode("overwrite").parquet(out)
        committed = self.spark.read.parquet(out)
        n = self._write_lineage(d)
        wall_ms = int((time.time() - t0) * 1000)
        manifest = {
            "stage": stage,
            "input_fingerprint": self._fingerprint(),
            "n_rows": n,
            "wall_ms": wall_ms,
            "extractor_version": EXTRACTOR_VERSION,
        }
        with open(os.path.join(d, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        self.metrics[stage] = manifest
        return committed

    def _write_lineage(self, stage_dir: str) -> int:
        """Per-partition lineage rows (partition_id, n_rows) from the parquet
        FOOTERS of the just-written files — driver-side metadata reads, zero
        Spark jobs (the old groupBy(input_file_name) cost a full re-scan +
        shuffle per stage; at 100 TB footers are the only sane source).
        Returns the total row count."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        data_dir = os.path.join(stage_dir, "data")
        parts = sorted(
            f for f in os.listdir(data_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        import hashlib
        import re

        ids, counts = [], []
        for fname in parts:
            meta = pq.ParquetFile(os.path.join(data_dir, fname)).metadata
            # stable partition id: the partition index encoded in Spark's
            # part-00017-<uuid> naming — survives re-listing order. Files
            # from other committers / compaction don't match the pattern;
            # fall back to a stable filename hash instead of failing the
            # whole stage commit.
            m = re.match(r"part-(\d+)-", fname)
            if m:
                idx = int(m.group(1))
            else:
                idx = int.from_bytes(
                    hashlib.md5(fname.encode()).digest()[:8], "big"
                ) >> 1
            ids.append(idx)
            counts.append(meta.num_rows)
        lineage_dir = os.path.join(stage_dir, "lineage")
        os.makedirs(lineage_dir, exist_ok=True)
        for old in os.listdir(lineage_dir):
            os.remove(os.path.join(lineage_dir, old))
        pq.write_table(
            pa.table({
                "partition_id": pa.array(ids, pa.int64()),
                "n_rows": pa.array(counts, pa.int64()),
            }),
            os.path.join(lineage_dir, "lineage.parquet"),
        )
        return sum(counts)

    def _load(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._dir(stage), "data"))

    def _stage(self, stage: str, build) -> DataFrame:
        if self._committed(stage):
            self.metrics[stage] = {"stage": stage, "resumed": True}
            return self._load(stage)
        if self.checkpoint == "minimal" and stage not in _MINIMAL_COMMITS:
            # fused: no parquet commit / manifest / url-hash shuffle. The lazy
            # localCheckpoint materializes the stage ONCE on first use (most
            # fused stages feed two consumers) without a commit barrier.
            self.metrics[stage] = {"stage": stage, "fused": True}
            return build().localCheckpoint(eager=False)
        return self._commit(stage, build())

    # -- the pipeline ----------------------------------------------------------
    # Snapshot winner rule, shared by EVERY path that picks one snapshot per
    # url (full docs build, full links build, incremental delta fold):
    # latest warc_ts wins; ties break on md5(html) descending. One rule means
    # incremental == full rebuild for any dup/tie layout (round-1 used
    # md5(text_extracted) in one path and md5(html) in another, so equal-ts
    # snapshots could diverge between the two paths).
    @staticmethod
    def _winner_order():
        return [F.col("warc_ts").desc(), F.col("snap_md5").desc()]

    @staticmethod
    def _dup_urls(pages: DataFrame) -> DataFrame:
        """urls with >1 snapshot — a pruned url-only scan (columnar, no html).
        If a crawl has a LARGE dup fraction this outgrows the broadcast —
        swap the hint below for a shuffle join; rows shuffled are still only
        the dup subset."""
        return (
            pages.groupBy("url")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > 1)
            .select("url")
        )

    def run(self) -> dict[str, DataFrame]:
        pend = self._pending()
        if pend:
            # manifests may carry the pending-inclusive fingerprint; a plain
            # run() would see a mismatch and silently rebuild every stage
            # from the BASE pages — resurrecting deleted urls / dropping the
            # delta. Force the caller to complete the mutation instead.
            raise RuntimeError(
                f"interrupted {pend['kind']} mutation ({pend['arg']!r}) is "
                f"pending in {self.workdir}; re-run it to completion "
                "(retry is idempotent) before a plain run()"
            )
        spark = self.spark
        pages = read_pages(spark, self.pages_path)

        def build_docs() -> DataFrame:
            # EXTRACT FIRST (narrow map over the scan partitions — the raw
            # html blobs never cross a shuffle), then latest-wins dedup that
            # only shuffles rows whose url actually HAS duplicate snapshots:
            #   1. dup_urls from a pruned url-only scan of the raw pages,
            #   2. non-dup rows pass through NARROW (no shuffle at all),
            #   3. dup rows (the tiny recrawled subset) window-dedup with the
            #      shared winner rule; snap_md5 = md5(html) is computed
            #      BEFORE extraction and rides along as a narrow column, so
            #      the window shuffles extracted text + 32 hex chars, never
            #      the html blob.
            # The naive window-over-everything alternative shuffles the whole
            # corpus text (measured: the one flat-cost stage at any core
            # count). snap_md5 is kept in the docs output: the incremental
            # path needs it to resolve equal-warc_ts delta-vs-base ties with
            # the same rule.
            dup_urls = self._dup_urls(pages)
            p = pages.withColumn("snap_md5", F.md5("html"))
            keep = ("url", "warc_ts", "lang", "snap_md5")
            # split the RAW pages on the broadcast so each page is extracted
            # exactly once (splitting after extraction would run the Python
            # stage twice over the corpus)
            no_dup = extract_stage(
                p.join(F.broadcast(dup_urls), "url", "left_anti"), keep=keep
            )
            w = Window.partitionBy("url").orderBy(*self._winner_order())
            dup_latest = (
                extract_stage(
                    p.join(F.broadcast(dup_urls), "url", "left_semi"), keep=keep
                )
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
            return no_dup.unionByName(dup_latest).select(
                "url", "warc_ts", "lang", "snap_md5", "text_extracted"
            )

        def build_links() -> DataFrame:
            # Links must come from the SAME winning snapshot as docs (a url
            # whose snapshots have different outlinks would otherwise give an
            # incremental != full divergence). Winner keys are computed from
            # a NARROW projection (html is read to hash but pruned before the
            # window shuffle); the raw winner rows are then recovered with a
            # broadcast semi-join, so html itself never crosses a shuffle.
            lp = read_pages(spark, self.pages_path)
            dup_urls = self._dup_urls(lp)
            no_dup = lp.join(F.broadcast(dup_urls), "url", "left_anti").select(
                "url", "html"
            )
            w = Window.partitionBy("url").orderBy(*self._winner_order())
            win_keys = (
                lp.join(F.broadcast(dup_urls), "url", "left_semi")
                .select("url", "warc_ts", F.md5("html").alias("snap_md5"))
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .select("url", "warc_ts", "snap_md5")
            )
            dup_win = (
                lp.join(F.broadcast(dup_urls), "url", "left_semi")
                .withColumn("snap_md5", F.md5("html"))
                .join(
                    F.broadcast(win_keys),
                    on=["url", "warc_ts", "snap_md5"],
                    how="left_semi",
                )
                .select("url", "html")
            )
            # links_stage ends in .distinct(), which absorbs the byte-identical
            # duplicate-row edge case the key join cannot separate.
            return links_stage(no_dup.unionByName(dup_win))

        docs = self._stage("docs", build_docs)
        sentences = self._stage("sentences", lambda: segment_stage(docs))
        pats = patterns_df(spark)
        triples = self._stage("triples", lambda: triples_stage(sentences, pats))
        defs = self._stage("defs", lambda: defs_stage(sentences))
        links = self._stage("links", build_links)
        canon = self._stage("canon", lambda: canonicalize_entities(defs))
        linked = self._stage(
            "linked",
            lambda: link_mentions(mentions_long(triples, defs), build_dictionary(canon)),
        )

        graph_stages = ("nodes", "edges", "edge_occurrences")
        if all(self._committed(s) for s in graph_stages):
            nodes, edges, occ = (self._load(s) for s in graph_stages)
            for s in graph_stages:
                self.metrics[s] = {"stage": s, "resumed": True}
        else:
            nodes, edges, occ = materialize_graph(
                docs, triples, linked, canon, links
            )
            nodes = self._commit("nodes", nodes, by_url=False)
            # occurrences first: edges is its rollup, derived from the
            # committed parquet so the resolution joins run exactly once
            occ = self._commit("edge_occurrences", occ, by_url=False)
            edges = self._commit("edges", edges_from_occurrences(occ), by_url=False)

        return {
            "docs": docs, "sentences": sentences, "triples": triples,
            "defs": defs, "links": links, "canon": canon, "linked": linked,
            "nodes": nodes, "edges": edges, "edge_occurrences": occ,
        }


    # -- incremental (W3 analog) ----------------------------------------------
    def _heal_swaps(self) -> None:
        """Repair a crash inside _swap_write's rename window (runs in
        __init__, before any stage is read). ``data_old`` existing means a
        swap was in flight: if ``data`` is also present the swap completed
        and only the cleanup was lost (drop the backup); if ``data`` is
        missing the crash hit between the two renames (restore the backup —
        the retry recomputes the merge from it idempotently)."""
        if not os.path.isdir(self.workdir):
            return
        for stage in os.listdir(self.workdir):
            d = os.path.join(self.workdir, stage)
            bak = os.path.join(d, "data_old")
            if not os.path.isdir(bak):
                continue
            data = os.path.join(d, "data")
            if os.path.isdir(data):
                shutil.rmtree(bak)
            else:
                os.rename(bak, data)

    def _swap_write(self, stage: str, df: DataFrame) -> None:
        """Replace a committed stage's data with df (which may READ the old
        files — writing the tmp dir materializes it fully first, so the
        directory swap is safe). The swap itself is two atomic renames with
        the delete LAST: a crash at any point leaves either the old or the
        new data recoverable (`_heal_swaps`), never a partially-deleted
        directory a retry would silently commit as truth. Iceberg
        equivalent: MERGE INTO / snapshot replace."""
        d = self._dir(stage)
        tmp = os.path.join(d, "data_new")
        if "url" in df.columns:
            df = df.repartition(self.n_partitions, F.xxhash64("url"))
        df.write.mode("overwrite").parquet(tmp)
        old = os.path.join(d, "data")
        bak = os.path.join(d, "data_old")
        if os.path.isdir(bak):  # leftover backup from a healed crash
            shutil.rmtree(bak)
        os.rename(old, bak)
        os.rename(tmp, old)
        shutil.rmtree(bak)

    def _refresh_manifest(self, stage: str) -> DataFrame:
        """Recompute lineage + manifest for a swapped stage from its files."""
        d = self._dir(stage)
        committed = self.spark.read.parquet(os.path.join(d, "data"))
        manifest = {
            "stage": stage,
            "input_fingerprint": self._fingerprint(),
            "n_rows": self._write_lineage(d),
            "wall_ms": 0,
            "extractor_version": EXTRACTOR_VERSION,
            "incremental": True,
        }
        with open(os.path.join(d, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        self.metrics[stage] = manifest
        return committed

    def run_incremental(self, delta_pages_path: str) -> dict[str, DataFrame]:
        """Fold a delta snapshot of pages into a committed workdir.

        The reference's watcher re-parses the WHOLE repo on any change
        (reference ``core/watcher.py:84-119``); here the O(corpus) extraction
        stages are delta-only — only the url-hash partitions whose urls the
        delta touches are rewritten — and only the cheap global stages
        (dictionary, linking, canonicalization, materialize) recompute, i.e.
        O(delta + graph), not O(corpus). Latest-wins on (url, warc_ts), ties
        to the delta.

        Replay semantics (positional mutation signatures): re-running the
        MOST RECENTLY recorded mutation with nothing after it is a no-op
        resume; replaying an EARLIER delta re-applies it as a new mutation
        (an interleaved delete/ingest may have changed what it affects — a
        bare membership no-op would silently keep stale state). Do not
        replay a full mutation log for recovery; crash recovery is the
        pending-retry path, which resumes exactly the interrupted mutation.
        """
        spark = self.spark
        delta_base = f"v{EXTRACTOR_VERSION}:{self._path_sig(delta_pages_path)}"
        self._require_no_other_pending(delta_base)
        pend = self._pending()
        retrying = pend is not None and pend.get("base_sig") == delta_base
        if not retrying and self._applied_last(delta_base):
            # re-run of the LATEST recorded mutation with nothing after it:
            # guaranteed no-op, resume the committed build. If other
            # mutations landed since, the delta is re-applied instead.
            return self.run()
        narrow = ("docs", "sentences", "triples", "defs", "links")
        if not retrying:
            # fresh mutation: narrow manifests must match the ingested-only
            # fingerprint. On a crash retry they are legitimately mixed
            # (some already delta-inclusive) and the swaps below are
            # idempotent, so the precondition is skipped.
            self._pending_sigs = []
            if not all(self._committed(s) for s in narrow):
                raise RuntimeError(
                    "run_incremental() needs a base build with "
                    "checkpoint='all' (per-stage snapshots to merge into); "
                    "run() must commit first"
                )
        delta_sig = self._begin_mutation(
            delta_base, "incremental", delta_pages_path
        )
        # the merge plans below read the CURRENT committed files; fingerprint
        # only matters again when manifests are refreshed post-swap
        self._pending_sigs = []

        delta_pages = read_pages(spark, delta_pages_path).withColumn(
            "snap_md5", F.md5("html")
        )
        w = Window.partitionBy("url").orderBy(*self._winner_order())
        delta_latest = (
            delta_pages.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        delta_docs = extract_stage(
            delta_latest, keep=("url", "warc_ts", "lang", "snap_md5")
        ).select("url", "warc_ts", "lang", "snap_md5", "text_extracted")

        # decide winners with the SAME rule as a full rebuild: delta wins iff
        # the base row is absent, strictly older, or equal-warc_ts with a
        # snap_md5 that does not outrank the delta's (on exact equality the
        # content is identical, so keeping the delta row changes nothing).
        # localCheckpoint BEFORE any directory swap — these plans read the
        # committed docs files, which the swaps below delete.
        old_docs = self._load("docs")
        base_key = old_docs.select(
            "url",
            F.col("warc_ts").alias("_base_ts"),
            F.col("snap_md5").alias("_base_md5"),
        )
        delta_win = (
            delta_docs.join(base_key, on="url", how="left")
            .where(
                F.col("_base_ts").isNull()
                | (F.col("warc_ts") > F.col("_base_ts"))
                | (
                    (F.col("warc_ts") == F.col("_base_ts"))
                    & (F.col("snap_md5") >= F.col("_base_md5"))
                )
            )
            .drop("_base_ts", "_base_md5")
            .localCheckpoint(eager=True)
        )
        win_urls = delta_win.select("url").distinct().localCheckpoint(eager=True)

        # delta-only narrow stages over the winning delta pages
        delta_pages_win = delta_latest.join(win_urls, on="url", how="left_semi")
        delta_sent = segment_stage(delta_win)
        pats = patterns_df(spark)
        new_narrow = {
            "docs": delta_win,
            "sentences": delta_sent,
            "triples": triples_stage(delta_sent, pats),
            "defs": defs_stage(delta_sent),
            "links": links_stage(delta_pages_win.select("url", "html")),
        }
        for stage, delta_df in new_narrow.items():
            old = self._load(stage)
            merged = old.join(win_urls, on="url", how="left_anti").unionByName(
                delta_df.select(*old.columns)
            )
            self._swap_write(stage, merged)
            self.spark.catalog.refreshByPath(os.path.join(self._dir(stage), "data"))

        # fingerprint advances (in memory) to include this delta; manifests
        # are rewritten delta-inclusive. The durable _ingested.json record is
        # the LAST step below; _pending.json covers the window in between.
        self._pending_sigs = [delta_sig]
        for stage in new_narrow:
            self._refresh_manifest(stage)

        # global stages recompute from the merged narrow outputs; only after
        # every stage (narrow + global) is committed with the delta-inclusive
        # fingerprint is the delta durably marked as folded in
        out = self._recompute_globals()
        self._finish_mutation(delta_sig)
        return out

    def _recompute_globals(self) -> dict[str, DataFrame]:
        """Rebuild the global stages (dictionary/canon, linking, graph) from
        the committed narrow stages — the shared tail of every mutation path
        (incremental fold, deletion). O(graph), not O(corpus)."""
        docs = self._load("docs")
        triples = self._load("triples")
        defs = self._load("defs")
        links = self._load("links")
        canon = self._commit("canon", canonicalize_entities(defs))
        linked = self._commit(
            "linked", link_mentions(mentions_long(triples, defs), build_dictionary(canon))
        )
        nodes, edges, occ = materialize_graph(docs, triples, linked, canon, links)
        nodes = self._commit("nodes", nodes, by_url=False)
        occ = self._commit("edge_occurrences", occ, by_url=False)
        edges = self._commit("edges", edges_from_occurrences(occ), by_url=False)
        return {
            "docs": docs, "sentences": self._load("sentences"), "triples": triples,
            "defs": defs, "links": links, "canon": canon, "linked": linked,
            "nodes": nodes, "edges": edges, "edge_occurrences": occ,
        }

    def run_delete(self, url_prefix: str) -> dict[str, DataFrame]:
        """Delete every page whose url starts with ``url_prefix`` from a
        committed build (S6 whole-repo delete / S7 single-file delete +
        empty-dir GC, reference ``graph_builder.py:407-441`` DETACH DELETE):
        narrow stages drop the matching urls partition-locally (filter +
        swap — on Iceberg this is ``DELETE FROM ... WHERE url LIKE ...`` as
        one snapshot commit), then the global stages recompute, which
        performs the GC for free: entities defined only on deleted pages and
        domains linked only from them simply don't re-materialize (the
        reference needs an explicit childless-Directory cleanup query; here
        the graph is rebuilt from the surviving facts).

        Recorded in the fingerprint chain like a delta, so resume and
        idempotent re-delete work identically to run_incremental.
        """
        if not url_prefix:
            raise ValueError("url_prefix must be non-empty")
        del_base = f"delete:{url_prefix}"
        self._require_no_other_pending(del_base)
        pend = self._pending()
        retrying = pend is not None and pend.get("base_sig") == del_base
        if not retrying and self._applied_last(del_base):
            # latest recorded mutation IS this delete and nothing landed
            # after it: guaranteed no-op. An interleaved incremental may
            # have re-added matching urls, so any other ordering re-applies.
            return self.run()
        narrow = ("docs", "sentences", "triples", "defs", "links")
        if not retrying:
            self._pending_sigs = []
            if not all(self._committed(s) for s in narrow):
                raise RuntimeError(
                    "run_delete() needs a base build with checkpoint='all' "
                    "(per-stage snapshots to rewrite); run() must commit first"
                )
        del_sig = self._begin_mutation(del_base, "delete", url_prefix)
        self._pending_sigs = []
        for stage in narrow:
            old = self._load(stage)
            kept = old.where(~F.col("url").startswith(url_prefix))
            self._swap_write(stage, kept)
            self.spark.catalog.refreshByPath(
                os.path.join(self._dir(stage), "data")
            )
        self._pending_sigs = [del_sig]
        for stage in narrow:
            self._refresh_manifest(stage)
        out = self._recompute_globals()
        self._finish_mutation(del_sig)
        return out


def run_pipeline(
    spark: SparkSession, pages_path: str, workdir: str, **kw
) -> dict[str, DataFrame]:
    return PipelineRunner(spark, pages_path, workdir, **kw).run()


def run_incremental(
    spark: SparkSession, pages_path: str, delta_path: str, workdir: str, **kw
) -> dict[str, DataFrame]:
    return PipelineRunner(spark, pages_path, workdir, **kw).run_incremental(delta_path)
