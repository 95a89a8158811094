"""Deterministic (seed-42) synthetic Common-Crawl-style corpus generator.

Produces the ``pages(url, warc_ts, html:binary, text, lang)`` input table of
`input_hint`, plus golden fixtures (FIXTURES.md §3) computed from the same
closed vocabulary, mirroring the reference's golden relationship corpus
(reference ``tests/test_graph_indexing.py:11-358``: ~400 pinned facts over a
known sample tree, including documented known-miss skips).

Pure Python + pyarrow (no Spark needed to generate). Everything derives from
``random.Random(42)`` — byte-stable across runs and machines.
"""

from __future__ import annotations

import hashlib
import html as html_mod
import json
import os
import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

from .vocab import (
    ENTITIES,
    PREDICATES,
    alias_matches_canonical,
    def_sentence,
    entity_cluster_label,
    entity_id_of,
    norm_surface,
    pred_phrase,
    resolve_mention,
)

SCALES = {
    "smoke": 200,
    "correctness": 5000,
    "bench": 100_000,
    "bench_heavy": 50_000,
    "bench_heavy_xl": 150_000,
    "bench_heavy_xxl": 400_000,
    "bench_skew": 100_000,
    "bench_skew_ctl": 100_000,
}
# extra per-page filler sentences per scale (realistic page weight for the
# throughput/scaling benches; goldens unaffected — see generate_corpus)
SCALE_FILLERS = {
    "smoke": 0,
    "correctness": 0,
    "bench": 0,
    "bench_heavy": 120,
    "bench_heavy_xl": 120,
    "bench_heavy_xxl": 120,
    "bench_skew": 200,
    "bench_skew_ctl": 200,
}
# hub-entity Zipf boost per scale (default 6.0 — the deliberate acme hub).
# bench_skew turns the boost up to 48 so ~95% of mention draws land on ONE
# entity: the hub surface becomes a single hot key through the link
# cascade's per-surface window, the mention distinct, and the edge rollup —
# the MEASURED-pipeline exercise of the skew machinery (functions/skew.py,
# salted CC) that previously only fixtures touched; longer documents (200
# filler sentences) make the per-page work realistic at the same time.
SCALE_HUB_BOOST = {
    "bench_skew": 48.0,
    # bench_skew_ctl: identical page count + document shape, DEFAULT hub
    # boost — the control leg that isolates skew from document length in
    # the skew-resilience ratio (bench.py pipeline_skew_ratio).
}

DOMAINS = [f"ref{i}.example.org" for i in range(20)]

FILLERS = [
    "The quarterly report shipped on schedule",
    "Markets were quiet for most of the week",
    "The committee adjourned without further comment",
    "Several reviewers praised the methodology",
    "The archive remains open to the public",
    "No further details were released",
    "The conference drew a record audience this year",
    "Editors revised the style guide again",
]

_EPOCH = datetime(2025, 1, 1, 0, 0, 0)


# -- derived vocab tables ----------------------------------------------------
def _entity_index():
    """entity key -> (entity_id, etype, cluster_label, variants, aliases)."""
    out = {}
    for key, etype, variants, aliases in ENTITIES:
        label = entity_cluster_label(variants)
        out[key] = (entity_id_of(label), etype, label, variants, aliases)
    return out

ENT = _entity_index()

# surface -> sorted [(entity_id, etype)] candidate list, via the shared
# matching rule (the "dictionary" the pipeline must reconstruct from corpus).
def _candidates_table():
    surfaces = set()
    for key, etype, variants, aliases in ENTITIES:
        surfaces.update(variants)
        surfaces.update(aliases)
    table = {}
    for s in surfaces:
        cands = set()
        for key, etype, variants, aliases in ENTITIES:
            if any(alias_matches_canonical(s, v) for v in variants):
                cands.add((ENT[key][0], etype))
        table[norm_surface(s)] = sorted(cands)
    return table

CANDS = _candidates_table()


def _zipf_weights(n: int, hub_boost: float = 6.0) -> list[float]:
    w = [1.0 / (i + 1) ** 1.05 for i in range(n)]
    w[0] *= hub_boost  # ENTITIES[0] (acme) is the deliberate hub
    return w


# -- HTML templating ----------------------------------------------------------
_NAV = '<nav><ul><li><a href="/home">Home</a></li><li><a href="/about">About</a></li></ul></nav>'
_FOOT = "<footer><p>© 2025 Example Syndicate. All rights reserved.</p></footer>"
_SCRIPT = '<script>window.__t=Date.now();console.log("boot");</script>'
_STYLE = "<style>body{margin:0;font:14px sans-serif}.x{display:none}</style>"
_ASIDE = "<aside><h3>Related</h3><ul><li>Archive</li><li>Tags</li></ul></aside>"


def _para_html(sentences: list[str], anchors: list[str]) -> str:
    body = " ".join(html_mod.escape(s) for s in sentences)
    for d in anchors:
        body += f' <a href="https://{d}/ref">see {d}</a>'
    return f"<p>{body}</p>"


def _render_html(title: str, para_htmls: list[str], variant: int) -> str:
    paras = "".join(para_htmls)
    t = html_mod.escape(title)
    if variant == 0:
        return (f"<html><head><title>{t}</title>{_STYLE}</head><body>{_NAV}"
                f"<main>{paras}</main>{_FOOT}</body></html>")
    if variant == 1:
        return (f"<html><head><title>{t}</title>{_SCRIPT}</head><body>"
                f'<header><h1>Site {t}</h1></header><div id="content">{paras}</div>'
                f"{_ASIDE}{_FOOT}{_SCRIPT}</body></html>")
    if variant == 2:
        return (f"<html><head><title>{t}</title></head><body>{_NAV}"
                f"<article><section>{paras}</section></article>{_FOOT}</body></html>")
    if variant == 3:
        return f"<html><body><div><div class='wrap'>{paras}</div></div></body></html>"
    return (f"<html><head>{_STYLE}{_SCRIPT}</head><body><!-- render -->{_NAV}"
            f"<template><p>tpl junk</p></template><main>{paras}</main>"
            f"{_ASIDE}{_FOOT}<!-- end --></body></html>")


def _para_text(sentences: list[str], anchors: list[str]) -> str:
    parts = list(sentences) + [f"see {d}" for d in anchors]
    return " ".join(parts)


# -- generation ---------------------------------------------------------------
def generate_corpus(
    out_dir: str,
    n_pages: int,
    seed: int = 42,
    filler_sentences: int = 0,
    hub_boost: float = 6.0,
) -> dict:
    """Generate pages + golden fixtures into out_dir. Returns manifest dict.

    filler_sentences: extra entity-free filler sentences appended to each
    page's last paragraph — sizes pages realistically (~100+ sentences like
    real web pages) for throughput/scaling benchmarks WITHOUT changing any
    golden fact: fillers are drawn from a SEPARATE rng stream and appended
    after sent_id assignment, so the main seed-42 stream (and every golden
    row) is byte-identical to filler_sentences=0.
    """
    rng = random.Random(seed)
    rng_fill = random.Random(seed + 7)
    ent_keys = [e[0] for e in ENTITIES]
    weights = _zipf_weights(len(ent_keys), hub_boost)
    by_type: dict[str, list[int]] = {}
    for i, (_, etype, _, _) in enumerate(ENTITIES):
        by_type.setdefault(etype, []).append(i)

    # queue of canonical variants still needing a definitional sentence
    to_define: list[tuple[str, str]] = []  # (variant_surface, etype)
    for key, etype, variants, _ in ENTITIES:
        for v in variants:
            to_define.append((v, etype))
    rng.shuffle(to_define)

    pages_rows = []
    triples_rows = []
    links_rows = []
    mentions_rows = []

    def pick_entity(types: tuple[str, ...]) -> str:
        idxs = [i for t in types for i in by_type[t]]
        ws = [weights[i] for i in idxs]
        return ent_keys[rng.choices(idxs, weights=ws, k=1)[0]]

    def pick_surface(key: str) -> str:
        _, _, _, variants, aliases = ENT[key]
        pool = variants + aliases
        # 60% canonical variant, 40% alias when aliases exist
        if aliases and rng.random() < 0.4:
            return rng.choice(aliases)
        return rng.choice(variants)

    for i in range(n_pages):
        url = f"https://site{i % 101}.example/p/{i:07d}"
        warc_ts = _EPOCH + timedelta(seconds=37 * i)
        lang = ["en"] * 9 + ["de", "fr", ""]
        lang = lang[i % 12] if i % 12 >= 9 else "en"

        sentences: list[tuple[str, dict | None]] = []  # (text, triple-meta)
        # definitional sentences: drain the queue first, then occasional dups
        n_defs = min(len(to_define), 2) if to_define else (1 if rng.random() < 0.15 else 0)
        for _ in range(n_defs):
            if to_define:
                surf, etype = to_define.pop()
            else:
                key = ent_keys[rng.randrange(len(ent_keys))]
                _, etype, _, variants, _ = ENT[key]
                surf = rng.choice(variants)
            sentences.append((def_sentence(surf, etype, lang), {"kind": "def", "surface": surf}))

        n_triples = rng.randint(1, 4)
        for _ in range(n_triples):
            pred, phrase, styp, otyp = PREDICATES[rng.randrange(len(PREDICATES))]
            skey = pick_entity(styp)
            okey = pick_entity(otyp)
            ssurf, osurf = pick_surface(skey), pick_surface(okey)
            sentences.append((
                f"{ssurf} {pred_phrase(pred, phrase, lang)} {osurf}.",
                {"kind": "triple", "pred": pred, "s": skey, "o": okey,
                 "ss": ssurf, "os": osurf, "styp": styp, "otyp": otyp},
            ))

        for _ in range(rng.randint(0, 3)):
            sentences.append((rng.choice(FILLERS) + ".", None))
        rng.shuffle(sentences)

        # ensure ambiguous mentions are resolvable: if cascade would need
        # context, co-define the true entity in-doc (except a deliberate ~2%
        # of pages left unresolvable -> known-miss rows, reference-style skip)
        allow_miss = rng.random() < 0.02
        extra_defs = []
        defined_here = {m["surface"] for _, m in sentences if m and m["kind"] == "def"}
        for _, meta in list(sentences):
            if not meta or meta["kind"] != "triple":
                continue
            for side, tkey in (("ss", "s"), ("os", "o")):
                surf, key = meta[side], meta[tkey]
                cands = CANDS[norm_surface(surf)]
                types = meta["styp"] if side == "ss" else meta["otyp"]
                typed = [c for c in cands if c[1] in types] or cands
                if len(typed) > 1 and not allow_miss:
                    variants = ENT[key][3]
                    if not (defined_here & set(variants)):
                        v = variants[0]
                        extra_defs.append((def_sentence(v, ENT[key][1], lang),
                                           {"kind": "def", "surface": v}))
                        defined_here.add(v)
        sentences.extend(extra_defs)

        # golden resolution: two-pass, exactly like the pipeline will do.
        doc_entities = set()
        for _, meta in sentences:
            if meta and meta["kind"] == "def":
                cands = CANDS[norm_surface(meta["surface"])]
                if len(cands) == 1:
                    doc_entities.add(cands[0][0])
            elif meta and meta["kind"] == "triple":
                for side in ("ss", "os"):
                    cands = CANDS[norm_surface(meta[side])]
                    if len(cands) == 1:
                        doc_entities.add(cands[0][0])

        n_sent = len(sentences)
        for sent_id, (text, meta) in enumerate(sentences):
            if not meta:
                continue
            if meta["kind"] == "def":
                cands = CANDS[norm_surface(meta["surface"])]
                rid, tier = resolve_mention(cands, None, doc_entities)
                mentions_rows.append((url, sent_id, meta["surface"], rid, tier))
                continue
            srow = {}
            for side, tkey, types in (("ss", "s", meta["styp"]), ("os", "o", meta["otyp"])):
                cands = CANDS[norm_surface(meta[side])]
                rid, tier = resolve_mention(cands, tuple(types), doc_entities)
                true_id = ENT[meta[tkey]][0]
                srow[side] = (rid, tier, true_id)
                mentions_rows.append((url, sent_id, meta[side], rid, tier))
            triples_rows.append({
                "url": url, "sent_id": sent_id,
                "subj_surface": meta["ss"], "pred": meta["pred"], "obj_surface": meta["os"],
                "subj_true": srow["ss"][2], "obj_true": srow["os"][2],
                "subj_resolved": srow["ss"][0], "obj_resolved": srow["os"][0],
                "subj_tier": srow["ss"][1], "obj_tier": srow["os"][1],
                "is_known_miss": (srow["ss"][0] != srow["ss"][2]) or (srow["os"][0] != srow["os"][2]),
            })

        # paragraphs + links
        texts = [t for t, _ in sentences]
        n_para = min(len(texts), rng.randint(1, 3))
        cuts = sorted(rng.sample(range(1, len(texts)), n_para - 1)) if n_para > 1 else []
        paras, prev = [], 0
        for c in cuts + [len(texts)]:
            paras.append(texts[prev:c]); prev = c
        page_domains = rng.sample(DOMAINS, rng.randint(0, 3))
        anchor_per_para = [[] for _ in paras]
        for d in page_domains:
            anchor_per_para[rng.randrange(len(paras))].append(d)
            links_rows.append((url, d))

        if filler_sentences:
            paras[-1] = paras[-1] + [
                f"{rng_fill.choice(FILLERS)} in week {rng_fill.randrange(1000)} of the archive."
                for _ in range(filler_sentences)
            ]

        para_htmls = [_para_html(p, a) for p, a in zip(paras, anchor_per_para)]
        text = "\n".join(_para_text(p, a) for p, a in zip(paras, anchor_per_para))
        html = _render_html(f"page {i}", para_htmls, i % 5)
        pages_rows.append((url, warc_ts, html.encode("utf-8"), text, lang))

    edge_rows, edge_links = _edge_case_rows()
    pages_rows.extend(edge_rows)
    links_rows.extend(edge_links)

    # golden rows for the self-referential edge-case page (the analog of the
    # reference's recursive factorial->factorial call check,
    # tests/test_graph_connections.py:22-26)
    selfref_url = "https://edge.example/selfref"
    acme_id = ENT["acme"][0]
    mentions_rows.append((selfref_url, 0, "Acme Corp", acme_id, "unique"))
    mentions_rows.append((selfref_url, 1, "Acme Corp", acme_id, "unique"))
    triples_rows.append({
        "url": selfref_url, "sent_id": 1,
        "subj_surface": "Acme Corp", "pred": "ACQUIRED", "obj_surface": "Acme Corp",
        "subj_true": acme_id, "obj_true": acme_id,
        "subj_resolved": acme_id, "obj_resolved": acme_id,
        "subj_tier": "unique", "obj_tier": "unique",
        "is_known_miss": False,
    })

    # -- write parquet --------------------------------------------------------
    os.makedirs(out_dir, exist_ok=True)

    def _write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out_dir, name))

    def _write_sharded(name: str, table: pa.Table, rows_per_shard: int = 5000) -> None:
        """Write as a DIRECTORY of shard files (row groups capped too): the
        Common-Crawl shape — many WARC-sized files — and what makes the
        first Spark scan parallel. A single-file corpus with one giant row
        group serializes the whole initial read onto one task."""
        path = os.path.join(out_dir, name)
        if os.path.isdir(path):
            for f in os.listdir(path):
                os.remove(os.path.join(path, f))
        elif os.path.exists(path):
            os.remove(path)
        os.makedirs(path, exist_ok=True)
        n = table.num_rows
        shards = max(1, (n + rows_per_shard - 1) // rows_per_shard)
        for s in range(shards):
            pq.write_table(
                table.slice(s * rows_per_shard, rows_per_shard),
                os.path.join(path, f"part-{s:05d}.parquet"),
                row_group_size=1024,
            )

    _write_sharded("pages.parquet", pa.table({
        "url": pa.array([r[0] for r in pages_rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in pages_rows], pa.timestamp("us")),
        "html": pa.array([r[2] for r in pages_rows], pa.binary()),
        "text": pa.array([r[3] for r in pages_rows], pa.string()),
        "lang": pa.array([r[4] for r in pages_rows], pa.string()),
    }))
    _write("golden_text.parquet", pa.table({
        "url": pa.array([r[0] for r in pages_rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in pages_rows], pa.timestamp("us")),
        "text": pa.array([r[3] for r in pages_rows], pa.string()),
    }))
    _write("golden_triples.parquet", pa.table(
        {k: pa.array([t[k] for t in triples_rows]) for k in (
            triples_rows[0].keys() if triples_rows else
            ["url", "sent_id", "subj_surface", "pred", "obj_surface", "subj_true",
             "obj_true", "subj_resolved", "obj_resolved", "subj_tier", "obj_tier",
             "is_known_miss"])}
    ) if triples_rows else pa.table({}))
    good = [t for t in triples_rows if not t["is_known_miss"]]
    edge_keys = sorted({(t["subj_true"], t["pred"], t["obj_true"]) for t in good})
    _write("golden_edges.parquet", pa.table({
        "subj_id": pa.array([e[0] for e in edge_keys], pa.string()),
        "pred": pa.array([e[1] for e in edge_keys], pa.string()),
        "obj_id": pa.array([e[2] for e in edge_keys], pa.string()),
    }))
    _write("golden_entities.parquet", pa.table({
        "entity_id": pa.array([ENT[k][0] for k, *_ in ENTITIES], pa.string()),
        "etype": pa.array([e[1] for e in ENTITIES], pa.string()),
        "canonical_name": pa.array([ENT[k][2] for k, *_ in ENTITIES], pa.string()),
        "variants": pa.array([e[2] for e in ENTITIES], pa.list_(pa.string())),
        "aliases": pa.array([e[3] for e in ENTITIES], pa.list_(pa.string())),
    }))
    _write("golden_links.parquet", pa.table({
        "url": pa.array([r[0] for r in links_rows], pa.string()),
        "domain": pa.array([r[1] for r in links_rows], pa.string()),
    }))
    _write("golden_mentions.parquet", pa.table({
        "url": pa.array([r[0] for r in mentions_rows], pa.string()),
        "sent_id": pa.array([r[1] for r in mentions_rows], pa.int32()),
        "surface": pa.array([r[2] for r in mentions_rows], pa.string()),
        "entity_id": pa.array([r[3] for r in mentions_rows], pa.string()),
        "tier": pa.array([r[4] for r in mentions_rows], pa.string()),
    }))

    manifest = {
        "seed": seed, "n_pages": len(pages_rows), "n_triples": len(triples_rows),
        "n_known_miss": sum(t["is_known_miss"] for t in triples_rows),
        "n_links": len(links_rows), "n_entities": len(ENTITIES),
        "sha": hashlib.md5(
            "".join(r[0] for r in pages_rows).encode()).hexdigest(),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def _edge_case_rows() -> tuple[list[tuple], list[tuple]]:
    """FIXTURES.md §4 edge cases (analog of reference tests/sample_project/edge_cases/).

    Returns (page rows, expected winner links). The dup-url cases pin the
    snapshot winner rule end-to-end: latest warc_ts wins, equal-warc_ts ties
    break on md5(html) descending — for BOTH the extracted text and the
    outlink edges (docs and links must come from the SAME winning snapshot)."""
    ts = _EPOCH

    def _link_page(body: str, domain: str) -> bytes:
        return (
            f'<html><body><p>{body} <a href="https://{domain}/ref">'
            f"see {domain}</a></p></body></html>"
        ).encode()

    rows = [
        ("https://edge.example/empty", ts, b"", "", "en"),
        ("https://edge.example/boilerplate", ts,
         f"<html><head>{_STYLE}</head><body>{_NAV}{_FOOT}{_SCRIPT}</body></html>".encode(),
         "", "en"),
        ("https://edge.example/malformed", ts,
         b"<html><body><p>Broken markup page <b>bold text</p><div>second line",
         "Broken markup page bold text\nsecond line", "en"),
        ("https://edge.example/nonutf8", ts,
         b"<p>caf\xe9 latte</p>", "caf\ufffd latte", ""),
        ("https://edge.example/selfref", ts,
         b"<html><body><p>Acme Corp is a company. Acme Corp acquired Acme Corp.</p></body></html>",
         "Acme Corp is a company. Acme Corp acquired Acme Corp.", "en"),
        # duplicate url, two snapshots — latest warc_ts wins downstream
        ("https://edge.example/dup", ts,
         b"<html><body><p>Old snapshot body.</p></body></html>", "Old snapshot body.", "en"),
        ("https://edge.example/dup", ts + timedelta(days=1),
         b"<html><body><p>New snapshot body.</p></body></html>", "New snapshot body.", "en"),
        # duplicate url whose snapshots carry DIFFERENT outlinks — only the
        # newest snapshot's links may survive
        ("https://edge.example/duplinks", ts,
         _link_page("Old link body.", "ref1.example.org"),
         "Old link body. see ref1.example.org", "en"),
        ("https://edge.example/duplinks", ts + timedelta(days=1),
         _link_page("New link body.", "ref2.example.org"),
         "New link body. see ref2.example.org", "en"),
    ]
    # equal-warc_ts tie: winner = lexicographically-max md5(html)
    tie_a = _link_page("Tie body alpha.", "ref3.example.org")
    tie_b = _link_page("Tie body beta.", "ref4.example.org")
    rows.append(("https://edge.example/tie", ts, tie_a,
                 "Tie body alpha. see ref3.example.org", "en"))
    rows.append(("https://edge.example/tie", ts, tie_b,
                 "Tie body beta. see ref4.example.org", "en"))
    tie_winner_domain = (
        "ref3.example.org"
        if hashlib.md5(tie_a).hexdigest() > hashlib.md5(tie_b).hexdigest()
        else "ref4.example.org"
    )
    links = [
        ("https://edge.example/duplinks", "ref2.example.org"),
        ("https://edge.example/tie", tie_winner_domain),
    ]
    return rows, links


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=sorted(SCALES), default="smoke")
    ap.add_argument("--out", default=None)
    ap.add_argument("--n", type=int, default=None)
    args = ap.parse_args()
    n = args.n or SCALES[args.scale]
    out = args.out or os.path.join(os.path.dirname(__file__), "..", "..", ".data", args.scale)
    m = generate_corpus(
        os.path.abspath(out),
        n,
        filler_sentences=SCALE_FILLERS.get(args.scale, 0),
        hub_boost=SCALE_HUB_BOOST.get(args.scale, 6.0),
    )
    print(json.dumps(m))


if __name__ == "__main__":
    main()
