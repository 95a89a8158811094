"""Stages 4+5 — dictionary build and the entity-linking priority cascade.

Dictionary (stage 4, analog of the reference pre-scan ``python.py:385-406``
building ``name -> [defining file paths]``): every mention surface is matched
against the *defined* canonical surfaces with a deterministic token rule
(vocab.alias_matches_canonical), expressed as a blocked join (block key:
the alias's last token must equal some canonical token) + JVM higher-order
function verification (forall/exists — no Python).

Linking (stage 5, analog of the call-resolution cascade
``graph_builder.py:262-300``):

    tier "unique"   — single candidate                       (:287-288)
    tier "type"     — predicate-slot type filter singles one (:275-279)
    tier "context"  — same-document co-mention singles one   (:285-286)
    tier "fallback" — min entity_id                          (:296-300)

implemented as one ``F.when`` cascade over array columns, after a left join
against the (broadcastable) dictionary and the per-document entity set.
The per-document set is the two-pass barrier of the reference (all docs'
unambiguous mentions are aggregated before any ambiguous mention resolves —
a shuffle boundary, not a code barrier; SURVEY.md L5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .canon import norm_expr


def _alias_tokens(col):
    """tokens of the normalized surface with trailing '.' stripped (initials)."""
    return F.transform(
        F.split(norm_expr(col), " "), lambda t: F.regexp_replace(t, r"\.$", "")
    )


def build_dictionary(canon: DataFrame) -> DataFrame:
    """canon(surface, etype, label, entity_id) ->
    dictionary(surface, candidates: array<struct<entity_id, etype>>) for every
    surface *reachable* by the matching rule from some mention; the join side
    is produced lazily in link-time instead — here we return the exploded
    canonical token table to join mentions against.

    Output: canon_tokens(entity_id, etype, c_tokens, tok) — one row per
    (canonical variant, token); the mention join blocks on tok.
    """
    toks = F.split(F.col("surface"), " ")  # canon surfaces are pre-normalized
    return (
        canon.select(
            "entity_id",
            "etype",
            toks.alias("c_tokens"),
        )
        .select("entity_id", "etype", "c_tokens", F.explode("c_tokens").alias("tok"))
    )


def surface_candidates(mention_surfaces: DataFrame, canon_tokens: DataFrame) -> DataFrame:
    """mention_surfaces(surface) x canon_tokens -> (surface, candidates).

    candidates is sorted by entity_id (struct sort) so every downstream
    min/first is deterministic. The dictionary is small relative to the
    corpus -> broadcast; at open-web scale this becomes a shuffle hash join
    on the block token (AQE decides).
    """
    m = mention_surfaces.select(
        "surface",
        _alias_tokens(F.col("surface")).alias("a_tokens"),
    ).withColumn("last_tok", F.element_at("a_tokens", -1))

    joined = m.join(
        F.broadcast(canon_tokens), on=m["last_tok"] == canon_tokens["tok"]
    )
    ok = (
        (F.size("a_tokens") <= F.size("c_tokens"))
        & F.forall(
            "a_tokens",
            lambda a: F.exists(
                "c_tokens",
                lambda c: (c == a) | ((F.length(a) <= 2) & c.startswith(a)),
            ),
        )
    )
    return (
        joined.where(ok)
        .select("surface", "entity_id", "etype")
        .distinct()
        .groupBy("surface")
        .agg(
            F.sort_array(
                F.collect_set(F.struct(F.col("entity_id"), F.col("etype")))
            ).alias("candidates")
        )
    )


def mentions_long(triples: DataFrame, defs: DataFrame) -> DataFrame:
    """Long-format mention table: one row per (url, sent_id, role, surface,
    slot_types). Roles: subj / obj (triple slots), def (definitional)."""
    subj = triples.select(
        "url", "sent_id", F.lit("subj").alias("role"),
        F.col("subj_surface").alias("surface"), F.col("subj_types").alias("slot_types"),
    )
    obj = triples.select(
        "url", "sent_id", F.lit("obj").alias("role"),
        F.col("obj_surface").alias("surface"), F.col("obj_types").alias("slot_types"),
    )
    d = defs.select(
        "url", "sent_id", F.lit("def").alias("role"),
        F.col("surface"), F.lit(None).cast("array<string>").alias("slot_types"),
    )
    return subj.unionByName(obj).unionByName(d)


def link_mentions(mentions: DataFrame, canon_tokens: DataFrame) -> DataFrame:
    """mentions(url, sent_id, role, surface, slot_types) ->
    + (entity_id, tier) columns. Two-pass:

      pass 1: per-doc set of unambiguous entity ids (|candidates| == 1),
      pass 2: the when-cascade per mention.
    """
    m = mentions.withColumn("surface_n", norm_expr(F.col("surface")))
    dict_df = surface_candidates(
        m.select(F.col("surface_n").alias("surface")).distinct(), canon_tokens
    )
    m = m.join(
        F.broadcast(dict_df).withColumnRenamed("surface", "surface_n"),
        on="surface_n",
        how="left",
    ).withColumn("candidates", F.coalesce("candidates", F.array()))

    # pass-1 doc context as a WINDOW, not groupBy+self-join: the old shape
    # computed `m` twice (once per branch — each re-reading triples/defs and
    # re-running the dict join) and paid two shuffles (agg + join-back). The
    # window needs ONE url-hash exchange and one pass; collect_list skips
    # the nulls the `when` leaves on ambiguous mentions, so the distinct set
    # equals the old collect_set exactly (downstream only tests membership).
    from pyspark.sql.window import Window

    w = Window.partitionBy("url")
    m = m.withColumn(
        "doc_ents",
        F.array_distinct(
            F.collect_list(
                F.when(
                    F.size("candidates") == 1,
                    F.col("candidates")[0]["entity_id"],
                )
            ).over(w)
        ),
    )

    cands = F.col("candidates")
    typed = F.when(
        F.col("slot_types").isNotNull(),
        F.filter(cands, lambda c: F.array_contains("slot_types", c["etype"])),
    ).otherwise(F.array())
    eff = F.when(F.size(typed) > 0, typed).otherwise(cands)
    local = F.filter(eff, lambda c: F.array_contains("doc_ents", c["entity_id"]))

    resolved = (
        F.when(F.size(cands) == 0, F.lit(None).cast("string"))
        .when(F.size(cands) == 1, cands[0]["entity_id"])
        .when(F.size(typed) == 1, typed[0]["entity_id"])
        .when(F.size(local) == 1, local[0]["entity_id"])
        .otherwise(F.array_min(F.transform(eff, lambda c: c["entity_id"])))
    )
    tier = (
        F.when(F.size(cands) == 0, F.lit("unlinked"))
        .when(F.size(cands) == 1, F.lit("unique"))
        .when(F.size(typed) == 1, F.lit("type"))
        .when(F.size(local) == 1, F.lit("context"))
        .otherwise(F.lit("fallback"))
    )
    return m.select(
        "url", "sent_id", "role", "surface",
        resolved.alias("entity_id"), tier.alias("tier"),
    )
