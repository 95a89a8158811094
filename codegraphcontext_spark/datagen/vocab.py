"""Closed entity/predicate vocabulary + the deterministic linking semantics.

This module is the single source of truth for:
  * the entity dictionary used by the synthetic corpus generator,
  * the surface-matching rule (alias -> candidate canonical entities), and
  * the priority-cascade mention resolver — the webtext transposition of the
    reference's call-resolution cascade (reference
    ``tools/graph_builder.py:262-300``: inferred-type hit > same-file def >
    globally-unique > import-path disambiguation > first-candidate fallback).

The generator uses these pure functions to compute golden fixtures; the Spark
pipeline re-expresses the same semantics as DataFrame joins + a ``F.when``
cascade. tests/test_linking.py asserts the two agree tier by tier.
"""

from __future__ import annotations

import hashlib

# --------------------------------------------------------------------------
# Entities.  Each entry: (key, type, canonical_variants, aliases)
#   - canonical_variants: spellings that receive *definitional* sentences in
#     the corpus ("X is a company."). Variants of one entity must be merged by
#     the canonicalization stage (MinHash-LSH + connected components) — the
#     fuzzy upgrade of the reference's MERGE-on-unique-key dedup
#     (graph_builder.py:69-75).
#   - aliases: additional surfaces used in mention position only.
# The FIRST entity is the deliberate hub (Zipf head) so hot-key skew is
# exercised (absorbed by map-side partial aggregation + AQE skew joins;
# see pipeline/canon.py docstring).
# --------------------------------------------------------------------------
ENTITIES: list[tuple[str, str, list[str], list[str]]] = [
    ("acme", "org", ["Acme Corp", "Acme Corporation"], ["Acme"]),
    ("acme_labs", "org", ["Acme Laboratories"], []),
    ("hamilton_org", "org", ["Hamilton Devices"], []),
    ("globex", "org", ["Globex Industries", "Globex Industries Inc"], ["Globex"]),
    ("initech", "org", ["Initech Systems"], ["Initech"]),
    ("umbrella", "org", ["Umbrella Holdings"], ["Umbrella"]),
    ("stark", "org", ["Stark Applied Science"], ["Stark Labs"]),
    ("wayne", "org", ["Wayne Enterprises"], []),
    ("tyrell", "org", ["Tyrell Analytics"], ["Tyrell"]),
    ("aperture", "org", ["Aperture Research"], ["Aperture"]),
    ("mercury_org", "org", ["Mercury Logistics"], ["Mercury"]),
    ("ada", "person", ["Ada Lovelace"], ["A. Lovelace", "Lovelace"]),
    ("grace", "person", ["Grace Hopper"], ["G. Hopper", "Hopper"]),
    ("alan", "person", ["Alan Turing"], ["A. Turing", "Turing"]),
    ("george", "person", ["George Washington"], ["G. Washington", "Washington"]),
    ("edsger", "person", ["Edsger Dijkstra"], ["Dijkstra"]),
    ("barbara", "person", ["Barbara Liskov"], ["Liskov"]),
    ("donald", "person", ["Donald Knuth"], ["Knuth"]),
    ("margaret", "person", ["Margaret Hamilton"], ["M. Hamilton", "Hamilton"]),
    ("tim", "person", ["Tim Berners-Lee"], ["Berners-Lee"]),
    ("washington_st", "place", ["Washington State"], ["Washington"]),
    ("zurich", "place", ["Zurich"], []),
    ("london", "place", ["Greater London"], ["London"]),
    ("portland", "place", ["Portland Oregon"], ["Portland"]),
    ("kyoto", "place", ["Kyoto"], []),
    ("oslo", "place", ["Oslo"], []),
    ("mercury_pl", "place", ["Mercury Nevada"], ["Mercury"]),
    ("hamilton_pl", "place", ["Hamilton Ontario"], ["Hamilton"]),
]

TYPE_NOUN = {"org": "company", "person": "person", "place": "place"}
NOUN_TYPE = {v: k for k, v in TYPE_NOUN.items()}

# --------------------------------------------------------------------------
# Predicates: (pred, template_phrase, allowed_subj_types, allowed_obj_types).
# A sentence is "{S} <phrase> {O}." — the extraction pattern table mirrors
# the reference's declarative tree-sitter query strings (python.py:8-44):
# adding a predicate = adding a row, not code.
# --------------------------------------------------------------------------
PREDICATES: list[tuple[str, str, tuple[str, ...], tuple[str, ...]]] = [
    ("FOUNDED", "founded", ("person", "org"), ("org",)),
    ("ACQUIRED", "acquired", ("org",), ("org",)),
    ("WORKS_AT", "works at", ("person",), ("org",)),
    ("CEO_OF", "is the chief executive of", ("person",), ("org",)),
    ("BORN_IN", "was born in", ("person",), ("place",)),
    ("LOCATED_IN", "is located in", ("org", "place"), ("place",)),
    ("PARTNER_OF", "partnered with", ("org",), ("org",)),
    ("MOVED_TO", "moved to", ("person", "org"), ("place",)),
]

PRED_TYPES = {p: (s, o) for p, _, s, o in PREDICATES}

# --------------------------------------------------------------------------
# Language packs (the per-language parser analog: the reference dispatches a
# parser per file language, tools/graph_builder.py:58-61 + the JS/Java import
# extractors import_extractor.py:58-110; here a language = a set of pattern
# ROWS, so adding one is data, not code). Entity surfaces are proper names —
# language-independent — so only the predicate phrase and the definitional
# copula/noun translate. Pages with an unknown/empty lang tag fall back to
# the 'en' ruleset (the reference's default-parser fallback).
# --------------------------------------------------------------------------
PRED_I18N: dict[str, dict[str, str]] = {
    "de": {
        "FOUNDED": "gründete",
        "ACQUIRED": "übernahm",
        "WORKS_AT": "arbeitet bei",
        "CEO_OF": "ist Geschäftsführer von",
        "BORN_IN": "wurde geboren in",
        "LOCATED_IN": "befindet sich in",
        "PARTNER_OF": "kooperierte mit",
        "MOVED_TO": "zog nach",
    },
    "fr": {
        "FOUNDED": "a fondé",
        "ACQUIRED": "a acquis",
        "WORKS_AT": "travaille chez",
        "CEO_OF": "est le directeur général de",
        "BORN_IN": "est né à",
        "LOCATED_IN": "se trouve à",
        "PARTNER_OF": "s'est associé à",
        "MOVED_TO": "a déménagé à",
    },
}

# Definitional-sentence packs: "<surface> <copula> <noun phrase>." — the
# noun phrase (with its article) keys back to the entity type.
DEF_I18N: dict[str, tuple[str, dict[str, str]]] = {
    "en": ("is a", {"company": "org", "person": "person", "place": "place"}),
    "de": ("ist", {"eine Firma": "org", "eine Person": "person", "ein Ort": "place"}),
    "fr": ("est", {"une entreprise": "org", "une personne": "person",
                   "un lieu": "place"}),
}

EXTRACTION_LANGS = ("en", "de", "fr")


def pred_phrase(pred: str, default_phrase: str, lang: str) -> str:
    """The phrase asserting ``pred`` in ``lang`` (en phrase as fallback)."""
    return PRED_I18N.get(lang, {}).get(pred, default_phrase)


def def_sentence(surface: str, etype: str, lang: str) -> str:
    """The definitional sentence declaring ``surface``'s type in ``lang``."""
    copula, nouns = DEF_I18N.get(lang) or DEF_I18N["en"]
    noun = {v: k for k, v in nouns.items()}[etype]
    return f"{surface} {copula} {noun}."


# --------------------------------------------------------------------------
# Normalization + similarity primitives (shared with the canonicalizer).
# --------------------------------------------------------------------------
def norm_surface(s: str) -> str:
    return " ".join(s.lower().split())


def char_3grams(s: str) -> set[str]:
    s = norm_surface(s)
    if len(s) < 3:
        return {s} if s else set()
    return {s[i : i + 3] for i in range(len(s) - 2)}


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


# Canonical-variant merge threshold (stage 6 verification after LSH blocking).
CANON_JACCARD_THRESHOLD = 0.45


def entity_cluster_label(variants: list[str]) -> str:
    """Deterministic cluster label = lexicographically-min normalized variant
    (min-label propagation over strings converges to exactly this)."""
    return min(norm_surface(v) for v in variants)


def entity_id_of(label: str) -> str:
    """Content-addressed entity id — stable under any parallelism (no
    monotonically_increasing_id; SURVEY.md §7.4 determinism rule)."""
    return hashlib.md5(label.encode("utf-8")).hexdigest()


# --------------------------------------------------------------------------
# Alias -> canonical candidate matching (the dictionary lookup).
# Rule: every alias token (with trailing '.' stripped) must match some
# canonical token — exact, or prefix when the alias token is an initial
# (<=2 chars). Alias must not have more tokens than the canonical, and the
# alias's LAST token must match a canonical token exactly (this is also the
# blocking key of the distributed join).
# --------------------------------------------------------------------------
def _tokens(s: str) -> list[str]:
    return [t.rstrip(".") for t in norm_surface(s).split()]


def alias_matches_canonical(alias: str, canonical: str) -> bool:
    a, c = _tokens(alias), _tokens(canonical)
    if not a or len(a) > len(c):
        return False
    if a[-1] not in c:
        return False
    for tok in a:
        if not any(tok == ct or (len(tok) <= 2 and ct.startswith(tok)) for ct in c):
            return False
    return True


# --------------------------------------------------------------------------
# The resolution cascade (reference graph_builder.py:262-300 transposed).
# candidates: list of (entity_id, etype) — already sorted by entity_id.
# slot_types: the type constraint implied by the predicate slot (tuple of
#   allowed types, or None when the slot is unconstrained).
# doc_entities: entity ids already unambiguously resolved in the same doc
#   (the "local definition in same file" tier, graph_builder.py:285-286).
# Returns (entity_id | None, tier) where tier names which rule fired.
# --------------------------------------------------------------------------
def resolve_mention(
    candidates: list[tuple[str, str]],
    slot_types: tuple[str, ...] | None,
    doc_entities: set[str],
) -> tuple[str | None, str]:
    if not candidates:
        return None, "unlinked"
    if len(candidates) == 1:
        return candidates[0][0], "unique"
    # tier a: slot-type filter (analog of inferred-obj-type, :275-279)
    if slot_types is not None:
        typed = [c for c in candidates if c[1] in slot_types]
        if len(typed) == 1:
            return typed[0][0], "type"
        if typed:
            candidates = typed
    # tier b: same-document co-mention (analog of local-def, :285-286)
    local = [c for c in candidates if c[0] in doc_entities]
    if len(local) == 1:
        return local[0][0], "context"
    # tier d: first candidate by sorted id (fallback, :296-300)
    return min(c[0] for c in candidates), "fallback"
