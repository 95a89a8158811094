from .vocab import (
    ENTITIES,
    PREDICATES,
    norm_surface,
    char_3grams,
    jaccard,
    alias_matches_canonical,
    resolve_mention,
)
from .pages import generate_corpus, SCALES

__all__ = [
    "ENTITIES",
    "PREDICATES",
    "norm_surface",
    "char_3grams",
    "jaccard",
    "alias_matches_canonical",
    "resolve_mention",
    "generate_corpus",
    "SCALES",
]
