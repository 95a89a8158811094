from .segment import segment_stage
from .triples import triples_stage, defs_stage, links_stage, patterns_df
from .canon import canonicalize_entities
from .linking import build_dictionary, link_mentions
from .materialize import materialize_graph

__all__ = [
    "segment_stage",
    "triples_stage",
    "defs_stage",
    "links_stage",
    "patterns_df",
    "canonicalize_entities",
    "build_dictionary",
    "link_mentions",
    "materialize_graph",
]
