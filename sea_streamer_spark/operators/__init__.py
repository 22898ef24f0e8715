"""Engine operators: fuse stream-join, as-of/range joins, dedup, similarity,
text analysis, multimodal plumbing, scale helpers (bucketing/salting)."""

from .asof import asof_join  # noqa: F401
from .curation import (  # noqa: F401
    hash_split,
    pack_token_budget,
    shuffle_rank,
    stratified_sample,
)
from .dedup import minhash_lsh_dedup, simhash_near_dup  # noqa: F401
from .fuse import mux, stream_join  # noqa: F401
from .graph import connected_components, dedup_clusters  # noqa: F401
from .quality import gopher_quality_flags, pii_redact, repetition_stats  # noqa: F401
from .range_join import range_join  # noqa: F401
