"""Engine operators: fuse stream-join, as-of/range joins, dedup, similarity,
text analysis, multimodal plumbing, scale helpers (bucketing/salting)."""

from .asof import asof_join  # noqa: F401
from .range_join import range_join  # noqa: F401
