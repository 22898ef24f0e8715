"""Engine operators: fuse stream-join, sharding, dedup, similarity, text."""
