"""Atomic JSON state files — the single persistence primitive behind the
sketch/filter models (operators/bloom.py, operators/sketch.py) and any
foreachBatch sink that keeps driver-side state across micro-batches.

Contract: ``save_json`` writes to ``path + ".tmp"`` and publishes with
``os.replace`` — readers never observe a torn file, and on any
atomic-rename filesystem (local, HDFS, S3-with-manifest via a committer) a
crash leaves either the old state or the new state, never a mix. Keeping
one implementation here means a durability upgrade (e.g. fsync-before-
rename) lands everywhere at once.
"""

from __future__ import annotations

import json
import os


def save_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def load_json(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
