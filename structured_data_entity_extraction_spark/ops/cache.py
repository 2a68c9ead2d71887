"""Persist bookkeeping for multi-consumer intermediates.

The dedup/link operators persist frames that feed several downstream
consumers (inverted indexes, gram arrays, simhash bands, the LSH miss
set). Those persists are intentionally left alive after the operator
returns -- the returned DataFrames are lazy and still reference them;
Spark evicts LRU under memory pressure, so a single sweep degrades
gracefully. But a long-lived session sweeping MANY corpora shouldn't
rely on LRU: wrap each sweep in ``cache_scope()`` and every frame
persisted (via ``persist_tracked``) inside the block is released on
exit.

    with cache_scope():
        pairs = minhash_lsh_pairs(docs).collect()   # actions INSIDE
    # all operator-internal persists are unpersisted here

Unpersisting is safe at any point -- later actions on the returned
frames recompute instead of failing -- but collect results you need
before leaving the scope or you pay the recompute.
"""

from __future__ import annotations

import contextlib
import threading

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_scopes: list[list[DataFrame]] = []
_lock = threading.Lock()


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist() that registers the frame with the innermost active
    cache_scope (no-op registration when none is active -- the r2
    leak-to-LRU behavior)."""
    df = df.persist(level)
    with _lock:
        if _scopes:
            _scopes[-1].append(df)
    return df


@contextlib.contextmanager
def cache_scope():
    """Release every persist_tracked frame created inside the block on
    exit (also on error). Yields the live list for inspection."""
    frames: list[DataFrame] = []
    with _lock:
        _scopes.append(frames)
    try:
        yield frames
    finally:
        with _lock:
            _scopes.remove(frames)
        for df in frames:
            df.unpersist()
