"""The audited narrow-persist cache lifecycle.

Several operators are multi-ACTION: they fire probe jobs (counts,
percentile probes, corpus stats) before building a small final result.
Without care, every action replays the expensive upstream lineage
(tokenization, gram counts, BLAS assignment) — the scale disease found
and fixed three times in round 9 (dsir_select 3.3×, bm25_topk 2.3×,
cluster_balanced_sample 2.1× at sf100). The cure is always the same
lifecycle:

1. persist a NARROW projection (a few fixed-width columns per row, so
   the cache is a tiny fraction of the table it derives from);
2. run the probe actions and build the small final result against it;
3. eagerly materialize the (small) result so its plan no longer
   references the narrow cache;
4. release the narrow cache — even when a probe throws.

Hand-rolling this in each operator is how cache leaks come back (the
round-6 q4 leak was exactly a forgotten release on an error path), so
every operator goes through this module instead.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

__all__ = ["materialize_and_release", "materialized_small_result"]


def materialize_and_release(
    result: DataFrame, *caches: DataFrame, blocking: bool = False
) -> DataFrame:
    """Persist and eagerly compute a (small) ``result``, then unpersist
    the given upstream ``caches``.

    The tail half of the lifecycle, for flows that pinned their narrow
    frame earlier (SF² combine mode persists an O(Σnᵢ²) difference
    table mid-flow). The result stays persisted on purpose: it is small
    by contract, and callers typically fire several downstream actions
    over it.
    """
    result = result.persist()
    result.count()
    for c in caches:
        c.unpersist(blocking=blocking)
    return result


def materialized_small_result(
    narrow: DataFrame,
    build_fn: Callable[[DataFrame], Optional[DataFrame]],
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    blocking: bool = False,
) -> Optional[DataFrame]:
    """Run the full narrow-persist lifecycle.

    Pins ``narrow`` at ``storage_level``, calls ``build_fn(pinned)`` —
    which may fire any number of probe actions and must return the SMALL
    result DataFrame (or ``None`` when the operator's answer is empty
    and the caller will synthesize it) — then eagerly materializes that
    result and releases the narrow cache. The release runs in a
    ``finally``: a probe that throws cannot leak the pin.

    The returned frame is persisted and already computed; its plan holds
    no reference to the narrow cache, so the release is safe.
    """
    pinned = narrow.persist(storage_level)
    try:
        result = build_fn(pinned)
        if result is None:
            return None
        return materialize_and_release(result, blocking=blocking)
    finally:
        pinned.unpersist(blocking=blocking)
