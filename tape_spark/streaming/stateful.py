"""Custom stateful streaming operators via ``applyInPandasWithState``.

The built-in windowed aggregations (windows.py) cover time-bucketed state;
this module covers *unbounded per-key* state — e.g. running statistics for
every light curve / user across the whole stream. State is a compact
(count, mean, M2) Welford triple per key, merged with each micro-batch
using Chan's parallel-variance combination, so per-key memory is O(1) no
matter how long the stream runs.

Works on both streaming and batch DataFrames (batch runs a plain
aggregation with the same output schema, for backfills and tests).
"""

from __future__ import annotations

from typing import Iterable, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _combine(n1: float, mean1: float, m2_1: float, n2: float, mean2: float, m2_2: float):
    """Chan et al. parallel combination of two (n, mean, M2) summaries."""
    n = n1 + n2
    if n == 0:
        return 0.0, 0.0, 0.0
    delta = mean2 - mean1
    mean = mean1 + delta * (n2 / n)
    m2 = m2_1 + m2_2 + delta * delta * (n1 * n2 / n)
    return n, mean, m2


def running_stats(
    df: DataFrame,
    keys: List[str],
    value_col: str = "value",
) -> DataFrame:
    """Per-key running count/mean/std, maintained incrementally on streams.

    Streaming: ``groupBy(keys).applyInPandasWithState`` with a
    (count, mean, M2) state triple — each micro-batch contributes one
    vectorized numpy summary that is merged into the state; the operator
    emits the updated totals per key per batch (sink in ``update`` mode).

    Batch: the same result as one built-in aggregation (no Python), so
    backfills and parity tests share this entry point.
    """
    out_schema = T.StructType(
        [df.schema[k] for k in keys]
        + [
            T.StructField("n", T.LongType()),
            T.StructField("mean", T.DoubleType()),
            T.StructField("std", T.DoubleType()),
        ]
    )

    if not df.isStreaming:
        # NaN handling must mirror the streaming state update, which drops
        # NaN samples: conditional aggregation over the finite values only
        # (an unguarded avg would propagate NaN and count would include it,
        # breaking the batch-backfill == stream contract)
        v = F.col(value_col).cast("double")
        valid = F.when(v.isNotNull() & ~F.isnan(v), v)
        return df.groupBy(*keys).agg(
            F.count(valid).alias("n"),
            F.coalesce(F.avg(valid), F.lit(0.0)).alias("mean"),
            F.coalesce(F.stddev_samp(valid), F.lit(0.0)).alias("std"),
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    state_schema = T.StructType(
        [
            T.StructField("n", T.DoubleType()),
            T.StructField("mean", T.DoubleType()),
            T.StructField("m2", T.DoubleType()),
        ]
    )
    vcol = value_col
    key_names = list(keys)

    def update(
        key: Tuple, pdfs: Iterable[pd.DataFrame], state: "GroupState"
    ) -> Iterable[pd.DataFrame]:
        n, mean, m2 = state.get if state.exists else (0.0, 0.0, 0.0)
        for pdf in pdfs:
            vals = pdf[vcol].to_numpy(dtype=float)
            vals = vals[~np.isnan(vals)]
            if not vals.size:
                continue
            bn = float(vals.size)
            bmean = float(vals.mean())
            bm2 = float(((vals - bmean) ** 2).sum())
            n, mean, m2 = _combine(n, mean, m2, bn, bmean, bm2)
        state.update((n, mean, m2))
        std = float(np.sqrt(m2 / (n - 1))) if n > 1 else 0.0
        row = dict(zip(key_names, key))
        row.update({"n": int(n), "mean": mean, "std": std})
        yield pd.DataFrame([row])

    return df.groupBy(*keys).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
