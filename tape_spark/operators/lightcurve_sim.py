"""Light-curve similarity search: fixed-dimension curve embeddings + the
ANN operators.

Pattern follows the distributed data-series similarity-search literature
(e.g. EDBT'19 streaming time-series similarity, VLDB'23 Odyssey): reduce
each variable-length series to a fixed-length, z-normalized summary
(a PAA — piecewise aggregate approximation), then run the generic vector
search machinery (brute-force / LSH / IVF cosine top-k) over the summaries.
The reduction runs through ``Ensemble.batch``, so it inherits the cohesive
map path; the search side is shared with the embedding operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _paa_embed(time: np.ndarray, flux: np.ndarray, num_bins: int) -> np.ndarray:
    """Piecewise-aggregate approximation on a uniform time grid over the
    curve's own span, forward-filled, then z-normalized (constant curves
    map to zeros)."""
    order = np.argsort(time)
    t, f = np.asarray(time, float)[order], np.asarray(flux, float)[order]
    keep = ~(np.isnan(t) | np.isnan(f))
    t, f = t[keep], f[keep]
    if t.size == 0:
        return np.zeros(num_bins)
    span = t[-1] - t[0]
    if span <= 0:
        vals = np.full(num_bins, f.mean())
    else:
        idx = np.minimum(((t - t[0]) / span * num_bins).astype(int), num_bins - 1)
        sums = np.bincount(idx, weights=f, minlength=num_bins)
        counts = np.bincount(idx, minlength=num_bins)
        vals = np.full(num_bins, np.nan)
        nz = counts > 0
        vals[nz] = sums[nz] / counts[nz]
        # forward/backward fill empty bins
        last = np.nan
        for i in range(num_bins):
            if np.isnan(vals[i]):
                vals[i] = last
            else:
                last = vals[i]
        first_valid = vals[~np.isnan(vals)]
        vals[np.isnan(vals)] = first_valid[0] if first_valid.size else 0.0
    std = vals.std()
    return (vals - vals.mean()) / std if std > 0 else np.zeros(num_bins)


def lightcurve_embeddings(ens, num_bins: int = 32) -> DataFrame:
    """One fixed-``num_bins`` PAA embedding per light curve, computed at
    scale through ``Ensemble.batch`` (cohesive map path — no shuffle beyond
    the ingest repartition). Output: (id, embedding array<double>)."""

    def kernel(time, flux):
        return {"embedding": _paa_embed(time, flux, num_bins).tolist()}

    return ens.batch(
        kernel,
        ens._time_col,
        ens._flux_col,
        meta=f"embedding array<double>",
    )


def similar_lightcurves(
    ens,
    query_ids,
    k: int = 10,
    num_bins: int = 32,
    method: str = "brute",
) -> DataFrame:
    """Top-``k`` most similar light curves (cosine over PAA embeddings) for
    each query id. ``method``: 'brute' (exact), 'ivf', or 'lsh'."""
    from pyspark.sql import functions as F

    from .similarity import cosine_topk, ivf_cosine_topk, lsh_cosine_topk

    emb = lightcurve_embeddings(ens, num_bins=num_bins).persist()
    id_col = ens._id_col
    queries = emb.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), "embedding"
    )
    search = {"brute": cosine_topk, "ivf": ivf_cosine_topk, "lsh": lsh_cosine_topk}[method]
    result = search(emb, queries, k=k, id_col=id_col, vec_col="embedding")
    # materialize the (O(k·|queries|)) result, then release the embedding
    # cache so repeated sweeps don't accumulate persisted tables
    result = result.persist()
    result.count()
    emb.unpersist()
    return result
