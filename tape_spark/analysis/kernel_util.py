"""Shared helpers for the whole-block vectorized kernels."""

from __future__ import annotations

import numpy as np
import pandas as pd


def sorted_factorize(values):
    """``np.unique(values, return_inverse=True)`` semantics — sorted
    uniques plus codes into them — but hash-based instead of sort-based.
    The one edge divergence: an all-missing object block factorizes to a
    single NaN category here, while ``np.unique`` raises TypeError; the
    raise is reproduced only for mixed-type (unorderable) uniques, via
    the argsort below.

    ``np.unique`` sorts the full array, which on object-dtype band columns
    costs ~26x more than a hash factorization (measured 3.3 s vs 0.13 s on
    a 3.4 M-row block): the per-element python-object comparisons dominate
    the whole kernel. ``pd.factorize`` hashes in C, and only the (tiny)
    unique set is then sorted to keep the downstream contract — both block
    kernels index segments as ``group * nb + band_code`` and rely on the
    code order being the sorted-unique order.
    """
    # use_na_sentinel=False keeps None/NaN as a real category: a -1
    # sentinel would otherwise silently alias missing values to the last
    # sorted unique (np.unique's behavior on None is to raise — sorting
    # mixed None/str — and the argsort below preserves exactly that)
    codes, cats = pd.factorize(values, use_na_sentinel=False)
    cats = np.asarray(cats)
    order = np.argsort(cats, kind="stable")
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order))
    return cats[order], rank[codes]
