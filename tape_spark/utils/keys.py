"""Opt-in hot-key guard for per-key windowed operators.

``sessionize`` and the as-of/interval joins order each key's rows inside
ONE window partition — correct and partial-aggregation-free by design,
but a key holding ~10⁹ rows (the "celebrity user" in an events stream)
becomes a single sorting task with no error and no progress signal. The
documented upstream remedies (pre-filter bots, bucket the key, split by
time range) only help if the operator TELLS you which key is hot — this
guard is the ``max_doc_tokens`` pattern (``utils/tokens.py``) applied to
keys: when set, one cheap count aggregate (map-side partial combine, the
count rides an 8-byte key exchange — a small fraction of the window it
protects) raises BEFORE the sort starts, naming the hottest keys and a
concrete ``salt_slices`` that would bring them under the bound.
``None`` (the default) skips the scan entirely.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

__all__ = ["assert_max_rows_per_key", "find_hot_keys", "suggest_salt_slices"]

# ceiling on a derived salt_slices: past this the per-slice carry frame
# (keys × S rows) and the S-way plan stop being "tiny", and a bound this
# far under the hottest key usually means the bound is wrong, not the salt
MAX_AUTO_SALT_SLICES = 4096


def find_hot_keys(
    df,
    key_cols: Sequence[str],
    max_rows_per_key: int,
) -> List:
    """Keys whose row count exceeds ``max_rows_per_key`` — up to 10,
    hottest first, each row carrying the key columns plus ``__n``.
    Empty ``key_cols`` counts the whole frame as ONE key (the keyless
    window is one global partition). One map-side-combined aggregate."""
    from pyspark.sql import functions as F

    grouped = (
        df.groupBy(*[F.col(k) for k in key_cols]) if key_cols else df.groupBy()
    )
    return (
        grouped.agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > int(max_rows_per_key))
        .orderBy(F.desc("__n"))
        .limit(10)
        .collect()
    )


def suggest_salt_slices(max_key_rows: int, max_rows_per_key: int) -> int:
    """The smallest S that brings the hottest key's per-slice rows under
    the bound, ASSUMING its rows spread roughly evenly over the time
    range (the salted plan slices by equal-width time, so a key bursty in
    time needs a larger S). Clamped to ``MAX_AUTO_SALT_SLICES``."""
    return max(
        1,
        min(
            MAX_AUTO_SALT_SLICES,
            math.ceil(int(max_key_rows) / int(max_rows_per_key)),
        ),
    )


def assert_max_rows_per_key(
    df,
    key_cols: Sequence[str],
    max_rows_per_key: Optional[int],
    op_name: str,
    salt_slices: int = 1,
) -> None:
    """Raise if any key exceeds the bound. ``salt_slices`` > 1 tells the
    guard the caller already salted: the effective per-task rows are then
    ~``n / salt_slices``, so it raises only when even the salted plan
    would overflow a task — naming the S that would suffice."""
    if max_rows_per_key is None:
        return
    if max_rows_per_key <= 0:
        raise ValueError(
            f"{op_name}: max_rows_per_key must be positive, got {max_rows_per_key}"
        )
    if not key_cols:
        raise ValueError(
            f"{op_name}: max_rows_per_key needs key columns to count by "
            "(a keyless call is ONE global partition — the guard cannot "
            "help; pass keys or drop the guard)"
        )
    hot = find_hot_keys(df, key_cols, int(max_rows_per_key) * max(1, int(salt_slices)))
    if hot:
        named = ", ".join(
            "(" + ", ".join(f"{k}={r[k]!r}" for k in key_cols) + f": {r['__n']} rows)"
            for r in hot
        )
        need_s = suggest_salt_slices(hot[0]["__n"], int(max_rows_per_key))
        salted_note = (
            f" (already salted with salt_slices={int(salt_slices)} — "
            f"per-slice rows still exceed the bound)"
            if int(salt_slices) > 1
            else ""
        )
        raise ValueError(
            f"{op_name}: key(s) exceed max_rows_per_key={int(max_rows_per_key)}"
            f"{salted_note} — each key's rows sort inside ONE task, so a hot "
            f"key is a single-core cliff with no progress signal. Hottest "
            f"(up to 10): {named}. Remedies: for asof_join pass "
            f"salt_slices={need_s} (computed: ceil(hottest/bound); the "
            f"salted two-phase plan splits each key into that many time "
            f"slices with boundary repair — bit-identical results, assumes "
            f"rows roughly even over time) or salt_slices='auto' to derive "
            f"it from this same count; otherwise pre-filter or cap the hot "
            f"keys, split them by time range, or route them through a "
            f"dedicated pass."
        )
