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
protects) raises BEFORE the sort starts, naming the hottest keys.
``None`` (the default) skips the scan entirely.
"""

from __future__ import annotations

from typing import Optional, Sequence

__all__ = ["assert_max_rows_per_key"]


def assert_max_rows_per_key(
    df,
    key_cols: Sequence[str],
    max_rows_per_key: Optional[int],
    op_name: str,
) -> None:
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
    from pyspark.sql import functions as F

    hot = (
        df.groupBy(*[F.col(k) for k in key_cols])
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > int(max_rows_per_key))
        .orderBy(F.desc("__n"))
        .limit(10)
        .collect()
    )
    if hot:
        named = ", ".join(
            "(" + ", ".join(f"{k}={r[k]!r}" for k in key_cols) + f": {r['__n']} rows)"
            for r in hot
        )
        raise ValueError(
            f"{op_name}: key(s) exceed max_rows_per_key={int(max_rows_per_key)} "
            f"— each key's rows sort inside ONE task, so a hot key is a "
            f"single-core cliff with no progress signal. Hottest (up to 10): "
            f"{named}. Remedies: for asof_join pass salt_slices=S (the "
            f"salted two-phase plan splits each key into S time slices "
            f"with boundary repair — bit-identical results); otherwise "
            f"pre-filter or cap the hot keys, split them by time range, "
            f"or route them through a dedicated pass."
        )
