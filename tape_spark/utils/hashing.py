"""The content-addressed md5 draw shared by every deterministic
sampling/bucketing operator.

`Ensemble.sample(method='hash')`, `stratified_sample`/`corpus_mix`,
`stratified_sample_exact`, and `pack_sequences` all promise the same
property: the selection/layout is a pure function of row content,
identical across runs, engines, repartitionings, and cluster sizes, and
replayable in plain SQL (`('0x' || substr(md5(id), 1, 13))::BIGINT /
2^52` in DuckDB). That only holds if they share ONE expression — this
module is that single definition.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5_unit(col: Column, salt: str = "") -> Column:
    """md5(col [+ ':' + salt]) mapped to [0, 1).

    Uses the top 52 md5 bits so the int→double conversion is exact (52 ≤
    the double mantissa) and the draw replays bit-identically on any
    engine."""
    seed = col.cast("string")
    if salt:
        seed = F.concat(seed, F.lit(":" + salt))
    return F.conv(F.substring(F.md5(seed), 1, 13), 16, 10).cast("double") / F.lit(
        float(1 << 52)
    )


def md5_unit_sql(col_sql: str, salt: str = "") -> str:
    """The SAME draw as :func:`md5_unit`, as a SQL fragment string — for
    operators that build their plans from memoized fragments to avoid the
    per-call Column-API py4j tax (see ``utils/sqlfrag.py``). MUST stay
    expression-for-expression identical to :func:`md5_unit`; the parity is
    locked by ``test_md5_unit_sql_matches_column`` so the two definitions
    cannot drift."""
    from .sqlfrag import sql_str

    seed = f"cast({col_sql} AS string)"
    if salt:
        seed = f"concat({seed}, {sql_str(':' + salt)})"
    return (
        f"cast(conv(substring(md5({seed}), 1, 13), 16, 10) AS double)"
        f" / {float(1 << 52)!r}D"
    )


def md5_bucket(col: Column, num_buckets: int) -> Column:
    """Deterministic bucket id in [0, num_buckets) from the same md5 bits."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast("long")
        % num_buckets
    )
