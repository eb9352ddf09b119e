"""Temporal join operators: as-of join and interval (range) join.

The reference engine has no temporal-join surface; these follow the public
semantics of ``pandas.merge_asof`` and of SQL inequality/range joins, built
Spark-first:

- ``asof_join`` is the union-scan formulation: tag both sides, union, and
  propagate the most recent right-side row with ``last(..., ignorenulls)``
  over an ordered window. ONE shuffle (hash-partition by the ``by`` keys),
  no UDF, no inequality join — Catalyst would otherwise plan a
  BroadcastNestedLoopJoin for ``l.ts >= r.ts``, which is quadratic.
- ``interval_join`` is the bucketed-equi-join formulation: right intervals
  are exploded to the fixed-width time buckets they cover, the left side
  keys by its single bucket, and the exact range predicate is applied
  AFTER the equi-join. Catalyst plans an ordinary shuffle/broadcast hash
  join on (by, bucket); cost scales with bucket collisions, never N².

At 100 TB both operators keep the property that every table-sized exchange
is an equi-key shuffle: as-of's window partitioning reuses the same hash
partitioning any downstream per-key op wants, and interval bucketing turns
a range predicate into join keys exactly like the LSH banding in
``operators/dedup.py`` turns similarity into join keys.
"""

from __future__ import annotations

import warnings
from functools import reduce
from typing import List, Optional, Sequence, Tuple, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join", "interval_overlap_join", "resample_timeseries"]


def _as_list(keys: Union[None, str, Sequence[str]]) -> List[str]:
    if keys is None:
        return []
    if isinstance(keys, str):
        return [keys]
    return list(keys)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Union[None, str, Sequence[str]] = None,
    direction: str = "backward",
    tolerance: Optional[float] = None,
    suffix: str = "_r",
    max_rows_per_key: Optional[int] = None,
    salt_slices: Union[None, int, str] = None,
) -> DataFrame:
    """Left as-of join: attach to every left row the single right row that
    is nearest in ``on`` — at-or-before it (``backward``, the default),
    at-or-after it (``forward``), or whichever of the two is closer
    (``nearest``) — matching ``pandas.merge_asof`` tie/filter semantics,
    including ``tolerance`` (matches farther than ``tolerance`` in ``on``
    become non-matches).

    Output: every left row and column, plus each non-key right column and
    ``on + suffix`` (the matched right timestamp); all right-side columns
    are NULL when no match exists (left-outer semantics). Right columns
    whose names clash with left columns get ``suffix`` appended.

    NULL handling: right rows with NULL ``on`` are dropped (they have no
    position on the time axis; ``pandas.merge_asof`` raises on them);
    left rows with NULL ``on`` pass through unmatched. Ties among right
    rows sharing the same (``by``, ``on``) resolve like ``merge_asof``:
    the last input row for ``backward``, the first for ``forward``
    (deterministic for a fixed input row order — a monotonic per-row id
    breaks the tie).

    Scale: both sides are unioned and hash-partitioned ONCE by ``by``;
    within each partition a single ordered scan propagates the latest
    right-side struct. ``nearest`` adds a second sort (opposite order)
    over the SAME exchange — Catalyst reuses the partitioning. With no
    ``by`` key the window is global (one ordered partition): correct, but
    a scale bottleneck — pass ``by`` for any large input. The sort key is
    ``on`` cast to double, so integer timestamps beyond 2**53 (e.g.
    epoch-ns int64) lose ordering/tolerance precision; the matched
    timestamp itself is re-emitted at its original dtype.

    Each ``by`` key's rows (BOTH sides) sort inside one window partition
    (bound ~10⁹ rows/key — the documented celebrity-key cliff); opt-in
    ``max_rows_per_key`` counts the union per key and raises before the
    sort naming the hot keys (see
    :func:`tape_spark.utils.keys.assert_max_rows_per_key`).

    ``salt_slices=S`` (S > 1) breaks that cliff with a SALTED TWO-PHASE
    plan: the union is cut into S equal-width time slices (one tiny
    eager min/max job fixes the range), the same ordered scan runs per
    ``(by, slice)`` partition — so a 10 M-row celebrity key becomes S
    parallel sorts of ~10M/S rows — and slice-boundary misses are
    repaired with per-slice CARRY rows: one map-side-combined aggregate
    collects each slice's last (backward) / first (forward) right row,
    a tiny per-key window turns those into "latest right row BEFORE
    this slice" / "earliest AFTER", and a left rows whose in-slice scan
    found nothing coalesce to the carry. Match semantics (ties,
    tolerance, NULL handling, all three directions) are IDENTICAL to
    the unsalted plan — asserted row-for-row in tests — because a left
    row's true predecessor is either in its own slice (in-slice scan
    finds it) or is the latest right row of an earlier slice (the carry
    is exactly that). Also lifts the ``by=None`` global-sort bottleneck
    (the slice column becomes the only partition key). Cost: one extra
    narrow aggregate over the union + a same-key join of the small
    carry frame (≤ keys x S rows); worth it only when a key's rows
    overflow one task's sort — see docs/SCALING.md "salted asof".

    ``salt_slices="auto"`` derives S from the SAME count the hot-key
    guard runs (so it requires ``max_rows_per_key``, which becomes the
    target rows-per-task): S = ceil(hottest key's rows / bound), clamped
    to 4096, and 1 (the plain unsalted plan) when no key exceeds the
    bound — the guard then salts instead of raising. With an explicit
    integer ``salt_slices`` the guard accounts for the salt: it raises
    only if even the per-slice rows (~n/S) would exceed the bound, and
    the error names the S that would suffice. The derivation assumes a
    hot key's rows spread roughly evenly over the time range; a key
    bursty in time needs a larger S (slices are equal-width in time).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    by = _as_list(by)
    for k in by + [on]:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"join key {k!r} must exist on both sides")
    if isinstance(salt_slices, str):
        if salt_slices != "auto":
            raise ValueError(
                f"salt_slices must be an int or 'auto', got {salt_slices!r}"
            )
        if max_rows_per_key is None:
            raise ValueError(
                "salt_slices='auto' derives S from the hot-key count, so "
                "it needs max_rows_per_key (the target rows-per-task)"
            )
        from ..utils.keys import find_hot_keys, suggest_salt_slices

        if by:
            hot = find_hot_keys(
                left.select(*by).unionByName(right.select(*by)),
                by,
                max_rows_per_key,
            )
            salt_slices = (
                suggest_salt_slices(hot[0]["__n"], max_rows_per_key) if hot else 1
            )
        else:
            # keyless: ONE global partition — target-size the slices from
            # the total row count (the slice column becomes the only key).
            # One count over the union, not two separate count() actions:
            # the pre-pass costs one job instead of two (each job carries
            # the fixed scheduling floor; the scans are unavoidable).
            total = (
                left.select(F.lit(1).alias("__one"))
                .unionByName(right.select(F.lit(1).alias("__one")))
                .count()
            )
            salt_slices = suggest_salt_slices(total, max_rows_per_key)
    elif max_rows_per_key is not None:
        from ..utils.keys import assert_max_rows_per_key

        assert_max_rows_per_key(
            left.select(*by).unionByName(right.select(*by)),
            by,
            max_rows_per_key,
            "asof_join",
            salt_slices=salt_slices if salt_slices else 1,
        )
    if not by and (salt_slices is None or salt_slices <= 1):
        warnings.warn(
            "asof_join with by=None runs as ONE globally ordered window "
            "partition — a single-task sort at scale. Pass `by` keys for "
            "any large input (or salt_slices to slice the global sort).",
            stacklevel=2,
        )
    # a NULL right timestamp has no position on the axis; under the
    # default asc-nulls-first ordering it would otherwise sort before
    # everything and leak its payload (with a NULL matched timestamp)
    # into left rows that have no true predecessor
    right = right.filter(F.col(on).isNotNull())

    # ``on`` rides inside the left struct so it is re-emitted with its
    # original dtype (``__t`` is a cast-to-double sort key only)
    left_payload = [c for c in left.columns if c not in by]
    right_payload = [c for c in right.columns if c not in by and c != on]
    assert on in left_payload
    rename = {c: (c + suffix if c in left.columns else c) for c in right_payload}
    matched_on = on + suffix
    out_names = list(by) + left_payload + [matched_on] + [rename[c] for c in right_payload]
    dupes = {n for n in out_names if out_names.count(n) > 1}
    if dupes:
        raise ValueError(
            f"output column collision {sorted(dupes)}; pick a different suffix"
        )

    # The right row travels as ONE struct so that propagation is atomic:
    # per-column last(ignorenulls) would skip a genuinely-NULL field of the
    # matched row and leak an older row's value. The matched timestamp
    # rides at its ORIGINAL dtype (only ``__t``, the sort key, is cast).
    r_struct = F.struct(
        F.col(on).alias(matched_on),
        *[F.col(c).alias(rename[c]) for c in right_payload],
    )
    l_side = left.select(
        *[F.col(k) for k in by],
        F.col(on).cast("double").alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__rid"),
        F.struct(*[F.col(c) for c in left_payload]).alias("__l"),
        F.lit(None).cast(
            right.select(r_struct.alias("__r")).schema["__r"].dataType
        ).alias("__r"),
    )
    r_side = right.select(
        *[F.col(k) for k in by],
        F.col(on).cast("double").alias("__t"),
        F.lit(0).alias("__is_left"),
        # tie-breaker among right rows sharing (by, on): merge_asof takes
        # the LAST input row for backward and the FIRST for forward;
        # a monotonic per-row id makes that choice deterministic for a
        # fixed input partitioning (partition-major, row-order minor).
        F.monotonically_increasing_id().alias("__rid"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left_payload]).alias("__l"))
            .schema["__l"].dataType
        ).alias("__l"),
        r_struct.alias("__r"),
    )
    u = l_side.unionByName(r_side)

    # --- salted two-phase plan (see docstring): time-slice the union so
    # no single task sorts a whole hot key, then repair slice boundaries
    # with per-slice carry rows
    slice_keys: List[str] = []
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")
    if salt_slices is not None:
        if salt_slices < 1:
            raise ValueError("salt_slices must be >= 1")
        if salt_slices > 1:
            rng = u.agg(F.min("__t").alias("lo"), F.max("__t").alias("hi")).first()
            lo, hi = rng["lo"], rng["hi"]
            if lo is not None and hi is not None and hi > lo:
                width = (hi - lo) / float(salt_slices)
                u = u.withColumn(
                    "__slice",
                    F.least(
                        F.floor((F.col("__t") - F.lit(lo)) / F.lit(width)),
                        F.lit(salt_slices - 1),
                    ).cast("int"),
                )
                slice_keys = ["__slice"]
                # per-slice boundary rows: the slice's last right row
                # under the backward tie order (max (__t, __rid) — the
                # LAST input row among equal timestamps, exactly the row
                # the unsalted scan would have propagated across the
                # boundary) and/or its first under the forward tie order.
                # One map-side-combined aggregate; left rows contribute a
                # NULL ordering key, which max_by/min_by ignore.
                ord_key = F.when(
                    F.col("__is_left") == 0,
                    F.struct(F.col("__t"), F.col("__rid")),
                )
                aggs = []
                if need_b:
                    aggs.append(F.max_by("__r", ord_key).alias("__r_last"))
                if need_f:
                    aggs.append(F.min_by("__r", ord_key).alias("__r_first"))
                per_slice = u.groupBy(*by, "__slice").agg(*aggs)
                # tiny per-key windows over ≤ salt_slices rows/key turn
                # boundary rows into carries: latest right row BEFORE the
                # slice / earliest right row AFTER it
                w_cb = (
                    Window.partitionBy(*by)
                    .orderBy(F.col("__slice").asc())
                    .rowsBetween(Window.unboundedPreceding, -1)
                )
                w_cf = (
                    Window.partitionBy(*by)
                    .orderBy(F.col("__slice").asc())
                    .rowsBetween(1, Window.unboundedFollowing)
                )
                carry_cols = []
                if need_b:
                    per_slice = per_slice.withColumn(
                        "__carry_b", F.last("__r_last", ignorenulls=True).over(w_cb)
                    )
                    carry_cols.append("__carry_b")
                if need_f:
                    per_slice = per_slice.withColumn(
                        "__carry_f", F.first("__r_first", ignorenulls=True).over(w_cf)
                    )
                    carry_cols.append("__carry_f")
                # eqNullSafe on the by keys (plain equality on __slice):
                # groupBy and the window partitionBy both treat NULL as an
                # ordinary group, so a NULL-key left row's carry lives in
                # the NULL group of per_slice — a null-rejecting equi-join
                # here would silently drop its cross-slice matches
                ps_by = [f"__ps_by_{i}" for i in range(len(by))]
                ps = per_slice.select(
                    *[F.col(k).alias(a) for k, a in zip(by, ps_by)],
                    F.col("__slice").alias("__ps_slice"),
                    *carry_cols,
                )
                cond = F.col("__slice") == F.col("__ps_slice")
                for k, a in zip(by, ps_by):
                    cond = cond & F.col(k).eqNullSafe(F.col(a))
                u = u.join(ps, cond, "left").drop("__ps_slice", *ps_by)

    # backward: ascending scan; a right row at the same ``on`` sorts first
    # (__is_left asc) so equal timestamps match, as in merge_asof; among
    # tied right rows __rid asc puts the LAST input row nearest the left.
    w_back = (
        Window.partitionBy(*by, *slice_keys)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__rid").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward: the same scan run in descending ``on`` order; __rid desc
    # so the FIRST input row among ties is scanned last (i.e. matches).
    w_fwd = (
        Window.partitionBy(*by, *slice_keys)
        .orderBy(F.col("__t").desc(), F.col("__is_left").asc(), F.col("__rid").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    def _within(match_col):
        gap = F.abs(F.col("__t") - match_col[matched_on].cast("double"))
        ok = match_col.isNotNull()
        if tolerance is not None:
            ok = ok & (gap <= F.lit(float(tolerance)))
        return ok

    # salted: a left row whose in-slice scan found nothing takes the
    # carry — the true cross-boundary predecessor/successor
    def _slice_fix(expr, carry_col):
        return F.coalesce(expr, F.col(carry_col)) if slice_keys else expr

    if direction == "backward":
        u = u.withColumn(
            "__m",
            _slice_fix(F.last("__r", ignorenulls=True).over(w_back), "__carry_b"),
        )
    elif direction == "forward":
        u = u.withColumn(
            "__m",
            _slice_fix(F.last("__r", ignorenulls=True).over(w_fwd), "__carry_f"),
        )
    else:  # nearest: take both candidates, keep the closer valid one
        u = (
            u.withColumn(
                "__mb",
                _slice_fix(F.last("__r", ignorenulls=True).over(w_back), "__carry_b"),
            )
            .withColumn(
                "__mf",
                _slice_fix(F.last("__r", ignorenulls=True).over(w_fwd), "__carry_f"),
            )
        )
        b_ok = _within(F.col("__mb"))
        f_ok = _within(F.col("__mf"))
        b_gap = F.abs(F.col("__t") - F.col("__mb")[matched_on].cast("double"))
        f_gap = F.abs(F.col("__t") - F.col("__mf")[matched_on].cast("double"))
        # ties go backward, matching merge_asof(direction="nearest")
        u = u.withColumn(
            "__m",
            F.when(b_ok & (~f_ok | (b_gap <= f_gap)), F.col("__mb")).when(
                f_ok, F.col("__mf")
            ),
        ).drop("__mb", "__mf")

    # left rows with NULL `on` (NULL __t) pass through unmatched: in the
    # descending (forward/nearest) scan they sort last and would otherwise
    # see the whole right side as a candidate.
    u = u.filter(F.col("__is_left") == 1).withColumn(
        "__m",
        F.when(_within(F.col("__m")) & F.col("__t").isNotNull(), F.col("__m")),
    )
    return u.select(
        *[F.col(k) for k in by],
        *[F.col("__l")[c].alias(c) for c in left_payload],
        F.col("__m")[matched_on].alias(matched_on),
        *[F.col("__m")[rename[c]].alias(rename[c]) for c in right_payload],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    by: Union[None, str, Sequence[str]] = None,
    bucket_width: Optional[float] = 3600.0,
    how: str = "inner",
) -> DataFrame:
    """Join every left row to the right intervals that contain it:
    ``right_start <= left_ts <= right_end`` (plus equality on ``by``).

    Spark has no native range join, and expressing the containment
    predicate directly degenerates to a nested-loop plan. Instead each
    right interval is exploded to the fixed-width time buckets it covers
    (``sequence(floor(start/w), floor(end/w))``) and the left row keys by
    its single bucket, so Catalyst plans a plain equi-join on
    (``by``, bucket); the exact containment predicate filters the
    collisions afterwards. A (left, right) pair can collide in at most one
    bucket — the left row owns exactly one — so no post-join dedup is
    needed.

    ``bucket_width`` (same units as the time columns; default one hour for
    epoch-second data) trades replication for selectivity: set it near the
    median interval length so intervals explode to O(1) buckets while a
    bucket holds few foreign intervals. Pass ``bucket_width=None`` to
    derive it from the data — the median interval length via ONE
    approx-percentile aggregate over the right side (an O(1)-row
    driver-side result, the same bounded-collect discipline as the rest
    of the engine). ``how`` is ``inner`` or ``left`` (left rows with no
    containing interval survive with NULL right columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if bucket_width is None:
        med = right.select(
            F.percentile_approx(
                F.col(right_end) - F.col(right_start), F.lit(0.5)
            ).alias("m")
        ).first()["m"]
        # degenerate corpora (all zero-length or empty right side) fall
        # back to a unit bucket rather than a zero-width division
        bucket_width = float(med) if med else 1.0
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    by = _as_list(by)
    w = float(bucket_width)

    l_b = left.withColumn("__bucket", F.floor(F.col(left_ts) / F.lit(w)))
    r_b = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / F.lit(w)),
                F.floor(F.col(right_end) / F.lit(w)),
            )
        ),
    )
    # disambiguate clashing non-key column names with a _r suffix
    clash = {
        c for c in r_b.columns if c in l_b.columns and c not in by and c != "__bucket"
    }
    for c in clash:
        r_b = r_b.withColumnRenamed(c, c + "_r")
    rs = right_start + ("_r" if right_start in clash else "")
    re_ = right_end + ("_r" if right_end in clash else "")

    cond = [l_b["__bucket"] == r_b["__bucket"]] + [l_b[k] == r_b[k] for k in by]
    contain = (F.col(rs) <= F.col(left_ts)) & (F.col(left_ts) <= F.col(re_))
    if how == "inner":
        out = l_b.join(r_b, cond, "inner").filter(contain)
        return out.drop(r_b["__bucket"]).drop(l_b["__bucket"]).drop(
            *[r_b[k] for k in by]
        )
    # left-outer: ONE structural left join with the containment predicate
    # INSIDE the join condition. A left row owns exactly one bucket, so
    # an unmatched row null-extends exactly once — no synthetic row ids,
    # no checkpoint, no complement branch, fully lazy. (Containment as a
    # post-join FILTER would instead turn colliding-but-not-containing
    # pairs into rows and need the complement machinery; as part of the
    # join condition, Spark evaluates it during the hash-join probe and
    # null-extends correctly.)
    out = l_b.join(r_b, reduce(lambda a, b: a & b, cond) & contain, "left")
    return out.drop(r_b["__bucket"]).drop(l_b["__bucket"]).drop(
        *[r_b[k] for k in by]
    )


def _with_row_id(left: DataFrame) -> Tuple[DataFrame, str]:
    """Attach a synthetic monotonic row id for the left-outer complement
    protocol, picking a name that cannot clash with user columns.

    The id-bearing frame is EAGERLY local-checkpointed before it fans
    out into the match branch and the complement branch. Without this,
    the two branches each re-evaluate the left lineage independently and
    ``monotonically_increasing_id`` — documented nondeterministic — can
    assign DIFFERENT ids to the same row (unstable upstream shuffle
    order, ``sample()``, AQE re-plans, task retries), silently dropping
    or duplicating left rows in the complement anti-join. Eager (not
    lazy) on purpose: a lazily-checkpointed RDD shared by two branch
    stages can still be computed concurrently on DIFFERENT executors
    before either publishes blocks, and the racing copies may disagree.
    Materializing under one job before the fan-out closes that window.
    Cost: the left table computes at call time and its blocks stay
    pinned until the returned frame is GC'd — callers with table-sized
    left frames should pass their own unique ``left_id`` instead (the
    zero-caching path)."""
    row_col = "__lrow"
    while row_col in left.columns:
        row_col += "_"
    with_id = left.withColumn(row_col, F.monotonically_increasing_id())
    return with_id.localCheckpoint(eager=True), row_col


def _attach_unmatched_left(
    left_with_id: DataFrame, inner: DataFrame, row_col: str, drop_id: bool
) -> DataFrame:
    """Left-outer completion for the exploded-left bucketed join:
    re-attach the left rows that produced no inner match, with NULL
    right columns. A plain outer equi-join on buckets would instead
    null-extend a left row once per unmatched bucket COPY, so the match
    runs inner and the complement comes from an anti-join.

    The anti-join keys on ONE id column — the caller's unique
    ``left_id`` (lazy, zero caching) or the synthetic eager-checkpointed
    ``_with_row_id`` column — rather than on every left column with
    ``eqNullSafe``: a wide left table would otherwise carry full rows as
    shuffle keys, and all-column equality can't distinguish genuinely
    identical left rows. ``drop_id`` is True only for the synthetic
    column (a caller's id stays in the output)."""
    unmatched = left_with_id.join(inner.select(row_col), row_col, "left_anti")
    for c in inner.columns:
        if c not in left_with_id.columns:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(inner.schema[c].dataType)
            )
    out = inner.unionByName(unmatched)
    return out.drop(row_col) if drop_id else out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: Union[None, str, Sequence[str]] = None,
    bucket_width: Optional[float] = 3600.0,
    how: str = "inner",
    min_overlap: float = 0.0,
    left_id: Optional[str] = None,
    validate_left_id: bool = False,
) -> DataFrame:
    """Join every left interval to the right intervals it OVERLAPS:
    ``left_start <= right_end AND right_start <= left_end`` (inclusive —
    touching endpoints overlap with length 0), plus equality on ``by``.
    The span-vs-span companion of :func:`interval_join` (sessions vs
    outages, spans vs annotation ranges, …).

    Same bucketed-equi-join shape — BOTH sides explode to the fixed-width
    buckets they cover and Catalyst plans a plain equi-join on
    (``by``, bucket) — but unlike point-in-interval, an overlapping pair
    can collide in EVERY bucket the overlap spans. Ownership dedups
    exactly without a distinct shuffle: the overlap's first bucket is
    ``floor(max(left_start, right_start) / w)``, a bucket both intervals
    necessarily cover, so the pair is kept only from that bucket — a
    map-side filter, mirroring the first-agreeing-band dedup in
    ``operators/dedup.py``.

    ``min_overlap`` keeps only pairs whose overlap length
    ``min(ends) - max(starts)`` is at least this long (0 keeps all,
    including point-touches). ``bucket_width=None`` derives the width
    from the LARGER of the two sides' median interval lengths (one
    O(1)-row aggregate per side) — the longer population dominates
    per-row bucket replication, so matching it bounds the explode factor
    at O(1) for the typical interval. ``how`` is ``inner`` or ``left``.

    For ``how='left'``, pass ``left_id`` — the name of a UNIQUE id
    column on ``left`` — whenever one exists: the unmatched-row
    complement then anti-joins on it lazily with zero caching (a
    duplicated id would make a match on one row drop its duplicates, so
    uniqueness is the caller's contract). Without ``left_id`` a
    synthetic id is attached and the left table is eagerly
    local-checkpointed at call time (see ``_with_row_id`` for why lazy
    isn't safe). The trade is lineage cost vs storage, measured at
    sf100 (95 M sessions derived from 100 M events, identical outputs):
    the lazy path re-evaluates the left lineage in BOTH branches
    (106 s), the checkpoint path computes it once and pins it (47 s) —
    so prefer ``left_id`` when the left side is a cheap scan or too big
    to pin, and the default when its lineage is expensive. (Callers
    with an expensive lineage AND a unique id can also persist the left
    frame themselves and pass ``left_id``.)

    The uniqueness contract fails SILENTLY if violated — a duplicated
    ``left_id`` value whose one copy matches hides its unmatched
    duplicates from the anti-join complement, producing a wrong
    left-outer result with no error. ``validate_left_id=True`` spends
    one aggregate (count vs count-distinct over the id column, a cheap
    partial-agg scan) to raise on duplicates instead; leave it off on
    trusted ids in the 100 TB hot path.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if bucket_width is None:
        meds = []
        for frame, s, e in ((left, left_start, left_end), (right, right_start, right_end)):
            m = frame.select(
                F.percentile_approx(F.col(e) - F.col(s), F.lit(0.5)).alias("m")
            ).first()["m"]
            if m is not None:  # `if m:` would drop a legitimate 0.0 median
                meds.append(float(m))
        bucket_width = max(meds) if meds else 1.0
        if bucket_width <= 0:
            # degenerate (point) intervals on both sides: any positive
            # width buckets a point exactly once; 1.0 keeps floor() exact
            # for integer-valued timestamps
            bucket_width = 1.0
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    by = _as_list(by)
    w = float(bucket_width)

    def _explode(frame, s, e):
        return frame.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / F.lit(w)), F.floor(F.col(e) / F.lit(w))
                )
            ),
        )

    # how='left' needs a per-left-row identity for the complement
    # anti-join (a span-vs-span left-outer can't be structural: the left
    # side explodes across buckets, so a direct outer join would
    # null-extend once per unmatched bucket COPY). Two paths:
    # - the caller names a unique ``left_id`` column: the complement
    #   keys on it — fully lazy, zero caching, the 100 TB path;
    # - no ``left_id``: a synthetic id is attached and the id-bearing
    #   frame is EAGERLY local-checkpointed so both branches read one
    #   materialized RDD (a lazy checkpoint still allows two branches on
    #   different executors to race duplicate partition computations and
    #   diverge the nondeterministic ids). Eager = the left table
    #   materializes at call time and stays pinned until the returned
    #   frame is garbage-collected — fine for session-scale frames;
    #   pass ``left_id`` for big ones.
    row_col = None
    if how == "left":
        if left_id is not None:
            if left_id not in left.columns:
                raise ValueError(f"left_id column {left_id!r} not in left")
            if validate_left_id:
                chk = left.agg(
                    F.count(left_id).alias("n"),
                    F.countDistinct(left_id).alias("d"),
                    F.sum(F.col(left_id).isNull().cast("long")).alias("nulls"),
                ).collect()[0]
                if int(chk["nulls"] or 0) or int(chk["n"]) != int(chk["d"]):
                    raise ValueError(
                        f"left_id {left_id!r} violates the uniqueness contract "
                        f"({int(chk['n'])} non-null rows, {int(chk['d'])} distinct, "
                        f"{int(chk['nulls'] or 0)} NULLs): a duplicated id whose "
                        "one copy matches silently DROPS its unmatched duplicates "
                        "from the left-outer complement — dedup or synthesize a "
                        "unique id (or omit left_id for the checkpointed path)"
                    )
            row_col = left_id
        else:
            left, row_col = _with_row_id(left)
    l_b = _explode(left, left_start, left_end)
    r_b = _explode(right, right_start, right_end)
    clash = {
        c for c in r_b.columns if c in l_b.columns and c not in by and c != "__bucket"
    }
    for c in clash:
        r_b = r_b.withColumnRenamed(c, c + "_r")
    rs = right_start + ("_r" if right_start in clash else "")
    re_ = right_end + ("_r" if right_end in clash else "")

    cond = [l_b["__bucket"] == r_b["__bucket"]] + [l_b[k] == r_b[k] for k in by]
    overlap_len = F.least(F.col(left_end), F.col(re_)) - F.greatest(
        F.col(left_start), F.col(rs)
    )
    owns = l_b["__bucket"] == F.floor(
        F.greatest(F.col(left_start), F.col(rs)) / F.lit(w)
    )
    keep = (overlap_len >= F.lit(float(min_overlap))) & owns
    inner = (
        l_b.join(r_b, cond, "inner")
        .filter(keep)
        .drop(r_b["__bucket"])
        .drop(l_b["__bucket"])
        .drop(*[r_b[k] for k in by])
    )
    if how == "inner":
        return inner
    return _attach_unmatched_left(left, inner, row_col, drop_id=left_id is None)


def resample_timeseries(
    df: DataFrame,
    on: str,
    value_col: str,
    step: float,
    by: Union[None, str, Sequence[str]] = None,
    method: str = "linear",
    max_gap: Optional[float] = None,
    max_grid_rows: Optional[int] = None,
) -> DataFrame:
    """Resample an irregular time series onto the uniform grid of integer
    multiples of ``step`` covering each series' observed span — the
    standard preparation for sequence models over unevenly sampled data
    (light curves, sensor streams): two as-of joins attach the nearest
    observation at-or-before and at-or-after every grid point, and the
    value is interpolated between them.

    ``method``: ``linear`` (default) interpolates
    ``v_prev + (v_next - v_prev) * ((t - t_prev) / (t_next - t_prev))``;
    ``previous`` holds the last observation; ``nearest`` takes whichever
    side is closer (ties to the earlier one). Grid points with either
    side missing (before the first / after the last observation under
    ``linear``) yield NULL. ``max_gap`` bounds how far interpolation may
    reach: under ``linear`` the bracketing span ``t_next - t_prev``,
    under ``previous`` the hold distance ``t - t_prev``, under
    ``nearest`` the distance to the chosen observation — beyond it the
    value is NULL.

    Simultaneous observations (several rows at one (series, t)) collapse
    to their MIN value first: an order-free convention that replays
    engine-exactly (a mean would depend on float summation order).

    Returns ``(by..., on, value_col, on + '_prev', on + '_next')`` —
    ``on`` holding the grid time. Scale shape: one ≤|series|-row span
    aggregate + grid explode, then two as-of joins, each ONE hash
    exchange on ``by`` (see :func:`asof_join`); interpolation is a
    codegen projection. Pass ``by`` for any large input — a global grid
    without it serializes the as-of scan.

    The output size is the CALLER'S grid choice — ``Σ⌈span/step⌉`` over
    all series — and a fine ``step`` over long spans silently multiplies
    the input (all objects at step=0.001 over year-long spans is ~2 B
    rows by design, not by accident). ``max_grid_rows`` makes that
    explicit: when set, the grid size is estimated from the same
    ≤|series|-row span aggregate the grid is built from (one tiny eager
    action — the only action this operator ever fires) and a grid larger
    than the bound raises with the number, BEFORE any as-of join work.
    """
    if step <= 0:
        raise ValueError("step must be > 0")
    if method not in ("linear", "previous", "nearest"):
        raise ValueError(f"method must be linear|previous|nearest, got {method!r}")
    if max_gap is not None and max_gap <= 0:
        raise ValueError("max_gap must be > 0")
    if max_grid_rows is not None and max_grid_rows <= 0:
        raise ValueError("max_grid_rows must be > 0")
    by = _as_list(by)
    keys = by + [on]
    obs = (
        df.filter(F.col(on).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(*keys)
        .agg(F.min(value_col).alias(value_col))
    )
    span = obs.groupBy(*by if by else [F.lit(1).alias("__g")]).agg(
        F.min(on).alias("__tmin"), F.max(on).alias("__tmax")
    )
    lo = F.ceil(F.col("__tmin") / F.lit(step))
    hi = F.floor(F.col("__tmax") / F.lit(step))
    if max_grid_rows is not None:
        est_row = span.select(
            F.sum(
                F.when(lo <= hi, hi - lo + F.lit(1)).otherwise(F.lit(0))
            ).alias("__g")
        ).collect()[0]["__g"]
        est = int(est_row or 0)
        if est > max_grid_rows:
            raise ValueError(
                f"resample grid would emit {est:,} rows "
                f"(max_grid_rows={max_grid_rows:,}): step={step} is too "
                "fine for the observed spans — coarsen step, restrict "
                "the input series, or raise max_grid_rows if you mean it"
            )
    grid = (
        span.filter(lo <= hi)  # sequence(a, b) with a > b counts DOWN — guard
        .select(
            *(by or []),
            F.explode(F.sequence(lo, hi)).alias("__i"),
        )
        .select(*(by or []), (F.col("__i") * F.lit(step)).alias(on))
    )
    prev_side = obs.select(
        *by, F.col(on), F.col(value_col).alias("__vp")
    )
    next_side = obs.select(
        *by, F.col(on), F.col(value_col).alias("__vn")
    )
    g = asof_join(grid, prev_side, on=on, by=by or None,
                  direction="backward", suffix="_prev")
    g = asof_join(g, next_side, on=on, by=by or None,
                  direction="forward", suffix="_next")
    tp, tn = F.col(on + "_prev"), F.col(on + "_next")
    vp, vn = F.col("__vp"), F.col("__vn")
    both = tp.isNotNull() & tn.isNotNull()
    if method == "linear":
        val = F.when(
            both & (tn == tp), vp
        ).when(
            both, vp + (vn - vp) * ((F.col(on) - tp) / (tn - tp))
        )
        if max_gap is not None:
            val = F.when((tn - tp) > F.lit(max_gap), F.lit(None)).otherwise(val)
    elif method == "previous":
        val = F.when(tp.isNotNull(), vp)
        if max_gap is not None:
            val = F.when(
                (F.col(on) - tp) > F.lit(max_gap), F.lit(None)
            ).otherwise(val)
    else:  # nearest
        take_prev = F.col(on) - tp <= tn - F.col(on)
        val = F.when(
            both, F.when(take_prev, vp).otherwise(vn)
        ).when(tp.isNotNull(), vp).when(tn.isNotNull(), vn)
        if max_gap is not None:
            dist = F.when(both, F.when(take_prev, F.col(on) - tp).otherwise(tn - F.col(on))) \
                .when(tp.isNotNull(), F.col(on) - tp) \
                .when(tn.isNotNull(), tn - F.col(on))
            val = F.when(dist > F.lit(max_gap), F.lit(None)).otherwise(val)
    return g.select(
        *(by or []),
        F.col(on),
        val.alias(value_col),
        tp.alias(on + "_prev"),
        tn.alias(on + "_next"),
    )
