"""Vector arithmetic over array columns, compiled to scalar codegen.

Spark's higher-order functions (``zip_with``/``aggregate``) are evaluated
*interpreted*, element by element — measured at ~µs-per-element on the
MinHash verify path (docs/SCALING.md, sf100 q4). When the vector width is
known at plan time (embedding dims are fixed per table), the same math
unrolls into a flat tree of ``GetArrayItem`` multiply-adds that
whole-stage codegen compiles like any scalar expression — order-of-
magnitude faster on per-pair hot paths (candidate verification, bucket
sign bits).

``UNROLL_MAX_DIM`` caps the expression width; wider vectors fall back to
the HOF forms (correct, just interpreted) rather than risk codegen
method-size fallbacks.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, functions as F

UNROLL_MAX_DIM = 512


def hof_dot(a: Column, b: Column) -> Column:
    """Interpreted fallback: Σ a[i]·b[i] via zip_with/aggregate."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def hof_sq_norm(col: Column) -> Column:
    return F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)


def dot(a: Column, b: Column, dim: int) -> Column:
    """Σ a[i]·b[i]; unrolled to scalar codegen when ``dim`` is modest."""
    if not 0 < dim <= UNROLL_MAX_DIM:
        return hof_dot(a, b)
    s = a[0] * b[0]
    for i in range(1, dim):
        s = s + a[i] * b[i]
    return s


def dot_lit(a: Column, vals: Sequence[float]) -> Column:
    """Σ a[i]·vals[i] against a plan-time-constant vector (hyperplanes):
    the constants fold straight into the generated code."""
    if not 0 < len(vals) <= UNROLL_MAX_DIM:
        return hof_dot(a, F.array(*[F.lit(float(v)) for v in vals]))
    s = a[0] * F.lit(float(vals[0]))
    for i in range(1, len(vals)):
        s = s + a[i] * F.lit(float(vals[i]))
    return s


def norm(col: Column, dim: int) -> Column:
    """L2 norm, zero-guarded (an all-zero vector scores 0, not NaN —
    Spark sorts NaN above every double, so an unguarded zero vector
    would take rank 1 in every bucket it lands in)."""
    sq = hof_sq_norm(col) if not 0 < dim <= UNROLL_MAX_DIM else _unrolled_sq(col, dim)
    return F.greatest(F.sqrt(sq), F.lit(1e-300))


def _unrolled_sq(col: Column, dim: int) -> Column:
    s = col[0] * col[0]
    for i in range(1, dim):
        s = s + col[i] * col[i]
    return s
