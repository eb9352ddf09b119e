"""Vector arithmetic over array columns, compiled to scalar codegen.

Spark's higher-order functions (``zip_with``/``aggregate``) are evaluated
*interpreted*, element by element — measured at ~µs-per-element on the
MinHash verify path (docs/SCALING.md, sf100 q4). When the vector width is
known at plan time (embedding dims are fixed per table), a dot product
unrolls into a flat tree of ``GetArrayItem`` multiply-adds that
whole-stage codegen compiles like any scalar expression — order-of-
magnitude faster on per-pair hot paths (candidate verification after a
join).

Scope note — why only the post-join dot is offered unrolled: an unrolled
expression placed BEFORE an exchange (per-row casts, norms, bucket bits)
feeds many consumers, and the optimizer's projection collapse inlines the
whole ``CreateArray`` into each of them — measured ~22 s of planning and
a driver-memory blowup on the LSH path at dim 64. After a shuffle or
broadcast the vectors are concrete exchange attributes, so unrolling is
pure win exactly where the quadratic (per-pair) work happens; per-row
prep stays in HOF form, whose per-element interpretation is amortized
over rows, not pairs.

``UNROLL_MAX_DIM`` caps the expression width; wider vectors fall back to
the HOF form (correct, just interpreted) rather than risk codegen
method-size fallbacks.
"""

from __future__ import annotations

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
    """Σ a[i]·b[i]; unrolled to scalar codegen when ``dim`` is modest.

    Use on per-pair expressions AFTER a join/exchange (see module
    docstring); both sides must be attribute references there, so the
    unroll cannot be inlined into other consumers.
    """
    if not 0 < dim <= UNROLL_MAX_DIM:
        return hof_dot(a, b)
    s = a[0] * b[0]
    for i in range(1, dim):
        s = s + a[i] * b[i]
    return s
