"""Helpers for building memoized SQL fragments.

The batch operators' plan-construction cost is dominated by py4j driver↔JVM
round trips: every Column-API call is one synchronous socket exchange
(~0.6 ms), so an operator that assembles a few hundred Column objects
charges ~0.1–0.3 s of driver wall to EVERY invocation (measured r14/r15,
docs/SCALING.md "plan-construction tax"). The fix, proven on the minhash
kernels: build the expression tree ONCE as a plain SQL string (memoized
per parameter tuple — strings are session-lifetime-safe, no JVM refs),
and apply it with one ``selectExpr``/string-``filter`` per FRAME.

Do NOT "improve" this to a single parameterized ``spark.sql(sql, df=frame)``
call: ``{frame}`` substitution re-resolves the frame through a temp view,
which severs cache-manager linkage — persisted inputs silently degrade to
fresh file scans (measured r15, locked by
``test_persisted_inputs_reach_plans_as_inmemory_scans``).
"""

from __future__ import annotations

__all__ = ["qident", "sql_str", "let_sql", "memo_udf", "check_parser_mode"]


def check_parser_mode(spark) -> None:
    """Refuse to apply fragments under a non-default string-literal parser.

    Every memoized fragment escapes its string literals for the DEFAULT
    parser (``spark.sql.parser.escapedStringLiterals=false``, where ``\\``
    sequences are escape-processed). Under ``escapedStringLiterals=true``
    the doubled backslashes in regex literals (``\\\\s+``, ``\\\\b...``)
    parse as DIFFERENT patterns and the text operators would return wrong
    results with no error — so raise at fragment-application time instead
    (one conf read, ~0.6 ms, dwarfed by the ~16 ms/frame analysis floor
    the fragments already pay)."""
    if (
        spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")
        or "false"
    ).lower() == "true":
        raise ValueError(
            "spark.sql.parser.escapedStringLiterals=true changes how the "
            "memoized SQL fragments' string literals parse (regex escapes "
            "would silently become different patterns); unset it (the "
            "default) to use the tape_spark text/curation operators"
        )


def qident(name: str) -> str:
    """Backquote a (possibly alias-qualified dotted) column name for SQL."""
    return ".".join(f"`{p}`" for p in name.split("."))


def sql_str(s: str) -> str:
    """A SQL string literal that parses back to exactly ``s`` under the
    default parser (``spark.sql.parser.escapedStringLiterals=false``,
    where ``\\`` sequences in literals are escape-processed)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def let_sql(bound_expr: str, var: str, body: str) -> str:
    """SQL let-binding: evaluate ``bound_expr`` ONCE per row and bind it to
    the lambda variable ``var`` inside ``body``.

    ``transform``'s argument array is evaluated once and the lambda sees
    its element as a variable lookup, so this gives the same
    evaluate-once guarantee as staging the expression through a separate
    projection — without the extra Dataset (each new Dataset costs an
    eager JVM analysis pass, ~16 ms, the r15-measured construction
    floor). Measured r16 on a 200 k-token document: let-bound == staged
    wall, while inlining the expression into a lambda body directly is
    O(elements × cost(expr)) — the round-10 quadratic-tokenizer trap this
    helper exists to avoid re-introducing.
    """
    return f"element_at(transform(array({bound_expr}), {var} -> {body}), 1)"


# The UDF flavor of the same per-call tax: a pandas_udf defined inside an
# operator body re-cloudpickles its closure and re-registers a JVM
# PythonFunction on EVERY operator call (~10-20 ms, measured r15). The
# kernels are deterministic and parameter-pure, so one UDF object per
# parameter tuple is identical — but a UserDefinedFunction caches its JVM
# handle, which dies with the SparkContext, so the memo key includes the
# application id (a fresh context gets fresh UDF objects; entries for dead
# contexts are dropped on the next miss).
_UDF_MEMO: dict = {}


def memo_udf(key: tuple, build):
    """Return ``build()`` memoized per ``(sparkContext.applicationId, *key)``.

    ``build`` must construct and return the UDF object (closure-pure:
    everything it captures must be derivable from ``key``)."""
    from pyspark.sql import SparkSession

    sess = SparkSession.getActiveSession()
    if sess is None:
        # no active session → no applicationId to scope the entry's
        # lifetime: a (None, *key) memo would survive a SparkContext
        # restart and hand back a UDF whose cached _judf holds a dead JVM
        # handle. Skip the memo entirely; the caller just pays one build.
        return build()
    app = sess.sparkContext.applicationId
    full = (app,) + tuple(key)
    got = _UDF_MEMO.get(full)
    if got is None:
        for k in [k for k in _UDF_MEMO if k[0] != app]:
            del _UDF_MEMO[k]
        got = build()
        _UDF_MEMO[full] = got
    return got
