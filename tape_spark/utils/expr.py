"""Pandas-query-dialect → Spark-SQL expression shim.

The reference accepts pandas ``DataFrame.query`` strings (e.g.
``"nobs_total >= 50"``, ``"~(flux > 10) & (band == 'g')"``); Spark SQL
shares most of the dialect but differs on the boolean operators: pandas
uses ``& | ~`` where Spark SQL wants ``AND OR NOT`` (in Spark, ``&``/``|``
are integral bitwise ops and ``~`` is bitwise complement).

Parity target: ``/root/reference/src/tape/ensemble_frame.py:243-281``
(query) — the ``@variable`` interpolation the reference half-supports is
rejected explicitly here.
"""

from __future__ import annotations


def translate_query_expr(expr: str) -> str:
    """Rewrite a pandas-query-style boolean expression into Spark SQL.

    Handles ``&`` → ``AND``, ``|`` → ``OR``, ``~`` → ``NOT``, leaves
    quoted string literals untouched, and rejects ``@variable``
    references. Backtick-quoted identifiers pass through unchanged
    (both dialects use backticks).
    """
    out = []
    i, n = 0, len(expr)
    in_quote: str | None = None
    while i < n:
        ch = expr[i]
        if in_quote:
            out.append(ch)
            if ch == "\\" and i + 1 < n:  # escaped char inside a literal
                out.append(expr[i + 1])
                i += 2
                continue
            if ch == in_quote:
                in_quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            in_quote = ch
            out.append(ch)
        elif ch == "@":
            raise ValueError(
                "@variable references are not supported in query expressions; "
                "format the value into the string instead"
            )
        elif ch == "&":
            out.append(" AND ")
        elif ch == "|":
            out.append(" OR ")
        elif ch == "~":
            out.append(" NOT ")
        else:
            out.append(ch)
        i += 1
    return "".join(out)
