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

__all__ = ["qident", "sql_str"]


def qident(name: str) -> str:
    """Backquote a (possibly alias-qualified dotted) column name for SQL."""
    return ".".join(f"`{p}`" for p in name.split("."))


def sql_str(s: str) -> str:
    """A SQL string literal that parses back to exactly ``s`` under the
    default parser (``spark.sql.parser.escapedStringLiterals=false``,
    where ``\\`` sequences in literals are escape-processed)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
