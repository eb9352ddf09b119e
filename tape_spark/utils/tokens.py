"""The ONE guarded whitespace tokenizer every text operator shares.

NULL / empty / SPACE-only text tokenizes to an EMPTY array. ``trim``
strips 0x20 only — identically in Spark and DuckDB, which is the
cross-engine convention all oracle replays rely on — so a tab/newline-
edged blank still yields phantom ``''`` tokens; what the single helper
guarantees is that every operator half (detection vs rebuild, gate vs
walk) sees the SAME array for the same text. An unguarded
``split(trim(lower(text)), '\\s+')`` yields ``['']`` — one phantom
token — on blank input, which skews position-aligned operators at
window size 1 (ADVICE r9).

This is a SQL-string helper on purpose (not a Column): the callers
embed it in ``F.expr`` projections that STAGE the token array before
any ``transform`` lambda touches it — inlining a split expression
inside a lambda re-evaluates the regex per element, O(tokens²) per
document (the round-10 long-doc probe bug).
"""

from __future__ import annotations

__all__ = ["ws_tokens_sql"]


def ws_tokens_sql(text_col: str) -> str:
    inner = f"trim(lower(coalesce({text_col}, '')))"
    return (
        f"CASE WHEN length({inner}) = 0 "
        f"THEN cast(array() as array<string>) "
        f"ELSE split({inner}, '\\\\s+') END"
    )
