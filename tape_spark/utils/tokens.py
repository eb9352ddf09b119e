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

from typing import Optional

__all__ = ["ws_tokens_sql", "assert_max_doc_tokens"]


def ws_tokens_sql(text_col: str) -> str:
    inner = f"trim(lower(coalesce({text_col}, '')))"
    return (
        f"CASE WHEN length({inner}) = 0 "
        f"THEN cast(array() as array<string>) "
        f"ELSE split({inner}, '\\\\s+') END"
    )


def assert_max_doc_tokens(
    docs, text_col: str, max_doc_tokens: Optional[int], op_name: str, ntok=None
) -> None:
    """Opt-in giant-document guard for the token-facing operators
    (bm25/dsir/decontaminate/split_contaminated) — the ``max_grid_rows``
    treatment ``resample_timeseries`` got in round 10, applied to the
    other known one-task cliff.

    Spark's higher-order functions are interpreted, not codegen'd
    (~25 ns/token/expression), and a document's tokens live in ONE task:
    a single 5 M-token document measured ~126 s in bm25's tf pass, and a
    50 M-token pathological doc is ~20 minutes pinning one core with no
    error and no progress signal. When ``max_doc_tokens`` is set, one
    cheap split-count aggregate (token counting only — none of the gram
    machinery, so it costs a small fraction of the pass it protects)
    raises BEFORE any per-token work starts, naming the offender count
    and the worst size. Remedies in the message: ``chunk_documents`` the
    giants first (cross-chunk grams at the seams are the documented
    trade — a gram spanning a chunk boundary is not seen), or filter /
    truncate. ``None`` (the default) skips the scan entirely.

    ``ntok`` lets an operator count with ITS OWN token grammar (a Column
    of per-document token counts). The default counts WHITESPACE tokens —
    exact for the gram operators (they tokenize on whitespace) but an
    UNDERCOUNT for punctuation-split grammars: a minified-JS-like
    document (rare whitespace, heavy punctuation) can hold 20x more
    ``[^a-z0-9]+`` tokens than whitespace tokens, which is precisely the
    kind of document this guard exists for — so BM25 passes its own
    count rather than inheriting the proxy.
    """
    if max_doc_tokens is None:
        return
    if max_doc_tokens <= 0:
        raise ValueError(f"{op_name}: max_doc_tokens must be positive, got {max_doc_tokens}")
    from pyspark.sql import functions as F

    if ntok is None:
        ntok = F.size(F.expr(ws_tokens_sql(text_col)))
    row = docs.agg(
        F.sum((ntok > F.lit(int(max_doc_tokens))).cast("long")).alias("n_over"),
        F.max(ntok).alias("tmax"),
    ).collect()[0]
    n_over = int(row["n_over"] or 0)
    if n_over:
        raise ValueError(
            f"{op_name}: {n_over} document(s) exceed max_doc_tokens="
            f"{int(max_doc_tokens)} (largest = {int(row['tmax'])} tokens). A "
            "document's tokens are processed by interpreted higher-order "
            "functions inside ONE task (~25 ns/token/expression — a 50 M-token "
            "document is ~20 minutes on one core). Pre-split giants with "
            "chunk_documents (grams spanning chunk seams are not matched — "
            "the documented trade), or filter/truncate them before calling."
        )
