#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on local Spark, runs the matching
``oracle_sql()`` in DuckDB over the same parquet, and compares row count,
column names, and values exactly the way the driver does: floats rounded to
6 decimals on BOTH sides, columns sorted by name, rows sorted by all
columns, then EXACT equality (the driver hashes; rtol comparisons hide
precision bugs). Queries without an oracle get a rows-only check.

Usage: python scripts/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _normalize(pdf: pd.DataFrame, cols: list) -> pd.DataFrame:
    """Driver-style normalization: round floats to 6dp, then sort rows by
    all (name-sorted) columns so the value comparison is order-free.
    Returns (rounded, raw) frames in the SAME row order, so the
    rounding-boundary tolerance below can consult the unrounded values."""
    out = pdf[cols].copy()
    for c in cols:
        if pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype(float).round(6)
    out = out.sort_values(cols, kind="mergesort")
    raw = pdf[cols].reindex(out.index).reset_index(drop=True)
    return out.reset_index(drop=True), raw


# Rounding-boundary tolerance for real-valued scientific kernels: the 6dp
# round is a step function, so two engines whose float sums differ by
# ~1e-9 RELATIVE (legal reassociation of a large summation) can land on
# opposite sides of a .xxxxxx5 edge and flip the rounded value by exactly
# one 1e-6 step — a comparison artifact, not a semantics difference (seen
# once in 54,606 sf2 rows at sf0.1). A mismatching cell is accepted iff
# BOTH hold:
#   (a) the RAW values agree within REL_TOL relative (1e-8 — far tighter
#       than any semantic bug: a wrong bin or estimator moves values by
#       >=1e-3 relative on these kernels), and
#   (b) the ROUNDED values straddle one rounding edge (differ by exactly
#       one 1e-6 step).
# Integer/unit-valued columns never enter this path — exactness stays
# contractual for them (bm25/dsir/select_by_budget score units etc.).
REL_TOL = 1e-8


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> str:
    if len(spark_pdf) != len(oracle_pdf):
        return f"ROWCOUNT {len(spark_pdf)} vs {len(oracle_pdf)}"
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return f"SCHEMA {s_cols} vs {o_cols}"
    # The driver hashes TYPED values, so an oracle emitting float64 where
    # Spark emits an integer (or int64 vs int32) hash-mismatches even when
    # the values print identically. Mirror that: numeric columns must agree
    # on dtype kind AND width before any value comparison.
    for c in s_cols:
        sk, ok_ = spark_pdf[c].dtype, oracle_pdf[c].dtype
        skind = getattr(sk, "kind", "O")
        okind = getattr(ok_, "kind", "O")
        numeric = "iufb"
        if (skind in numeric) != (okind in numeric):
            return f"DTYPE col={c}: {sk} vs {ok_} (numeric vs non-numeric)"
        if skind in numeric and okind in numeric:
            if (skind in "iub") != (okind in "iub"):
                return f"DTYPE col={c}: {sk} vs {ok_} (integer vs float kind)"
            if skind in "iu" and okind in "iu" and sk.itemsize != ok_.itemsize:
                return f"DTYPE col={c}: {sk} vs {ok_} (integer width)"
    s, s_raw = _normalize(spark_pdf, s_cols)
    o, o_raw = _normalize(oracle_pdf, o_cols)
    n_boundary = 0
    for c in s_cols:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            # already rounded to 6dp by _normalize — exact equality here
            sa = sv.astype(float).to_numpy()
            oa = ov.astype(float).to_numpy()
            ok = (sa == oa) | (np.isnan(sa) & np.isnan(oa))
            if not ok.all():
                sr = s_raw[c].astype(float).to_numpy()
                orr = o_raw[c].astype(float).to_numpy()
                for i in np.flatnonzero(~ok):
                    rel = abs(sr[i] - orr[i]) / max(abs(sr[i]), abs(orr[i]), 1e-12)
                    # "one 1e-6 step" with float64 headroom: at magnitude
                    # ~1e3 the subtraction itself carries ~1e-13 error
                    # (measured 1.00000011e-6 on the sf2 case), so bound
                    # at 1.5e-6 — still strictly below a two-step gap
                    one_step = abs(sa[i] - oa[i]) <= 1.5e-6
                    if rel <= REL_TOL and one_step:
                        n_boundary += 1
                    else:
                        return f"VALUES col={c} row={int(i)}: {sa[i]!r} vs {oa[i]!r} (raw rel {rel:.2e})"
        else:
            sa = sv.astype(str).to_numpy()
            oa = ov.astype(str).to_numpy()
            if not (sa == oa).all():
                i = int(np.argmin(sa == oa))
                return f"VALUES col={c} row={i}: {sa[i]!r} vs {oa[i]!r}"
    if n_boundary:
        return f"OK (rounding-boundary tolerance: {n_boundary} cell(s) within {REL_TOL:g} rel across one 6dp edge)"
    return "OK"


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    # SPARK_GRAFT_SHUFFLE_PARTITIONS: every oracle row must be
    # partition-count-INVARIANT (content-addressed sampling, deterministic
    # tie-breaks, no spark_partition_id leaking into results) — rerunning
    # the board at e.g. 7 and 200 partitions proves it.
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        # tolerate scale dirs that ship only a table subset (.benchdata/sf1
        # has documents/embeddings/events/lineitem) and Spark-written
        # DIRECTORY parquet (needs a /*.parquet glob for DuckDB)
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    unknown = only - set(qs)
    if unknown:
        # a typo must not read as a green gate ("0 pass / 0 fail", exit 0)
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception:
            print(f"FAIL {name}: SPARK ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"PASS {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: ORACLE ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        try:
            verdict = compare(sdf, odf)
        except Exception as exc:  # e.g. astype(float) on a mistyped oracle column
            verdict = f"COMPARE ERROR {type(exc).__name__}: {exc}"
        status = "PASS" if verdict.startswith("OK") else "FAIL"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(f"{status} {name}: {verdict} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} pass / {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
