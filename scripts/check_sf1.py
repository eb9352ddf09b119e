#!/usr/bin/env python
"""Standing per-round sf1 correctness sweep (verdict r10 asks #3 and #6).

Runs the ten heaviest oracle rows from ``__spark_entry__.queries()`` at
sf1 (100x the sf0.01 gate: 50k docs / 200k vectors / 1M events) through
the SAME rows+schema+6dp-values comparison the driver uses, PLUS a
planted-pair MinHash oracle that closes the one sf1 exclusion from r10:
the full-corpus exact-Jaccard DuckDB replay is quadratic in
docs-per-shingle on the synthetic 31-word vocabulary, but ~120 planted
documents with engineered bigram overlap make the exact side linear (a
240-doc self-join) while the LSH side still runs over the full
50k+240-doc corpus — so banding is exercised at scale and the oracle
stays cheap.

Planted geometry (all tokens unique per pair, so cross-pair and
base-corpus Jaccard is exactly 0):

- 100 "dup" pairs: A = t0..t40 (40 distinct bigrams), B = t0..t34 then
  u0..u5 (34 shared + 6 unique = 40 bigrams) -> J = 34/46 ~ 0.739 >= 0.7.
- 20 "control" pairs: B shares only the first 8 bigrams, 32 unique ->
  J = 8/72 ~ 0.111 < 0.7 (and far below the 0.3 est_jaccard verify).

At 16 bands x 4 rows the per-dup-pair candidate probability is
1-(1-0.739^4)^16 ~ 0.9965; signatures are deterministic (seeded
xxhash64), so the found-count is a constant of the corpus — the 0.9
recall floor has wide margin, and controls surviving the 0.3 verify
would need est ~ 3x their true Jaccard across 64 draws.

Zero manual steps: regenerates .benchdata/sf1 via make_scale_data.py if
absent, writes the planted parquet idempotently, and emits
``CORRECTNESS_sf1_r{N}.json`` (N = 1 + max existing driver round, or
$ROUND).

Usage: python scripts/check_sf1.py [query ...]
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import time
import traceback

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from check_correctness import TABLES, compare  # noqa: E402

SF1_DIR = os.environ.get("SF1_DIR", os.path.join(REPO, ".benchdata", "sf1"))

# the ten heaviest oracle rows (the set the r9 verdict asked for and the
# r10 manual sweep ran) — scale-dependent wrongness (unit-sum overflow,
# skew tie-breaks, percentile undershoot) is invisible at sf0.01
HEAVY = [
    "dedup_exact",
    "dedup_simhash",
    "decontaminate",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "text_signals",
    "corpus_filter",
    "vocab_topk",
    "doc_fingerprint",
    "stratified_sample",
]


def _detect_round() -> int:
    if os.environ.get("ROUND"):
        return int(os.environ["ROUND"])
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def _git_head() -> str:
    """The tree the sweep ran at, so refreshed artifacts are self-describing."""
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _ensure_sf1() -> None:
    need = ["documents", "embeddings", "events", "lineitem"]
    if all(os.path.exists(os.path.join(SF1_DIR, f"{t}.parquet")) for t in need):
        return
    print(f"regenerating {SF1_DIR} via make_scale_data.py ...", flush=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_scale_data.py"),
         "/root/testdata/sf0.1", SF1_DIR],
        check=True,
    )


def _planted_rows():
    """Deterministic planted corpus: (doc_id, text) far above sf1's id range."""
    rows = []
    base = 10_000_000_000
    for p in range(120):
        dup = p < 100
        t = [f"p{p:04d}t{i:03d}" for i in range(41)]
        shared_tokens = 35 if dup else 9  # bigrams shared = tokens - 1
        n_unique = 41 - shared_tokens  # keep |B| bigrams == 40
        u = [f"p{p:04d}u{i:03d}" for i in range(n_unique)]
        rows.append((base + 2 * p, " ".join(t)))
        rows.append((base + 2 * p + 1, " ".join(t[:shared_tokens] + u)))
    return rows


def _ensure_planted(path: str) -> None:
    if os.path.exists(path):
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids, texts = zip(*_planted_rows())
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}),
        path,
    )


def q_minhash_planted(spark, sf_dir):
    """LSH over the FULL sf1+planted corpus; exact side over planted only."""
    from pyspark.sql import functions as F

    from tape_spark.operators import minhash_near_duplicates, ngram_jaccard_pairs

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .unionByName(
            spark.read.parquet(f"{sf_dir}/planted.parquet").select("doc_id", "text")
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    planted = docs.filter(F.col("doc_id") >= 10_000_000_000)
    lsh = minhash_near_duplicates(
        docs, num_hashes=64, bands=16, threshold=0.3
    ).select("id_a", "id_b")
    # planted ids sit above every corpus id, so restricting on id_a alone
    # keeps exactly the planted-x-planted pairs (pairs are id_a < id_b)
    lsh_planted = lsh.filter(F.col("id_a") >= 10_000_000_000)
    exact = ngram_jaccard_pairs(planted, n=2, threshold=0.7).select("id_a", "id_b")
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    n_hit = exact.join(lsh_planted, ["id_a", "id_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    # control pairs (J~0.111) must NOT survive the 0.3 est_jaccard verify
    n_control = lsh_planted.join(exact, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("n_control_fp")
    )
    return (
        n_exact.crossJoin(n_hit)
        .crossJoin(n_control)
        .select(
            "n_exact",
            (F.col("n_hit") / F.col("n_exact") >= 0.9).alias("recall_ok"),
            (F.col("n_control_fp") == 0).alias("zero_fp"),
        )
    )


MINHASH_PLANTED_SQL = (
    # exact bigram Jaccard over the 240 planted docs ONLY — linear, not
    # the full-corpus quadratic replay the gate-SF oracle uses
    "WITH toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t "
    "FROM planted), "
    "sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] AS shingle "
    "FROM toks, UNNEST(range(1, len(t))) AS r(i)), "
    "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
    "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter "
    "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
    "GROUP BY 1, 2) "
    "SELECT CAST(count(*) AS BIGINT) AS n_exact, true AS recall_ok, true AS zero_fp "
    "FROM pairs JOIN sizes sa ON pairs.id_a = sa.doc_id "
    "JOIN sizes sb ON pairs.id_b = sb.doc_id "
    "WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.7"
)


def main():
    _ensure_sf1()
    planted_path = os.path.join(SF1_DIR, "planted.parquet")
    _ensure_planted(planted_path)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF1_DIR, f"{t}.parquet")
        if os.path.isdir(path):
            path += "/*.parquet"
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    con.execute(
        f"CREATE VIEW planted AS SELECT * FROM read_parquet('{planted_path}')"
    )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    plan = [(n, qs[n], oracles.get(n)) for n in HEAVY]
    plan.append(("dedup_minhash_planted", q_minhash_planted, MINHASH_PLANTED_SQL))

    only = set(sys.argv[1:])
    results, n_pass, n_fail = {}, 0, 0
    for name, fn, osql in plan:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF1_DIR).toPandas()
            odf = con.execute(osql).df()
            verdict = compare(sdf, odf)
        except Exception:
            verdict = "ERROR"
            traceback.print_exc()
        secs = round(time.time() - t0, 1)
        status = "PASS" if verdict.startswith("OK") else "FAIL"
        n_pass += status == "PASS"
        n_fail += status == "FAIL"
        results[name] = {"status": status, "rows": int(len(sdf)) if verdict != "ERROR" else None, "secs": secs}
        if not verdict.startswith("OK"):
            results[name]["detail"] = verdict
        print(f"{status} {name}: {verdict} [{secs}s]", flush=True)
    spark.stop()

    if not only:
        rnd = _detect_round()
        artifact = {
            "round": rnd,
            "head": _git_head(),
            "sf_dir": os.path.relpath(SF1_DIR, REPO),
            "scale_vs_gate": "100x (50k docs / 200k vectors vs the sf0.01 gate)",
            "harness": "scripts/check_sf1.py (auto-regen data + driver-replica compare; planted-pair minhash oracle)",
            "results": results,
            "summary": f"{n_pass} pass / {n_fail} fail",
        }
        out = os.path.join(REPO, f"CORRECTNESS_sf1_r{rnd}.json")
        with open(out, "w") as fh:
            json.dump(artifact, fh, indent=2)
        print(f"wrote {out}: {artifact['summary']}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
