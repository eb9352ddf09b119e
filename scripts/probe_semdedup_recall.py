#!/usr/bin/env python
"""Cross-cluster recall of semantic_dedup at sf1 (round-9 verdict item 6).

The clone contract proves co-clustered duplicates merge; it cannot see
pairs the coarse quantizer SPLITS across clusters — by design (SemDeDup:
the clustering IS the candidate generator), but previously a sentence,
not a number. This probe quantifies it: brute-force all cosine>=tau
pairs over the sf1 embeddings (20k x 64, blockwise numpy on the driver)
and report, per num_clusters, the fraction of those pairs that
semantic_dedup lands in the same duplicate GROUP.

Appends one JSON line per (tau, num_clusters) to $PROBE_OUT (default
/root/repo/.benchdata/probe_semdedup_recall.jsonl).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PROBE_SF_DIR", "/root/repo/.benchdata/sf1")
OUT = os.environ.get(
    "PROBE_OUT", "/root/repo/.benchdata/probe_semdedup_recall.jsonl"
)


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tape_spark.operators import semantic_dedup

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    n = len(ids)

    for tau in (0.95, 0.90):
        # brute-force >=tau pairs, blockwise (upper triangle)
        prs, pcs = [], []
        block = 2048
        for lo in range(0, n, block):
            sims = mat[lo : lo + block] @ mat.T
            rows, cols = np.nonzero(sims >= tau)
            rows = rows + lo
            keep = rows < cols
            prs.append(rows[keep])
            pcs.append(cols[keep])
        bf_a = ids[np.concatenate(prs)]
        bf_b = ids[np.concatenate(pcs)]
        n_pairs = len(bf_a)
        for k in (16, 64, 256, 1024):
            t0 = time.time()
            out = (
                semantic_dedup(
                    emb,
                    threshold=tau,
                    num_clusters=k,
                    train_sample=8192,
                    seed=11,
                )
                .toPandas()
                .set_index("vec_id")
            )
            grp = out["group_id"]
            same = int((grp.loc[bf_a].to_numpy() == grp.loc[bf_b].to_numpy()).sum())
            rec = {
                "phase": "semdedup_recall",
                "sf_dir": SF_DIR,
                "tau": tau,
                "num_clusters": k,
                "bf_pairs": n_pairs,
                "recovered": same,
                "recall": round(same / n_pairs, 4) if n_pairs else None,
                "sec": round(time.time() - t0, 1),
            }
            with open(OUT, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(json.dumps(rec))
    spark.stop()


def jittered():
    """The clone-table recall above is trivially 1.0 (every tau-pair is an
    IDENTICAL clone pair, and identical vectors always share a nearest
    centroid). This phase plants the pairs the quantizer CAN split:
    non-identical near-duplicates. For every 10th original vector v,
    plant a partner v' = normalize(v + eps*u) with u a deterministic unit
    vector orthogonal to v and eps = 0.292 (cos(v, v') ~ 0.96). Recall =
    fraction of planted (v, v') pairs semantic_dedup lands in the same
    duplicate group, per num_clusters — the measured cost of "the
    clustering IS the candidate generator" (SemDeDup's own trade)."""
    import time as _t

    from pyspark.sql import SparkSession
    from pyspark.sql import types as T

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tape_spark.operators import semantic_dedup

    pdf = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids = pdf["vec_id"].to_numpy()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    n, dim = mat.shape

    sel = np.arange(0, n, 10)
    rng_dirs = np.vstack(
        [np.sin((int(ids[i]) + 1) * (np.arange(dim) + 3.0)) for i in sel]
    )
    # orthogonalize against v, normalize, mix at eps
    v = mat[sel]
    u = rng_dirs - (rng_dirs * v).sum(axis=1, keepdims=True) * v
    u /= np.maximum(np.linalg.norm(u, axis=1, keepdims=True), 1e-300)
    eps = 0.292
    w = v + eps * u
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    cos = (v * w).sum(axis=1)
    partner_ids = ids[sel] + 10_000_000

    rows = [
        (int(i), [float(x) for x in mat[j]])
        for j, i in enumerate(ids)
    ] + [
        (int(pid), [float(x) for x in w[j]])
        for j, pid in enumerate(partner_ids)
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    emb = spark.createDataFrame(rows, schema)
    tau = 0.95  # below the planted cos ~0.96, above the background sims
    for k in (16, 64, 256, 1024):
        t0 = _t.time()
        out = (
            semantic_dedup(
                emb, threshold=tau, num_clusters=k, train_sample=8192, seed=11
            )
            .toPandas()
            .set_index("vec_id")
        )
        grp = out["group_id"]
        same = int(
            (grp.loc[ids[sel]].to_numpy() == grp.loc[partner_ids].to_numpy()).sum()
        )
        rec = {
            "phase": "semdedup_recall_jittered",
            "sf_dir": SF_DIR,
            "planted_pairs": len(sel),
            "planted_cos_min": round(float(cos.min()), 4),
            "num_clusters": k,
            "recovered": same,
            "recall": round(same / len(sel), 4),
            "sec": round(_t.time() - t0, 1),
        }
        with open(OUT, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "jittered":
        jittered()
    else:
        main()
