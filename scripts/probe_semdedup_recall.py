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


if __name__ == "__main__":
    main()
