#!/usr/bin/env python
"""Round-8 sf100 probes (run each phase as its own process so every JVM
exit reclaims its shuffle files, as the sf100 methodology prescribes):

  python scripts/probe_sf100_r8.py write_bucketed   # one-time bucketed write
  python scripts/probe_sf100_r8.py q3q6_bucketed    # SF2 + bin_sources chains from the bucketed table
  python scripts/probe_sf100_r8.py q3q6_raw         # same chains from raw parquet (baseline re-check)
  python scripts/probe_sf100_r8.py q10_ab           # curation pipeline: ingest-repartition A/B
  python scripts/probe_sf100_r8.py ann              # IVF/LSH recall + wall at 2M vectors

Appends one JSON line per phase to $PROBE_OUT (default
/root/repo/.benchdata/probe_sf100_r8.jsonl). Extends the round-7
bucketed-storage verification (BENCH_sf100_bucketed.json) to q3/q6/q10
and probes the approximate ANN paths at scale (round-8 verdict items 3
and 7).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PROBE_SF_DIR", "/root/repo/.benchdata/sf100")
OUT = os.environ.get("PROBE_OUT", "/root/repo/.benchdata/probe_sf100_r8.jsonl")
WAREHOUSE = "/root/repo/.benchdata/warehouse"
DERBY = "/root/repo/.benchdata/derby"


def session():
    from pyspark.sql import SparkSession

    os.makedirs(DERBY, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[32]")
        .enableHiveSupport()
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.warehouse.dir", WAREHOUSE)
        .config("spark.driver.extraJavaOptions", f"-Dderby.system.home={DERBY}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def emit(phase: str, payload: dict):
    rec = {"phase": phase, "sf": 100.0, **payload}
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def _ens_raw(spark):
    import __spark_entry__ as em

    return em._ensemble(spark, SF_DIR)


def _ens_bucketed(spark):
    from tape_spark import ColumnMapper, Ensemble

    cm = ColumnMapper(
        id_col="l_orderkey",
        time_col="t",
        flux_col="l_extendedprice",
        err_col="l_quantity",
        band_col="l_returnflag",
    )
    return Ensemble(spark).from_table("lineitem_sf100_b", column_mapper=cm)


def q3_chain(ens):
    ens.prune(threshold=5)
    return ens.sf2(sf_method="basic").count()


def q6_chain(ens):
    ens.bin_sources(time_window=604800.0, count_col="bin_count")
    return ens.frames["source"].count()


def main():
    phase = sys.argv[1]
    spark = session()

    if phase == "write_bucketed":
        t0 = time.time()
        _ens_raw(spark).save_bucketed("lineitem_sf100_b", num_buckets=64)
        emit(phase, {"write_sec": round(time.time() - t0, 1)})

    elif phase in ("q3q6_bucketed", "q3q6_raw"):
        loader = _ens_bucketed if phase.endswith("bucketed") else _ens_raw
        reps = int(os.environ.get("PROBE_REPS", "2"))
        res = {}
        for q, chain in (("q3_sf2_basic", q3_chain), ("q6_bin_sources", q6_chain)):
            ts = []
            for _ in range(reps):
                e = loader(spark)
                t0 = time.time()
                chain(e)
                ts.append(round(time.time() - t0, 1))
            res[q] = ts
        emit(phase, {"reps": res})

    elif phase == "q10_ab":
        from pyspark.sql import functions as F

        from tape_spark.operators import (
            chunk_documents,
            decontaminate,
            stratified_sample,
        )

        def pipeline(docs):
            # exactly bench.py's q10 body, so numbers compare 1:1
            bench_set = docs.filter(F.col("doc_id") % 23 == 0)
            train = docs.filter(F.col("doc_id") % 23 != 0)
            clean = decontaminate(train, bench_set, n=3).filter(
                ~F.col("is_contaminated")
            )
            kept = stratified_sample(
                train.join(clean.select("doc_id"), "doc_id", "left_semi"),
                "lang",
                {"en": 0.8, "de": 0.8, "fr": 0.8, "es": 0.8, "zh": 0.8},
            )
            return chunk_documents(kept, chunk_tokens=64, overlap_tokens=8).count()

        raw = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        res = {}
        for mode in ("presplit", "repartitioned"):
            docs = raw if mode == "presplit" else raw.repartition(32)
            ts = []
            for _ in range(int(os.environ.get("PROBE_REPS", "2"))):
                t0 = time.time()
                pipeline(docs)
                ts.append(round(time.time() - t0, 1))
            res[mode] = ts
        emit(phase, {"reps": res})

    elif phase == "ann":
        from pyspark.sql import functions as F

        from tape_spark.operators import cosine_topk
        from tape_spark.operators.similarity import ivf_cosine_topk, lsh_cosine_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        n = emb.count()
        queries = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )

        def pairs(df):
            return {(r["query_id"], r["corpus_id"]) for r in df.collect()}

        t0 = time.time()
        exact = pairs(cosine_topk(emb, queries, k=10))
        brute_sec = round(time.time() - t0, 1)
        res = {"n_vectors": n, "brute_sec": brute_sec}
        for name, fn, kw in (
            (
                "ivf",
                ivf_cosine_topk,
                {"num_clusters": 64, "nprobe": 8, "train_sample": 8192},
            ),
            ("lsh", lsh_cosine_topk, {"num_planes": 8, "num_tables": 4}),
        ):
            t0 = time.time()
            approx = pairs(fn(emb, queries, k=10, **kw))
            sec = round(time.time() - t0, 1)
            res[name] = {
                "sec": sec,
                "recall": round(len(approx & exact) / max(1, len(exact)), 4),
                "params": kw,
            }
        emit(phase, res)

    else:
        raise SystemExit(f"unknown phase {phase!r}")
    spark.stop()


if __name__ == "__main__":
    main()
