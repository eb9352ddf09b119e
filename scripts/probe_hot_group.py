#!/usr/bin/env python
"""Hot-group probe: one text duplicated 1M times inside a 5M-doc corpus.

A realistic 100 TB hot key — an empty page, a cookie banner, a scraped
error template — puts 10^6..10^8 identical documents into ONE
text-hash group / near-dup component. Window.partitionBy drags every
copy's full row through one unsplittable sort task; the round-11
rewrites (min_by keep-first, two-pass argmax resolve) partial-aggregate
the group map-side so the exchange carries one candidate per input
partition. This probe A/Bs the shipped aggregation paths against
inline replicas of the removed window plans on the planted corpus and
checks both produce the same survivors.

Appends phase "hot_group" to BENCH_sf100_r11.json.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("PROBE_SF_DIR", os.path.join(REPO, ".benchdata", "sf100"))
OUT = os.path.join(REPO, "BENCH_sf100_r11.json")
HOT_COPIES = int(os.environ.get("PROBE_HOT_COPIES", "1000000"))


def main():
    from pyspark.sql import SparkSession, functions as F, Window

    from tape_spark.operators import dedup_keep_first, resolve_duplicates

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Plant the hot group: the first HOT_COPIES doc_ids all become one
    # boilerplate string; the rest of the corpus is untouched.
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") < HOT_COPIES,
                F.lit("error 404 page not found please try again later " * 10),
            ).otherwise(F.col("text")),
        )
        .repartition(64)
        .persist()
    )
    n = docs.count()
    rec = {"phase": "hot_group", "sf_dir": SF_DIR, "rows": n, "hot_copies": HOT_COPIES}
    print({"input": n, "hot": HOT_COPIES}, flush=True)

    # -- keep-first: shipped min_by aggregation vs the removed window plan.
    # Parity is on the SURVIVOR ID SET (order-free xor of id hashes), not
    # row counts — both paths emit one row per text group by construction,
    # so a count comparison could never catch a wrong survivor.
    def _id_checksum(frame):
        row = frame.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("doc_id")).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"] or 0)

    t0 = time.time()
    agg_sig = _id_checksum(dedup_keep_first(docs))
    rec["keep_first_agg_secs"] = round(time.time() - t0, 1)

    w = Window.partitionBy(F.xxhash64(F.col("text")), F.length("text")).orderBy(
        F.col("doc_id").asc()
    )
    t0 = time.time()
    win_sig = _id_checksum(
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    rec["keep_first_window_secs"] = round(time.time() - t0, 1)
    rec["keep_first_rows_match"] = bool(agg_sig == win_sig)
    print({k: rec[k] for k in list(rec)[-3:]}, flush=True)

    # -- resolve: one component holding every hot copy
    clusters = (
        docs.filter(F.col("doc_id") < HOT_COPIES)
        .select("doc_id")
        .withColumn("component", F.lit(0).cast("long"))
        .persist()
    )
    clusters.count()
    qual = docs.select("doc_id", F.length("text").alias("q")).persist()
    qual.count()

    t0 = time.time()
    agg_kept_n, agg_kept_h = _id_checksum(
        resolve_duplicates(qual, clusters, quality_col="q")
    )
    rec["resolve_agg_secs"] = round(time.time() - t0, 1)

    worder = Window.partitionBy("component").orderBy(
        F.desc_nulls_last("q"), F.asc("doc_id")
    )
    member = clusters.join(qual, "doc_id", "left")
    t0 = time.time()
    win_kept_n, win_kept_h = _id_checksum(
        qual.join(
            member.withColumn("__rk", F.row_number().over(worder))
            .filter(F.col("__rk") > 1)
            .select("doc_id"),
            "doc_id",
            "left_anti",
        )
    )
    rec["resolve_window_secs"] = round(time.time() - t0, 1)
    rec["resolve_rows_match"] = bool(
        (agg_kept_n, agg_kept_h) == (win_kept_n, win_kept_h)
    )
    rec["resolve_kept"] = int(agg_kept_n)
    print({k: rec[k] for k in list(rec)[-4:]}, flush=True)

    existing = []
    if os.path.exists(OUT):
        with open(OUT) as fh:
            existing = [json.loads(l) for l in fh if l.strip()]
    existing = [
        r
        for r in existing
        if not (
            r.get("phase") == "hot_group"
            and r.get("hot_copies") == HOT_COPIES
            and r.get("sf_dir", SF_DIR) == SF_DIR
        )
    ]
    existing.append(rec)
    with open(OUT, "w") as fh:
        for r in existing:
            fh.write(json.dumps(r) + "\n")
    print(json.dumps(rec))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
