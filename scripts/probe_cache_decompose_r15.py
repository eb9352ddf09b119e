#!/usr/bin/env python
"""Fourth-session r15 probe: rebuild the 5M-doc store and decompose the
first-trigger store-cache build (OPTIMIZATION_r15.md "Not yet optimized"
#1 / §9 — the sf100 artifact shows ~2 843 s executor for the build vs
~55 s for plain scans of the same 85 M rows, and the local 2 M-row
reproduction could not attribute it).

Phases (one process each, sf100 shuffle-reclaim convention):

  python scripts/probe_cache_decompose_r15.py build_store
      # zipf 5M docs -> signatures (signature_bits=32, the r12 recipe)
      # -> minhash_save_store at .benchdata/r15_scratch/store_5m
  python scripts/probe_cache_decompose_r15.py decompose
      # interleaved A/B: noop-scan vs persist-build (the r15 HEAD cache
      # path), ENTRIES AND SIGS SEPARATELY.  The first run of this phase
      # also carried localCheckpoint legs; their blocks cannot be freed
      # promptly (ContextCleaner releases them on GC, not on deref), so
      # the leaked 10-24 GB inflated later reps' jvmGcTime — the legs
      # were removed and the phase re-run (first-run record kept in the
      # session log; its best reps agree with the clean run)

Work-proportional stage metrics from the status REST API lead; walls are
reported but this host swings 2-3x under external load (steal time).
Emits one JSON line per phase, appended to $PROBE_OUT (default
BENCH_sf100_r15.json, replacing same-phase rows).
"""

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ZIPF_DIR = os.environ.get(
    "PROBE_ZIPF_DIR", os.path.join(REPO, ".benchdata", "sf100_zipf")
)
SCRATCH = os.path.join(REPO, ".benchdata", "r15_scratch")
OUT = os.environ.get("PROBE_OUT", os.path.join(REPO, "BENCH_sf100_r15.json"))
REPS = int(os.environ.get("PROBE_REPS", "3"))


def session(extra=None):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "96g"))
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIR", "/tmp/spark-probe"))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def emit(phase, payload):
    rec = {"phase": phase, **payload}
    print(json.dumps(rec), flush=True)
    existing = []
    if os.path.exists(OUT):
        with open(OUT) as fh:
            existing = [json.loads(l) for l in fh if l.strip()]
    existing = [r for r in existing if r.get("phase") != phase]
    existing.append(rec)
    with open(OUT, "w") as fh:
        for r in existing:
            fh.write(json.dumps(r) + "\n")


def _ui_base(spark):
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    return f"{url}/api/v1/applications/{app}"


def _fetch_stages(spark):
    with urllib.request.urlopen(f"{_ui_base(spark)}/stages?status=complete") as r:
        return json.loads(r.read())


def run_with_metrics(spark, fn, top_n=4):
    before = {s["stageId"] for s in _fetch_stages(spark)}
    t0 = time.time()
    result = fn()
    wall = round(time.time() - t0, 2)
    stages = [s for s in _fetch_stages(spark) if s["stageId"] not in before]
    tot = {
        "wall": wall,
        "run_ms": sum(s.get("executorRunTime", 0) for s in stages),
        "cpu_ms": sum(s.get("executorCpuTime", 0) for s in stages) // 1_000_000,
        "input_mb": round(sum(s.get("inputBytes", 0) for s in stages) / 1e6, 1),
        "input_records": sum(s.get("inputRecords", 0) for s in stages),
        "gc_ms": sum(s.get("jvmGcTime", 0) for s in stages),
    }
    return tot, result


def main():
    phase = sys.argv[1]

    if phase == "build_store":
        spark = session()
        from pyspark.sql import functions as F

        from tape_spark.operators import minhash_signatures
        from tape_spark.streaming import minhash_save_store

        os.makedirs(SCRATCH, exist_ok=True)
        docs = (
            spark.read.parquet(f"{ZIPF_DIR}/documents.parquet")
            .repartition(64)
            .persist()
        )
        n_docs = docs.count()
        t0 = time.time()
        sigs = minhash_signatures(docs, signature_bits=32).persist()
        sigs.count()
        sig_secs = round(time.time() - t0, 1)
        path = f"{SCRATCH}/store_5m"
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        t0 = time.time()
        minhash_save_store(sigs, path, num_entry_buckets=64, num_sig_buckets=32)
        save_secs = round(time.time() - t0, 1)
        emit(phase, {"n_docs": n_docs, "corpus_sig_secs": sig_secs,
                     "save_secs": save_secs, "path": path})
        spark.stop()

    elif phase == "decompose":
        # The question §9 could not answer: WHERE do the ~2 843 s of
        # first-trigger executor time go?  Separate the two tables and
        # compare two materializations per table, interleaved:
        #   scan  — noop write of the snapshot read (floor: bytes+decode)
        #   cache — persist(MEMORY_AND_DISK)+count, the r15 HEAD path
        spark = session()
        from pyspark import StorageLevel

        from tape_spark.utils.io import read_parquet_snapshot

        store = f"{SCRATCH}/store_5m"

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        def storage_mb():
            with urllib.request.urlopen(f"{_ui_base(spark)}/storage/rdd") as r:
                rdds = json.loads(r.read())
            return {
                "memory_mb": round(sum(x["memoryUsed"] for x in rdds) / 1e6, 1),
                "disk_mb": round(sum(x["diskUsed"] for x in rdds) / 1e6, 1),
            }

        results = {}

        def record(key, met, foot=None):
            row = results.setdefault(key, {"reps": []})
            if foot is not None:
                met = {**met, **foot}
            row["reps"].append(met)

        sc = spark.sparkContext
        for rep in range(REPS):
            for table in ("entries", "sigs"):
                snap = lambda: read_parquet_snapshot(spark, f"{store}/{table}")

                sc.setJobDescription(f"scan {table} rep{rep}")
                met, _ = run_with_metrics(spark, lambda: noop(snap()))
                record(f"scan_{table}", met)

                sc.setJobDescription(f"cache {table} rep{rep}")
                df = snap().persist(StorageLevel.MEMORY_AND_DISK)
                met, _ = run_with_metrics(spark, df.count)
                record(f"cache_{table}", met, storage_mb())
                df.unpersist(blocking=True)
        sc.setJobDescription(None)
        emit(phase, results)
        spark.stop()

    elif phase == "decompose_conf":
        # config variants for the SQL cache build of the slow table(s):
        # compressed=false and batchSize=100k, fresh session each.
        from pyspark import StorageLevel

        store = f"{SCRATCH}/store_5m"
        results = {}
        for label, conf in (
            ("uncompressed", {"spark.sql.inMemoryColumnarStorage.compressed": "false"}),
            ("batch100k", {"spark.sql.inMemoryColumnarStorage.batchSize": "100000"}),
        ):
            spark = session(conf)
            from tape_spark.utils.io import read_parquet_snapshot

            per = {}
            for table in ("entries", "sigs"):
                reps = []
                for rep in range(REPS):
                    df = read_parquet_snapshot(
                        spark, f"{store}/{table}"
                    ).persist(StorageLevel.MEMORY_AND_DISK)
                    met, _ = run_with_metrics(spark, df.count)
                    df.unpersist(blocking=True)
                    reps.append(met)
                per[table] = reps
            results[label] = per
            spark.stop()
        emit(phase, results)

    else:
        raise SystemExit(f"unknown phase {phase!r}")


if __name__ == "__main__":
    main()
