#!/usr/bin/env python
"""Round-15 sf100 probes (one phase per process). Phases close the
round-14 verdict's "Done =" measurement criteria:

  python scripts/probe_sf100_r15.py trigger_verify  # ask #1: the verify-leg attack — r15 split-broadcast verify + cross-trigger store cache at the 50k-doc/5M-store anchor
  python scripts/probe_sf100_r15.py plan_tax        # ask #3: explicit join_mode='slim' plan-construction wall at 1M docs (<0.3s target)
  python scripts/probe_sf100_r15.py auto_decision   # ask #3 companion: full auto-mode decision wall at 1M docs at r15 HEAD

Walls on this host swing 2-3x on identical reps — phases interleave A/B
reps in one process and lead with work-proportional stage metrics from
the status REST API, not bare walls. Emits one JSON line per phase,
appended to BENCH_sf100_r15.json.
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
R12_SCRATCH = os.path.join(REPO, ".benchdata", "r12_scratch")
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
    line = json.dumps(rec)
    print(line, flush=True)
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


def run_with_metrics(spark, fn, top_n=6):
    before = {s["stageId"] for s in _fetch_stages(spark)}
    t0 = time.time()
    result = fn()
    wall = round(time.time() - t0, 2)
    stages = [s for s in _fetch_stages(spark) if s["stageId"] not in before]
    tot = {
        "n_stages": len(stages),
        "tasks": sum(s.get("numTasks", 0) for s in stages),
        "executor_run_ms": sum(s.get("executorRunTime", 0) for s in stages),
        "executor_cpu_ms": sum(s.get("executorCpuTime", 0) for s in stages)
        // 1_000_000,
        "input_mb": round(sum(s.get("inputBytes", 0) for s in stages) / 1e6, 1),
        "input_records": sum(s.get("inputRecords", 0) for s in stages),
    }
    top = sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:top_n]
    tot["top_stages"] = [
        {
            "name": s["name"].split("\n")[0][:90],
            "tasks": s.get("numTasks", 0),
            "run_ms": s.get("executorRunTime", 0),
            "cpu_ms": s.get("executorCpuTime", 0) // 1_000_000,
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "input_records": s.get("inputRecords", 0),
        }
        for s in top
    ]
    return wall, result, tot


def _arrivals(spark, n_arr):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{ZIPF_DIR}/documents.parquet")
    return (
        docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(977)) == 5)
        .limit(n_arr)
        .select(
            (F.col("doc_id") + 200_000_000).alias("doc_id"),
            F.concat("text", F.lit(" tail")).alias("text"),
        )
        .persist()
    )


def main():
    phase = sys.argv[1]

    if phase == "trigger_verify":
        # Ask #1: the 50k-doc trigger against the 5M-doc store at r15
        # HEAD. A = match_batch per trigger (reads the store from parquet
        # each time; r15 split-broadcast verify + memoized kernels),
        # B = the foreachBatch wrapper's cross-trigger cache (first call
        # pays the base materialization, later triggers probe the cache).
        # Interleaved reps after separate warms.
        spark = session()
        from tape_spark.streaming import (
            minhash_match_batch,
            minhash_match_foreach_batch,
        )

        store = f"{R12_SCRATCH}/store_5m"
        arr = _arrivals(spark, 50_000)
        arr.count()

        def run_uncached():
            caches = []
            n = minhash_match_batch(
                arr, store, threshold=0.3, _cleanup=caches
            ).count()
            for c in caches:
                c.unpersist()
            return n

        sink_counts = []
        fn = minhash_match_foreach_batch(
            store,
            lambda df, bid: sink_counts.append(df.count()),
            threshold=0.3,
            append_arrivals=False,
            cache_store=True,
        )

        run_uncached()  # warm A (JIT, page cache)
        t0 = time.time()
        fn(arr, 0)  # B's first trigger: pays the base cache build
        cache_build_wall = round(time.time() - t0, 2)

        walls_a, walls_b, met_a, met_b = [], [], None, None
        n_rows = None
        for rep in range(REPS):
            w, n_rows, met_a = run_with_metrics(spark, run_uncached)
            walls_a.append(w)
            w, _, met_b = run_with_metrics(spark, lambda: fn(arr, rep + 1))
            walls_b.append(w)
        assert sink_counts and all(c == sink_counts[0] for c in sink_counts)
        assert n_rows == sink_counts[0], (n_rows, sink_counts)
        emit(
            phase,
            {
                "n_matches": int(n_rows),
                "uncached": {"walls": walls_a, "stage_split": met_a},
                "cached": {
                    "first_trigger_wall": cache_build_wall,
                    "walls": walls_b,
                    "stage_split": met_b,
                },
            },
        )
        spark.stop()

    elif phase == "plan_tax":
        # Ask #3: driver-side plan construction of an explicit
        # join_mode='slim' call with caller-provided signatures must be
        # <0.3s at 1M docs (no job runs — the return is lazy).
        spark = session()
        from pyspark.sql import functions as F

        from tape_spark.operators.dedup import (
            minhash_near_duplicates,
            minhash_signatures,
        )

        docs = (
            spark.read.parquet(f"{ZIPF_DIR}/documents.parquet")
            .limit(1_000_000)
        )
        sigs = minhash_signatures(docs, num_hashes=128).persist()
        sigs.count()
        walls = []
        for rep in range(REPS + 2):
            t0 = time.time()
            minhash_near_duplicates(
                docs, threshold=0.7, num_hashes=128,
                signatures=sigs, join_mode="slim",
            )
            walls.append(round(time.time() - t0, 3))
        emit(phase, {"slim_plan_walls": walls, "first_is_cold": True})
        spark.stop()

    elif phase == "auto_decision":
        # companion: the full auto decision wall at 1M docs at r15 HEAD
        # (r14: 2.3-2.9s, of which ~0.85s was plan construction)
        spark = session()
        from tape_spark.operators import dedup as D

        docs = (
            spark.read.parquet(f"{ZIPF_DIR}/documents.parquet")
            .limit(1_000_000)
        )
        sigs = D.minhash_signatures(docs, num_hashes=128).persist()
        sigs.count()
        walls, picks = [], []
        for rep in range(REPS + 1):
            t0 = time.time()
            D.minhash_near_duplicates(
                docs, threshold=0.7, num_hashes=128,
                signatures=sigs, join_mode="auto",
            )
            walls.append(round(time.time() - t0, 2))
            picks.append(D._LAST_AUTO_DECISION["picked"])
        emit(phase, {"auto_walls": walls, "picks": picks})
        spark.stop()

    elif phase == "cache_build":
        # the honest caveat on the trigger win: the cross-trigger store
        # cache's FIRST trigger pays the full materialization (~185s in
        # trigger_verify). Decompose it: build wall + executor metrics +
        # cache footprint for the default compressed in-memory columnar
        # format vs compressed=false (the build is CPU-bound on batch
        # compression if the uncompressed build is much faster).
        spark = session()
        from tape_spark.utils.io import read_parquet_snapshot

        store = f"{R12_SCRATCH}/store_5m"

        def storage_bytes():
            with urllib.request.urlopen(f"{_ui_base(spark)}/storage/rdd") as r:
                rdds = json.loads(r.read())
            return {
                "memory_mb": round(sum(x["memoryUsed"] for x in rdds) / 1e6, 1),
                "disk_mb": round(sum(x["diskUsed"] for x in rdds) / 1e6, 1),
            }

        results = {}
        for comp in ("true", "false"):
            spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", comp)
            walls, met, foot = [], None, None
            for rep in range(2):
                e = read_parquet_snapshot(spark, f"{store}/entries").persist()
                s = read_parquet_snapshot(spark, f"{store}/sigs").persist()
                w, _, met = run_with_metrics(
                    spark, lambda: (e.count(), s.count())
                )
                walls.append(w)
                foot = storage_bytes()
                e.unpersist(blocking=True)
                s.unpersist(blocking=True)
            results[f"compressed_{comp}"] = {
                "build_walls": walls,
                "footprint": foot,
                "stage_split": met,
            }
        emit(phase, results)
        spark.stop()

    else:
        raise SystemExit(f"unknown phase {phase!r}")


if __name__ == "__main__":
    main()
