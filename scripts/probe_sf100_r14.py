#!/usr/bin/env python
"""Round-14 sf100 probes (one phase per process). Phases close the
round-13 verdict's "Done =" measurement criteria:

  python scripts/probe_sf100_r14.py cold_bm25        # ask #1: composed BM25 on compacted-vs-uncompacted under the emulated cold object store
  python scripts/probe_sf100_r14.py cold_pointlookup # ask #1+#2: store point lookup 64-vs-320 buckets, plain vs chunk-pushed bucket IN, cold+throttled
  python scripts/probe_sf100_r14.py cold_trigger50k  # ask #1: a 50k-doc trigger under the throttle, both bucket counts
  python scripts/probe_sf100_r14.py trigger_decompose# ask #5: per-stage split of one 50k trigger + Arrow-batch attack
  python scripts/probe_sf100_r14.py asof_salted      # ask #4: salted two-phase asof vs the single-sort celebrity drag at 100M events
  python scripts/probe_sf100_r14.py automode_sampled # ask #3: sampled decision pass <1s at 1M docs, pick unchanged vs exact

The cold object-store regime is EMULATED, not asserted (the r13 gap):
the four preserved index/store generations are copied onto a loopback
ext4 mount (.benchdata/coldstore_mnt on /dev/loop1) and the probe
process joins a cgroup-v1 blkio group throttled to 80 MiB/s + 1000 read
IOPS on that device only (shuffle/local dirs stay unthrottled — the
throttle models the REMOTE store, not the cluster disks). v1 blkio
throttles buffered READS correctly (only buffered writes escape it);
validated: 20 cold files read at 83 MB/s in-group vs 840 MB/s out.
Setup (root, documented for reproduction):

  truncate -s 12G .benchdata/coldstore.img
  losetup /dev/loop1 .benchdata/coldstore.img && mkfs.ext4 -F /dev/loop1
  mount /dev/loop1 .benchdata/coldstore_mnt  # then cp the index dirs in
  mkdir /sys/fs/cgroup/blkio/sparkcold
  echo "7:1 83886080" > .../sparkcold/blkio.throttle.read_bps_device
  echo "7:1 1000"     > .../sparkcold/blkio.throttle.read_iops_device

Emits one JSON line per phase, appended to BENCH_sf100_r14.json.
"""

import json
import os
import statistics
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("PROBE_SF_DIR", os.path.join(REPO, ".benchdata", "sf100"))
ZIPF_DIR = os.environ.get("PROBE_ZIPF_DIR", os.path.join(REPO, ".benchdata", "sf100_zipf"))
R12_SCRATCH = os.path.join(REPO, ".benchdata", "r12_scratch")
R13_SCRATCH = os.path.join(REPO, ".benchdata", "r13_scratch")
COLD_MNT = os.environ.get("PROBE_COLD_MNT", os.path.join(REPO, ".benchdata", "coldstore_mnt"))
CGROUP = "/sys/fs/cgroup/blkio/sparkcold"
LOOP_DEV = "7:1"
OUT = os.environ.get("PROBE_OUT", os.path.join(REPO, "BENCH_sf100_r14.json"))
REPS = int(os.environ.get("PROBE_REPS", "2"))


def session(extra=None):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
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
    rec = {"phase": phase, "sf_dir": SF_DIR, **payload}
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


def drop_caches():
    os.system("sync; echo 3 > /proc/sys/vm/drop_caches")


def join_cold_cgroup():
    """Move THIS process (and every child it forks/execs from now on —
    the py4j JVM, its Python workers) into the throttled blkio group."""
    with open(f"{CGROUP}/cgroup.procs", "w") as f:
        f.write(str(os.getpid()))


def blkio_read_stats():
    """(bytes, ios) read from the loop device by the throttled group."""
    out = {}
    for fname, key in (
        ("blkio.throttle.io_service_bytes", "bytes"),
        ("blkio.throttle.io_serviced", "ios"),
    ):
        val = 0
        with open(f"{CGROUP}/{fname}") as f:
            for line in f:
                parts = line.split()
                if len(parts) == 3 and parts[0] == LOOP_DEV and parts[1] == "Read":
                    val = int(parts[2])
        out[key] = val
    return out


# --- per-run stage metrics via the status REST API (UI must be on) ---


def _ui_base(spark):
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    return f"{url}/api/v1/applications/{app}"


def _fetch_stages(spark):
    with urllib.request.urlopen(f"{_ui_base(spark)}/stages?status=complete") as r:
        return json.loads(r.read())


def _stage_task_skew(spark, stage):
    sid, att = stage["stageId"], stage.get("attemptId", 0)
    url = f"{_ui_base(spark)}/stages/{sid}/{att}/taskList?length=2000"
    with urllib.request.urlopen(url) as r:
        tasks = json.loads(r.read())
    d = sorted(t.get("duration", 0) for t in tasks)
    if not d:
        return {}
    return {
        "n_tasks": len(d),
        "max_ms": d[-1],
        "p90_ms": d[int(0.9 * (len(d) - 1))],
        "p50_ms": d[len(d) // 2],
        "skew_max_over_p50": round(d[-1] / max(1, d[len(d) // 2]), 1),
    }


def run_with_metrics(spark, fn, tasks_detail=False, top_n=4):
    before = {s["stageId"] for s in _fetch_stages(spark)}
    t0 = time.time()
    result = fn()
    wall = round(time.time() - t0, 2)
    stages = [s for s in _fetch_stages(spark) if s["stageId"] not in before]
    tot = {
        "n_stages": len(stages),
        "tasks": sum(s.get("numTasks", 0) for s in stages),
        "executor_run_ms": sum(s.get("executorRunTime", 0) for s in stages),
        "executor_cpu_ms": sum(s.get("executorCpuTime", 0) for s in stages) // 1_000_000,
        "input_mb": round(sum(s.get("inputBytes", 0) for s in stages) / 1e6, 1),
        "input_records": sum(s.get("inputRecords", 0) for s in stages),
        "shuffle_read_mb": round(sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 1),
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
            "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
        }
        for s in top
    ]
    if tasks_detail and top:
        tot["top_stage_skew"] = _stage_task_skew(spark, top[0])
    return wall, result, tot


def timed_cold(fn):
    """drop caches, zero-point the blkio counters, run fn, return wall +
    device-read deltas (the work-proportional metrics on this host)."""
    drop_caches()
    b0 = blkio_read_stats()
    t0 = time.time()
    result = fn()
    wall = round(time.time() - t0, 2)
    b1 = blkio_read_stats()
    return {
        "wall": wall,
        "dev_read_mb": round((b1["bytes"] - b0["bytes"]) / 1e6, 1),
        "dev_read_ios": b1["ios"] - b0["ios"],
    }, result


BM25_QUERIES = [
    ("q_head", "w00001 w00002 w00003"),
    ("q_mid", "w00412 w01731"),
    ("q_tail", "w07321 w09871"),
    ("q_mix", "w00005 w04242 w09001"),
]


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
    # PROBE_SUFFIX lets a phase re-run under a different cgroup throttle
    # (set outside) and land as its own record, e.g. "_iops100"
    global OUT
    phase = sys.argv[1] + os.environ.get("PROBE_SUFFIX", "")

    if phase.startswith("cold_bm25"):
        # Ask #1 A/B no.1: the composed 4-query mix on the SAME corpus in
        # both layouts, reading from the throttled loop mount, cold. The
        # r13 claim under test: the compaction file-count win (148 vs
        # 1024 footers) matters when reads are request-cost dominated.
        join_cold_cgroup()
        spark = session({"spark.ui.enabled": "true"})
        from tape_spark.operators import bm25_load_index, bm25_topk_indexed

        layouts = {
            "uncompacted": f"{COLD_MNT}/bm25_idx_uncompacted",
            "rowsalt_compacted": f"{COLD_MNT}/bm25_idx_rowsalt",
        }
        nfiles = {
            n: sum(len(fs) for _, _, fs in os.walk(f"{p}/postings"))
            for n, p in layouts.items()
        }

        def run(path):
            p, s = bm25_load_index(spark, path)
            res = bm25_topk_indexed(p, s, BM25_QUERIES, k=10)
            return sorted(
                (r["query_id"], r["rank"], int(r["doc_id"]), int(r["score_units"]))
                for r in res.collect()
            )

        # parity first (warm, untimed)
        checks = {n: hash(tuple(run(p))) for n, p in layouts.items()}
        out = {n: [] for n in layouts}
        for _ in range(REPS + 1):
            for n, p in layouts.items():
                m, _ = timed_cold(lambda p=p: run(p))
                out[n].append(m)
        emit(phase, {
            "throttle": os.environ.get("PROBE_THROTTLE", "80MiB/s + 1000 read IOPS"),
            "parity": checks["uncompacted"] == checks["rowsalt_compacted"],
            "postings_files": nfiles,
            "cold_throttled": out,
        })

    elif phase.startswith("cold_pointlookup"):
        # Ask #1 A/B no.2 + ask #2 done-criterion: point lookups against
        # the 64- and 320-bucket stores under the throttle, with and
        # without the CHUNKED bucket IN push (r13: the unchunked push
        # crashed past ~1-2k literals; the win was records-read-only
        # warm-local — does it become a WALL win when reads cost
        # requests?).
        join_cold_cgroup()
        spark = session({
            "spark.ui.enabled": "true",
            "spark.sql.parquet.pushdown.inFilterThreshold": "100000",
        })
        from tape_spark.streaming import minhash_match_batch

        stores = {
            "b64": f"{COLD_MNT}/store_5m",
            "b320": f"{COLD_MNT}/store_5m_b320",
        }
        n_arrs = [
            int(x)
            for x in os.environ.get("PROBE_NARRS", "8,100").split(",")
        ]
        results = []
        for n_arr in n_arrs:
            arr = _arrivals(spark, n_arr)
            arr.count()
            rec = {"n_arr": n_arr, "runs": {}, "rows": {}}
            for sname, spath in stores.items():
                for push in (False, True):
                    tag = f"{sname}_{'push' if push else 'plain'}"
                    walls = []
                    for rep in range(REPS):
                        caches = []
                        m, nrows = timed_cold(
                            lambda: minhash_match_batch(
                                arr, spath, threshold=0.3,
                                push_bucket_in=push, _cleanup=caches,
                            ).count()
                        )
                        for c in caches:
                            c.unpersist()
                        walls.append(m)
                        rec["rows"][tag] = int(nrows)
                        print(f"  {n_arr} {tag} rep{rep}: {m}", flush=True)
                    rec["runs"][tag] = walls
            arr.unpersist()
            results.append(rec)
            # row parity across all four variants of this n_arr
            rec["rows_agree"] = len(set(rec["rows"].values())) == 1
        emit(phase, {
            "throttle": os.environ.get("PROBE_THROTTLE", "80MiB/s + 1000 read IOPS"),
            "in_filter_threshold": 100000,
            "points": results,
        })

    elif phase.startswith("cold_trigger50k"):
        # Ask #1 A/B no.3: one 50k-doc trigger per store generation under
        # the throttle — the batch regime where r13 found bucket count
        # irrelevant WARM (the IN-set covers every partition); cold the
        # question is whether layout changes device bytes at all.
        join_cold_cgroup()
        spark = session({"spark.ui.enabled": "true"})
        from tape_spark.streaming import minhash_match_batch

        stores = {
            "b64": f"{COLD_MNT}/store_5m",
            "b320": f"{COLD_MNT}/store_5m_b320",
        }
        arr = _arrivals(spark, 50_000)
        arr.count()
        out = {}
        rows = {}
        for rep in range(REPS):
            for sname, spath in stores.items():
                caches = []
                m, nrows = timed_cold(
                    lambda: minhash_match_batch(
                        arr, spath, threshold=0.3, _cleanup=caches
                    ).count()
                )
                for c in caches:
                    c.unpersist()
                out.setdefault(sname, []).append(m)
                rows[sname] = int(nrows)
        emit(phase, {
            "throttle": os.environ.get("PROBE_THROTTLE", "80MiB/s + 1000 read IOPS"),
            "n_arr": 50_000,
            "rows": rows,
            "cold_throttled": out,
        })

    elif phase == "trigger_decompose":
        # Ask #5: split the ~30s 50k-doc trigger into its stages (warm,
        # unthrottled, the r12_scratch original store — decomposition is
        # about CPU shape, not IO), then attack the top term with Arrow
        # batch sizing on the signature UDF.
        spark = session({"spark.ui.enabled": "true"})
        from tape_spark.streaming import minhash_match_batch

        store = f"{R12_SCRATCH}/store_5m"
        arr = _arrivals(spark, 50_000)
        arr.count()

        def run_once():
            caches = []
            n = minhash_match_batch(
                arr, store, threshold=0.3, _cleanup=caches
            ).count()
            for c in caches:
                c.unpersist()
            return n

        run_once()  # warm
        walls, metrics = [], None
        for rep in range(REPS + 1):
            w, n_rows, m = run_with_metrics(spark, run_once, tasks_detail=True, top_n=8)
            walls.append(w)
            metrics = m  # keep the last (warmest) rep's stage split
        base = {"walls": walls, "n_rows": int(n_rows), "stage_split": metrics}

        # attack: Arrow batch size on the signature mapInPandas (default
        # 10k rows/batch). Larger batches amortize per-batch numpy setup
        # of the 64-way min broadcast; smaller improve pipelining.
        attack = {}
        for batch_rows in ("2000", "10000", "50000"):
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", batch_rows)
            run_once()
            ws = []
            for _ in range(REPS):
                t0 = time.time()
                run_once()
                ws.append(round(time.time() - t0, 2))
            attack[f"arrow_{batch_rows}"] = ws
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        emit(phase, {"base": base, "arrow_batch_attack": attack})

    elif phase.startswith("asof_salted"):
        # Ask #4: the celebrity-key single-sort drag (guarded-permissive
        # walls swung 29.7-110.2s in r13). A/B the unsalted window plan
        # against salt_slices=32 on the same 100M-event celebrity frame,
        # interleaved, with the long-pole task skew of the heaviest stage.
        from pyspark.sql import functions as F

        from tape_spark.operators import asof_join

        spark = session({"spark.ui.enabled": "true"})
        ev = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .select(
                F.when(
                    F.pmod(F.xxhash64("user_id"),
                           F.lit(int(os.environ.get("PROBE_HOT_MOD", "10")))) == 0,
                    F.lit(42),
                )
                .otherwise(F.col("user_id")).alias("user_id"),
                F.col("ts").cast("timestamp").cast("double").alias("t"),
                "value",
            )
            .persist()
        )
        n = ev.count()
        right = (
            ev.filter(F.pmod(F.xxhash64("t"), F.lit(100)) == 0)
            .select("user_id", "t", F.col("value").alias("profile"))
            .persist()
        )
        n_right = right.count()
        probe_agg = [
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64(F.col("profile")), F.lit(1_000_003))).alias("h1"),
            F.sum(F.pmod(F.xxhash64(F.col("t_r")), F.lit(1_000_003))).alias("h2"),
        ]

        def run(salt):
            return tuple(
                asof_join(ev, right, on="t", by="user_id", salt_slices=salt)
                .agg(*probe_agg)
                .collect()[0]
            )

        # parity first: the salted plan must return identical checksums
        base_chk = run(None)
        salt_chk = run(32)
        results = {"unsalted": [], "salted32": []}
        for _ in range(REPS + 1):
            for tag, salt in (("unsalted", None), ("salted32", 32)):
                w, _, m = run_with_metrics(
                    spark, lambda s=salt: run(s), tasks_detail=True, top_n=3
                )
                results[tag].append({"wall": w, "skew": m.get("top_stage_skew"),
                                     "top": m["top_stages"][:2]})
        emit(phase, {
            "n_events": n, "n_right": n_right,
            "parity": base_chk == salt_chk,
            "checksums": {"unsalted": list(base_chk), "salted32": list(salt_chk)},
            "runs": results,
        })

    elif phase == "automode_sampled":
        # Ask #3 done-criterion: decision pass <1s at 1M docs with the
        # pick unchanged vs the exact pass, on BOTH measured anchor
        # corpora shapes (plain zipf1m; zipf1m + 2k boilerplate clones).
        from pyspark.sql import functions as F

        from tape_spark.operators import minhash_near_duplicates, minhash_signatures
        import tape_spark.operators.dedup as dd

        spark = session()
        base_docs = (
            spark.read.parquet(f"{ZIPF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 1_000_000)
            .select("doc_id", "text")
        )
        boiler = (
            spark.read.parquet(f"{ZIPF_DIR}/documents.parquet")
            .filter(F.col("doc_id") == 7)
            .select(F.explode(F.sequence(F.lit(1), F.lit(2000))).alias("i"), "text")
            .select((F.col("i") + 5_000_000).alias("doc_id"), "text")
        )
        corpora = {
            "zipf1m": base_docs,
            "zipf1m_boiler2k": base_docs.unionByName(boiler),
        }
        out = {}
        for cname, docs in corpora.items():
            docs = docs.repartition(64).persist()
            docs.count()
            sigs = minhash_signatures(docs, signature_bits=32).persist()
            sigs.count()
            rec = {}
            for tag, target in (("exact", 1 << 62), ("sampled", 2_000_000)):
                dd._AUTO_TARGET_ENTRIES = target
                walls = []
                for _ in range(REPS + 1):
                    t0 = time.time()
                    # measurement pass only: auto decides, then we read the
                    # decision without materializing the join
                    minhash_near_duplicates(
                        docs, signatures=sigs, num_hashes=64, bands=16,
                        threshold=0.5, join_mode="auto",
                    )
                    walls.append(round(time.time() - t0, 2))
                rec[tag] = {
                    "decision_walls": walls,
                    "min_wall": min(walls),
                    "decision": dd._LAST_AUTO_DECISION,
                }
            dd._AUTO_TARGET_ENTRIES = 2_000_000
            rec["pick_unchanged"] = (
                rec["exact"]["decision"]["picked"]
                == rec["sampled"]["decision"]["picked"]
            )
            rec["c_exact"] = rec["exact"]["decision"]["candidate_pairs"]
            rec["c_sampled"] = rec["sampled"]["decision"]["candidate_pairs"]
            out[cname] = rec
            sigs.unpersist()
            docs.unpersist()
        emit(phase, out)

    else:
        raise SystemExit(f"unknown phase {phase!r}")


if __name__ == "__main__":
    main()
