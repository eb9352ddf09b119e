#!/usr/bin/env python
"""Round-13 sf100 probes (each phase its own process, per the sf100
shuffle-reclaim convention). Phases close the round-12 verdict's
"Done =" measurement criteria:

  python scripts/probe_sf100_r13.py bm25_gap      # ask #1: per-stage metrics + AQE A/B + cold-cache A/B on the preserved compacted/uncompacted indexes
  python scripts/probe_sf100_r13.py store_growth2 # ask #2: bucket counts grown per the sizing rule, planted partners fixed to a 1M subset
  python scripts/probe_sf100_r13.py rowgroup_skip # ask #2: does a pushed bucket IN-set prune row groups at mid-size triggers?
  python scripts/probe_sf100_r13.py crash_retry   # ask #4: kill between the sigs and entries appends of a checkpointed stream, restart, verify exactly-once
  python scripts/probe_sf100_r13.py automode_tie  # ask #6: cap-64/thr-0.7 point with more interleaved reps
  python scripts/probe_sf100_r13.py asof_guard    # ask #7: asof max_rows_per_key raise on the celebrity frame at 100M events

Emits one JSON line per phase and appends to BENCH_sf100_r13.json.
Inputs: .benchdata/sf100 (events), .benchdata/sf100_zipf (documents),
and the r12 scratch's preserved bm25_idx / bm25_idx_uncompacted /
store_1m / store_5m dirs (rebuilt here if absent).
"""

import json
import os
import shutil
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("PROBE_SF_DIR", os.path.join(REPO, ".benchdata", "sf100"))
ZIPF_DIR = os.environ.get("PROBE_ZIPF_DIR", os.path.join(REPO, ".benchdata", "sf100_zipf"))
R12_SCRATCH = os.path.join(REPO, ".benchdata", "r12_scratch")
SCRATCH = os.environ.get("PROBE_SCRATCH", os.path.join(REPO, ".benchdata", "r13_scratch"))
OUT = os.environ.get("PROBE_OUT", os.path.join(REPO, "BENCH_sf100_r13.json"))
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


# --- per-run stage metrics via the status REST API (UI must be on) ---


def _ui_base(spark):
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    return f"{url}/api/v1/applications/{app}"


def _fetch_stages(spark):
    with urllib.request.urlopen(f"{_ui_base(spark)}/stages?status=complete") as r:
        return json.loads(r.read())


def _stage_task_skew(spark, stage):
    """Task-duration skew for one stage: the long pole vs the median."""
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


def run_with_metrics(spark, fn, tasks_detail=False):
    """Run fn() and return (wall, result, metrics): totals + the top
    stages by executor run time attributed to this run (stage ids newer
    than any seen before)."""
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
    top = sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:4]
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
    if tasks_detail and top:
        tot["top_stage_skew"] = _stage_task_skew(spark, top[0])
    return wall, result, tot


BM25_QUERIES = [
    ("q_head", "w00001 w00002 w00003"),
    ("q_mid", "w00412 w01731"),
    ("q_tail", "w07321 w09871"),
    ("q_mix", "w00005 w04242 w09001"),
]


def main():
    phase = sys.argv[1]
    os.makedirs(SCRATCH, exist_ok=True)

    if phase == "bm25_gap":
        # Ask #1 done-criterion: instrument the composed 4-query mix on
        # the PRESERVED r12 indexes (identical data, compacted vs
        # uncompacted layouts) with per-stage task metrics, AQE on/off,
        # and a cold-cache A/B — in BOTH orders within one process, so
        # the r12 confound (the "after" always ran after the 50 s
        # compaction job) is gone.
        spark = session({"spark.ui.enabled": "true"})
        from tape_spark.operators import bm25_load_index, bm25_topk_indexed

        layouts = {
            "uncompacted": f"{R12_SCRATCH}/bm25_idx_uncompacted",
            "compacted": f"{R12_SCRATCH}/bm25_idx",
        }
        loaded = {}
        for name, path in layouts.items():
            loaded[name] = bm25_load_index(spark, path)

        def run(name):
            p, s = loaded[name]
            res = bm25_topk_indexed(p, s, BM25_QUERIES, k=10)
            return sorted(
                (r["query_id"], r["rank"], int(r["doc_id"]), int(r["score_units"]))
                for r in res.collect()
            )

        # result parity first (one warm-up rep each, untimed)
        checks = {name: hash(tuple(run(name))) for name in layouts}
        parity = checks["uncompacted"] == checks["compacted"]

        def block(tag, reps, cold=False):
            out = {n: [] for n in layouts}
            for _ in range(reps):
                for n in layouts:
                    if cold:
                        drop_caches()
                    wall, _, m = run_with_metrics(spark, lambda n=n: run(n))
                    out[n].append({"wall": wall, **m})
            return out

        results = {}
        results["warm_aqe_on"] = block("warm_aqe_on", 3)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        results["warm_aqe_off"] = block("warm_aqe_off", 2)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        results["cold_aqe_on"] = block("cold_aqe_on", 2, cold=True)
        emit(phase, {"results_identical": parity, "runs": results})

    elif phase == "bm25_salt_fix":
        # Ask #1, the fix test: bm25_gap's stage metrics showed the
        # compacted layout does LESS total work (fewer records, less
        # input, less executor time) yet walls ~2x worse — within-stage
        # task skew. Hypothesis: the PROBE-KEY salt concentrates each
        # query term's postings into ONE file, so one task owns a head
        # term's whole scoring work; the uncompacted layout spreads each
        # term across 16 generation files. Test: recompact a copy with
        # the FULL-ROW salt (term, doc_id) — hot terms spread across the
        # k per-partition files, within-file term sort (row-group
        # skipping) unchanged — and interleave all three layouts with
        # task-skew capture on the heaviest stage.
        spark = session({"spark.ui.enabled": "true"})
        from tape_spark.operators import (
            bm25_compact_index,
            bm25_load_index,
            bm25_topk_indexed,
        )

        rowsalt = f"{SCRATCH}/bm25_idx_rowsalt"
        if not os.path.exists(f"{rowsalt}/stats"):
            if os.path.exists(rowsalt):
                shutil.rmtree(rowsalt)
            t0 = time.time()
            shutil.copytree(f"{R12_SCRATCH}/bm25_idx_uncompacted", rowsalt)
            copy_secs = round(time.time() - t0, 1)
            t0 = time.time()
            info = bm25_compact_index(spark, rowsalt)
            compact_secs = round(time.time() - t0, 1)
        else:
            copy_secs = compact_secs = None
            info = {}
        n_files = sum(
            1 for root, _, files in os.walk(f"{rowsalt}/postings")
            for f in files if f.endswith(".parquet")
        )
        layouts = {
            "uncompacted": f"{R12_SCRATCH}/bm25_idx_uncompacted",
            "compact_keysalt": f"{R12_SCRATCH}/bm25_idx",
            "compact_rowsalt": rowsalt,
        }
        loaded = {n: bm25_load_index(spark, p) for n, p in layouts.items()}

        def run(name):
            p, s = loaded[name]
            res = bm25_topk_indexed(p, s, BM25_QUERIES, k=10)
            return sorted(
                (r["query_id"], r["rank"], int(r["doc_id"]), int(r["score_units"]))
                for r in res.collect()
            )

        checks = {n: hash(tuple(run(n))) for n in layouts}  # also warms
        runs = {n: [] for n in layouts}
        for _ in range(3):
            for n in layouts:
                wall, _, m = run_with_metrics(spark, lambda n=n: run(n),
                                              tasks_detail=True)
                runs[n].append({"wall": wall, **m})
        emit(phase, {
            "results_identical": len(set(checks.values())) == 1,
            "rowsalt_copy_secs": copy_secs,
            "rowsalt_compact_secs": compact_secs,
            "rowsalt_files": n_files,
            "rowsalt_compact_info": info,
            "runs": runs,
        })

    elif phase == "bm25_selective":
        # The other side of the salt trade: a SELECTIVE probe (one tail
        # term) under the three layouts. Keysalt puts the term's postings
        # in one file per partition (max row-group skipping); rowsalt
        # spreads them over k files (reads up to k x the row groups);
        # uncompacted opens 16 generation files. Records read + walls.
        spark = session({"spark.ui.enabled": "true"})
        from pyspark.sql import functions as F

        layouts = {
            "uncompacted": f"{R12_SCRATCH}/bm25_idx_uncompacted",
            "compact_keysalt": f"{R12_SCRATCH}/bm25_idx",
            "compact_rowsalt": f"{SCRATCH}/bm25_idx_rowsalt",
        }
        terms = ["w07321", "w09871", "w01731"]
        from tape_spark.operators.retrieval import _STATS_SCHEMA

        results = {}
        for name, path in layouts.items():
            srows = spark.read.schema(_STATS_SCHEMA).parquet(f"{path}/stats").collect()
            bmod = {int(r["num_term_buckets"]) for r in srows}.pop()
            tdf = spark.createDataFrame([(t,) for t in terms], "term string")
            tb = sorted({
                int(r["tb"]) for r in tdf.select(
                    F.pmod(F.xxhash64("term"), F.lit(bmod)).alias("tb")
                ).collect()
            })
            p = spark.read.parquet(f"{path}/postings")
            results[name] = {"walls": [], "rows": None}
            for rep in range(REPS + 2):
                t0 = time.time()
                n = (
                    p.filter(F.col("tbucket").isin(tb) & F.col("term").isin(terms))
                    .agg(F.count(F.lit(1)), F.sum("tf")).collect()
                )
                w = round(time.time() - t0, 3)
                if rep:
                    results[name]["walls"].append(w)
                results[name]["rows"] = int(n[0][0])
        emit(phase, {"terms": terms, "results": results})

    elif phase == "store_growth2":
        # Ask #2 done-criterion: grow num_entry_buckets per the stated
        # sizing rule (constant partition bytes) and confine planted
        # partners to a FIXED 1M-doc subset so true-match work is
        # constant across store sizes. Three stores:
        #   A: 1M docs,  64/32 buckets  (r12's store_1m layout)
        #   B: 5M docs, 320/160 buckets (sizing rule: 5x docs -> 5x buckets)
        #   C: 5M docs,  64/32 buckets  (r12's store_5m — the under-bucketed control)
        # Signatures are read back from the preserved store_5m/sigs table
        # (same kernel), not recomputed.
        from pyspark.sql import functions as F

        from tape_spark.streaming import minhash_match_batch, minhash_save_store

        spark = session({"spark.ui.enabled": "true"})
        sigs5 = (
            spark.read.parquet(f"{R12_SCRATCH}/store_5m/sigs")
            .select("corpus_id", "signature")
            .persist()
        )
        n5 = sigs5.count()
        stores = {
            "A_1m_64": {"path": f"{R12_SCRATCH}/store_1m", "exists": True},
            "C_5m_64": {"path": f"{R12_SCRATCH}/store_5m", "exists": True},
            "B_5m_320": {"path": f"{SCRATCH}/store_5m_b320", "exists": False},
        }
        if not os.path.exists(f"{stores['B_5m_320']['path']}/meta"):
            t0 = time.time()
            minhash_save_store(
                sigs5, stores["B_5m_320"]["path"],
                num_entry_buckets=320, num_sig_buckets=160,
            )
            stores["B_5m_320"]["save_secs"] = round(time.time() - t0, 1)
        docs = spark.read.parquet(f"{ZIPF_DIR}/documents.parquet")
        # arrivals drawn ONLY from the 1M-doc subset every store contains
        arr = (
            docs.filter(F.col("doc_id") < 1_000_000)
            .filter(F.pmod(F.xxhash64("doc_id"), F.lit(17)) == 3)
            .limit(50_000)
            .select(
                (F.col("doc_id") + 100_000_000).alias("doc_id"),
                F.concat("text", F.lit(" tail")).alias("text"),
            )
            .persist()
        )
        n_arr = arr.count()
        sigs5.unpersist()

        walls = {k: [] for k in stores}
        scan_walls = {k: [] for k in stores}
        counts = {}
        for rep in range(3):
            for k, st in stores.items():
                caches = []
                t0 = time.time()
                m = minhash_match_batch(arr, st["path"], threshold=0.5,
                                        _cleanup=caches)
                row = m.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.pmod(F.xxhash64("doc_id", "corpus_id"),
                                 F.lit(1_000_000_007))).alias("s"),
                ).first()
                walls[k].append(round(time.time() - t0, 2))
                counts[k] = (row["n"], int(row["s"] or 0))
                for c in caches:
                    c.unpersist()
                # the isolated corpus-proportional floor term: one narrow
                # scan of the slim entries table (all partitions, as a
                # 50k trigger's IN-set saturates them)
                t0 = time.time()
                spark.read.parquet(f"{st['path']}/entries").agg(
                    F.count(F.lit(1)),
                    F.sum(F.pmod(F.col("bucket"), F.lit(1_000_003))),
                ).collect()
                scan_walls[k].append(round(time.time() - t0, 2))
        # partition size bookkeeping: bytes of one entries partition
        sizes = {}
        for k, st in stores.items():
            edir = f"{st['path']}/entries"
            parts = [d for d in os.listdir(edir) if d.startswith("pbucket=")]
            tot = 0
            for root, _, files in os.walk(edir):
                for f in files:
                    if f.endswith(".parquet"):
                        tot += os.path.getsize(os.path.join(root, f))
            sizes[k] = {
                "n_partitions": len(parts),
                "total_mb": round(tot / 1e6, 1),
                "mb_per_partition": round(tot / 1e6 / max(1, len(parts)), 2),
            }
        emit(phase, {
            "n_corpus_sigs": n5,
            "n_arrivals": n_arr,
            "store_walls": walls,
            "entries_scan_walls": scan_walls,
            "match_checksums": {k: list(v) for k, v in counts.items()},
            "entries_sizes": sizes,
            "true_match_work_fixed": counts.get("A_1m_64") is not None,
        })

    elif phase == "pointlookup_rebucket":
        # The regime bucket growth exists FOR: point-lookup triggers,
        # where the pbucket IN-set is a strict partition subset. Compare
        # 8-doc trigger walls + records read across the three stores, and
        # measure minhash_rebucket_store itself at 5 M docs (on a copy of
        # the 64-bucket store; parity asserted against the natively-built
        # 320-bucket store).
        from pyspark.sql import functions as F

        from tape_spark.streaming import minhash_match_batch, minhash_rebucket_store

        spark = session({"spark.ui.enabled": "true"})
        docs = spark.read.parquet(f"{ZIPF_DIR}/documents.parquet")
        arr = (
            docs.filter(F.col("doc_id") < 1_000_000)
            .filter(F.pmod(F.xxhash64("doc_id"), F.lit(131071)) == 9)
            .limit(8)
            .select(
                (F.col("doc_id") + 300_000_000).alias("doc_id"),
                F.concat("text", F.lit(" tail")).alias("text"),
            )
            .persist()
        )
        n_arr = arr.count()
        rb = f"{SCRATCH}/store_5m_rebucketed"
        reb = {}
        if not os.path.exists(f"{rb}/meta"):
            if os.path.exists(rb):
                shutil.rmtree(rb)
            t0 = time.time()
            shutil.copytree(f"{R12_SCRATCH}/store_5m", rb)
            reb["copy_secs"] = round(time.time() - t0, 1)
            t0 = time.time()
            reb["info"] = minhash_rebucket_store(
                spark, rb, num_entry_buckets=320, num_sig_buckets=160
            )
            reb["rebucket_secs"] = round(time.time() - t0, 1)
        stores = {
            "A_1m_64": f"{R12_SCRATCH}/store_1m",
            "C_5m_64": f"{R12_SCRATCH}/store_5m",
            "B_5m_320": f"{SCRATCH}/store_5m_b320",
            "R_5m_rebucketed_320": rb,
        }
        out = {k: {"walls": [], "metrics": []} for k in stores}
        checks = {}
        for rep in range(3):
            for k, path in stores.items():
                caches = []

                def one(path=path):
                    m = minhash_match_batch(arr, path, threshold=0.5,
                                            _cleanup=caches)
                    return m.agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum(F.pmod(F.xxhash64("doc_id", "corpus_id"),
                                     F.lit(1_000_000_007))).alias("s"),
                    ).first()

                wall, row, mtr = run_with_metrics(spark, one)
                out[k]["walls"].append(wall)
                out[k]["metrics"].append({
                    "input_records": mtr["input_records"],
                    "input_mb": mtr["input_mb"],
                })
                checks[k] = (int(row["n"]), int(row["s"] or 0))
                for c in caches:
                    c.unpersist()
        same_5m = len({checks[k] for k in
                       ("C_5m_64", "B_5m_320", "R_5m_rebucketed_320")}) == 1
        emit(phase, {
            "n_arrivals": n_arr,
            "rebucket": reb,
            "walls": {k: v["walls"] for k, v in out.items()},
            "read_metrics": {k: v["metrics"][-1] for k, v in out.items()},
            "match_checksums": {k: list(v) for k, v in checks.items()},
            "rebucketed_equals_native_320": same_5m,
        })

    elif phase == "rowgroup_skip":
        # Ask #2, second part: entries files are written sorted by
        # (band, bucket) — measure whether PUSHING the arrivals' bucket
        # IN-set (raising the parquet in-filter threshold so it is not
        # rewritten to a useless min/max range) prunes row groups at
        # mid-size triggers, vs the plain pbucket-only read.
        from pyspark.sql import functions as F

        from tape_spark.streaming.neardup import (
            _arrival_signatures,
            _entry_rows,
            _load_store_meta,
        )

        spark = session({
            "spark.ui.enabled": "true",
            # default 10: larger IN-sets are rewritten to (min,max) range
            # filters, which never prune uniform hash values
            "spark.sql.parquet.pushdown.inFilterThreshold": "100000",
        })
        store = f"{R12_SCRATCH}/store_5m"
        meta = _load_store_meta(spark, store)
        docs = spark.read.parquet(f"{ZIPF_DIR}/documents.parquet")
        results = []
        for n_arr in (8, 100, 1000, 5000):
            arr = (
                docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(977)) == 5)
                .limit(n_arr)
                .select(
                    (F.col("doc_id") + 200_000_000).alias("doc_id"),
                    F.concat("text", F.lit(" tail")).alias("text"),
                )
                .persist()
            )
            arr.count()
            sigs = _arrival_signatures(arr, meta, "text", "doc_id")
            ent = _entry_rows(sigs, "doc_id", meta["bands"],
                              meta["num_hashes"] // meta["bands"],
                              meta["num_entry_buckets"]).persist()
            keys = ent.select("pbucket", "bucket").distinct().collect()
            pbuckets = sorted({int(r["pbucket"]) for r in keys})
            buckets = sorted({int(r["bucket"]) for r in keys})
            base = spark.read.parquet(f"{store}/entries").filter(
                F.col("pbucket").isin(pbuckets)
            )
            variants = {
                "pbucket_only": base,
                "plus_bucket_in": base.filter(F.col("bucket").isin(buckets)),
            }
            rec = {"n_arr": n_arr, "n_pbuckets": len(pbuckets),
                   "n_buckets": len(buckets), "walls": {}, "rows": {},
                   "errors": {}}
            for rep in range(REPS + 1):
                for name, v in variants.items():
                    if name in rec["errors"]:
                        continue
                    t0 = time.time()
                    try:
                        n = v.agg(F.count(F.lit(1))).collect()[0][0]
                    except Exception as e:
                        # a pushed IN-set past a few thousand literals
                        # overflows the parquet filter evaluator's stack —
                        # an engine limit worth recording, not retrying
                        rec["errors"][name] = str(e)[:160]
                        continue
                    w = round(time.time() - t0, 2)
                    if rep:  # rep 0 warms
                        rec["walls"].setdefault(name, []).append(w)
                    rec["rows"][name] = int(n)
            ent.unpersist()
            arr.unpersist()
            results.append(rec)
        emit(phase, {"in_filter_threshold": 100000, "points": results})

    elif phase == "crash_retry":
        # Ask #4 done-criterion: drive the streaming ingest loop through
        # a REAL checkpointed writeStream, fail the driver-side append
        # between the sigs and entries writes of one trigger, restart
        # from the checkpoint, and verify the documented semantics: the
        # replayed append REPLACES its partial files (exactly-once store
        # growth), the sink sees the batch twice (documented exposure),
        # and no matches are lost.
        from pyspark.sql import functions as F

        from tape_spark.operators import minhash_signatures
        from tape_spark.streaming import (
            minhash_match_foreach_batch,
            minhash_save_store,
            stream_minhash_matches,
        )
        import tape_spark.utils.io as tio

        spark = session()
        docs = (
            spark.read.parquet(f"{ZIPF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 200_000)
            .persist()
        )
        n_corpus = docs.count()
        store = f"{SCRATCH}/crash_store"
        src = f"{SCRATCH}/crash_src"
        ckpt = f"{SCRATCH}/crash_ckpt"
        sink_out = []
        for p in (store, src, ckpt):
            if os.path.exists(p):
                shutil.rmtree(p)
        sigs = minhash_signatures(docs, signature_bits=32).persist()
        minhash_save_store(sigs, store, num_entry_buckets=16, num_sig_buckets=8)
        n_triggers, per = 6, 5_000
        for i in range(n_triggers):
            (
                docs.filter(
                    (F.col("doc_id") % n_triggers == i)
                    & (F.col("doc_id") < n_triggers * per)
                )
                .select(
                    (F.col("doc_id") + 10_000_000 * (i + 1)).alias("doc_id"),
                    F.concat("text", F.lit(" tail")).alias("text"),
                )
                .coalesce(1)
                .write.mode("append")
                .parquet(src)
            )
            time.sleep(0.05)

        FAIL_BATCH = "sb3"
        orig_append = tio.append_partitioned_batch
        state = {"failed": False}

        def faulty(df, part_col, sort_cols, path, batch_id):
            if (
                batch_id == FAIL_BATCH
                and path.endswith("/entries")
                and not state["failed"]
            ):
                state["failed"] = True
                raise RuntimeError("injected crash between sigs and entries appends")
            return orig_append(df, part_col, sort_cols, path, batch_id)

        schema = "doc_id long, text string"

        def start():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            return (
                stream.writeStream.foreachBatch(
                    minhash_match_foreach_batch(
                        store,
                        lambda df, bid: sink_out.append(
                            (bid, sorted((r[0], r[1]) for r in df.collect()))
                        ),
                        threshold=0.5,
                        append_arrivals=True,
                    )
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        tio.append_partitioned_batch = faulty
        q = start()
        crashed = False
        try:
            q.awaitTermination(600)
        except Exception as e:
            crashed = True
            err_head = str(e)[:200]
        # the half-applied state: trigger-3 sigs landed (tagged), entries
        # missing, no sb3 marker
        from tape_spark.utils.io import list_batch_file_ids

        half_sig_ids = sorted(list_batch_file_ids(f"{store}/sigs"))
        half_entry_ids = sorted(list_batch_file_ids(f"{store}/entries"))
        markers_mid = sorted(
            r["batch_id"] for r in spark.read.parquet(f"{store}/batches").collect()
        )
        sink_batches_mid = [b for b, _ in sink_out]
        # restart from the same checkpoint with the fault removed
        tio.append_partitioned_batch = orig_append
        q2 = start()
        q2.awaitTermination(600)

        n_sigs = spark.read.parquet(f"{store}/sigs").count()
        n_entries = spark.read.parquet(f"{store}/entries").count()
        dup_sigs = (
            spark.read.parquet(f"{store}/sigs")
            .groupBy("corpus_id").count().filter("count > 1").count()
        )
        markers_end = sorted(
            r["batch_id"] for r in spark.read.parquet(f"{store}/batches").collect()
        )
        # parity: a fresh probe batch must match through the recovered
        # store exactly as through a full signature frame of the union
        probe = (
            docs.filter(F.col("doc_id") % 97 == 11)
            .limit(2_000)
            .select((F.col("doc_id") + 900_000_000).alias("doc_id"),
                    F.concat("text", F.lit(" tail2")).alias("text"))
            .persist()
        )
        probe.count()
        from tape_spark.streaming import minhash_match_batch

        caches = []
        got = sorted(
            (r[0], r[1])
            for r in minhash_match_batch(probe, store, threshold=0.5,
                                         _cleanup=caches).collect()
        )
        all_sigs = spark.read.parquet(f"{store}/sigs").select(
            F.col("corpus_id").alias("doc_id"), "signature"
        )
        want = sorted(
            (r[0], r[1])
            for r in stream_minhash_matches(
                probe, all_sigs, threshold=0.5
            ).collect()
        )
        for c in caches:
            c.unpersist()
        expected_sigs = n_corpus + n_triggers * per
        emit(phase, {
            "n_corpus": n_corpus,
            "n_triggers": n_triggers,
            "rows_per_trigger": per,
            "crash_injected": crashed,
            "crash_error_head": err_head if crashed else "",
            "half_applied_state": {
                "sig_batch_tags": half_sig_ids,
                "entry_batch_tags": half_entry_ids,
                "markers": markers_mid,
                "sink_batches_before_crash": sink_batches_mid,
            },
            "after_restart": {
                "sigs_rows": n_sigs,
                "sigs_rows_expected": expected_sigs,
                "entries_rows": n_entries,
                "entries_rows_expected": expected_sigs * 16,
                "duplicate_sig_ids": dup_sigs,
                "markers": markers_end,
                "sink_batches": [b for b, _ in sink_out],
                "replayed_sink_batch_identical": (
                    [rows for b, rows in sink_out if b == 3][0]
                    == [rows for b, rows in sink_out if b == 3][-1]
                    if len([1 for b, _ in sink_out if b == 3]) == 2 else None
                ),
            },
            "probe_match_parity": got == want,
            "exactly_once": (
                n_sigs == expected_sigs
                and n_entries == expected_sigs * 16
                and dup_sigs == 0
            ),
        })

    elif phase == "ingest_loop2":
        # The r12 ingest_loop drove the verbs directly; this re-drive
        # composes the FULL r13 stack: a real checkpointed writeStream
        # through the foreachBatch wrapper (batch-id idempotent appends),
        # stopped after 6 triggers, compacted (full-row salt, markers
        # preserved), RESTARTED from the same checkpoint for 6 more.
        # Evidence sought: flat per-trigger walls under the exactly-once
        # protocol, compaction neutral-or-better, matches found across
        # the stop/compact/restart boundary.
        from pyspark.sql import functions as F

        from tape_spark.operators import minhash_signatures
        from tape_spark.streaming import (
            minhash_compact_store,
            minhash_match_foreach_batch,
            minhash_save_store,
        )

        spark = session()
        docs = (
            spark.read.parquet(f"{ZIPF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 1_000_000)
            .repartition(64)
            .persist()
        )
        n_corpus = docs.count()
        store = f"{SCRATCH}/loop2_store"
        src = f"{SCRATCH}/loop2_src"
        ckpt = f"{SCRATCH}/loop2_ckpt"
        for p in (store, src, ckpt):
            if os.path.exists(p):
                shutil.rmtree(p)
        t0 = time.time()
        sigs = minhash_signatures(docs, signature_bits=32).persist()
        minhash_save_store(sigs, store, num_entry_buckets=64, num_sig_buckets=32)
        save_secs = round(time.time() - t0, 1)
        sigs.unpersist()
        n_triggers, per = 12, 50_000
        for i in range(n_triggers):
            (
                docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(n_triggers)) == i)
                .limit(per)
                .select(
                    (F.col("doc_id") + 10_000_000 * (i + 1)).alias("doc_id"),
                    F.concat("text", F.lit(" tail")).alias("text"),
                )
                .coalesce(1)
                .write.mode("append")
                .parquet(src)
            )
            time.sleep(0.05)

        ticks = []   # (batch_id, completion wall time, n_matches)

        def sink(df, bid):
            n = df.count()
            ticks.append((bid, time.time(), n))

        def run_stream():
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = (
                stream.writeStream.foreachBatch(
                    minhash_match_foreach_batch(
                        store, sink, threshold=0.5, append_arrivals=True
                    )
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(3600)

        # first half: all 12 files exist but we stop after the stream
        # drains what it sees — simpler: run availableNow over ALL 12,
        # with a compaction BETWEEN two stream runs by splitting the
        # input in time: move files 7..12 aside first
        hold = f"{SCRATCH}/loop2_hold"
        os.makedirs(hold, exist_ok=True)
        files = sorted(
            f for f in os.listdir(src) if f.endswith(".parquet")
        )
        import glob as _glob

        all_files = sorted(_glob.glob(f"{src}/*.parquet"),
                           key=lambda p: os.path.getmtime(p))
        for p in all_files[6:]:
            shutil.move(p, hold)
        t_start = time.time()
        run_stream()
        files_mid = sum(
            1 for root, _, fs in os.walk(store) for f in fs
            if f.endswith(".parquet")
        )
        t0 = time.time()
        compact_info = minhash_compact_store(spark, store)
        compact_secs = round(time.time() - t0, 1)
        files_after_compact = sum(
            1 for root, _, fs in os.walk(store) for f in fs
            if f.endswith(".parquet")
        )
        for p in sorted(_glob.glob(f"{hold}/*.parquet")):
            shutil.move(p, src)
        n_first_half = len(ticks)
        t_start2 = time.time()
        run_stream()
        # per-trigger walls from sink completion deltas (the second run's
        # first trigger is measured from the restart, not across the
        # compaction pause)
        walls = []
        prev = t_start
        for i, (bid, t, n) in enumerate(ticks):
            if i == n_first_half:
                prev = t_start2
            walls.append({"batch": bid, "wall": round(t - prev, 1), "matches": n})
            prev = t
        # cross-boundary evidence: trigger 6+ should match earlier
        # triggers' appended arrivals too (near-copies of the same base
        # docs collide); matches grow as the store grows
        emit(phase, {
            "n_corpus": n_corpus,
            "save_secs": save_secs,
            "triggers": walls,
            "files_mid": files_mid,
            "compact_info": compact_info,
            "compact_secs": compact_secs,
            "files_after_compact": files_after_compact,
            "markers": sorted(
                r["batch_id"]
                for r in spark.read.parquet(f"{store}/batches").collect()
            ),
            "final_sigs": spark.read.parquet(f"{store}/sigs").count(),
            "expected_sigs": n_corpus + n_triggers * per,
        })

    elif phase == "automode_tie":
        # Ask #6: the one A/B point where auto's pick != measured best
        # (cap 64 / thr 0.7), re-measured with more interleaved reps to
        # decide tie vs real model gap.
        from pyspark.sql import functions as F

        from tape_spark.operators import minhash_near_duplicates, minhash_signatures
        import tape_spark.operators.dedup as dedup_mod

        spark = session()
        docs = (
            spark.read.parquet(f"{ZIPF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 1_000_000)
            .repartition(64)
            .persist()
        )
        n_docs = docs.count()
        sigs = minhash_signatures(docs, signature_bits=32).persist()
        sigs.count()
        walls = {"fused": [], "slim": [], "auto": []}
        pairs = None
        decision = None
        for rep in range(4):
            for mode in ("fused", "slim", "auto"):
                t0 = time.time()
                n = minhash_near_duplicates(
                    docs, signatures=sigs, num_hashes=64, bands=16,
                    threshold=0.7, max_bucket_size=64, join_mode=mode,
                ).count()
                walls[mode].append(round(time.time() - t0, 2))
                pairs = n
                if mode == "auto" and decision is None:
                    decision = dedup_mod._LAST_AUTO_DECISION
        import statistics

        summary = {
            m: {
                "walls": w,
                "min": min(w),
                "median": round(statistics.median(w), 2),
                "spread_pct": round(100 * (max(w) - min(w)) / min(w), 1),
            }
            for m, w in walls.items()
        }
        best = min(("fused", "slim"), key=lambda m: summary[m]["median"])
        overlap = (
            min(walls["fused"]) <= max(walls["slim"])
            and min(walls["slim"]) <= max(walls["fused"])
        )
        emit(phase, {
            "n_docs": n_docs, "cap": 64, "thr": 0.7, "reps": 4,
            "pairs": pairs, "summary": summary,
            "auto_decision": decision,
            "measured_best_by_median": best,
            "ranges_overlap": overlap,
        })

    elif phase == "asof_guard":
        # Ask #7: the asof-join hot-key guard on the celebrity frame at
        # 100M events (r12 drove only sessionize's). The guard must raise
        # BEFORE the single-task sort, naming the hot key, at a cost of
        # one map-side-combined count; overhead measured at a permissive
        # threshold vs unguarded.
        from pyspark.sql import functions as F

        from tape_spark.operators import asof_join

        spark = session()
        ev = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .select(
                F.when(F.pmod(F.xxhash64("user_id"), F.lit(10)) == 0, F.lit(42))
                .otherwise(F.col("user_id")).alias("user_id"),
                F.col("ts").cast("timestamp").cast("double").alias("t"),
                "value",
            )
            .persist()
        )
        n = ev.count()
        # right side: sparse per-user "profile snapshots" (~1% of events)
        right = (
            ev.filter(F.pmod(F.xxhash64("t"), F.lit(100)) == 0)
            .select("user_id", "t", F.col("value").alias("profile"))
            .persist()
        )
        n_right = right.count()
        t0 = time.time()
        raised, msg = False, ""
        try:
            asof_join(ev, right, on="t", by="user_id",
                      max_rows_per_key=max(100, n // 50)).count()
        except ValueError as e:
            raised, msg = True, str(e)[:300]
        raise_secs = round(time.time() - t0, 1)
        # the aggregate must DEPEND on the matched right column — a bare
        # count(*) lets Catalyst prune the entire asof window (measured:
        # 0.4 s "joins" at 100M events) and the comparison is vacuous
        probe_agg = [
            F.count(F.lit(1)),
            F.sum(F.pmod(F.xxhash64(F.col("profile")), F.lit(1_000_003))),
            F.sum(F.pmod(F.xxhash64(F.col("t_r")), F.lit(1_000_003))),
        ]
        walls = {"unguarded": [], "guarded": []}
        for _ in range(REPS):
            t0 = time.time()
            asof_join(ev, right, on="t", by="user_id").agg(*probe_agg).collect()
            walls["unguarded"].append(round(time.time() - t0, 1))
            t0 = time.time()
            asof_join(ev, right, on="t", by="user_id",
                      max_rows_per_key=3 * n).agg(*probe_agg).collect()
            walls["guarded"].append(round(time.time() - t0, 1))
        emit(phase, {
            "n_events": n,
            "n_right": n_right,
            "guard_raised": raised,
            "guard_raise_secs": raise_secs,
            "guard_message_head": msg,
            "walls": walls,
            "guard_overhead_pct": round(
                100.0 * (min(walls["guarded"]) - min(walls["unguarded"]))
                / max(min(walls["unguarded"]), 1e-9), 1,
            ),
        })

    else:
        raise SystemExit(f"unknown phase {phase!r}")


if __name__ == "__main__":
    main()
