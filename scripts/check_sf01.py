#!/usr/bin/env python
"""Standing per-round sf0.1 correctness sweep (verdict r11 ask #2).

Runs the FULL ``queries()`` board at /root/testdata/sf0.1 — one decade
above the sf0.01 grading scale — through the same rows+schema+6dp-values
comparison as the driver, with ONE documented relaxation (defined in
``check_correctness.compare``): a float cell whose 6dp-rounded values
differ is accepted iff the RAW values agree within 1e-8 relative AND the
rounded values straddle exactly one 1e-6 rounding edge. That is a
comparison artifact of rounding a cross-engine float summation, not a
semantics difference; integer/unit-valued columns stay exact. Writes
``CORRECTNESS_sf01_r{N}.json``.

Usage: python scripts/check_sf01.py [query ...]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time
import traceback

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from check_correctness import TABLES, compare, REL_TOL  # noqa: E402

SF_DIR = os.environ.get("SF01_DIR", "/root/testdata/sf0.1")


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
    import subprocess

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


def main():
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
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.isdir(path):
            path += "/*.parquet"
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    results, n_pass, n_fail = {}, 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                verdict = compare(sdf, odf)
            else:
                verdict = "OK (rows-only)"
        except Exception:
            verdict = "ERROR"
            traceback.print_exc()
        secs = round(time.time() - t0, 1)
        status = "PASS" if verdict.startswith("OK") else "FAIL"
        n_pass += status == "PASS"
        n_fail += status == "FAIL"
        results[name] = {
            "status": status,
            "rows": int(len(sdf)) if verdict != "ERROR" else None,
            "secs": secs,
        }
        if verdict not in ("OK",):
            results[name]["detail"] = verdict
        print(f"{status} {name}: {verdict} [{secs}s]", flush=True)
    spark.stop()

    if not only:
        rnd = _detect_round()
        artifact = {
            "round": rnd,
            "head": _git_head(),
            "sf_dir": SF_DIR,
            "scale_vs_gate": "10x the sf0.01 grading scale (full board)",
            "harness": "scripts/check_sf01.py (driver-replica compare)",
            "tolerance_rule": (
                "float cells whose 6dp roundings differ are accepted iff raw "
                f"values agree within {REL_TOL:g} relative AND the roundings "
                "straddle exactly one 1e-6 edge (cross-engine float-summation "
                "rounding artifact); integer/unit columns stay exact — see "
                "scripts/check_correctness.py"
            ),
            "results": results,
            "summary": f"{n_pass} pass / {n_fail} fail",
        }
        out = os.path.join(REPO, f"CORRECTNESS_sf01_r{rnd}.json")
        with open(out, "w") as fh:
            json.dump(artifact, fh, indent=2)
        print(f"wrote {out}: {artifact['summary']}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
