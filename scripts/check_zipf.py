#!/usr/bin/env python
"""Standing Zipf-corpus gate (verdict r10 ask #4, made repeatable).

Regenerates the heavy-tailed-vocabulary variant of the sf0.01 gate dir
(.benchdata/sf0.01_zipf via make_zipf_data.py) when absent, re-runs the
FULL driver-replica correctness gate (scripts/check_correctness.py) on
it, and emits CORRECTNESS_zipf_r{N}.json — so every round proves the
50-row board green on a corpus where df << N, planted exact/near dups
exist, and shingle/idf statistics are non-degenerate, with zero manual
steps.

Usage: python scripts/check_zipf.py
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIPF_DIR = os.environ.get("ZIPF_DIR", os.path.join(REPO, ".benchdata", "sf0.01_zipf"))
SRC = os.environ.get("ZIPF_SRC", "/root/testdata/sf0.01")


def _detect_round() -> int:
    if os.environ.get("ROUND"):
        return int(os.environ["ROUND"])
    import glob

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


def main() -> int:
    if not os.path.exists(os.path.join(ZIPF_DIR, "documents.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "make_zipf_data.py"), SRC, ZIPF_DIR],
            check=True,
        )
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=ZIPF_DIR)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_correctness.py")],
        env=env,
        capture_output=True,
        text=True,
    )
    # console progress bars interleave \r fragments into stdout lines
    lines = [l for l in proc.stdout.replace("\r", "\n").splitlines() if l.strip()]
    rows = {}
    for l in lines:
        m = re.match(r"(PASS|FAIL) (\S+): (.*?) \((\d+) rows\) \[([\d.]+)s\]", l)
        if m:
            rows[m.group(2)] = {
                "status": m.group(1),
                "detail": None if m.group(3) == "OK" else m.group(3),
                "rows": int(m.group(4)),
                "secs": float(m.group(5)),
            }
        else:
            m2 = re.match(r"(PASS|FAIL) (\S+): rows-only \((\d+) rows\) \[([\d.]+)s\]", l)
            if m2:
                rows[m2.group(2)] = {
                    "status": m2.group(1),
                    "detail": "rows-only",
                    "rows": int(m2.group(3)),
                    "secs": float(m2.group(4)),
                }
                continue
            # error rows print without the '(N rows) [Ns]' suffix (e.g.
            # 'FAIL name: SPARK ERROR' + traceback) — they must land in
            # the artifact, not vanish from it
            m3 = re.match(r"(PASS|FAIL) (\S+): (.+)", l)
            if m3 and m3.group(2) not in rows:
                rows[m3.group(2)] = {
                    "status": m3.group(1),
                    "detail": m3.group(3),
                    "rows": None,
                    "secs": None,
                }
    summary = next((l for l in lines if re.match(r"\d+ pass / \d+ fail", l)), "")
    n_fail = proc.returncode
    rnd = _detect_round()
    out = os.path.join(REPO, f"CORRECTNESS_zipf_r{rnd}.json")
    with open(out, "w") as fh:
        json.dump(
            {
                "round": rnd,
                "head": _git_head(),
                "sf_dir": os.path.relpath(ZIPF_DIR, REPO),
                "corpus": "10k-word Zipf(1) vocabulary, planted exact (id%10==9) and "
                "~8%-mutation near (id%10==5) duplicates; every other table linked "
                "from the gate dir (scripts/make_zipf_data.py)",
                "harness": "scripts/check_correctness.py under SPARK_GRAFT_SF_DIR",
                "results": rows,
                "summary": summary,
            },
            fh,
            indent=2,
        )
    print(f"wrote {out}: {summary}")
    if n_fail:
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-2000:])
    return n_fail


if __name__ == "__main__":
    sys.exit(main())
