#!/usr/bin/env python
"""Deterministically scale the sf0.1 test tables ~10x to measure scaling
exponents empirically (SCALING.md's claims are design arguments; this
produces the data to check them on one host).

Replication strategy per table (all pure SQL, no RNG state — `hash()` on
(id, replica, position) makes every byte reproducible):

- lineitem: 10 replicas with shifted ``l_orderkey`` — 10x the light
  curves, identical per-curve shapes, so per-curve kernels (SF2, Stetson)
  should scale linearly in row count.
- documents: 10 replicas with shifted ``doc_id`` and a per-replica
  deterministic word shuffle (order by hash) — a cyclic rotation would
  preserve bigram shingles and make every replica a near-duplicate of its
  source, quadratically inflating LSH candidate pairs; a shuffle keeps
  the corpus' duplicate structure comparable to the original.
- events: 10 replicas, ids/user_ids offset, timestamps shifted 30 days
  per replica so window/session cardinalities scale ~linearly.
- embeddings: 10 replicas with shifted ``vec_id`` (ANN cost is
  value-independent).

Output: $OUT_DIR (default /root/repo/.benchdata/sf1)/{table}.parquet.
Run bench.py against it with SPARK_GRAFT_SF_DIR=$OUT_DIR.
"""

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.benchdata/sf1"
REPLICAS = int(os.environ.get("SCALE_REPLICAS", "10"))
# optional comma-separated table subset (e.g. SCALE_TABLES=documents,events)
# — a probe that only replays events need not pay the 600M-row lineitem
# explode. Parts are resumable per table, so the filter composes with a
# later unfiltered run against the same OUT.
TABLES = {
    t.strip()
    for t in os.environ.get(
        "SCALE_TABLES", "lineitem,documents,events,embeddings"
    ).split(",")
    if t.strip()
}
# batch sizes participate in part-file naming (parts encode only their
# starting replica), so they belong to the resume grid: changing either
# must wipe, same as changing REPLICAS
BATCH = 100
DOC_BATCH = 10

os.makedirs(OUT, exist_ok=True)

# Part names encode only their starting replica, so "part exists" only
# means "complete" when REPLICAS (and the batch grids) match the run
# that wrote it — a re-run with a different REPLICAS against the same
# OUT would silently keep wrong-scale parts. A manifest pins the grid;
# on mismatch every table output is wiped before regeneration.
import json as _json
import shutil

_manifest = os.path.join(OUT, "manifest.json")
_grid = {"replicas": REPLICAS, "src": SRC, "batch": BATCH, "doc_batch": DOC_BATCH}
_prev = None
if os.path.exists(_manifest):
    with open(_manifest) as fh:
        _prev = _json.load(fh)
if _prev != _grid:
    if _prev is not None:
        print(f"grid changed ({_prev} -> {_grid}); wiping {OUT} outputs")
    for _t in ("lineitem", "documents", "events", "embeddings"):
        _p = os.path.join(OUT, f"{_t}.parquet")
        if os.path.isfile(_p):
            os.remove(_p)
        elif os.path.isdir(_p):
            shutil.rmtree(_p)
    with open(_manifest, "w") as fh:
        _json.dump(_grid, fh)


def fresh_con():
    """One connection per COPY: DuckDB's buffer pool fragments over many
    large COPYs in a single process (observed OOM after ~50 batches of a
    1000x run with plenty of host memory left); a fresh connection per
    batch keeps every batch's footprint independent. Spill stays bounded
    via the temp dir + memory cap."""
    c = duckdb.connect()
    c.sql(f"SET temp_directory = '{OUT}/.duckdb_tmp'")
    c.sql("SET memory_limit = '24GB'")
    return c


con = fresh_con()

# batch the big row-replication tables too: one COPY per replica batch
# keeps DuckDB's working set (and its spill) bounded at any REPLICAS —
# a 1000x single-COPY run otherwise spills tens of GB to temp. Output is
# a directory of parts (Spark and DuckDB both glob it).


def copy_batched(select_fmt: str, out_name: str, batch: int = BATCH) -> None:
    out_path = f"{OUT}/{out_name}"
    if os.path.isfile(out_path):
        os.remove(out_path)
    os.makedirs(out_path, exist_ok=True)
    # drop parts outside this run's batch grid (a prior larger/smaller
    # run); in-range parts are kept so an interrupted run resumes
    keep = {f"part-{lo:06d}.parquet" for lo in range(0, REPLICAS, batch)}
    for stale in set(os.listdir(out_path)) - keep:
        os.remove(os.path.join(out_path, stale))
    for lo in range(0, REPLICAS, batch):
        hi = min(lo + batch, REPLICAS)
        part = f"{out_path}/part-{lo:06d}.parquet"
        if os.path.exists(part):
            continue  # resumable: a prior interrupted run's parts are kept
        # write-then-rename so an interrupted COPY can never leave a
        # truncated part that a resume would mistake for complete
        tmp = part + ".inprogress"
        fresh_con().sql(
            f"COPY ({select_fmt.format(LO=lo, HI=hi)}) "
            f"TO '{tmp}' (FORMAT PARQUET)"
        )
        os.replace(tmp, part)
    print(out_name, "done")


if "lineitem" in TABLES:
    copy_batched(
        f"""SELECT * REPLACE (l_orderkey + r.k * 150000 AS l_orderkey)
            FROM '{SRC}/lineitem.parquet', UNNEST(range({{LO}}, {{HI}})) r(k)""",
        "lineitem.parquet",
    )

# the per-token explode is REPLICAS x corpus-tokens rows; generate in
# replica batches so 100x runs stay in bounded memory. The output is a
# directory of parquet parts — both Spark and DuckDB glob it natively.
def _make_documents():
    doc_out = f"{OUT}/documents.parquet"
    # clear a single-file previous output; stale EXTRA parts from a larger
    # prior run are removed below (parts within range are kept for resume)
    if os.path.isfile(doc_out):
        os.remove(doc_out)
    os.makedirs(doc_out, exist_ok=True)
    expected = {f"part-{lo:05d}.parquet" for lo in range(0, REPLICAS, DOC_BATCH)}
    for stale in set(os.listdir(doc_out)) - expected:
        os.remove(os.path.join(doc_out, stale))  # incl. .inprogress leftovers
    for lo in range(0, REPLICAS, DOC_BATCH):
        hi = min(lo + DOC_BATCH, REPLICAS)
        if os.path.exists(f"{doc_out}/part-{lo:05d}.parquet"):
            continue
        _doc_tmp = f"{doc_out}/part-{lo:05d}.parquet.inprogress"
        fresh_con().sql(f"""
        COPY (
          WITH tok AS (
            SELECT doc_id, lang, source, n_chars,
                   regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS w
            FROM '{SRC}/documents.parquet'
          ),
          expl AS (
            SELECT doc_id, r.k, lang, source, n_chars,
                   w[CAST(t.i AS BIGINT) + 1] AS tok_w,
                   hash(doc_id * 1000003 + r.k * 7919 + t.i) AS h
            FROM tok, UNNEST(range({lo}, {hi})) r(k), UNNEST(range(0, len(w))) t(i)
          )
          SELECT doc_id + k * 5000 AS doc_id,
                 string_agg(tok_w, ' ' ORDER BY h, tok_w) AS text,
                 any_value(lang) AS lang,
                 any_value(source) AS source,
                 any_value(n_chars) AS n_chars
          FROM expl GROUP BY doc_id + k * 5000
        ) TO '{_doc_tmp}' (FORMAT PARQUET)
        """)
        os.replace(_doc_tmp, f"{doc_out}/part-{lo:05d}.parquet")
        print(f"documents replicas [{lo}, {hi}) done")
    print("documents done")


if "documents" in TABLES:
    _make_documents()

if "events" in TABLES:
    copy_batched(
        f"""SELECT event_id + r.k * 100000 AS event_id,
               ts + to_days(CAST(r.k * 30 AS INTEGER)) AS ts,
               user_id + r.k * 1500 AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet', UNNEST(range({{LO}}, {{HI}})) r(k)""",
    "events.parquet",
)

if "embeddings" in TABLES:
    con.sql(f"""
    COPY (
      SELECT * REPLACE (vec_id + r.k * 2000 AS vec_id)
      FROM '{SRC}/embeddings.parquet', UNNEST(range(0, {REPLICAS})) r(k)
    ) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
    """)
    print("embeddings done")

for t in ("lineitem", "documents", "events", "embeddings"):
    if t not in TABLES:
        continue
    p = f"{OUT}/{t}.parquet"
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    n = con.sql(f"SELECT count(*) FROM '{glob}'").fetchone()[0]
    print(t, n)
