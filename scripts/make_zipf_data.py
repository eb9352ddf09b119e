#!/usr/bin/env python
"""Zipf-enriched vocabulary variant of a testdata dir (verdict r10 ask #4).

The synthetic gate corpus draws every document from a 31-word vocabulary,
so shingle/df/idf statistics are degenerate: every bigram is hot, df ~ N
for every term — the easiest possible geometry for bm25 pruning, minhash
banding, and vocab ranking. This script derives a documents table with a
deterministic heavy-tailed vocabulary and copies/links every other table
unchanged, so the full correctness gate can re-run on a corpus where
df << N actually holds.

Construction (pure hash arithmetic — no RNG state, byte-reproducible):

- vocabulary: 10,000 words ``w00001..w10000``; word ranks are drawn
  log-uniformly — u ~ U(0,1) from a 64-bit hash, rank = floor(10001^u) —
  giving P(rank=r) ~ ln((r+1)/r) ~ 1/r, i.e. Zipf(~1). Expected df of the
  tail rank is ~N_words/(r * ln 10001): rank-1 words appear everywhere,
  rank-9000 words in ~0.001% of positions.
- length: 30 + hash(d) % 90 words per document.
- duplicate structure (so the dedup rows stay non-vacuous): every
  doc_id % 10 == 9 is an EXACT copy of doc_id-1; every doc_id % 10 == 5
  is a NEAR copy of doc_id-1 with ~8% of positions redrawn from a
  different hash stream (bigram Jaccard ~ 0.85, above the 0.7 near-dup
  threshold).
- lang/source are carried over from the source table by doc_id (keeps
  the stratification distributions); n_chars is recomputed = len(text).

Usage: python scripts/make_zipf_data.py [SRC_DIR] [OUT_DIR]
       defaults: /root/testdata/sf0.01 -> /root/repo/.benchdata/sf0.01_zipf
"""

import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.benchdata/sf0.01_zipf"
V = 10_000
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

os.makedirs(OUT, exist_ok=True)

con = duckdb.connect()

# base_id: dup rows (d%10 in (5,9)) draw their word stream from d-1, so the
# copy is structural, not a self-join. The mutation stream for near-dups is
# salted by d (not base_id) so the ~8% redrawn positions differ from the base.
word_sql = f"""
CREATE OR REPLACE FUNCTION zipf_word(seed) AS
  'w' || lpad(CAST(least({V}, CAST(floor(pow({V + 1}.0,
      (hash(seed) % 999983) / 999983.0)) AS BIGINT)) AS VARCHAR), 5, '0')
"""
con.execute(word_sql)

docs_src = f"{SRC}/documents.parquet"
if os.path.isdir(docs_src):
    docs_src += "/*.parquet"
out_docs = os.path.join(OUT, "documents.parquet")

con.execute(
    f"""
COPY (
  WITH src AS (SELECT doc_id, lang, source FROM read_parquet('{docs_src}')),
  base AS (
    SELECT doc_id, lang, source,
           CASE WHEN doc_id % 10 IN (5, 9) THEN doc_id - 1 ELSE doc_id END AS base_id,
           doc_id % 10 = 5 AS mutate
    FROM src
  ),
  gen AS (
    SELECT doc_id, lang, source,
           array_to_string(list_transform(
             range(30 + CAST(hash(base_id * 7919 + 17) % 90 AS BIGINT)),
             i -> CASE WHEN mutate AND hash(doc_id * 1000033 + i) % 12 = 0
                       THEN zipf_word(doc_id * 1000037 + i)
                       ELSE zipf_word(base_id * 1000003 + i) END
           ), ' ') AS text
    FROM base
  )
  SELECT doc_id, text, lang, source, CAST(length(text) AS BIGINT) AS n_chars
  FROM gen ORDER BY doc_id
) TO '{out_docs}' (FORMAT PARQUET)
"""
)
n = con.execute(f"SELECT count(*) FROM read_parquet('{out_docs}')").fetchone()[0]
print(f"documents {n} (zipf vocab V={V})")

for t in TABLES:
    if t == "documents":
        continue
    src_path = os.path.join(SRC, f"{t}.parquet")
    dst_path = os.path.join(OUT, f"{t}.parquet")
    if not os.path.exists(src_path):
        continue
    if os.path.islink(dst_path) or os.path.isfile(dst_path):
        os.remove(dst_path)
    elif os.path.isdir(dst_path):
        shutil.rmtree(dst_path)
    os.symlink(src_path, dst_path)
print(f"linked {OUT} -> {SRC} for non-document tables")
