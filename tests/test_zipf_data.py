"""The Zipf-corpus probes (dedup_zipf, jaccard_cap, bm25_zipf) and the
standing check_zipf gate all assume the generator's planted structure:
doc_id%10==9 is an EXACT copy of id-1, doc_id%10==5 a partial-mutation
near copy, everything else drawn from a heavy-tailed 10k-word
vocabulary. Pin those invariants on a tiny generated sample so a
generator edit can't silently void the probes' recall math."""

import os
import subprocess
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def zipf_dir(tmp_path_factory):
    src = tmp_path_factory.mktemp("zipf_src")
    out = tmp_path_factory.mktemp("zipf_out")
    n = 40
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["placeholder"] * n),
                "lang": pa.array(["en", "zh", "de", "fr"] * (n // 4)),
                "source": pa.array([f"src{i % 3}" for i in range(n)]),
                "n_chars": pa.array([11] * n, pa.int64()),
            }
        ),
        str(src / "documents.parquet"),
    )
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_zipf_data.py"),
            str(src),
            str(out),
        ],
        check=True,
        capture_output=True,
    )
    return str(out)


def _docs(zipf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, lang, n_chars FROM "
        f"read_parquet('{zipf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    return {r[0]: r for r in rows}


def test_exact_copies_planted(zipf_dir):
    d = _docs(zipf_dir)
    for i in d:
        if i % 10 == 9:
            assert d[i][1] == d[i - 1][1], f"doc {i} must equal doc {i - 1}"


def test_near_copies_planted(zipf_dir):
    d = _docs(zipf_dir)
    for i in d:
        if i % 10 == 5:
            a, b = d[i - 1][1].split(), d[i][1].split()
            assert len(a) == len(b)
            assert a != b, "a near copy must actually mutate"
            frac = sum(x != y for x, y in zip(a, b)) / len(a)
            # hash(d,i)%12==0 mutation: ~8% expected; bound loosely
            assert 0 < frac < 0.35


def test_vocab_and_metadata(zipf_dir):
    d = _docs(zipf_dir)
    import re

    for i, (doc_id, text, lang, n_chars) in d.items():
        toks = text.split()
        assert 30 <= len(toks) <= 119  # 30 + hash % 90
        assert all(re.fullmatch(r"w\d{5}", t) for t in toks)
        assert all(1 <= int(t[1:]) <= 10000 for t in toks)
        assert n_chars == len(text)  # recomputed, not carried over
        assert lang in ("en", "zh", "de", "fr")  # carried over by doc_id
    # determinism: non-planted ids draw only from their own hash stream,
    # so the same doc_id always yields the same text across runs (checked
    # implicitly by the exact-copy assertions; here check id 0 is stable
    # in shape rather than pin bytes, which would couple the test to the
    # hash function)
    assert len({d[i][1] for i in d if i % 10 not in (5, 9)}) == len(
        [i for i in d if i % 10 not in (5, 9)]
    )
