"""The sf1 planted-pair minhash oracle rests on engineered bigram overlap
(scripts/check_sf1.py); these tests pin that geometry in pure Python so a
generator edit can't silently void the oracle's 0.7 / 0.111 contract."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from check_sf1 import _planted_rows  # noqa: E402


def _bigrams(text):
    t = text.lower().strip().split()
    return {f"{a} {b}" for a, b in zip(t, t[1:])}


def _jaccard(x, y):
    return len(x & y) / len(x | y)


def test_planted_pair_geometry():
    rows = dict(_planted_rows())
    assert len(rows) == 240
    base = 10_000_000_000
    for p in range(120):
        a, b = _bigrams(rows[base + 2 * p]), _bigrams(rows[base + 2 * p + 1])
        assert len(a) == 40 and len(b) == 40
        j = _jaccard(a, b)
        if p < 100:  # dup pairs: above the 0.7 exact threshold with margin
            assert abs(j - 34 / 46) < 1e-12
        else:  # controls: far below both 0.7 exact and the 0.3 verify
            assert abs(j - 8 / 72) < 1e-12


def test_planted_vocab_is_pair_unique():
    """No shingle crosses pairs (cross-pair Jaccard is exactly 0) and no
    token can collide with the base corpus' real-word vocabulary."""
    rows = _planted_rows()
    seen = {}
    for doc_id, text in rows:
        pair = (doc_id - 10_000_000_000) // 2
        for tok in text.split():
            assert tok.startswith(f"p{pair:04d}")
            assert tok not in seen or seen[tok] == pair
            seen[tok] = pair
