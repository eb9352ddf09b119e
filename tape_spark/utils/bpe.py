"""Minimal byte-pair-encoding tokenizer — pure Python, no wheels.

Implements the public BPE algorithm (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units"):
pre-tokenize on whitespace, represent each word as its character
sequence plus an end-of-word marker, then greedily merge the most
frequent adjacent symbol pair until the merge budget is spent. Encoding
applies the learned merges by rank — the same greedy procedure every
mainstream BPE implementation uses.

This exists so ``tokenize_chunks`` (operators/text.py) can run a REAL
subword tokenizer in environments without ``tokenizers``/``tiktoken``
wheels (such as this sandbox): train on a deterministic,
content-addressed corpus sample (bounded driver-side collect), then
ship the merge table to executors inside the UDF closure — it is a
plain picklable object. The reference engine has no tokenizer surface
at all; this is part of the beyond-reference LLM-pipeline layer.

Design notes for 100 TB:
- Training is a DRIVER-side, bounded operation (sample_fraction +
  max_docs + max_chars caps) — the classic recipe: learn merges once on
  a small representative sample, apply them corpus-wide. Applying is a
  narrow Arrow-batched map with the merge table as closure state.
- Encoding is O(tokens · merges-applied) with a rank dict; no regex
  backtracking, no global state.
- Determinism: pair-frequency ties break lexicographically, the sample
  is selected by md5 content addressing and ordered by id, and ids are
  assigned by sorted vocabulary — identical merges and ids on every
  run, locked by tests/test_utils.py.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

__all__ = ["BPETokenizer", "train_bpe", "train_bpe_from_corpus"]

_EOW = "</w>"
_UNK = "<unk>"


def _word_freqs(texts: Iterable[str]) -> Counter:
    freqs: Counter = Counter()
    for t in texts:
        if t:
            freqs.update(t.split())
    return freqs


def train_bpe(texts: Iterable[str], num_merges: int = 200) -> "BPETokenizer":
    """Learn ``num_merges`` BPE merges from an in-memory corpus sample.

    Classic Sennrich training over whitespace-word frequencies; each
    iteration merges the globally most frequent adjacent symbol pair
    (ties: lexicographically smallest pair, for determinism).
    """
    freqs = _word_freqs(texts)
    # word -> current symbol sequence (chars + end-of-word marker)
    words: Dict[str, List[str]] = {
        w: list(w) + [_EOW] for w in freqs
    }
    # Incremental pair bookkeeping (the standard fast-BPE trick): keep the
    # global pair counts plus an inverted index pair -> words containing
    # it, and after each merge re-count only the affected words — training
    # cost is the initial scan plus O(touched words) per merge, not a full
    # corpus rescan per merge.
    pair_counts: Counter = Counter()
    pair_words: Dict[Tuple[str, str], set] = {}
    for w, syms in words.items():
        f = freqs[w]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] += f
            pair_words.setdefault(p, set()).add(w)
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best_n = max(pair_counts.values())
        if best_n < 2:
            break  # nothing left worth merging
        best = min(p for p, n in pair_counts.items() if n == best_n)
        merges.append(best)
        a, b = best
        ab = a + b
        for w in list(pair_words.get(best, ())):
            syms = words[w]
            f = freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(w)
                    if not ws:
                        del pair_words[p]
            i, out = 0, []
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_counts[p] += f
                pair_words.setdefault(p, set()).add(w)
    base_chars = {c for w in freqs for c in w}
    return BPETokenizer(merges, sorted(base_chars))


def train_bpe_from_corpus(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 200,
    sample_fraction: float = 0.05,
    max_docs: int = 500,
    max_chars: int = 1_000_000,
) -> "BPETokenizer":
    """Train on a deterministic content-addressed sample of a DataFrame
    corpus: keep docs whose ``md5(id)`` fraction falls below
    ``sample_fraction`` (the same engine-agnostic draw the curation
    samplers use), order by id, cap at ``max_docs`` — ONE bounded
    driver-side collect, never table-sized. ``max_chars`` truncates the
    concatenated sample as a final guard.
    """
    from pyspark.sql import functions as F

    sample = (
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
        .filter(
            F.conv(F.md5(F.col("__id").cast("string")).substr(1, 13), 16, 10)
            .cast("double")
            / F.lit(float(16 ** 13))
            < sample_fraction
        )
        .orderBy("__id")
        .limit(max_docs)
        .collect()
    )
    texts, total = [], 0
    for row in sample:
        t = row["__text"] or ""
        if total + len(t) > max_chars:
            t = t[: max_chars - total]
        texts.append(t)
        total += len(t)
        if total >= max_chars:
            break
    return train_bpe(texts, num_merges=num_merges)


class BPETokenizer:
    """A trained BPE: merge table + vocabulary, picklable for UDF closures.

    Ids are assigned deterministically: 0 is ``<unk>`` (characters never
    seen in training), then the sorted vocabulary (base characters, the
    end-of-word marker, and every merged symbol).
    """

    # word -> ids memo cap: natural text is Zipfian, so a small cache
    # absorbs almost all occurrences; entries are short int lists, so the
    # worst case is a few MB per executor process. Insertion stops at the
    # cap (no eviction churn): under Zipf the frequent words appear early,
    # and a full cache of early words is exactly the useful one.
    _WORD_CACHE_MAX = 65_536

    def __init__(self, merges: Sequence[Tuple[str, str]], base_chars: Sequence[str]):
        self.merges = [tuple(m) for m in merges]
        self.base_chars = list(base_chars)
        self._ranks = {m: i for i, m in enumerate(self.merges)}
        vocab = set(self.base_chars) | {_EOW} | {a + b for a, b in self.merges}
        self._id_of = {_UNK: 0}
        for i, s in enumerate(sorted(vocab), start=1):
            self._id_of[s] = i
        self._sym_of = {i: s for s, i in self._id_of.items()}
        self._word_ids: Dict[str, List[int]] = {}

    @property
    def vocab_size(self) -> int:
        return len(self._id_of)

    def _encode_word(self, word: str) -> List[str]:
        syms = [c if c in self._id_of else _UNK for c in word] + [_EOW]
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = self._ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    def encode(self, text: str) -> List[int]:
        """Whitespace-pretokenized BPE encode; unknown characters map to
        ``<unk>`` (id 0). Per-word results are memoized (word occurrences
        are Zipfian — re-deriving the merges per occurrence measured as
        the dominant cost of corpus-wide encoding)."""
        out: List[int] = []
        cache = self._word_ids
        id_of = self._id_of
        for w in (text or "").split():
            ids = cache.get(w)
            if ids is None:
                ids = [id_of.get(s, 0) for s in self._encode_word(w)]
                if len(cache) < self._WORD_CACHE_MAX:
                    cache[w] = ids
            out.extend(ids)
        return out

    def decode(self, ids: Sequence[int]) -> str:
        """Inverse of :meth:`encode` up to whitespace normalization and
        ``<unk>`` characters: words rejoin on the end-of-word marker with
        single spaces. A word whose characters literally spell the
        ``</w>`` marker decodes as a boundary (the classic marker
        collision every marker-based BPE shares); use a byte-level
        alphabet if inputs can contain it."""
        text = "".join(self._sym_of.get(i, _UNK) for i in ids)
        return " ".join(w for w in text.split(_EOW) if w != "")

    # pickle support: derived dicts rebuild from the two defining fields
    def __getstate__(self):
        return {"merges": self.merges, "base_chars": self.base_chars}

    def __setstate__(self, state):
        self.__init__(state["merges"], state["base_chars"])

    def __call__(self, text: str) -> List[int]:
        return self.encode(text)
