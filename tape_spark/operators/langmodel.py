"""Bigram language-model perplexity scoring — the CCNet-style corpus
quality signal (Wenzek et al. 2020 filter web text by LM perplexity;
Brants et al. 2007 "Stupid Backoff" is the smoothing).

No LM wheels exist in this environment, and none are needed: a bigram
Stupid-Backoff model is a pair of count dictionaries. Training is a
bounded DRIVER-side pass over a deterministic content-addressed corpus
sample (the same md5 draw every sampler in this repo uses); scoring is a
narrow Arrow-batched map with the counts as closure state — no shuffle,
no Python in the tokenization (tokens are computed JVM-side with the
same ``split(trim(lower(text)))`` expression the SQL oracle replays).

Model definition (deliberately exact-replayable in SQL):

- tokens: whitespace split of ``trim(lower(text))``, empty tokens
  dropped;
- vocabulary: sample tokens with count >= ``min_count``; everything else
  maps to ``<unk>`` BEFORE counting, so ``c(<unk>)`` aggregates all rare
  mass. ``c(<unk>)`` gets +1 (and N gets +1) so every mapped token has
  positive probability even when the sample itself had no OOV;
- score: ``log p(doc) = ln(c(t0)/N) + sum_i ln(S(t_i | t_{i-1}))`` with
  Stupid Backoff ``S(w|v) = c(vw)/c(v)`` when the bigram was seen, else
  ``alpha * c(w)/N`` (alpha = 0.4, the published constant);
- ``ppl = exp(-log p / n_tokens)``; empty documents score NULL.
- Every per-term log-prob is quantized to an integer count of 1e-12
  units (``floor(x * 1e12 + 0.5)`` — identical semantics in Python and
  SQL, unlike banker's ``round``) and the document score is the INTEGER
  sum of those units divided back. Integer addition is associative, so
  the score is bit-identical however the engine orders the sum — an
  unordered SQL ``SUM`` and Python's sequential loop can otherwise
  differ in the last ULP and flip a ``round(ppl, 6)`` hash gate on
  knife-edge values.

At 100 TB: training reads one bounded sample (driver memory ~ counts of
a few-hundred-doc vocabulary); scoring inherits the corpus partitioning
untouched. The reference engine has no corpus-quality surface at all —
this extends the beyond-reference LLM-pipeline layer next to
``text_signals`` / ``corpus_filter``.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["BigramLM", "train_bigram_lm", "perplexity_score"]

_UNK = "<unk>"
_ALPHA = 0.4
_LP_UNIT = 1e12  # per-term log-prob quantum (see module docstring)


def _quantize_lp(x: float) -> int:
    """floor(x * 1e12 + 0.5): order-safe integer units of a log-prob
    term, with a rounding rule SQL replays exactly."""
    return math.floor(x * _LP_UNIT + 0.5)


class BigramLM:
    """Picklable Stupid-Backoff bigram model: unigram counts (with the
    ``<unk>`` +1 already applied), bigram counts over mapped tokens, and
    the adjusted total N."""

    def __init__(
        self,
        unigrams: Dict[str, int],
        bigrams: Dict[Tuple[str, str], int],
        total: int,
        min_count: int,
        alpha: float = _ALPHA,
    ):
        self.unigrams = unigrams
        self.bigrams = bigrams
        self.total = total
        self.min_count = min_count
        self.alpha = alpha

    @property
    def vocab_size(self) -> int:
        return len(self.unigrams)

    def map_token(self, t: str) -> str:
        return t if t in self.unigrams and t != _UNK else _UNK

    def logprob(self, tokens) -> Optional[float]:
        """Natural-log probability of a token sequence (already mapped or
        raw — raw tokens are OOV-mapped here). None for empty input."""
        toks = [self.map_token(t) for t in tokens if t != ""]
        if not toks:
            return None
        n = float(self.total)
        units = _quantize_lp(math.log(self.unigrams[toks[0]] / n))
        for v, w in zip(toks, toks[1:]):
            c_vw = self.bigrams.get((v, w))
            if c_vw:
                units += _quantize_lp(math.log(c_vw / self.unigrams[v]))
            else:
                units += _quantize_lp(math.log(self.alpha * self.unigrams[w] / n))
        return units / _LP_UNIT

    def perplexity(self, tokens) -> Optional[float]:
        toks = [t for t in tokens if t != ""]
        lp = self.logprob(toks)
        if lp is None:
            return None
        return math.exp(-lp / len(toks))


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_fraction: float = 0.3,
    max_docs: int = 400,
    min_count: int = 3,
    alpha: float = _ALPHA,
) -> BigramLM:
    """Train on the deterministic md5-addressed sample (keep docs whose
    ``md5(id)`` fraction < ``sample_fraction``, ordered by id, capped at
    ``max_docs``): ONE bounded driver collect of token arrays, counts
    assembled in plain Python. Identical inputs give identical models —
    every choice (the draw, the vocabulary rule, the +1 on ``<unk>``) is
    a pure function of the data, replayable in SQL."""
    toks_expr = F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda x: x != "",
    )
    rows = (
        df.select(F.col(id_col).alias("__id"), toks_expr.alias("__toks"))
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
    raw: Dict[str, int] = {}
    docs = [list(r["__toks"]) for r in rows]
    for toks in docs:
        for t in toks:
            raw[t] = raw.get(t, 0) + 1
    vocab = {t for t, c in raw.items() if c >= min_count and t != _UNK}
    unigrams: Dict[str, int] = {}
    bigrams: Dict[Tuple[str, str], int] = {}
    total = 0
    for toks in docs:
        mapped = [t if t in vocab else _UNK for t in toks]
        total += len(mapped)
        for t in mapped:
            unigrams[t] = unigrams.get(t, 0) + 1
        for v, w in zip(mapped, mapped[1:]):
            bigrams[(v, w)] = bigrams.get((v, w), 0) + 1
    unigrams[_UNK] = unigrams.get(_UNK, 0) + 1
    total += 1
    return BigramLM(unigrams, bigrams, total, min_count, alpha)


def perplexity_score(
    df: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document LM perplexity: ``(id, n_lm_tokens, ppl)``.

    Tokenization happens JVM-side (the same codegen expression the
    training pass and the SQL oracle use); the Arrow boundary carries
    only the token arrays in and two numbers per document back. Empty or
    NULL documents emit ``n_lm_tokens = 0`` and NULL ``ppl``.
    """
    toks_expr = F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda x: x != "",
    )
    staged = df.select(F.col(id_col), toks_expr.alias("__toks"))

    out_type = T.StructType(
        [
            T.StructField("n_lm_tokens", T.LongType()),
            T.StructField("ppl", T.DoubleType()),
        ]
    )

    @F.pandas_udf(out_type)
    def score(toks: pd.Series) -> pd.DataFrame:
        ns, ppls = [], []
        for arr in toks:
            arr = [] if arr is None else list(arr)
            ns.append(len(arr))
            ppls.append(lm.perplexity(arr))
        return pd.DataFrame({"n_lm_tokens": ns, "ppl": ppls})

    return staged.select(
        F.col(id_col), score(F.col("__toks")).alias("__s")
    ).select(
        id_col,
        F.col("__s.n_lm_tokens").alias("n_lm_tokens"),
        F.col("__s.ppl").alias("ppl"),
    )
