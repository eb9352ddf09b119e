"""Naive-Bayes text quality classifier — the fastText-style "looks like
curated text vs looks like crawl" gate every published LLM data pipeline
runs next to the perplexity filter (GPT-3 / LLaMA data prep train a
linear classifier on a curated-positive vs crawl-negative sample and
keep documents the classifier scores highly).

No classifier wheels exist in this environment, and none are needed: a
multinomial Naive Bayes over the same whitespace tokens the bigram LM
uses IS a linear model over bag-of-words counts (the classic strong
baseline), and — unlike logistic regression — its fit is pure counting,
so the oracle can REBUILD the model in SQL exactly, the same way the
Stupid-Backoff LM oracle does (``operators/langmodel.py``).

Model definition (deliberately exact-replayable in SQL):

- training sample: the shared deterministic md5-addressed draw — keep
  documents whose ``md5(id)`` fraction < ``sample_fraction``, ordered by
  id, capped at ``max_docs``; the binary label is a caller-supplied SQL
  boolean expression over the document row (e.g. ``"source <= 'src4'"``)
  evaluated at sample time;
- tokens: whitespace split of ``trim(lower(text))``, empty tokens
  dropped — identical to the LM / text_signals tokenizer;
- vocabulary: sample tokens with count >= ``min_count``; everything else
  maps to ``<unk>`` BEFORE counting (Laplace smoothing makes a zero-count
  ``<unk>`` safe, so no +1 trick is needed here);
- per-token weight: ``ln((c(t|+) + a) / (N+ + a*V)) - ln((c(t|-) + a) /
  (N- + a*V))`` with Laplace ``a`` and ``V = |vocab| + 1`` (the +1 is
  ``<unk>``), quantized to integer 1e-12 units with ``floor(x*1e12+0.5)``
  — the order-safe integer-sum discipline the LM scorer established;
- document score: ``nb_logodds = (prior_units + sum(token units)) /
  1e12`` where ``prior_units`` quantizes ``ln(n+/n) - ln(n-/n)`` over the
  sample's document counts; ``nb_label = nb_logodds > 0``. Empty
  documents score the prior alone.

At 100 TB: training reads one bounded driver-side sample (counts of a
few-hundred-doc vocabulary); scoring is a zero-shuffle Arrow-batched map
with the weight dictionary as closure state, tokenization JVM-side —
the corpus partitioning passes through untouched. The reference engine
(``/root/reference/src/tape/ensemble.py``) has no corpus surface at all;
this extends the beyond-reference LLM-pipeline layer next to
``perplexity_score`` / ``corpus_filter``.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["NBClassifier", "train_nb_classifier", "nb_score"]

_UNK = "<unk>"
_LP_UNIT = 1e12


def _quantize(x: float) -> int:
    """floor(x * 1e12 + 0.5): the repo's order-safe log-prob quantum
    (identical semantics in Python and DuckDB SQL, unlike banker's
    ``round``)."""
    return math.floor(x * _LP_UNIT + 0.5)


def _toks_expr(text_col: str):
    """The shared JVM-side tokenizer (same expression as the LM and the
    SQL oracles): whitespace split of trim(lower(text)), empties out."""
    return F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda x: x != "",
    )


class NBClassifier:
    """Picklable trained model: per-token integer weight units (the
    log-likelihood-ratio, pre-quantized), the prior units, and the
    vocabulary rule needed to map scoring tokens."""

    def __init__(
        self,
        weights: Dict[str, int],
        prior_units: int,
        min_count: int,
        alpha: float,
        n_pos_docs: int,
        n_neg_docs: int,
    ):
        self.weights = weights  # includes the _UNK entry
        self.prior_units = prior_units
        self.min_count = min_count
        self.alpha = alpha
        self.n_pos_docs = n_pos_docs
        self.n_neg_docs = n_neg_docs

    @property
    def vocab_size(self) -> int:
        return len(self.weights)  # |vocab| + 1 (<unk>)

    def logodds(self, tokens) -> float:
        units = self.prior_units
        unk = self.weights[_UNK]
        for t in tokens:
            if t != "":
                units += self.weights.get(t, unk)
        return units / _LP_UNIT


def train_nb_classifier(
    df: DataFrame,
    label_expr: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_fraction: float = 0.5,
    max_docs: int = 500,
    min_count: int = 2,
    alpha: float = 1.0,
) -> NBClassifier:
    """Fit multinomial NB on the deterministic md5-addressed sample.

    ``label_expr`` is a SQL boolean expression over the input row (it is
    evaluated JVM-side with ``F.expr`` and must be replayable by the
    oracle verbatim). ONE bounded driver collect of (label, token-array)
    rows; counts assembled in plain Python. Raises ``ValueError`` if the
    sample does not contain both classes — a one-class "classifier" would
    silently score every document with the prior's sign.
    """
    rows = (
        df.select(
            F.col(id_col).alias("__id"),
            F.expr(label_expr).alias("__y"),
            _toks_expr(text_col).alias("__toks"),
        )
        .filter(
            F.conv(F.md5(F.col("__id").cast("string")).substr(1, 13), 16, 10)
            .cast("double")
            / F.lit(float(16**13))
            < sample_fraction
        )
        .orderBy("__id")
        .limit(max_docs)
        .collect()
    )
    raw: Dict[str, int] = {}
    docs = [(bool(r["__y"]), list(r["__toks"])) for r in rows]
    for _, toks in docs:
        for t in toks:
            raw[t] = raw.get(t, 0) + 1
    vocab = {t for t, c in raw.items() if c >= min_count and t != _UNK}

    n_pos_docs = sum(1 for y, _ in docs if y)
    n_neg_docs = len(docs) - n_pos_docs
    if n_pos_docs == 0 or n_neg_docs == 0:
        raise ValueError(
            f"training sample has a single class (pos={n_pos_docs}, "
            f"neg={n_neg_docs}); widen sample_fraction/max_docs or fix "
            f"label_expr={label_expr!r}"
        )

    counts: Dict[str, list] = {}  # token -> [pos_count, neg_count]
    n_tok = [0, 0]  # [N+, N-]
    for y, toks in docs:
        idx = 0 if y else 1
        for t in toks:
            m = t if t in vocab else _UNK
            cell = counts.setdefault(m, [0, 0])
            cell[idx] += 1
            n_tok[idx] += 1

    v_size = len(vocab) + 1  # + <unk>
    a = float(alpha)
    den_pos = n_tok[0] + a * v_size
    den_neg = n_tok[1] + a * v_size
    weights: Dict[str, int] = {}
    for t in vocab | {_UNK}:
        c_pos, c_neg = counts.get(t, (0, 0))
        weights[t] = _quantize(
            math.log((c_pos + a) / den_pos) - math.log((c_neg + a) / den_neg)
        )
    n = len(docs)
    prior_units = _quantize(
        math.log(n_pos_docs / n) - math.log(n_neg_docs / n)
    )
    return NBClassifier(weights, prior_units, min_count, a, n_pos_docs, n_neg_docs)


def nb_score(
    df: DataFrame,
    model: NBClassifier,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document classifier score: ``(id, n_nb_tokens, nb_logodds,
    nb_label)``.

    Tokenization happens JVM-side (the same codegen expression training
    and the SQL oracle use); the Arrow boundary carries only token arrays
    in and two numbers per document back. Zero shuffles — the corpus
    partitioning passes through. NULL/empty documents score the prior
    alone with ``n_nb_tokens = 0``.
    """
    staged = df.select(F.col(id_col), _toks_expr(text_col).alias("__toks"))

    out_type = T.StructType(
        [
            T.StructField("n_nb_tokens", T.LongType()),
            T.StructField("nb_logodds", T.DoubleType()),
        ]
    )

    @F.pandas_udf(out_type)
    def score(toks: pd.Series) -> pd.DataFrame:
        ns, lods = [], []
        for arr in toks:
            arr = [] if arr is None else list(arr)
            ns.append(len(arr))
            lods.append(model.logodds(arr))
        return pd.DataFrame({"n_nb_tokens": ns, "nb_logodds": lods})

    return staged.select(
        F.col(id_col), score(F.col("__toks")).alias("__s")
    ).select(
        id_col,
        F.col("__s.n_nb_tokens").alias("n_nb_tokens"),
        F.col("__s.nb_logodds").alias("nb_logodds"),
        (F.col("__s.nb_logodds") > 0).alias("nb_label"),
    )
