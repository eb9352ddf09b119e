"""Property-based operator checks (hypothesis): randomized inputs against
independent reference implementations. Spark-backed properties keep
max_examples small (each example is a Spark job); numpy properties run the
default budget."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from tape_spark.analysis.structure_function.base_calculator import binned_statistic


# --------------------------------------------------------------------- #
# binned_statistic vs a direct per-bin loop (pure numpy, cheap examples) #
# --------------------------------------------------------------------- #


@given(
    data=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=1, max_size=60
    ),
    cuts=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=2, max_size=8
    ),
)
@settings(max_examples=200, deadline=None)
def test_binned_statistic_matches_reference_loop(data, cuts):
    x = np.asarray(data, dtype=float)
    edges = np.unique(np.asarray(cuts, dtype=float))
    if edges.size < 2:
        return
    vals = x * 2.0 + 1.0
    stat, _, _ = binned_statistic(x, vals, statistic="mean", bins=edges)
    n_bins = edges.size - 1
    for b in range(n_bins):
        lo, hi = edges[b], edges[b + 1]
        if b == n_bins - 1:
            mask = (x >= lo) & (x <= hi)  # last bin right-inclusive
        else:
            mask = (x >= lo) & (x < hi)
        if mask.any():
            assert stat[b] == pytest.approx(vals[mask].mean(), rel=1e-12)
        else:
            assert np.isnan(stat[b])


# --------------------------------------------------------------------- #
# exact dedup: hash-keyed plan == full-text plan on random corpora       #
# --------------------------------------------------------------------- #

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon"]


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    texts = [
        " ".join(draw(st.lists(st.sampled_from(_WORDS), min_size=0, max_size=4)))
        for _ in range(n)
    ]
    return texts


@given(texts=corpora())
@settings(max_examples=10, deadline=None)
def test_exact_dedup_hash_equals_text_property(spark, texts):
    from tape_spark.operators import exact_dedup

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    by_text = exact_dedup(docs, by_hash=False).toPandas().sort_values("doc_id").reset_index(drop=True)
    by_hash = exact_dedup(docs, by_hash=True).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(by_text, by_hash)


# --------------------------------------------------------------------- #
# sessionize vs a pure-python reference over random event streams        #
# --------------------------------------------------------------------- #


def _sessions_reference(times, gap):
    """Independent session counter: sorted times, gap > threshold splits."""
    if not times:
        return 0
    times = sorted(times)
    n = 1
    for prev, cur in zip(times, times[1:]):
        if cur - prev > gap:
            n += 1
    return n


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # user
            st.floats(min_value=0, max_value=10_000, allow_nan=False),  # t
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None)
def test_sessionize_matches_reference_property(spark, events):
    from tape_spark.streaming import sessionize

    gap = 600.0
    df = spark.createDataFrame(
        [(u, float(t), i) for i, (u, t) in enumerate(events)],
        "user_id long, t double, event_id long",
    )
    out = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in sessionize(df, gap_seconds=gap, order_cols=["event_id"]).collect()
    }
    by_user = {}
    for u, t in events:
        by_user.setdefault(u, []).append(t)
    for u, times in by_user.items():
        assert out[u] == (_sessions_reference(times, gap), len(times))


# --------------------------------------------------------------------- #
# curation: decontaminate vs a python set reference; stratified_sample   #
# vs a hashlib md5 replay (random corpora)                               #
# --------------------------------------------------------------------- #

_words = st.sampled_from("alpha beta gamma delta epsilon zeta".split())
_texts = st.lists(
    st.one_of(st.none(), st.lists(_words, max_size=12).map(" ".join)),
    min_size=1,
    max_size=12,
)


def _ngram_set(text, n):
    toks = (text or "").strip().lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@given(train=_texts, bench=_texts, n=st.integers(min_value=1, max_value=4))
@settings(max_examples=10, deadline=None)
def test_decontaminate_matches_set_reference_property(spark, train, bench, n):
    from tape_spark.operators import decontaminate

    tdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(train)), "text": train}),
        "doc_id long, text string",
    )
    bdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(bench)), "text": bench}),
        "doc_id long, text string",
    )
    bset = set()
    for t in bench:
        bset |= _ngram_set(t, n)
    got = {r["doc_id"]: r.asDict() for r in decontaminate(tdf, bdf, n=n).collect()}
    assert set(got) == set(range(len(train)))
    for i, t in enumerate(train):
        grams = _ngram_set(t, n)
        assert got[i]["n_ngrams"] == len(grams)
        assert got[i]["n_contaminated"] == len(grams & bset)


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=25, unique=True),
    frac=st.floats(min_value=0.0, max_value=1.0),
)
@settings(max_examples=10, deadline=None)
def test_stratified_sample_matches_md5_replay_property(spark, ids, frac):
    import hashlib

    from tape_spark.operators import stratified_sample

    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids, "lang": ["x"] * len(ids)}))
    kept = {r["doc_id"] for r in stratified_sample(df, "lang", {"x": frac}, id_col="doc_id").collect()}
    expect = {
        i
        for i in ids
        if int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) / float(1 << 52) < frac
    }
    assert kept == expect


# --------------------------------------------------------------------- #
# BPE: pure-python properties (cheap examples, default budget)           #
# --------------------------------------------------------------------- #


_word = st.text(alphabet="abcdef", min_size=1, max_size=6)


@given(
    corpus=st.lists(
        st.lists(_word, min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    n_merges=st.integers(min_value=0, max_value=40),
)
@settings(max_examples=150, deadline=None)
def test_bpe_roundtrip_and_bounds_property(corpus, n_merges):
    """For ANY corpus trained on itself: encode/decode roundtrips every
    training document exactly (no OOV possible), and the subword count
    stays within [words, chars + words]."""
    from tape_spark.utils.bpe import train_bpe

    tok = train_bpe(corpus, num_merges=n_merges)
    for doc in corpus:
        ids = tok.encode(doc)
        words = doc.split()
        assert tok.decode(ids) == " ".join(words)
        if words:
            lo = len(words)
            hi = sum(len(w) + 1 for w in words)
            assert lo <= len(ids) <= hi
        else:
            assert ids == []


@given(
    corpus=st.lists(
        st.lists(_word, min_size=1, max_size=10).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=100, deadline=None)
def test_bpe_merge_monotone_property(corpus):
    """More merges never increase a training document's token count."""
    from tape_spark.utils.bpe import train_bpe

    t_small = train_bpe(corpus, num_merges=5)
    t_big = train_bpe(corpus, num_merges=50)
    for doc in corpus:
        assert len(t_big.encode(doc)) <= len(t_small.encode(doc))


# --------------------------------------------------------------------- #
# Bigram LM: probabilities are a proper score (pure python)              #
# --------------------------------------------------------------------- #


@given(
    corpus=st.lists(
        st.lists(_word, min_size=2, max_size=12).map(" ".join),
        min_size=2,
        max_size=8,
    ),
    doc=st.lists(_word, min_size=1, max_size=10),
)
@settings(max_examples=150, deadline=None)
def test_bigram_lm_logprob_finite_negative_property(corpus, doc):
    """Any document scores a finite, non-positive log-prob against any
    trained model (the <unk>+1 floor guarantees no -inf), and perplexity
    is >= 1 within float tolerance."""
    from tape_spark.operators.langmodel import train_bigram_lm as _t  # noqa: F401
    from tape_spark.operators.langmodel import BigramLM

    # train directly from python (avoid a Spark job per example)
    from collections import Counter

    raw = Counter(t for d in corpus for t in d.split())
    vocab = {t for t, c in raw.items() if c >= 2}
    uni, big, total = {}, {}, 0
    for d in corpus:
        mapped = [t if t in vocab else "<unk>" for t in d.split()]
        total += len(mapped)
        for t in mapped:
            uni[t] = uni.get(t, 0) + 1
        for v, w in zip(mapped, mapped[1:]):
            big[(v, w)] = big.get((v, w), 0) + 1
    uni["<unk>"] = uni.get("<unk>", 0) + 1
    lm = BigramLM(uni, big, total + 1, min_count=2)
    lp = lm.logprob(doc)
    assert lp is not None and np.isfinite(lp) and lp <= 1e-12
    assert lm.perplexity(doc) >= 1.0 - 1e-9


# --------------------------------------------------------------------- #
# interval overlap join vs pandas brute force (Spark examples, small)    #
# --------------------------------------------------------------------- #


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    width=st.sampled_from([30.0, 150.0, 2000.0]),
)
@settings(max_examples=8, deadline=None)
def test_interval_overlap_join_property(spark, seed, width):
    from tape_spark.operators import interval_overlap_join

    rng = np.random.default_rng(seed)
    n_l, n_r = 30, 20
    ls = np.round(rng.uniform(0, 1000, n_l), 2)
    left = pd.DataFrame(
        {"key": rng.integers(0, 3, n_l), "ls": ls,
         "le": np.round(ls + rng.uniform(0, 300, n_l), 2), "lv": range(n_l)}
    )
    rs = np.round(rng.uniform(0, 1000, n_r), 2)
    right = pd.DataFrame(
        {"key": rng.integers(0, 3, n_r), "rs": rs,
         "re": np.round(rs + rng.uniform(0, 200, n_r), 2),
         "lab": [f"i{i}" for i in range(n_r)]}
    )
    got = (
        interval_overlap_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            "ls", "le", "rs", "re", by="key", bucket_width=width,
        )
        .toPandas()
        .sort_values(["key", "lv", "lab"])
        .reset_index(drop=True)
    )
    m = left.merge(right, on="key")
    ov = np.minimum(m["le"], m["re"]) - np.maximum(m["ls"], m["rs"])
    exp = m[ov >= 0].sort_values(["key", "lv", "lab"]).reset_index(drop=True)
    cols = ["key", "ls", "le", "lv", "rs", "re", "lab"]
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got[cols], exp[cols], check_dtype=False)


# --------------------------------------------------------------------- #
# select_by_budget vs the naive sorted greedy prefix                     #
# --------------------------------------------------------------------- #


@given(
    rows=st.lists(
        st.tuples(
            st.floats(min_value=-50, max_value=50, allow_nan=False),  # score
            st.floats(min_value=0, max_value=20, allow_nan=False),    # weight
        ),
        min_size=1,
        max_size=80,
    ),
    budget=st.integers(min_value=1, max_value=400),
    nb=st.sampled_from([2, 3, 7]),
)
@settings(max_examples=12, deadline=None)
def test_select_by_budget_prefix_property(spark, rows, budget, nb):
    """Histogram-pruned selection == the naive (score desc, id) greedy
    prefix for arbitrary score/weight shapes, bucket counts, and budgets
    (incl. all-equal scores, zero weights, and boundary-straddling
    ties)."""
    from tape_spark.operators import select_by_budget

    data = [(i, s, w) for i, (s, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, score double, w double").repartition(4)
    got = {
        r["doc_id"]
        for r in select_by_budget(df, budget, "score", "w", num_buckets=nb).collect()
    }
    kept, cum = set(), 0.0
    for i, s, w in sorted(data, key=lambda r: (-r[1], r[0])):
        if cum + w <= budget:
            kept.add(i)
            cum += w
        else:
            break
    assert got == kept
