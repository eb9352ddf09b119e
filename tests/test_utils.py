"""ColumnMapper, query-expression shim, and TimeSeries tests
(reference model: ``test_utils.py``, ``test_timeseries.py``)."""

import numpy as np
import pytest

from tape_spark import ColumnMapper, TimeSeries
from tape_spark.utils.column_mapper import PS1ColumnMapper, ZTFColumnMapper
from tape_spark.utils.expr import translate_query_expr


def test_column_mapper_readiness():
    cm = ColumnMapper()
    ready, needed = cm.is_ready(show_needed=True)
    assert not ready
    assert len(needed) == 5
    cm.assign(id_col="id", time_col="t", flux_col="f", err_col="e", band_col="b")
    assert cm.is_ready()


def test_column_mapper_known_maps():
    ztf = ZTFColumnMapper()
    assert ztf.is_ready()
    assert ztf.map["time_col"] == "mjd"
    ps1 = PS1ColumnMapper()
    assert ps1.is_ready()
    assert ps1.map["id_col"] == "objID"  # reference column_mapper.py:185


def test_translate_query_expr_boolean_ops():
    assert translate_query_expr("a & b") == "a  AND  b"
    assert translate_query_expr("a | ~b") == "a  OR   NOT b"


def test_translate_query_expr_preserves_literals():
    out = translate_query_expr("band == 'g&r' & flux > 1")
    assert "'g&r'" in out
    assert out.endswith("flux > 1")
    assert " AND " in out


def test_translate_query_expr_rejects_at():
    with pytest.raises(ValueError):
        translate_query_expr("flux > @x")


def test_timeseries_from_dict_and_golden_sf2():
    """The reference's TimeSeries sf2 test (test_analysis.py:115-136)."""
    ts = TimeSeries()
    ts.meta["id"] = 1
    ts.from_dict(
        {
            "time": [1.11, 2.23, 3.45, 4.01, 5.67, 6.32, 7.88, 8.2],
            "flux": [0.11, 0.23, 0.45, 0.01, 0.67, 0.32, 0.88, 0.2],
            "flux_err": [0.1, 0.023, 0.045, 0.1, 0.067, 0.032, 0.8, 0.02],
            "band": ["r"] * 8,
        }
    )
    res = ts.sf2()
    assert res["sf2"][0] == pytest.approx(0.005365, rel=0.001)


def test_timeseries_band_index():
    ts = TimeSeries().from_dict(
        {
            "time": [1.0, 2.0, 3.0, 4.0],
            "flux": [1.0, 2.0, 3.0, 4.0],
            "flux_err": [0.1, 0.1, 0.1, 0.1],
            "band": ["g", "r", "g", "r"],
        }
    )
    assert list(ts.band) == ["g", "g", "r", "r"]  # sorted by band index
    assert ts.data.index.names == ["band", "index"]


def test_timeseries_stetson_j():
    n = 100
    rng = np.random.default_rng(2)
    ts = TimeSeries().from_dict(
        {
            "time": np.arange(n, dtype=float),
            "flux": rng.normal(10, 0.1, n),
            "flux_err": np.full(n, 0.1),
            "band": ["g"] * n,
        }
    )
    out = ts.stetson_J()
    assert "g" in out and np.isfinite(out["g"])


def test_timeseries_missing_band_label_raises():
    with pytest.raises(KeyError):
        TimeSeries().from_dict({"time": [1.0], "flux": [1.0], "flux_err": [0.1]})


def test_timeseries_dropna():
    ts = TimeSeries().from_dict(
        {
            "time": [1.0, 2.0],
            "flux": [1.0, np.nan],
            "flux_err": [0.1, 0.1],
            "band": ["g", "g"],
        }
    )
    ts.dropna()
    assert len(ts.data) == 1


# ------------------------------------------------------------------ #
# BPE tokenizer (utils/bpe.py)                                       #
# ------------------------------------------------------------------ #


def test_bpe_known_corpus_merges():
    """The textbook example: with 'low' dominant, the first merges build
    it up deterministically (ties break lexicographically)."""
    from tape_spark.utils.bpe import train_bpe

    corpus = ["low low low low low lower lower newest newest"]
    tok = train_bpe(corpus, num_merges=4)
    assert tok.merges[0] == ("l", "o")
    assert tok.merges[1] == ("lo", "w")
    # 'low' as a standalone word becomes exactly one symbol + eow merge
    ids = tok.encode("low")
    assert len(ids) <= 2


def test_bpe_training_deterministic():
    from tape_spark.utils.bpe import train_bpe

    corpus = ["the quick brown fox jumps over the lazy dog " * 3,
              "pack my box with five dozen liquor jugs"]
    a = train_bpe(corpus, num_merges=50)
    b = train_bpe(list(corpus), num_merges=50)
    assert a.merges == b.merges
    assert a.encode("the quick fox") == b.encode("the quick fox")


def test_bpe_roundtrip_and_unknowns():
    from tape_spark.utils.bpe import train_bpe

    tok = train_bpe(["alpha beta gamma alpha beta"], num_merges=20)
    s = "alpha beta gamma"
    assert tok.decode(tok.encode(s)) == s
    # unknown characters map to <unk> id 0 and decode as the literal marker
    ids = tok.encode("alpha Zeta")
    assert 0 in ids
    assert tok.decode(tok.encode("alpha")) == "alpha"


def test_bpe_subword_counts_sane():
    from tape_spark.utils.bpe import train_bpe

    corpus = ["hello world hello spark hello engine " * 5]
    tok = train_bpe(corpus, num_merges=100)
    s = "hello world"
    n = len(tok.encode(s))
    # at least one token per word, at most chars + one eow per word
    assert 2 <= n <= len(s) + 2
    # heavily repeated words compress to near one symbol each
    assert len(tok.encode("hello hello hello")) <= 6


def test_bpe_pickle_roundtrip():
    import pickle

    from tape_spark.utils.bpe import train_bpe

    tok = train_bpe(["some corpus with words some corpus"], num_merges=30)
    tok2 = pickle.loads(pickle.dumps(tok))
    s = "some words"
    assert tok2.encode(s) == tok.encode(s)
    assert tok2.vocab_size == tok.vocab_size


def test_bpe_train_from_corpus_bounded(spark):
    """Content-addressed sampling is deterministic and the collect is
    bounded by max_docs/max_chars."""
    from tape_spark.utils.bpe import train_bpe_from_corpus

    docs = spark.createDataFrame(
        [(i, f"document number {i} has words shared across the corpus")
         for i in range(200)],
        "doc_id long, text string",
    )
    a = train_bpe_from_corpus(docs, num_merges=40, sample_fraction=0.3, max_docs=20)
    b = train_bpe_from_corpus(docs, num_merges=40, sample_fraction=0.3, max_docs=20)
    assert a.merges == b.merges and len(a.merges) > 0
    assert a.encode("document words") == b.encode("document words")


# ------------------------------------------------------------------ caching
class TestCachingLifecycle:
    def test_materialized_small_result_releases_narrow(self, spark):
        from pyspark.storagelevel import StorageLevel

        from tape_spark.utils.caching import materialized_small_result

        narrow = spark.range(100).withColumnRenamed("id", "x")
        seen = {}

        def build(pinned):
            seen["level"] = pinned.storageLevel
            seen["pinned"] = pinned
            return pinned.groupBy().sum("x")

        out = materialized_small_result(narrow, build)
        # the narrow frame was pinned during probes and released after
        assert seen["level"] == StorageLevel.MEMORY_AND_DISK
        assert not seen["pinned"].storageLevel.useMemory
        # the result is persisted, already computed, and correct
        assert out.storageLevel.useMemory
        assert out.collect()[0][0] == 4950

    def test_release_runs_even_when_build_raises(self, spark):
        from tape_spark.utils.caching import materialized_small_result

        narrow = spark.range(10)
        seen = {}

        def build(pinned):
            seen["pinned"] = pinned
            pinned.count()
            raise RuntimeError("probe blew up")

        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="probe blew up"):
            materialized_small_result(narrow, build)
        assert not seen["pinned"].storageLevel.useMemory

    def test_none_result_passthrough_still_releases(self, spark):
        from tape_spark.utils.caching import materialized_small_result

        narrow = spark.range(10)
        seen = {}

        def build(pinned):
            seen["pinned"] = pinned
            return None

        assert materialized_small_result(narrow, build) is None
        assert not seen["pinned"].storageLevel.useMemory

    def test_materialize_and_release_tail_half(self, spark):
        from tape_spark.utils.caching import materialize_and_release

        cache = spark.range(50).persist()
        cache.count()
        assert cache.storageLevel.useMemory
        result = materialize_and_release(cache.groupBy().count(), cache)
        assert result.storageLevel.useMemory
        assert not cache.storageLevel.useMemory
        assert result.collect()[0][0] == 50


class TestPartitionedBatchAppend:
    def test_append_replaces_on_retry_and_cleans_partials(self, spark, tmp_path):
        """Same-batch retries converge to exactly-once: a full re-run and
        a partial-files re-run both end with exactly one copy of the
        batch's rows, tagged for later cleanup."""
        import os

        from tape_spark.utils.io import (
            append_partitioned_batch,
            list_batch_file_ids,
            remove_batch_files,
        )

        base = spark.range(0, 100).selectExpr("id % 4 as p", "id as v")
        path = str(tmp_path / "t")
        base.write.partitionBy("p").parquet(path)
        batch = spark.range(100, 140).selectExpr("id % 4 as p", "id as v")
        n = append_partitioned_batch(batch, "p", ["v"], path, "g1")
        assert n == 4  # one file per touched partition
        assert spark.read.parquet(path).count() == 140
        assert list_batch_file_ids(path) == {"g1"}
        # full retry: replaced, not duplicated
        append_partitioned_batch(batch, "p", ["v"], path, "g1")
        assert spark.read.parquet(path).count() == 140
        # partial-crash simulation: delete one of g1's files (as if the
        # mover died mid-way), retry heals to the full batch exactly once
        victims = [
            os.path.join(root, f)
            for root, _, files in os.walk(path)
            for f in files
            if f.endswith(".batch-g1.parquet")
        ]
        os.remove(victims[0])
        append_partitioned_batch(batch, "p", ["v"], path, "g1")
        assert spark.read.parquet(path).count() == 140
        # cleanup removes exactly the batch's files
        assert remove_batch_files(path, "g1") == 4
        assert spark.read.parquet(path).count() == 100

    def test_batch_id_validated(self, spark, tmp_path):
        import pytest

        from tape_spark.utils.io import append_partitioned_batch

        df = spark.range(2).selectExpr("id as p", "id as v")
        with pytest.raises(ValueError, match="batch_id"):
            append_partitioned_batch(df, "p", None, str(tmp_path / "x"), "a/b")


def test_compact_partitioned_parquet_per_partition_k(spark, tmp_path):
    """k is sized per partition, not off the global mean: a hot partition
    many times the average still splits to ~target-sized files while tiny
    partitions fuse to one."""
    import os

    from pyspark.sql import functions as F

    from tape_spark.utils.io import compact_partitioned_parquet

    # hot partition 0: ~120k rows of incompressible 64-char md5 text;
    # cold partitions 1-3: 200 rows each
    hot = spark.range(120_000).select(
        F.lit(0).alias("p"),
        F.col("id").alias("k"),
        F.concat(F.md5(F.col("id").cast("string")),
                 F.md5((F.col("id") + 1).cast("string"))).alias("v"),
    )
    cold = spark.range(600).select(
        (F.col("id") % 3 + 1).cast("long").alias("p"),
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("v"),
    )
    path = str(tmp_path / "skewed")
    hot.unionByName(cold).repartition(8).write.partitionBy("p").parquet(path)
    before = spark.read.parquet(path).groupBy("p").count().collect()

    def files_in(p):
        d = os.path.join(path, f"p={p}")
        return [f for f in os.listdir(d) if f.endswith(".parquet")]

    hot_bytes_before = sum(
        os.path.getsize(os.path.join(path, "p=0", f)) for f in files_in(0)
    )
    want_hot_k = max(1, hot_bytes_before // (1024 * 1024) + 1)
    compact_partitioned_parquet(spark, path, "p", sort_cols=["k"], target_file_mb=1)
    # hot partition split by ITS byte-derived k (a global-mean k would
    # give ~2 across 4 partitions); slot-hash collisions can merge a
    # couple of salt groups, so the count is bounded, not exact. cold
    # partitions fuse to one file.
    assert want_hot_k >= 4
    assert want_hot_k - 2 <= len(files_in(0)) <= want_hot_k
    for p in (1, 2, 3):
        assert len(files_in(p)) == 1
    after = spark.read.parquet(path).groupBy("p").count().collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
