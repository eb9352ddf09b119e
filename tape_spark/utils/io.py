"""Partitioned-parquet compaction shared by the append-able indexes.

Every append-able index in the engine (``bm25_append_index``,
``ivfpq_append_index``, ``minhash_append_store``) grows by plain parquet
appends: N appends leave N files inside EVERY partition directory the
batches touched, and a partition-pruned query then opens N footers per
pruned partition — read amplification that grows silently with ingest
count. Compaction is the standard warehouse answer: rewrite each
partition as one file (plus optional within-partition sort for row-group
locality), atomically swap directories, and queries read exactly the
rows they read before — the operators assert bit-identical results in
tests.

The swap is two local renames (write to ``<dir>__compact_tmp``, move the
old dir aside, move tmp in, delete old). On an object store you would
instead swap a manifest/table pointer (Iceberg/Delta style); the rename
convention here matches the local/HDFS filesystems the rest of the
index layout targets.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional, Sequence

REBUCKET_SENTINEL = "__rebucket_inprogress"


def write_rebucket_sentinel(path: str) -> None:
    """Mark an index/store root as mid-rebucket. Rebucketing changes the
    partition-pruning modulus across two non-atomic table swaps; between
    them a concurrent reader would prune with the old modulus against the
    new layout and silently return INCOMPLETE results. The sentinel makes
    that window (and a crash inside it) fail loudly instead: every
    load/match/query/append/compact path raises while it exists."""
    with open(os.path.join(path, REBUCKET_SENTINEL), "w") as f:
        f.write("rebucket in progress; see tape_spark.utils.io\n")


def clear_rebucket_sentinel(path: str) -> None:
    try:
        os.remove(os.path.join(path, REBUCKET_SENTINEL))
    except FileNotFoundError:
        pass


def check_rebucket_sentinel(path: str) -> None:
    """Raise if ``path`` carries a rebucket-in-progress sentinel — the
    layout may not match the recorded modulus, so pruned reads could
    silently miss rows. Repair: re-run the rebucket verb with the same
    arguments (it recomputes both tables from the durable source rows),
    which clears the sentinel on success."""
    p = os.path.join(path, REBUCKET_SENTINEL)
    if os.path.exists(p):
        raise RuntimeError(
            f"{path!r} has an in-progress or crashed rebucket ({p} present): "
            "pruned reads against a half-swapped layout silently miss rows. "
            "Re-run the rebucket verb with the same arguments to repair."
        )


def filter_in_chunked(df, col: str, values, max_pushed_literals: int = 200):
    """``df WHERE col IN values`` with a BOUNDED pushed-literal count.

    Spark pushes an In filter to parquet as a recursive Or tree; past
    ~1–2 k literals evaluating it overflows the filter evaluator's stack
    (measured: ``BENCH_sf100_r13.json`` phase ``rowgroup_skip`` — a
    100-doc trigger's 1 600-literal bucket IN-set crashes with
    ``StackOverflowError`` when ``spark.sql.parquet.pushdown
    .inFilterThreshold`` is raised above the set size; the r14 bisect
    found the limit CONTEXT-DEPENDENT — the same 1 000-literal slice
    passes or overflows depending on page boundaries and surrounding
    stack depth, failing as low as ~900 — hence the 200 default, a 4x
    margin under the worst observed failure). Slicing the set into
    ≤``max_pushed_literals`` runs and UNIONING one scan per slice
    keeps every pushed tree below the limit while preserving the
    row-group skipping the push exists for (each scan prunes with its
    own slice; a slice's misses are skipped at the page level exactly as
    before). The slices are disjoint, so the union is exact with no
    dedup step.

    Below the bound this is a plain ``isin`` — zero plan change for the
    common case."""
    from pyspark.sql import functions as F

    vals = sorted(set(values))
    if len(vals) <= max_pushed_literals:
        return df.filter(F.col(col).isin(vals))
    parts = [
        df.filter(F.col(col).isin(vals[i : i + max_pushed_literals]))
        for i in range(0, len(vals), max_pushed_literals)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write_partitioned_single_file(
    df,
    part_col: str,
    sort_cols: Optional[Sequence[str]],
    path: str,
    mode: str,
) -> None:
    """The append-able indexes' shared write convention: one file per
    touched partition value per write. Without the repartition on the
    partition column, EVERY upstream task writes into EVERY partition
    dir it holds rows for (tasks × partitions files from a single save —
    a 64-task store save measured ~3.5k files), and a pruned read then
    opens all of them. The narrow extra shuffle at write time buys the
    read amplification back forever; the optional within-partition sort
    keeps the probe keys row-group-contiguous so a pruned read skips row
    groups, not just files. Used by the BM25 postings, the IVFPQ encoded
    table, and the near-dup store (save AND append paths), and mirrored
    by :func:`compact_partitioned_parquet`."""
    from pyspark.sql import functions as F

    w = df.repartition(F.col(part_col))
    if sort_cols:
        w = w.sortWithinPartitions(*sort_cols)
    w.write.partitionBy(part_col).mode(mode).parquet(path)


def read_parquet_snapshot(spark, dirpath: str):
    """Read a (possibly partitioned) parquet dir as an EXPLICIT FILE
    LIST — a frozen snapshot safe to ``persist`` across out-of-band
    appends to the dir.

    Why not ``spark.read.parquet(dirpath)``: Spark's cache manager
    substitutes cached plans into later queries by canonicalized plan
    equality, and file relations canonicalize by their ROOT PATHS — so
    persisting a dir-rooted read makes EVERY later read of that dir in
    the session (ours or a user's) silently return the stale cached
    snapshot after new files are appended (measured r15: a post-append
    ``read.parquet`` returned the pre-append row count until unpersist).
    Rooting the relation at the individual files (``basePath`` keeps the
    partition columns) gives it root paths no fresh dir read can match,
    so the cache stays private to the frames derived from it."""
    files = []
    for root, _, names in os.walk(dirpath):
        for f in names:
            if f.endswith(".parquet"):
                files.append(os.path.join(root, f))
    if not files:
        raise FileNotFoundError(f"no parquet files under {dirpath!r}")
    return spark.read.option("basePath", dirpath).parquet(*sorted(files))


def recover_compact_swap(dirpath: str) -> None:
    """Repair an interrupted :func:`compact_partitioned_parquet` swap.

    The swap sequence is: write ``<dir>__compact_tmp`` fully, rename the
    live dir to ``<dir>__compact_old``, rename tmp into place, delete
    old. A crash between the two renames leaves the live path MISSING
    (data intact in old+tmp); a crash before any rename leaves a stale
    tmp; a crash before the final delete leaves a stale old. All three
    states are decidable from which directories exist, so roll forward
    or clean up instead of failing opaquely at the next read:

    - live missing, tmp present  → roll forward (tmp was complete before
      any rename started): tmp becomes live, old is deleted.
    - live present, old present  → the swap finished; delete stale old.
    - live present, tmp present  → the swap never started renaming;
      delete stale tmp (the next compaction rewrites it).
    """
    tmp = dirpath.rstrip("/") + "__compact_tmp"
    old = dirpath.rstrip("/") + "__compact_old"
    if not os.path.exists(dirpath):
        if os.path.exists(tmp):
            os.rename(tmp, dirpath)
        elif os.path.exists(old):
            # tmp already moved in and then crashed before deleting old —
            # impossible to reach with dirpath missing unless tmp became
            # dirpath; restore from old as the last resort
            os.rename(old, dirpath)
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)


def compact_partitioned_parquet(
    spark,
    dirpath: str,
    part_col: str,
    sort_cols: Optional[Sequence[str]] = None,
    target_file_mb: int = 16,
    salt_cols: Optional[Sequence[str]] = None,
) -> int:
    """Rewrite ``dirpath`` (a ``partitionBy(part_col)`` parquet dir) with
    a BOUNDED number of files per partition value. Returns the number of
    data files BEFORE compaction (so callers can log the amplification
    removed). Crash-safe: a prior interrupted swap is repaired on entry
    (:func:`recover_compact_swap`), and the tmp dir is fully written
    before the first rename, so every intermediate state is recoverable.

    Why not ONE file per partition: a parquet file smaller than
    ``spark.sql.files.maxPartitionBytes`` (128 MB default) reads as ONE
    task, so fully-fused partitions cap a pruned query's parallelism at
    the number of partitions it touches — measured at sf100, fusing the
    BM25 postings to one ~30-70 MB file per bucket made the 4-query mix
    2.6× SLOWER warm (8 tasks on a 32-thread executor) even though it cut
    1024 files to 64. Compaction's actual job is to bound the per-append
    FILE-COUNT growth, not to minimize files, so each partition is
    rewritten as ~``ceil(partition_bytes / target_file_mb)`` files
    (default 16 MB — the parquet row-group convention; small enough that
    a pruned warm read of a few partitions still fans out across an
    executor's threads, large enough that footer cost stays negligible).
    The
    split salt defaults to the FULL ROW identity so hot probe keys
    spread across the k files (see the salt comment below for the
    measured reason); each file stays sorted by ``sort_cols`` so
    selective reads still skip row groups."""
    recover_compact_swap(dirpath)
    n_before = 0
    for root, _, files in os.walk(dirpath):
        for f in files:
            if f.endswith(".parquet"):
                n_before += 1
    # k is computed PER PARTITION from that directory's bytes: a global
    # k off the mean under-splits hot partitions under skewed layouts
    # (Zipf term buckets — the BM25 postings case — run many times the
    # mean), partially defeating the read-parallelism goal the 16 MB
    # target exists for.
    part_k: dict = {}
    for d in os.listdir(dirpath):
        pdir = os.path.join(dirpath, d)
        if not (os.path.isdir(pdir) and d.startswith(f"{part_col}=")):
            continue
        pbytes = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(pdir)
            for f in files
            if f.endswith(".parquet")
        )
        part_k[d.split("=", 1)[1]] = max(
            1, int(pbytes // (target_file_mb * 1024 * 1024)) + 1
        )
    from pyspark.sql import functions as F

    df = spark.read.parquet(dirpath)
    tmp = dirpath.rstrip("/") + "__compact_tmp"
    # Salt choice decides how a HOT probe key's rows spread across the k
    # files. Default: FULL ROW identity — a hot key (a head Zipf term, a
    # celebrity band bucket) spreads evenly across the k files, so the
    # per-row work its matches feed (decode, explode, partial aggregate)
    # parallelizes across k tasks instead of serializing in one. This
    # was measured, not guessed: salting by the probe key alone
    # concentrated each query term's postings into ONE task and made the
    # composed BM25 mix ~2x SLOWER warm after compaction even though the
    # scan itself read fewer bytes (docs/SCALING.md round 13, the r12
    # open observation). Within-file sort by sort_cols is unchanged, so
    # row-group min/max skipping on the probe keys still prunes — a
    # selective probe now touches up to k files per partition instead of
    # one, the right trade at k ≈ partition_bytes/16 MB. Pass explicit
    # salt_cols to restore key-locality where a workload wants it.
    salt_cols = (
        list(salt_cols)
        if salt_cols
        else [c for c in df.columns]
    )
    if part_k:
        vals = sorted(part_k)
        k_expr = F.coalesce(
            F.try_element_at(
                F.map_from_arrays(
                    F.array(*[F.lit(v) for v in vals]),
                    F.array(*[F.lit(part_k[v]) for v in vals]),
                ),
                F.col(part_col).cast("string"),
            ),
            F.lit(1),
        )
    else:
        k_expr = F.lit(1)
    # the seed literal matters: every index here derives part_col FROM
    # xxhash64(sort_cols) mod B, so an unseeded xxhash64(sort_cols) mod k
    # is CONSTANT within a partition when k divides B (same hash, smaller
    # modulus) and the salt silently degenerates to one file — measured
    # exactly that on the bm25 postings (tbucket = xxhash64(term) % 64).
    # numPartitions gets explicit headroom (4x the total slot count):
    # repartition hashes the (part, salt) tuples into the shuffle's task
    # count, and at the session default the distinct slots collide —
    # merging salt groups back into fewer, oversized files (the exact
    # under-split this per-partition k exists to avoid). Collisions can
    # still merge a slot pair (bounded at ~2x target size); file counts
    # are bounded above by k per partition either way.
    total_slots = max(1, sum(part_k.values()))
    w = df.repartition(
        total_slots * 4,
        F.col(part_col),
        F.pmod(F.xxhash64(F.lit("__compact_salt"), *salt_cols), k_expr),
    )
    if sort_cols:
        w = w.sortWithinPartitions(*sort_cols)
    w.write.partitionBy(part_col).mode("overwrite").parquet(tmp)
    old = dirpath.rstrip("/") + "__compact_old"
    os.rename(dirpath, old)
    os.rename(tmp, dirpath)
    shutil.rmtree(old)
    return n_before


_BATCH_ID_RE = None  # compiled lazily; import re at top kept minimal


def _validate_batch_id(batch_id: str) -> None:
    import re

    global _BATCH_ID_RE
    if _BATCH_ID_RE is None:
        _BATCH_ID_RE = re.compile(r"[A-Za-z0-9._-]{1,100}")
    if not isinstance(batch_id, str) or not _BATCH_ID_RE.fullmatch(batch_id):
        raise ValueError(
            f"batch_id {batch_id!r} must be 1-100 chars of [A-Za-z0-9._-] "
            "(it becomes part of data file names)"
        )


def _batch_suffix(batch_id: str) -> str:
    return f".batch-{batch_id}.parquet"


def remove_batch_files(dirpath: str, batch_id: str) -> int:
    """Delete every data file a prior (possibly partial) attempt of
    ``batch_id`` moved into ``dirpath``. Returns the number removed —
    the idempotence half of :func:`append_partitioned_batch`."""
    _validate_batch_id(batch_id)
    suffix = _batch_suffix(batch_id)
    removed = 0
    if not os.path.exists(dirpath):
        return 0
    for root, _, files in os.walk(dirpath):
        for f in files:
            if f.endswith(suffix):
                os.remove(os.path.join(root, f))
                removed += 1
    return removed


def list_batch_file_ids(dirpath: str) -> set:
    """Batch ids tagged on data files under ``dirpath`` (appends made
    via :func:`append_partitioned_batch`). Compaction uses this to
    refuse while an unmarked (half-applied) batch's files are present —
    rewriting would erase the tags the batch's retry needs."""
    import re

    ids = set()
    if not os.path.exists(dirpath):
        return ids
    pat = re.compile(r"\.batch-([A-Za-z0-9._-]+)\.parquet$")
    for root, _, files in os.walk(dirpath):
        for f in files:
            m = pat.search(f)
            if m:
                ids.add(m.group(1))
    return ids


def append_partitioned_batch(
    df,
    part_col: str,
    sort_cols: Optional[Sequence[str]],
    path: str,
    batch_id: str,
) -> int:
    """IDEMPOTENT append to a ``partitionBy(part_col)`` parquet dir: a
    retried append REPLACES its earlier (partial or complete) files
    instead of duplicating rows. Returns the number of files landed.

    Mechanism: the batch is fully written to a sibling staging dir with
    the shared one-file-per-touched-partition convention
    (:func:`write_partitioned_single_file`), any files a previous
    attempt of the SAME ``batch_id`` already moved in are removed, and
    the staged files are renamed into the live partition dirs with a
    ``.batch-<id>.parquet`` name tag. Readers never see the staging dir;
    a crash mid-move leaves some tagged files visible (the same
    non-transactional exposure as a plain append) but the retry removes
    exactly those files first, so re-running with the same batch_id
    converges to exactly-once. Callers keep their own applied-batch
    marker (written AFTER this returns) to decide whether to retry at
    all; compaction must refuse while an unmarked batch's tagged files
    exist (:func:`list_batch_file_ids`).
    """
    _validate_batch_id(batch_id)
    tmp = f"{path.rstrip('/')}__batch_{batch_id}_tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    write_partitioned_single_file(df, part_col, sort_cols, tmp, "overwrite")
    remove_batch_files(path, batch_id)
    os.makedirs(path, exist_ok=True)
    moved = 0
    for d in os.listdir(tmp):
        src_dir = os.path.join(tmp, d)
        if not (os.path.isdir(src_dir) and d.startswith(f"{part_col}=")):
            continue
        dst_dir = os.path.join(path, d)
        os.makedirs(dst_dir, exist_ok=True)
        for f in os.listdir(src_dir):
            if not f.endswith(".parquet"):
                continue
            os.rename(
                os.path.join(src_dir, f),
                os.path.join(dst_dir, f[: -len(".parquet")] + _batch_suffix(batch_id)),
            )
            moved += 1
    shutil.rmtree(tmp)
    return moved


def atomic_replace_parquet(df, dirpath: str) -> None:
    """Overwrite a small parquet dir without the delete-then-write hole of
    ``mode('overwrite')`` (which removes the live dir before the new write
    commits — a crash in between destroys the table). Writes to
    ``<dir>__compact_tmp`` and swaps with the same rename convention
    :func:`recover_compact_swap` repairs."""
    recover_compact_swap(dirpath)
    tmp = dirpath.rstrip("/") + "__compact_tmp"
    df.write.mode("overwrite").parquet(tmp)
    old = dirpath.rstrip("/") + "__compact_old"
    os.rename(dirpath, old)
    os.rename(tmp, dirpath)
    shutil.rmtree(old)
