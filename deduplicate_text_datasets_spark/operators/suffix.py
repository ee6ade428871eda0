"""ExactSubstr operators: self-similar, across-similar, count-occurrences,
find-training-data.

Reference (src/main.rs) builds one global suffix array and scans it in
sorted order so equal length-L windows become *adjacent runs*
(cmd_self_similar main.rs:807-960). The global SA is an artifact of
single-machine design — at 10^12 docs it is petabytes streamed through one
node (main.rs:817-826). The Spark-native equivalent of "group positions
whose length-L windows are identical" is a **groupBy on a 128-bit window
fingerprint**:

  per shard (Arrow kernel, no per-row Python):
      rolling polynomial hash of every length-L window     O(n) vectorized
  global:
      groupBy(h1, h2) with map-side partial aggregation    1 shuffle of
                                                           24 B/position

Equality of fingerprints == equality of windows up to hash collisions;
with two independent 64-bit rolling hashes the collision probability over
P positions is ~P^2/2^128 (< 1e-10 even at P = 10^14). The reference
accepts an analogous approximation class via HACKSIZE (main.rs:1208-1216).

Point queries (count-occurrences, find-training-data) keep a real per-shard
suffix array: a prefix-doubling SA built with numpy argsort inside the
kernel — the distributed "global SA" is the union of shard SAs plus the
overlap ownership rule (SURVEY.md §4.3).
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import ROLLHASH_X1, ROLLHASH_X2, ExactSubstrConfig
from ..sources.corpus import (
    assemble_shard_buffer,
    assign_shards,
    corpus_total_bytes,
    with_offsets,
)

_U64 = np.uint64
_MASK64 = (1 << 64) - 1
_MIX = np.uint64(0xFF51AFD7ED558CCD)


def _mix64(h: np.ndarray) -> np.ndarray:
    """Bijective finalizer (splitmix64-style): preserves equality classes,
    spreads low bits so the shuffle hash-partitions evenly."""
    h = h ^ (h >> np.uint64(33))
    h = h * _MIX
    h = h ^ (h >> np.uint64(29))
    return h


# Per-worker cache of x^k / x^-k power tables (wraps mod 2^64). The
# fingerprint kernel is memory-bandwidth-bound at high core counts
# (measured: the limiting resource of the 8->32 scaling leg), so every
# avoided array pass is throughput: powers depend only on (x, n) and a
# worker processes many shards of the same size — compute once, slice.
_POW_CACHE: dict[tuple[int, bool], np.ndarray] = {}


def _powers(x: int, n: int, inverse: bool) -> np.ndarray:
    key = (x, inverse)
    cur = _POW_CACHE.get(key)
    if cur is None or len(cur) < n:
        size = max(n, 2 * len(cur) if cur is not None else n)
        base = pow(x, -1, 1 << 64) if inverse else x
        arr = np.full(size, _U64(base), dtype=_U64)
        arr[0] = 1
        np.cumprod(arr, out=arr)
        _POW_CACHE[key] = arr
        cur = arr
    return cur[:n]


#: cache block for window_hashes: per-iteration working set is ~3 arrays
#: of block u64 (0.75 MB at 32K) — sized to sit in per-core L2 so the
#: post-cumsum passes re-read cache, not DRAM. Paired A/B on this host
#: (each worker interleaving both variants, drift-immune): 1.30x at 8
#: workers, 1.32-1.34x at 32 — largest exactly in the wide memory-bound
#: regime the 8->32 scaling leg measures.
_FP_BLOCK = int(os.environ.get("SPARK_GRAFT_FP_BLOCK", str(1 << 15)))

_M64 = (1 << 64) - 1


def window_hashes(
    buf: np.ndarray, length: int, x: int, block: int | None = None
) -> np.ndarray:
    """Polynomial rolling hash mod 2^64 of every length-L window, O(n).

    h[i] = sum_{j=0..L-1} buf[i+j] * x^(L-1-j)  (mod 2^64)

    Computed via the prefix-sum identity with x invertible (x odd):
      c[k]   = buf[k] * x^(-k)
      h[i]   = (sum_{k=i}^{i+L-1} c[k]) * x^(i+L-1)
    numpy uint64 arithmetic wraps mod 2^64 exactly (C semantics).

    Cache-blocked: power tables are one BLOCK long — position k's factor
    x^(-k) = x^(-s) * x^(-(k-s)) splits into a per-block python-int scalar
    (exact mod 2^64) times the small cached table, so the big n-length
    power tables never stream from DRAM, and every pass after the (carry-
    chained) cumsum runs block-wise over L2-resident scratch. The result
    is bit-identical to the unblocked formulation for any block size
    (multiplication mod 2^64 is associative; tested at block=37/n/default
    in test_suffix).
    """
    n = len(buf)
    m = n - length + 1
    if m <= 0:
        return np.empty(0, dtype=_U64)
    B = block or _FP_BLOCK
    xpow_b = _powers(x, min(B, n), inverse=False)
    xipow_b = _powers(x, min(B, n), inverse=True)
    xinv = pow(x, -1, 1 << 64)
    xinv_step = pow(xinv, B, 1 << 64)
    x_step = pow(x, B, 1 << 64)
    p = np.empty(n + 1, dtype=_U64)
    p[0] = 0
    scale = 1  # x^(-s) as a python int (exact, warning-free)
    carry = _U64(0)
    for s in range(0, n, B):
        e = min(s + B, n)
        seg = p[s + 1 : e + 1]
        np.multiply(buf[s:e], xipow_b[: e - s], out=seg, casting="unsafe")
        if scale != 1:
            np.multiply(seg, _U64(scale), out=seg)
        np.cumsum(seg, out=seg)
        seg += carry
        carry = seg[-1]
        scale = (scale * xinv_step) & _M64
    out = np.empty(m, dtype=_U64)
    t = np.empty(min(B, m), dtype=_U64)
    scale = pow(x, length - 1, 1 << 64)  # x^(s+L-1)
    for s in range(0, m, B):
        e = min(s + B, m)
        o = out[s:e]
        tt = t[: e - s]
        np.subtract(p[s + length : e + length], p[s:e], out=o)
        np.multiply(o, xpow_b[: e - s], out=o)
        np.multiply(o, _U64(scale), out=o)
        scale = (scale * x_step) & _M64
        # _mix64 in place (same bijective finalizer)
        np.right_shift(o, np.uint64(33), out=tt)
        np.bitwise_xor(o, tt, out=o)
        np.multiply(o, _MIX, out=o)
        np.right_shift(o, np.uint64(29), out=tt)
        np.bitwise_xor(o, tt, out=o)
    return out


def _fingerprint_kernel(
    shard_pdf: pd.DataFrame,
    cfg: ExactSubstrConfig,
    total: int,
    dup_keys_bc=None,
) -> pd.DataFrame:
    """One shard -> (h1, h2, pos) for every *owned* position whose length-L
    window is fully inside the corpus. Owned = [s*S, min((s+1)*S, total));
    the trailing overlap is read, never emitted (ownership rule, the
    analogue of the merge-time overlap skip, main.rs:1262-1278).

    ``dup_keys_bc`` (optional broadcast membership sketch of probable-
    duplicate h1 keys: a SORTED int64 array or a sketch.BloomSketch) is
    the prefilter's pass-2 map-side filter: only positions whose h1 hits
    the sketch are emitted, so the exchange ships probable-dup positions
    instead of every position."""
    L = cfg.length_threshold
    s = int(shard_pdf["shard_id"].iloc[0])
    lo, buf = assemble_shard_buffer(
        shard_pdf, cfg.shard_bytes, cfg.overlap_bytes, total, cfg.with_separators
    )
    own_lo = s * cfg.shard_bytes
    own_hi = min((s + 1) * cfg.shard_bytes, total - L + 1)
    if own_hi <= own_lo:
        return pd.DataFrame({"h1": [], "h2": [], "pos": []}).astype(
            {"h1": "int64", "h2": "int64", "pos": "int64"}
        )
    h1 = window_hashes(buf, L, ROLLHASH_X1)
    a, b = own_lo - lo, own_hi - lo
    h1v = h1[a:b].view(np.int64)
    pos = np.arange(own_lo, own_hi, dtype=np.int64)
    if dup_keys_bc is not None:
        from .sketch import sketch_contains

        mask = sketch_contains(dup_keys_bc.value, h1v)
        h1v, pos = h1v[mask], pos[mask]
        # h2 only for survivors' slice — but window_hashes is whole-buffer
        # vectorized; slicing after is still the cheap path
        h2 = window_hashes(buf, L, ROLLHASH_X2)
        h2v = h2[a:b].view(np.int64)[mask]
    else:
        h2 = window_hashes(buf, L, ROLLHASH_X2)
        h2v = h2[a:b].view(np.int64)
    return pd.DataFrame({"h1": h1v, "h2": h2v, "pos": pos})


FINGERPRINT_SCHEMA = T.StructType(
    [
        T.StructField("h1", T.LongType(), False),
        T.StructField("h2", T.LongType(), False),
        T.StructField("pos", T.LongType(), False),
    ]
)

# Kernel RETURN batching: classic applyInPandas serializes one Arrow batch
# per group, so a production 64 MiB shard's fingerprint frame (~64Mi
# positions x 24 B) forces a ~1.5 GiB direct-memory allocation in the JVM
# receiver — measured OOM at the stress scale (netty cap ~6 GiB, 32
# concurrent tasks). The position-emitting kernels therefore use the
# Spark 4.1 ITERATOR form of applyInPandas and yield bounded slices:
# 2^21 rows x 24 B ≈ 48 MiB per batch, constant in shard width.
_EMIT_ROWS = int(os.environ.get("SPARK_GRAFT_FP_EMIT_ROWS", str(1 << 21)))


def _emit_chunks(out: pd.DataFrame, rows: int | None = None):
    rows = rows or _EMIT_ROWS
    if len(out) <= rows:
        yield out
        return
    for lo in range(0, len(out), rows):
        yield out.iloc[lo : lo + rows]


def window_fingerprints(
    docs: DataFrame,
    cfg: ExactSubstrConfig,
    total: int | None = None,
    dup_keys_bc=None,
    emit_rows: int | None = None,
) -> DataFrame:
    """documents -> (h1, h2, pos) fingerprint frame (one row per corpus
    position — or per probable-dup position when ``dup_keys_bc`` is set).
    ``docs`` may already carry offsets; if not they are added."""
    if "byte_start" not in docs.columns:
        # cache: the offsets frame feeds both the total-bytes action and the
        # fingerprint job (avoids recomputing the cumsum windows);
        # scope-registered so a cache_scope() caller reclaims it
        from ..plans.caching import scoped_persist

        docs = scoped_persist(with_offsets(docs, cfg.with_separators))
    if total is None:
        total = corpus_total_bytes(docs)
    shards = assign_shards(docs, cfg.shard_bytes, cfg.overlap_bytes)

    emit_rows = emit_rows or _EMIT_ROWS

    def fp_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # shards stream IN one complete group at a time (the kernel needs
        # the whole shard buffer) and the position frame streams OUT in
        # bounded slices (see _EMIT_ROWS)
        for g in _iter_shard_groups(batches):
            yield from _emit_chunks(
                _fingerprint_kernel(g, cfg, total, dup_keys_bc), emit_rows
            )

    return _apply_shard_kernel(shards, total, cfg.shard_bytes, fp_kernel,
                               FINGERPRINT_SCHEMA)


def _apply_shard_kernel(
    shards: DataFrame,
    total: int,
    shard_bytes: int,
    kernel,
    schema: T.StructType,
) -> DataFrame:
    """Run a per-shard iterator kernel under the configured layout.

    Default (`range`): `_shards_one_per_task` — explicit range layout so
    few-shard corpora (production 64 MiB widths) get one shard per task
    instead of hash-colliding onto one reducer. Its cost is the range
    partitioner's sampling job, one extra pass over the (cheap, cached)
    shard projection. `SPARK_GRAFT_SHARD_LAYOUT=groupby` keeps the legacy
    hash-groupBy layout for A/B runs; the SAME kernel serves both because
    `_iter_shard_groups` degenerates to one group under groupBy.
    """
    proj = shards.select("shard_id", "doc_id", "byte_start", "text")
    if os.environ.get("SPARK_GRAFT_SHARD_LAYOUT", "range") == "groupby":
        return proj.groupBy("shard_id").applyInPandas(kernel, schema)
    return _shards_one_per_task(proj, total, shard_bytes).mapInPandas(
        kernel, schema
    )


def _shards_one_per_task(
    shards: DataFrame, total: int, shard_bytes: int
) -> DataFrame:
    """Lay the exploded shard frame out ~one shard per task.

    groupBy("shard_id").applyInPandas hash-partitions the shard keys, and
    with FEW shards — a mid-size corpus at the production 64 MiB width,
    e.g. the stress runs — distinct ids collide into one reducer
    (measured at the 30k-doc profile: ONE task computed both 64 MiB
    kernels serially and wrote the whole 2.36 GB fingerprint exchange).
    Range-partitioning the dense integer shard_id into min(#shards,
    shuffle.partitions) partitions gives ~one shard per task instead; at
    web scale (#shards >> #partitions) both layouts pack many shards per
    task and the exchanged bytes are identical, so this is never worse.
    Rows are sorted by (shard_id, byte_start) within each partition so a
    mapInPandas kernel can stream one complete shard at a time (see
    _iter_shard_groups) holding one shard's rows in memory, exactly like
    the groupBy form did.
    """
    n_shards = max(1, -(-total // shard_bytes))
    try:
        default_parts = int(
            shards.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (TypeError, ValueError):
        default_parts = 200
    n_parts = max(1, min(n_shards, default_parts))
    return shards.repartitionByRange(n_parts, "shard_id").sortWithinPartitions(
        "shard_id", "byte_start"
    )


def _iter_shard_groups(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """One pdf per shard_id from a stream of Arrow batches that is sorted
    by shard_id within the partition. Holds at most one shard's rows —
    the same peak memory as the applyInPandas group form."""
    pend: list[pd.DataFrame] = []
    cur: int | None = None
    for pdf in batches:
        if not len(pdf):
            continue
        sids = pdf["shard_id"].to_numpy()
        cut = np.nonzero(sids[1:] != sids[:-1])[0] + 1
        edges = [0, *cut.tolist(), len(pdf)]
        for i in range(len(edges) - 1):
            seg = pdf.iloc[edges[i] : edges[i + 1]]
            sid = int(sids[edges[i]])
            if cur is None:
                cur = sid
            if sid != cur:
                yield pd.concat(pend, ignore_index=True)
                pend, cur = [], sid
            pend.append(seg)
    if pend:
        yield pd.concat(pend, ignore_index=True)


WINDOW_KEY_SCHEMA = T.StructType([T.StructField("k", T.LongType(), False)])


def _key_kernel(
    shard_pdf: pd.DataFrame, cfg: ExactSubstrConfig, total: int
) -> pd.DataFrame:
    """Prefilter pass 1: one shard -> the h1 window key of every owned
    position (no pos, no h2 — half the hash work, a third of the bytes)."""
    L = cfg.length_threshold
    s = int(shard_pdf["shard_id"].iloc[0])
    lo, buf = assemble_shard_buffer(
        shard_pdf, cfg.shard_bytes, cfg.overlap_bytes, total, cfg.with_separators
    )
    own_lo = s * cfg.shard_bytes
    own_hi = min((s + 1) * cfg.shard_bytes, total - L + 1)
    if own_hi <= own_lo:
        return pd.DataFrame({"k": []}).astype({"k": "int64"})
    h1 = window_hashes(buf, L, ROLLHASH_X1)
    a, b = own_lo - lo, own_hi - lo
    return pd.DataFrame({"k": h1[a:b].view(np.int64)})


def window_keys(
    docs: DataFrame,
    cfg: ExactSubstrConfig,
    total: int | None = None,
    emit_rows: int | None = None,
) -> DataFrame:
    """documents -> (k) single-column window-key frame (prefilter pass 1)."""
    if "byte_start" not in docs.columns:
        from ..plans.caching import scoped_persist

        docs = scoped_persist(with_offsets(docs, cfg.with_separators))
    if total is None:
        total = corpus_total_bytes(docs)
    shards = assign_shards(docs, cfg.shard_bytes, cfg.overlap_bytes)

    emit_rows = emit_rows or _EMIT_ROWS

    def key_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for g in _iter_shard_groups(batches):
            yield from _emit_chunks(_key_kernel(g, cfg, total), emit_rows)

    return _apply_shard_kernel(shards, total, cfg.shard_bytes, key_kernel,
                               WINDOW_KEY_SCHEMA)


def find_duplicates(fingerprints: DataFrame, cfg: ExactSubstrConfig) -> DataFrame:
    """Self-similar (cmd_self_similar, main.rs:807-960): group positions by
    window fingerprint; clusters of size >= 2 (and > frequency_threshold,
    main.rs:914) are duplicates.

    Plan shape: groupBy(h1, h2) with map-side partial aggregation
    (count+min combine before the exchange, so the paper's 60,000x-repeated
    C4 boilerplate window — README.md:10 — contributes one row per mapper,
    not 10^8 rows to one reducer), then the filtered duplicate-key stats
    join back onto the fingerprint frame. The join's hot keys are split by
    AQE skew-join handling; the round-1 count-over-window variant pinned
    every member of a hot window in one unsplittable WindowExec partition.

    ``fingerprints`` is consumed twice (agg + join-back) — callers must
    persist it or the shard fingerprint kernels re-run (see self_similar).

    Returns duplicates(pos, cluster_id, cluster_size), cluster_id = min
    member position (deterministic; reference numbering is order-dependent
    so we fix min-member, SURVEY.md §7).
    """
    stats = (
        fingerprints.groupBy("h1", "h2")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("pos").alias("cluster_id"),
        )
        .filter(
            (F.col("cluster_size") >= 2)
            & (F.col("cluster_size") > cfg.frequency_threshold)
        )
    )
    return fingerprints.join(stats, ["h1", "h2"]).select(
        "pos", "cluster_id", "cluster_size"
    )


DUPLICATES_SCHEMA = T.StructType(
    [
        T.StructField("pos", T.LongType(), False),
        T.StructField("cluster_id", T.LongType(), False),
        T.StructField("cluster_size", T.LongType(), False),
    ]
)


def _dup_group_rows(pdf: pd.DataFrame, min_count: int) -> pd.DataFrame:
    """Vectorized cluster pass over a frame of COMPLETE (h1, h2) groups
    sorted by (h1, h2, pos): change-point detection + repeat, no hashing.
    pos is ascending within each group, so pos[group_start] IS the min
    member = cluster_id."""
    h1 = pdf["h1"].to_numpy()
    h2 = pdf["h2"].to_numpy()
    pos = pdf["pos"].to_numpy()
    change = np.nonzero((h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1]))[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(pos)]))
    sizes = ends - starts
    keep = np.repeat(sizes >= min_count, sizes)
    return pd.DataFrame(
        {
            "pos": pos[keep],
            "cluster_id": np.repeat(pos[starts], sizes)[keep],
            "cluster_size": np.repeat(sizes, sizes)[keep].astype(np.int64),
        }
    )


def find_duplicates_mappass(
    fingerprints: DataFrame, cfg: ExactSubstrConfig
) -> DataFrame:
    """Single-pass variant of find_duplicates: same output contract
    (pos, cluster_id=min member, cluster_size; size >= 2 and >
    frequency_threshold), different physical plan.

    repartition(h1, h2) -> sortWithinPartitions(h1, h2, pos) -> ONE
    vectorized Arrow pass per partition. Every (h1, h2) group is
    contiguous in its sorted partition, so cluster_size is a run length
    and cluster_id is the run head — no hash aggregation, no join-back,
    and the fingerprint frame has exactly ONE consumer (no persist, no
    second kernel run). Exchange: the same single 24 B/position shuffle
    as the copartition plan; the agg exchange (~32 B/position of
    mostly-unique keys that defeat map-side combine) disappears.

    Memory: the kernel buffers at most one straddling group between Arrow
    batches (60k-dup C4 boilerplate window ~= 1.4 MB; a pathological
    10^8-member group ~= 2.4 GB — the same rows the agg plan's join-back
    routes through AQE skew-split tasks, so the exposure is a buffer
    instead of a task, bounded by the hottest single window's dup count).
    """
    min_count = max(2, cfg.frequency_threshold + 1)
    clustered = fingerprints.repartition("h1", "h2").sortWithinPartitions(
        "h1", "h2", "pos"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pend: list[pd.DataFrame] = []  # segments of the trailing group
        key: tuple[int, int] | None = None
        for pdf in batches:
            if not len(pdf):
                continue
            h1 = pdf["h1"].to_numpy()
            h2 = pdf["h2"].to_numpy()
            first = (int(h1[0]), int(h2[0]))
            last = (int(h1[-1]), int(h2[-1]))
            brk = np.nonzero((h1 != last[0]) | (h2 != last[1]))[0]
            cut = int(brk[-1]) + 1 if len(brk) else 0
            head, tail = pdf.iloc[:cut], pdf.iloc[cut:]
            if pend and first != key:
                # pending group closed exactly at the batch boundary
                out = _dup_group_rows(
                    pd.concat(pend, ignore_index=True), min_count
                )
                pend = []
                if len(out):
                    yield from _emit_chunks(out)
            if len(head):
                if pend:
                    head = pd.concat([*pend, head], ignore_index=True)
                    pend = []
                out = _dup_group_rows(head, min_count)
                if len(out):
                    yield from _emit_chunks(out)
            if len(tail):
                pend.append(tail)
                key = last
        if pend:
            out = _dup_group_rows(pd.concat(pend, ignore_index=True), min_count)
            if len(out):
                yield from _emit_chunks(out)

    return clustered.mapInPandas(kernel, DUPLICATES_SCHEMA)


def _prefilter_sketch_bc(
    dup_keys: DataFrame, max_keys: int, sketch_mode: str | None = None
):
    """Dup-key frame -> broadcast membership sketch (None = no prefilter).

    Modes (env SPARK_GRAFT_FP_SKETCH):
      * ``auto`` (default) — exact sorted-int64 set while it fits the
        broadcast guard (``max_keys``), **Bloom filter above it** — the
        round-4 cliff (guard exceeded -> prefilter silently off, exactly
        in the dup-dense regime) is gone: Bloom false positives only ADD
        candidate positions (discarded by the exact post-shuffle (h1, h2)
        stats filter), false negatives are impossible, so recall is exact
        at ANY key count with a bounded broadcast
        (SPARK_GRAFT_FP_BLOOM_MAX_BYTES, default 64 MiB).
      * ``set``  — round-4 behavior (set or give up), kept A/B-able.
      * ``bloom`` — force the Bloom path at any size (benches/tests).
    """
    import os
    import warnings

    if sketch_mode is None:
        sketch_mode = os.environ.get("SPARK_GRAFT_FP_SKETCH", "auto")
    sc = dup_keys.sparkSession.sparkContext
    if sketch_mode != "set":
        # the key frame feeds up to three jobs on the Bloom path (guard
        # probe, count, slice build) — persist it once, scope-reclaimed
        from ..plans.caching import scoped_persist

        dup_keys = scoped_persist(dup_keys)
    if sketch_mode != "bloom":
        key_pdf = dup_keys.limit(max_keys + 1).toPandas()
        if len(key_pdf) <= max_keys:
            keys = np.sort(key_pdf["k"].to_numpy(np.int64))
            return sc.broadcast(keys)
        if sketch_mode == "set":
            warnings.warn(
                f"self_similar prefilter: dup-key set exceeds "
                f"{max_keys} keys (corpus is dup-dense); falling "
                "back to the copartition plan",
                stacklevel=3,
            )
            return None
    from .sketch import build_bloom_sketch

    n = dup_keys.count()
    if n == 0:
        return sc.broadcast(np.empty(0, dtype=np.int64))
    max_bytes = int(
        os.environ.get("SPARK_GRAFT_FP_BLOOM_MAX_BYTES", str(64 << 20))
    )
    return sc.broadcast(build_bloom_sketch(dup_keys, n, max_bytes=max_bytes))


def self_similar(
    docs: DataFrame,
    cfg: ExactSubstrConfig,
    total: int | None = None,
    persist_fp: bool | None = None,
    copartition: bool | None = None,
    prefilter: bool | None = None,
    prefilter_max_keys: int | None = None,
    prefilter_sketch: str | None = None,
    dedup_pass: str | None = None,
) -> DataFrame:
    """documents -> duplicates(pos, cluster_id, cluster_size).

    dedup_pass selects the clustering plan over the fingerprint frame
    (env SPARK_GRAFT_FP_DEDUP):

    * ``mappass`` (default, round-5) — find_duplicates_mappass: one
      (h1, h2) exchange -> sorted partitions -> single vectorized Arrow
      pass. The fingerprint frame becomes single-consumer, so
      persist_fp/copartition are moot and skipped (no 24 B/position
      cache at all); the prefilter still composes (pass-2 frame shrinks
      identically). Motivation: the stress profile at 30k docs/64 MiB
      shards showed the agg plan's stats+join-back at 44% of all CPU;
      measured at sf0.1 mappass is 0.70x wall at identical exchange
      bytes and identical output (scripts/measure_exchange.py
      --modes=copart,mappass; BASELINE.md round-5).
    * ``agg`` — find_duplicates: groupBy stats + join-back, fingerprint
      frame persisted/copartitioned per the kwargs below (round-4 plan;
      kept A/B-able — it routes pathological single-window hot groups
      through AQE skew-split tasks instead of one kernel buffer).

    find_duplicates consumes the fingerprint frame twice (stats agg +
    join-back). Two strategies:

    * persist_fp=True (default): persist MEMORY_AND_DISK — the rolling-hash
      kernels run once; the frame (24 B/position) is written to and read
      from storage. Right when executors bring their own disks/memory
      (real cluster) or the kernel input scan is expensive.
    * persist_fp=False: recompute the kernels for the second consumer —
      pure CPU that scales with cores, trading ~2x kernel compute for zero
      storage traffic. Right on storage-bandwidth-bound hosts (this
      sandbox's single shared disk) when the doc frame is already cached.

    copartition=True (default, with persist_fp): hash-repartition the
    persisted frame by (h1, h2) BEFORE caching, so BOTH consumers are
    already clustered on the group key — the stats agg runs exchange-free
    (HashPartitioning(h1,h2) satisfies its ClusteredDistribution) and the
    join-back co-locates without re-shuffling the fingerprint side (the
    initial adaptive plan may still carry ENSURE exchanges — AQE elides
    them at runtime once the cache materializes). Net: ONE 24 B/position
    exchange total, vs the partial-agg exchange (~32 B/position:
    mostly-unique keys defeat map-side combine) PLUS a possible
    24 B/position join exchange when the dup-key frame outgrows broadcast
    (boilerplate-heavy webtext at 100 TB). Measured: 1.79x fewer exchange
    bytes and 1.43x wall in the no-broadcast regime, parity (+8%) when
    the dup-key frame broadcasts — scripts/measure_exchange.py,
    BASELINE.md round-4 section; output parity pinned by
    tests/test_round4.py.

    prefilter=True (the at-scale mode; round-4 verdict item 1): at real-
    corpus dup density (<1% of C4 positions, README.md:10 context) ~99% of
    fingerprints are singletons that the stats filter discards only AFTER
    riding the 24 B/position exchange. Two passes instead:

      pass 1  h1-only key kernel (half the hash work) -> groupBy(k)
              count >= max(2, freq_threshold+1). Exchange: one 8 B key
              (+8 B partial count) per map-side-distinct key — and never
              the positions.
      pass 2  full fingerprint kernel re-runs (cheap, CPU-bound, scales
              with cores) with the dup-key set broadcast as a sorted
              int64 array; each shard emits ONLY positions whose h1 is in
              the set. Exchange: 24 B x dup_fraction per position.

    Recall is exact: equal windows have equal h1, so every true duplicate
    position survives pass 2; h1 collisions only ADD candidate positions
    (expected extra pairs ~P^2/2^64 — ~10^8 rows at P=10^14, noise), and
    find_duplicates' exact (h1, h2) grouping then drops them. Net at 1%
    dup density: ~16 B/position total exchange vs copartition's 24
    (1.5x) and the broadcast-unavailable two-exchange plan's 48 (3x) —
    plus the join-back and stats stages now run on a ~100x smaller frame.

    The dup-key set is collected driver-side (limit-guarded:
    ``prefilter_max_keys``, default 2^24 keys = 128 MB broadcast; env
    SPARK_GRAFT_FP_PREFILTER_MAX_KEYS). Above the guard the sketch
    degrades to a bounded-size Bloom filter instead of switching off
    (``prefilter_sketch`` / SPARK_GRAFT_FP_SKETCH, see
    _prefilter_sketch_bc): false positives only add candidates the exact
    post-shuffle stats filter discards, so recall stays exact at any
    dup-key count.

    Env overrides for benches: SPARK_GRAFT_FP_PERSIST=0/1,
    SPARK_GRAFT_FP_COPART=0/1, SPARK_GRAFT_FP_PREFILTER=0/1,
    SPARK_GRAFT_FP_SKETCH=auto/set/bloom.
    """
    import os

    from ..plans.caching import scoped_persist

    if persist_fp is None:
        persist_fp = os.environ.get("SPARK_GRAFT_FP_PERSIST", "1") != "0"
    if copartition is None:
        copartition = os.environ.get("SPARK_GRAFT_FP_COPART", "1") != "0"
    if prefilter is None:
        prefilter = os.environ.get("SPARK_GRAFT_FP_PREFILTER", "0") == "1"
    if prefilter_max_keys is None:
        prefilter_max_keys = int(
            os.environ.get("SPARK_GRAFT_FP_PREFILTER_MAX_KEYS", str(1 << 24))
        )
    if dedup_pass is None:
        dedup_pass = os.environ.get("SPARK_GRAFT_FP_DEDUP", "mappass")
    if dedup_pass not in ("agg", "mappass"):
        raise ValueError(f"dedup_pass must be 'agg' or 'mappass': {dedup_pass}")

    if "byte_start" not in docs.columns:
        docs = scoped_persist(with_offsets(docs, cfg.with_separators))
    if total is None:
        total = corpus_total_bytes(docs)

    if prefilter:
        min_count = max(2, cfg.frequency_threshold + 1)
        dup_keys = (
            window_keys(docs, cfg, total)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= min_count)
            .select("k")
        )
        dup_keys_bc = _prefilter_sketch_bc(
            dup_keys, prefilter_max_keys, sketch_mode=prefilter_sketch
        )
    else:
        dup_keys_bc = None

    # the prefiltered frame honors copartition/persist too: in the
    # no-broadcast (100-TB) regime its stats agg + join-back still want the
    # single (h1, h2)-clustered exchange, just over a ~dup_fraction frame
    fp = window_fingerprints(docs, cfg, total, dup_keys_bc)
    if dedup_pass == "mappass":
        # single consumer: no persist, no pre-repartition — the mappass
        # operator owns the one (h1, h2) exchange + partition sort
        return find_duplicates_mappass(fp, cfg)
    if copartition and persist_fp:
        # only with persist: uncached, each consumer would re-run the
        # repartition exchange anyway (no saving over the status quo)
        fp = fp.repartition("h1", "h2")
    if persist_fp:
        fp = scoped_persist(fp)
    return find_duplicates(fp, cfg)


CLUSTER_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("cluster_id", T.LongType(), False),
        T.StructField("cluster_size", T.LongType(), False),
        T.StructField("sample", T.BinaryType(), False),
    ]
)


def cluster_samples(
    docs_with_offsets: DataFrame,
    duplicates: DataFrame,
    cfg: ExactSubstrConfig,
) -> DataFrame:
    """``--only_save_one`` parity (main.rs:130, 915-919): instead of every
    duplicate position, emit the matched length-L byte sequence once per
    cluster — (cluster_id, cluster_size, sample).

    The sample is read at the cluster head (min member position; the
    reference dumps the run's shared prefix, which is identical at every
    member). Extraction is an interval join of the head windows against
    the doc offsets plus a per-cluster byte-assembly kernel — the window
    may straddle documents (or contain separator bytes), exactly like the
    reference's raw corpus reads.
    """
    from ..sources.corpus import doc_payload
    from .intervals import interval_join

    L = cfg.length_threshold
    heads = duplicates.groupBy("cluster_id").agg(
        F.max("cluster_size").alias("cluster_size")
    )
    ranges = heads.select(
        F.col("cluster_id").alias("start"),
        (F.col("cluster_id") + L).alias("end"),
        "cluster_size",
    )
    hit = interval_join(ranges, docs_with_offsets)

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        start = int(pdf["start"].iloc[0])
        end = int(pdf["end"].iloc[0])
        buf = np.zeros(end - start, dtype=np.uint8)
        for doc_id, byte_start, text in zip(
            pdf["doc_id"], pdf["byte_start"], pdf["text"]
        ):
            payload = doc_payload(int(doc_id), text, cfg.with_separators)
            ds, de = int(byte_start), int(byte_start) + len(payload)
            a, b = max(ds, start), min(de, end)
            if b > a:
                buf[a - start : b - start] = np.frombuffer(
                    payload, dtype=np.uint8
                )[a - ds : b - ds]
        return pd.DataFrame(
            {
                "cluster_id": [start],
                "cluster_size": [int(pdf["cluster_size"].iloc[0])],
                "sample": [buf.tobytes()],
            }
        )

    return (
        hit.select(
            "start", "end", "cluster_size", "doc_id", "byte_start", "text"
        )
        .groupBy("start")
        .applyInPandas(lambda pdf: assemble(pdf), CLUSTER_SAMPLE_SCHEMA)
    )


def duplicate_window_census(
    docs: DataFrame, cfg: ExactSubstrConfig, k: int = 20
) -> DataFrame:
    """Most-duplicated-substrings census: the paper's headline analysis
    table (Lee et al. 2022 §6; the reference produces it by post-processing
    cmd_self_similar + cmd_collect dumps) — the k length-L windows repeated
    most often across the corpus, with their text.

    documents -> (snippet string, cnt, first_pos), ordered top-k by
    (cnt DESC, first_pos ASC) — a total order (first_pos = the cluster's
    min position, unique per cluster), so the selected set is deterministic
    and oracle-comparable.

    Plan (100-TB read): self_similar's cluster frame -> per-cluster size
    (groupBy on the already dup-density-sized frame) -> global top-k via
    TakeOrderedAndProject (k rows cross the final exchange, never the
    cluster frame) -> snippet extraction ONLY for those k heads through
    cluster_samples' interval join (windows may straddle documents, exactly
    like the reference's raw corpus reads). Corpus text never rides a
    shuffle; the census adds one tiny top-k reduction on top of
    self_similar's single fingerprint exchange.

    Note: `cnt` counts window OCCURRENCES (overlapping matches included),
    matching the oracle's COUNT(*) per distinct window, not distinct docs.
    """
    from ..plans.caching import scoped_persist

    if "byte_start" not in docs.columns:
        docs = scoped_persist(with_offsets(docs, cfg.with_separators))
    dups = self_similar(docs, cfg)
    heads = dups.groupBy("cluster_id").agg(
        F.max("cluster_size").alias("cluster_size")
    )
    top = heads.orderBy(
        F.desc("cluster_size"), F.asc("cluster_id")
    ).limit(k)
    # cluster_samples only reads (cluster_id, cluster_size): handing it the
    # k-row top frame extracts exactly k snippets — no semi-join back into
    # the position frame needed.
    samples = cluster_samples(docs, top, cfg)
    return samples.select(
        # byte-window decode; for multi-byte UTF-8 corpora a window can cut
        # a code point (reference byte semantics, finish_dedup's splice
        # does the same) — the SQL-oracle comparison assumes 1-byte chars
        F.decode(F.col("sample"), "UTF-8").alias("snippet"),
        F.col("cluster_size").alias("cnt"),
        F.col("cluster_id").alias("first_pos"),
    )


def across_similar(
    fingerprints_a: DataFrame, fingerprints_b: DataFrame, cfg: ExactSubstrConfig
) -> tuple[DataFrame, DataFrame]:
    """cmd_across_similar (main.rs:962-1158): emit positions of A whose
    window also occurs in B, and vice versa — i.e. two left-semi joins on
    the window key. The reference's merge-interleave drain of equal runs on
    both sides *is* a sort-merge semi-join; Catalyst picks SMJ/BHJ and AQE
    handles skewed keys."""
    keys_a = fingerprints_a.select("h1", "h2").distinct()
    keys_b = fingerprints_b.select("h1", "h2").distinct()
    dups_a = fingerprints_a.join(keys_b, ["h1", "h2"], "left_semi").select("pos")
    dups_b = fingerprints_b.join(keys_a, ["h1", "h2"], "left_semi").select("pos")
    return dups_a, dups_b


# ---------------------------------------------------------------------------
# Per-shard suffix arrays: count-occurrences / find-training-data
# ---------------------------------------------------------------------------


try:  # linear-time SA-IS when the (public, pip) binding is present
    from pydivsufsort import divsufsort as _divsufsort
except ImportError:  # pragma: no cover - env without pydivsufsort
    _divsufsort = None


def suffix_array(buf: np.ndarray) -> np.ndarray:
    """Per-shard suffix sort. Oracle semantics:
    sorted(S[i:] for i in range(len(S))) (src/main.rs:23-24).

    Replaces the reference's SA-IS kernel (src/table.rs:400-586) — per
    shard, inside an Arrow kernel, never materialized globally. Uses
    libdivsufsort (linear-ish time) when ``pydivsufsort`` is importable;
    the fallback is a bucket-refined prefix-doubling sort:

    * round 0 ranks every suffix by its first 4 bytes in one radix argsort
      (16-bit sentinel lanes: byte+1 with 0-pad, so a short suffix sorts
      before any extension — no zero-byte/padding ambiguity);
    * each doubling round re-sorts ONLY the still-tied rank groups
      (Larsson–Sadakane refinement): on real text the tied fraction
      collapses after a couple of rounds and later rounds touch just the
      duplicated regions, so the k-th round costs O(dup_k log dup_k), not
      O(n log n) — the dominant-compute fix flagged in VERDICT r02.

    Ranks are "group start slot" integers (< n <= 2^27 at the 64 MiB
    production shard cap), so a (rank, next_rank) pair packs into one
    uint64 key and each round is a single stable radix argsort.
    """
    n = len(buf)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if _divsufsort is not None:
        return np.asarray(_divsufsort(buf), dtype=np.int64)
    if n >= (1 << 32) - 1:
        # the doubling rounds pack rank+1 (< n+1) into the low 32 bits of a
        # uint64 key; at n >= 2^32-1 that lane overflows and the sort would
        # silently corrupt. Unreachable under the 64 MiB production shard
        # cap (config.ExactSubstrConfig.shard_bytes) — fail loudly if a
        # future config change lifts it.
        raise ValueError(
            f"suffix_array fallback supports shard buffers < 2^32-1 bytes "
            f"(got {n}); shrink shard_bytes or install pydivsufsort"
        )
    # round 0: rank by first 4 bytes via sentinel lanes (b+1, 0-padded)
    ext = np.concatenate(
        [buf.astype(np.uint64) + np.uint64(1), np.zeros(4, dtype=np.uint64)]
    )
    key0 = (
        (ext[0:n] << np.uint64(48))
        | (ext[1 : n + 1] << np.uint64(32))
        | (ext[2 : n + 2] << np.uint64(16))
        | ext[3 : n + 3]
    )
    order = np.argsort(key0, kind="stable").astype(np.int64)
    k0 = key0[order]
    start = np.empty(n, dtype=bool)
    start[0] = True
    start[1:] = k0[1:] != k0[:-1]
    slots = np.arange(n, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.maximum.accumulate(np.where(start, slots, 0))
    # initial unresolved subset: slots whose rank group has size > 1. The
    # subset only ever shrinks, so later rounds never rescan all n slots —
    # per-round cost is O(current tied count), which on real text collapses
    # to just the duplicated regions after a couple of rounds.
    eq_next = np.zeros(n, dtype=bool)
    eq_next[:-1] = ~start[1:]
    unres = eq_next.copy()
    unres[1:] |= eq_next[:-1]
    s = np.nonzero(unres)[0]
    k = 4
    while len(s):
        if k > 2 * n:  # sentinel base case makes this unreachable
            raise RuntimeError("suffix_array failed to converge")
        suf = order[s]
        nxt = suf + k
        key2 = np.where(
            nxt < n, rank[np.minimum(nxt, n - 1)] + 1, 0
        ).astype(np.uint64)
        # group id (= start slot) rides the high half so one stable radix
        # argsort refines every group at once; groups are slot-contiguous
        comb = (rank[suf].astype(np.uint64) << np.uint64(32)) | key2
        sub = np.argsort(comb, kind="stable")
        order[s] = suf[sub]
        cs = comb[sub]
        m = len(s)
        nstart = np.empty(m, dtype=bool)
        nstart[0] = True
        nstart[1:] = cs[1:] != cs[:-1]
        rank[order[s]] = np.maximum.accumulate(np.where(nstart, s, 0))
        # still-tied slots within the subset (equal comb <=> same old group
        # and same doubled key; distinct old groups never share comb since
        # the group id is the high half)
        eq = np.zeros(m, dtype=bool)
        eq[:-1] = cs[1:] == cs[:-1]
        un2 = eq.copy()
        un2[1:] |= eq[:-1]
        s = s[un2]
        k <<= 1
    return order


def _sa_compare(buf: np.ndarray, start: int, q: np.ndarray) -> int:
    """Compare corpus suffix buf[start:] with query q lexicographically on
    the first len(q) bytes: -1 suffix < q, 0 prefix-match, 1 suffix > q."""
    seg = buf[start : start + len(q)]
    if len(seg) < len(q):
        qq = q[: len(seg)]
        neq = np.nonzero(seg != qq)[0]
        if len(neq) == 0:
            return -1  # shorter suffix with matching prefix sorts first
        i = neq[0]
        return -1 if seg[i] < qq[i] else 1
    neq = np.nonzero(seg != q)[0]
    if len(neq) == 0:
        return 0
    i = neq[0]
    return -1 if seg[i] < q[i] else 1


def _sa_range(buf: np.ndarray, sa: np.ndarray, q: np.ndarray) -> tuple[int, int]:
    """Double binary search -> [first, last) SA rows whose suffix starts
    with q (count_occurances kernel, src/main.rs:286-366). Counts
    overlapping occurrences by construction ("aaaa".count("aa") == 3,
    main.rs:629-632)."""
    lo, hi = 0, len(sa)
    while lo < hi:  # first suffix >= q (prefix-match counts as >=)
        mid = (lo + hi) // 2
        if _sa_compare(buf, sa[mid], q) < 0:
            lo = mid + 1
        else:
            hi = mid
    first = lo
    hi = len(sa)
    while lo < hi:  # first suffix that is > q and not prefixed by q
        mid = (lo + hi) // 2
        if _sa_compare(buf, sa[mid], q) <= 0:
            lo = mid + 1
        else:
            hi = mid
    return first, lo


QUERY_HITS_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("cnt", T.LongType(), False),
        T.StructField("first_pos", T.LongType(), True),
    ]
)


def count_occurrences(
    docs: DataFrame,
    queries: list[tuple[int, bytes]],
    cfg: ExactSubstrConfig,
    total: int | None = None,
) -> DataFrame:
    """cmd_count_occurrences / -multi (main.rs:623-728): per-shard suffix
    arrays answer each query in O(|q| log n); per-shard partial counts are
    summed — a two-stage aggregation. Queries ride the task closure
    (broadcast side, like the reference's in-RAM query file main.rs:643).

    A match is counted by the shard owning its start position; the shard
    buffer extends ``overlap_bytes`` past the owned range, so any query up
    to overlap_bytes+1 bytes is counted exactly once.

    Returns (query_id, count, first_pos).
    """
    max_q = max((len(q) for _, q in queries), default=0)
    if max_q > cfg.overlap_bytes + 1:
        raise ValueError(
            f"query of {max_q} bytes exceeds overlap_bytes+1="
            f"{cfg.overlap_bytes + 1}; raise ExactSubstrConfig.overlap_bytes"
        )
    if "byte_start" not in docs.columns:
        docs = with_offsets(docs, cfg.with_separators)
    if total is None:
        total = corpus_total_bytes(docs)
    qarr = [(int(qid), np.frombuffer(q, dtype=np.uint8)) for qid, q in queries]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        s = int(pdf["shard_id"].iloc[0])
        lo, buf = assemble_shard_buffer(
            pdf, cfg.shard_bytes, cfg.overlap_bytes, total, cfg.with_separators
        )
        own_hi = min((s + 1) * cfg.shard_bytes, total)
        sa = suffix_array(buf)
        rows = []
        for qid, q in qarr:
            if len(q) == 0:
                continue
            first, last = _sa_range(buf, sa, q)
            if last <= first:
                continue
            starts = sa[first:last] + lo
            owned = starts[starts < own_hi]
            if len(owned) == 0:
                continue
            rows.append((qid, int(len(owned)), int(owned.min())))
        return pd.DataFrame(rows, columns=["query_id", "cnt", "first_pos"]).astype(
            {"query_id": "int64", "cnt": "int64", "first_pos": "int64"}
        )

    shards = assign_shards(docs, cfg.shard_bytes, cfg.overlap_bytes)
    hits = (
        shards.select("shard_id", "doc_id", "byte_start", "text")
        .groupBy("shard_id")
        .applyInPandas(kernel, QUERY_HITS_SCHEMA)
    )
    # baseline (qid, 0, null) rows ride the same aggregation as a local
    # relation so absent queries report 0 without a left join back against
    # a query frame (round-6 — one broadcast join less per call)
    spark = docs.sparkSession
    baseline = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": np.array([qid for qid, _ in queries], np.int64),
                "cnt": np.zeros(len(queries), np.int64),
                "first_pos": pd.array([None] * len(queries), dtype="Int64"),
            }
        ),
        QUERY_HITS_SCHEMA,
    )  # pandas input -> local relation (a list parallelizes into RDD slices)
    return hits.unionByName(baseline).groupBy("query_id").agg(
        F.sum("cnt").alias("count"), F.min("first_pos").alias("first_pos")
    )


MATCH_LEN_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("qpos", T.LongType(), False),
        T.StructField("match_len", T.LongType(), False),
    ]
)


def _lcp(a: np.ndarray, b: np.ndarray) -> int:
    m = min(len(a), len(b))
    if m == 0:
        return 0
    neq = np.nonzero(a[:m] != b[:m])[0]
    return int(neq[0]) if len(neq) else m


# --- batched match-length kernel (vectorized find-training-data) ----------
#
# The reference runs find-training-data over EVERY token offset of large
# query files with 176 threads (main.rs:778); a per-probe Python binary
# search (one numpy allocation per comparison) is orders slower at that
# shape. Here ALL probes advance together through a lane-parallel binary
# search: each step gathers one 4-byte suffix chunk per probe and narrows
# every probe's SA range at once. Chunks are 16-bit sentinel lanes
# (byte+1, 0-padded) so a suffix end never falsely matches a probe byte —
# exact even for corpora/queries containing NUL bytes (packed-u16 token
# corpora have them in every high byte < 256).

_CHUNK = 4  # bytes compared per descent level


def _sentinel_ext(arr: np.ndarray) -> np.ndarray:
    """uint64 lanes byte+1 with trailing zero pad (reads past the end of
    any suffix resolve to the 0 sentinel)."""
    return np.concatenate(
        [arr.astype(np.uint64) + np.uint64(1), np.zeros(_CHUNK, dtype=np.uint64)]
    )


def _chunk_at(ext: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Packed 4-lane chunk starting at each idx (clamped reads land in the
    zero pad, i.e. the sentinel)."""
    last = len(ext) - 1
    v = np.zeros(len(idx), dtype=np.uint64)
    for b in range(_CHUNK):
        v = (v << np.uint64(16)) | ext[np.minimum(idx + b, last)]
    return v


def _lane_lcp(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Leading equal 16-bit lanes between packed chunks (0..4)."""
    xor = x ^ y
    cnt = np.zeros(len(x), dtype=np.int64)
    alive = np.ones(len(x), dtype=bool)
    for b in range(_CHUNK):
        lane = (xor >> np.uint64(16 * (_CHUNK - 1 - b))) & np.uint64(0xFFFF)
        alive &= lane == 0
        cnt += alive
    return cnt


def _vbisect(
    ext: np.ndarray,
    sa: np.ndarray,
    off: int,
    lo: np.ndarray,
    hi: np.ndarray,
    pk: np.ndarray,
    side: str,
) -> np.ndarray:
    """searchsorted of each probe chunk pk[i] within its own SA range
    [lo[i], hi[i]) on the depth-``off`` suffix chunk — all probes bisect in
    lockstep (each iteration is one vectorized gather+compare)."""
    lo = lo.copy()
    hi = hi.copy()
    nsa = len(sa)
    while True:
        run = lo < hi
        if not run.any():
            return lo
        mid = (lo + hi) >> 1
        kv = _chunk_at(ext, sa[np.minimum(mid, nsa - 1)] + off)
        go = (kv < pk) if side == "left" else (kv <= pk)
        adv = run & go
        lo = np.where(adv, mid + 1, lo)
        hi = np.where(run & ~go, mid, hi)


def _batched_match_lens(
    buf: np.ndarray, sa: np.ndarray, q: np.ndarray, qpos: np.ndarray,
    probe_cap: int,
) -> np.ndarray:
    """For each probe (suffix of q starting at qpos[i], capped), the
    longest common prefix with ANY suffix of buf. Exact: equals
    max_j lcp(buf[sa[j]:], q[qpos[i]:qpos[i]+cap]).

    Per descent level d the surviving probes (those matching the first
    4*d bytes of some suffix) narrow their tie range with two lockstep
    bisections; a probe whose range empties takes its final partial-chunk
    LCP from the two suffixes adjacent to its insertion point (sorted
    order makes common-prefix length unimodal around it). Work per level
    is O(active * log n) gathers, and the active set shrinks to just the
    long-match probes.
    """
    n = len(sa)
    m = len(qpos)
    best = np.zeros(m, dtype=np.int64)
    if m == 0 or n == 0:
        return best
    ext = _sentinel_ext(buf)
    qext = _sentinel_ext(q)
    qpos = qpos.astype(np.int64)
    qlen = np.maximum(np.minimum(len(q) - qpos, probe_cap), 0)
    lo = np.zeros(m, dtype=np.int64)
    hi = np.full(m, n, dtype=np.int64)
    resolved = np.zeros(m, dtype=bool)
    d = 0
    while not resolved.all():
        off = _CHUNK * d
        rem = qlen - off
        # probe exhausted with a live range => some suffix matched all of it
        done = (~resolved) & (rem <= 0)
        best[done] = qlen[done]
        resolved |= done
        act = np.nonzero(~resolved)[0]
        if len(act) == 0:
            break
        pk = _chunk_at(qext, qpos[act] + off)
        l2 = _vbisect(ext, sa, off, lo[act], hi[act], pk, "left")
        r2 = _vbisect(ext, sa, off, lo[act], hi[act], pk, "right")
        empty = l2 == r2
        if empty.any():
            ei = act[empty]
            le = l2[empty]
            pke = pk[empty]
            cand = np.zeros(len(ei), dtype=np.int64)
            for dj in (-1, 0):
                j = le + dj
                ok = (j >= lo[ei]) & (j < hi[ei])
                sv = _chunk_at(ext, sa[np.where(ok, j, 0)] + off)
                ll = np.minimum(_lane_lcp(pke, sv), rem[ei])
                cand = np.maximum(cand, np.where(ok, ll, 0))
            best[ei] = off + cand
            resolved[ei] = True
        ni = act[~empty]
        lo[ni] = l2[~empty]
        hi[ni] = r2[~empty]
        # Narrow-range early-out: <= 2 candidate suffixes left. Finish each
        # with one flat numpy LCP scan instead of descending 4 bytes per
        # round — a whole-document duplicate (match_len ~ doc bytes) would
        # otherwise cost len/4 lockstep rounds. The max-LCP suffix is
        # inside [lo, hi): anything outside matches < base bytes.
        base = _CHUNK * (d + 1)
        for i in ni[(hi[ni] - lo[ni]) <= 2]:
            if base >= qlen[i]:
                continue  # the rem<=0 branch resolves it next round
            qs = q[qpos[i] + base : qpos[i] + qlen[i]]
            bst = 0
            for j in range(lo[i], hi[i]):
                bst = max(bst, _lcp(buf[sa[j] + base :], qs))
            best[i] = base + bst
            resolved[i] = True
        d += 1
    return best


def _match_lens_loop(
    buf: np.ndarray, sa: np.ndarray, q: np.ndarray, qpos: np.ndarray,
    probe_cap: int,
) -> np.ndarray:
    """Naive per-probe binary-search kernel (the pre-r03 implementation) —
    kept as the test oracle and the bench comparator for the batched
    kernel."""
    out = np.zeros(len(qpos), dtype=np.int64)
    for ix, i in enumerate(qpos):
        probe = q[i : i + probe_cap]
        loi, hii = 0, len(sa)
        while loi < hii:
            mid = (loi + hii) // 2
            if _sa_compare(buf, sa[mid], probe) < 0:
                loi = mid + 1
            else:
                hii = mid
        best = 0
        for j in (loi - 1, loi):
            if 0 <= j < len(sa):
                best = max(best, _lcp(buf[sa[j] :], probe))
        out[ix] = best
    return out


def find_training_data(
    docs: DataFrame,
    queries: list[tuple[int, bytes]],
    cfg: ExactSubstrConfig,
    probe_cap: int = 65536,
    step: int = 1,
    total: int | None = None,
) -> DataFrame:
    """find-training-data (cmd_find_training_data_2, main.rs:730-805):
    for every query offset (step=2 for u16-token corpora, main.rs:762-768),
    the longest prefix of that query suffix occurring anywhere in the
    corpus, probe-capped (main.rs:525-526 cap 65536).

    Per shard: binary-search the query suffix in the shard SA, LCP against
    both neighbors; global answer = max over shards
    (groupBy(query_id, qpos).max — partial agg first).

    Cross-shard caveat (documented approximation, same class as the
    reference's HACKSIZE): a match longer than shard_bytes+overlap that
    straddles an ownership boundary reports the in-buffer prefix length.
    """
    if "byte_start" not in docs.columns:
        docs = with_offsets(docs, cfg.with_separators)
    if total is None:
        total = corpus_total_bytes(docs)
    qarr = [(int(qid), np.frombuffer(q, dtype=np.uint8)) for qid, q in queries]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, buf = assemble_shard_buffer(
            pdf, cfg.shard_bytes, cfg.overlap_bytes, total, cfg.with_separators
        )
        sa = suffix_array(buf)
        frames = []
        for qid, q in qarr:
            qpos = np.arange(0, len(q), step, dtype=np.int64)
            lens = _batched_match_lens(buf, sa, q, qpos, probe_cap)
            frames.append(
                pd.DataFrame(
                    {"query_id": qid, "qpos": qpos, "match_len": lens}
                )
            )
        if not frames:
            return pd.DataFrame(
                {"query_id": [], "qpos": [], "match_len": []}
            ).astype({"query_id": "int64", "qpos": "int64", "match_len": "int64"})
        return pd.concat(frames, ignore_index=True)

    shards = assign_shards(docs, cfg.shard_bytes, cfg.overlap_bytes)
    per_shard = (
        shards.select("shard_id", "doc_id", "byte_start", "text")
        .groupBy("shard_id")
        .applyInPandas(kernel, MATCH_LEN_SCHEMA)
    )
    return per_shard.groupBy("query_id", "qpos").agg(
        F.max("match_len").alias("match_len")
    )


POSITIONS_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("pos", T.LongType(), False),
    ]
)


def find_positions(
    docs: DataFrame,
    queries: list[tuple[int, bytes]],
    cfg: ExactSubstrConfig,
    total: int | None = None,
) -> DataFrame:
    """All occurrence positions of each query (SuffixTable::positions,
    src/table.rs:250-307): the same per-shard double binary search as
    count_occurrences, emitting every owned start offset."""
    max_q = max((len(q) for _, q in queries), default=0)
    if max_q > cfg.overlap_bytes + 1:
        raise ValueError(
            f"query of {max_q} bytes exceeds overlap_bytes+1="
            f"{cfg.overlap_bytes + 1}"
        )
    if "byte_start" not in docs.columns:
        docs = with_offsets(docs, cfg.with_separators)
    if total is None:
        total = corpus_total_bytes(docs)
    qarr = [(int(qid), np.frombuffer(q, dtype=np.uint8)) for qid, q in queries]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        s = int(pdf["shard_id"].iloc[0])
        lo, buf = assemble_shard_buffer(
            pdf, cfg.shard_bytes, cfg.overlap_bytes, total, cfg.with_separators
        )
        own_hi = min((s + 1) * cfg.shard_bytes, total)
        sa = suffix_array(buf)
        out_q, out_p = [], []
        for qid, q in qarr:
            if len(q) == 0:
                continue
            first, last = _sa_range(buf, sa, q)
            starts = sa[first:last] + lo
            owned = starts[starts < own_hi]
            out_q.extend([qid] * len(owned))
            out_p.extend(owned.tolist())
        return pd.DataFrame({"query_id": out_q, "pos": out_p}).astype(
            {"query_id": "int64", "pos": "int64"}
        )

    shards = assign_shards(docs, cfg.shard_bytes, cfg.overlap_bytes)
    return (
        shards.select("shard_id", "doc_id", "byte_start", "text")
        .groupBy("shard_id")
        .applyInPandas(kernel, POSITIONS_SCHEMA)
    )


def contains(
    docs: DataFrame,
    queries: list[tuple[int, bytes]],
    cfg: ExactSubstrConfig,
    total: int | None = None,
) -> DataFrame:
    """Membership probe (is_present_memory, src/main.rs:442-485):
    (query_id, present) — a count > 0 test; the per-shard search
    short-circuits through the same SA range lookup."""
    out = count_occurrences(docs, queries, cfg, total)
    return out.select("query_id", (F.col("count") > 0).alias("present"))
