"""Round-5 coverage: path-keyed SA-index overlap memo, TFDS/HF sharded
loaders (streaming HF path per round-4 ADVICE), one-bound-per-task shard
fan-out, injected multimodal decoders, and the small ADVICE hygiene fixes
(size-conf warning, AcrossDedupResult iteration deprecation).
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from deduplicate_text_datasets_spark.config import ExactSubstrConfig
from deduplicate_text_datasets_spark.sources.documents import (
    DOCUMENTS_SCHEMA,
    synth_documents_pandas,
)


@pytest.fixture(scope="module")
def fixture_pdf():
    return synth_documents_pandas(40, size_lo=30, size_hi=120)


@pytest.fixture(scope="module")
def docs(spark, fixture_pdf):
    return spark.createDataFrame(fixture_pdf, schema=DOCUMENTS_SCHEMA)


# --- SA index: overlap memo keyed by path (round-4 verdict item 5) ---------


def test_overlap_memo_survives_reread(spark, docs, tmp_path_factory):
    """A re-read of the same stored index must hit the module-level
    per-path memo instead of re-paying the one-column scan; a rewrite at
    the same path must invalidate it (the rebuild may change overlap)."""
    from deduplicate_text_datasets_spark.operators import sa_index as sx

    cfg = ExactSubstrConfig(
        length_threshold=50, shard_bytes=4096, overlap_bytes=64,
        with_separators=True,
    )
    path = str(tmp_path_factory.mktemp("idx5") / "sa")
    sx.write_suffix_index(sx.build_suffix_index(docs, cfg), path)

    first = sx.read_suffix_index(spark, path)
    sx.count_occurrences_indexed(first, [(0, b"abc")]).collect()
    assert sx._OVERLAP_BY_PATH.get(path) == 64

    # poison the PATH memo: a fresh frame from the same path must read it
    # (proof it never re-aggregates), so this 2-byte query must now raise
    sx._OVERLAP_BY_PATH[path] = 0
    reread = sx.read_suffix_index(spark, path)
    assert getattr(reread, "_sa_overlap_memo", None) is None  # fresh object
    with pytest.raises(ValueError, match="overlap"):
        sx.count_occurrences_indexed(reread, [(0, b"ab")]).collect()

    # a rewrite at the same path drops the stale entry; the next query
    # re-aggregates the true overlap and succeeds again
    sx.write_suffix_index(sx.build_suffix_index(docs, cfg), path)
    assert path not in sx._OVERLAP_BY_PATH
    again = sx.read_suffix_index(spark, path)
    sx.count_occurrences_indexed(again, [(0, b"ab")]).collect()
    assert sx._OVERLAP_BY_PATH.get(path) == 64


# --- self_similar dup-key prefilter (round-4 verdict item 1) -----------------


SS_CFG = ExactSubstrConfig(
    length_threshold=50, shard_bytes=4096, overlap_bytes=64,
    with_separators=True,
)


def test_self_similar_prefilter_parity(spark, docs):
    """prefilter mode must be bit-identical to the copartition plan, and
    the guard-exceeded fallback must warn and still return it."""
    from deduplicate_text_datasets_spark.operators.suffix import self_similar

    base = sorted(tuple(r) for r in self_similar(docs, SS_CFG).collect())
    assert len(base) > 0
    spark.catalog.clearCache()
    pre = sorted(
        tuple(r) for r in self_similar(docs, SS_CFG, prefilter=True).collect()
    )
    assert pre == base
    spark.catalog.clearCache()
    with pytest.warns(UserWarning, match="dup-key"):
        fb = self_similar(
            docs, SS_CFG, prefilter=True, prefilter_max_keys=1,
            prefilter_sketch="set",
        )
    assert sorted(tuple(r) for r in fb.collect()) == base
    spark.catalog.clearCache()


def test_prefilter_pass2_ships_only_candidates(spark, docs):
    """The pass-2 fingerprint frame must contain EXACTLY the positions
    whose h1 key is globally non-unique — i.e. the singleton ~majority
    never enters the exchange (the whole point of the prefilter)."""
    from deduplicate_text_datasets_spark.operators.suffix import (
        window_fingerprints,
        window_keys,
    )

    fp_full = window_fingerprints(docs, SS_CFG).cache()
    n_all = fp_full.count()
    expected = (
        fp_full.groupBy("h1")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter("c >= 2")
        .agg(F.sum("c").alias("s"))
        .collect()[0]["s"]
    ) or 0
    key_pdf = (
        window_keys(docs, SS_CFG)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter("c >= 2")
        .select("k")
        .toPandas()
    )
    keys = np.sort(key_pdf["k"].to_numpy(np.int64))
    bc = spark.sparkContext.broadcast(keys)
    n_pre = window_fingerprints(docs, SS_CFG, dup_keys_bc=bc).count()
    assert n_pre == expected
    assert n_pre < n_all, "fixture has no singleton windows? test is vacuous"
    fp_full.unpersist()
    spark.catalog.clearCache()


# --- sources hygiene (round-4 ADVICE) ---------------------------------------


def test_size_bytes_warns_on_garbage():
    from deduplicate_text_datasets_spark.sources.documents import _size_bytes

    assert _size_bytes("128m") == 128 << 20
    assert _size_bytes("134217728b") == 134217728
    with pytest.warns(UserWarning, match="maxPartitionBytes"):
        assert _size_bytes("12 parsecs") == 128 << 20


def test_across_result_iter_deprecated():
    from deduplicate_text_datasets_spark.plans.pipeline import (
        AcrossDedupResult,
    )

    res = AcrossDedupResult(1, 2, 3, 4, 5, 6)
    with pytest.warns(DeprecationWarning, match="A side"):
        assert tuple(res) == (1, 2, 3)
    # named fields carry the full symmetric result
    assert (res.dups_b, res.ranges_b, res.deduped_b) == (4, 5, 6)


def test_sharded_text_one_bound_per_task(spark):
    """repartitionByRange on lo gives every [lo, hi) bound its own task —
    hash partitioning could serialize several shard loads in one task and
    leave other slots idle (round-4 ADVICE)."""
    from deduplicate_text_datasets_spark.sources.documents import (
        read_sharded_text,
    )

    def loader(lo, hi):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        return [f"p{pid}" for _ in range(lo, hi)]

    df = read_sharded_text(spark, 23, loader, "x://", 5)  # 5 bounds
    by_bound = {
        r["doc_id"] // 5: r["text"] for r in df.select("doc_id", "text").collect()
    }
    assert len(by_bound) == 5
    assert len(set(by_bound.values())) == 5, (
        f"shard bounds shared tasks: {by_bound}"
    )


# --- HF streaming slice loader (round-4 ADVICE medium) ----------------------


class _FakeHFStream:
    """Records skip/take and serves dict examples like an IterableDataset."""

    def __init__(self, rows, calls):
        self._rows = rows
        self._calls = calls

    def skip(self, n):
        self._calls.append(("skip", n))
        return _FakeHFStream(self._rows[n:], self._calls)

    def take(self, n):
        self._calls.append(("take", n))
        return _FakeHFStream(self._rows[:n], self._calls)

    def __iter__(self):
        return iter(self._rows)


class _FakeHFDatasets:
    def __init__(self, n=23):
        self.calls = []
        self._rows = [{"text": f"doc {i}", "junk": i} for i in range(n)]

    def load_dataset(self, name, split=None, streaming=False):
        self.calls.append(("load_dataset", name, split, streaming))
        if streaming:
            return _FakeHFStream(self._rows, self.calls)
        # slice syntax path: split like 'train[lo:hi]'
        lo, hi = split[split.index("[") + 1 : -1].split(":")
        rows = self._rows[int(lo) : int(hi)]

        class _Shard:
            column_names = ["text", "junk"]

            def __getitem__(self, key):
                return [r[key] for r in rows]

        return _Shard()


def test_hf_slice_loader_streaming_no_full_prepare():
    """streaming=True must stream + skip/take — never issue a full-split
    (or slice-syntax) prepare that downloads the whole split per node."""
    from deduplicate_text_datasets_spark.sources.documents import (
        _hf_load_slice,
    )

    fake = _FakeHFDatasets()
    out = _hf_load_slice(fake, "c4", "train", "text", True, 10, 15)
    assert out == [f"doc {i}" for i in range(10, 15)]
    assert ("load_dataset", "c4", "train", True) in fake.calls
    assert ("skip", 10) in fake.calls and ("take", 5) in fake.calls
    # no slice-syntax (prepared) load anywhere
    assert not any(
        c[0] == "load_dataset" and not c[3] for c in fake.calls
    )


def test_hf_slice_loader_prepared_path():
    from deduplicate_text_datasets_spark.sources.documents import (
        _hf_load_slice,
    )

    fake = _FakeHFDatasets()
    out = _hf_load_slice(fake, "c4", "train", "text", False, 5, 9)
    assert out == [f"doc {i}" for i in range(5, 9)]
    assert ("load_dataset", "c4", "train[5:9]", False) in fake.calls


def test_hf_streaming_sharded_e2e(spark):
    """The streaming slice loader driving the real sharded reader end to
    end. The fake module is defined INSIDE the test so cloudpickle ships
    it by value into the executor tasks (the tests module itself is not
    importable on workers)."""
    from deduplicate_text_datasets_spark.sources.documents import (
        _hf_load_slice,
        read_sharded_text,
    )

    class Stream:
        def __init__(self, rows):
            self._rows = rows

        def skip(self, n):
            return Stream(self._rows[n:])

        def take(self, n):
            return Stream(self._rows[:n])

        def __iter__(self):
            return iter(self._rows)

    class FakeDS:
        def load_dataset(self, name, split=None, streaming=False):
            assert streaming, "e2e loader must use the streaming path"
            return Stream([{"text": f"doc {i}"} for i in range(23)])

    def loader(lo, hi):
        return _hf_load_slice(FakeDS(), "c4", "train", "text", True, lo, hi)

    df = read_sharded_text(spark, 23, loader, "hf://c4/train/", 5)
    rows = df.orderBy("doc_id").collect()
    assert [r["text"] for r in rows] == [f"doc {i}" for i in range(23)]
    assert rows[4]["url"] == "hf://c4/train/4"


# --- TFDS sharded loader (round-4 verdict item 6) ----------------------------


class _FakeTFDS:
    """tfds.load / tfds.as_numpy / tfds.builder stand-in; examples carry
    bytes text like real TFDS text features."""

    def __init__(self, n=17):
        self.calls = []
        self._rows = [{"text": f"wiki {i}".encode()} for i in range(n)]
        n_total = n

        class _Split:
            num_examples = n_total

        class _Info:
            splits = {"train": _Split()}

        class _Builder:
            info = _Info()

        self._builder = _Builder()

    def builder(self, name):
        self.calls.append(("builder", name))
        return self._builder

    def load(self, name, split=None):
        self.calls.append(("load", name, split))
        lo, hi = split[split.index("[") + 1 : -1].split(":")
        return self._rows[int(lo) : int(hi)]

    def as_numpy(self, ds):
        return iter(ds)


def test_tfds_load_slice():
    from deduplicate_text_datasets_spark.sources.documents import (
        _tfds_load_slice,
    )

    fake = _FakeTFDS()
    out = _tfds_load_slice(fake, "wiki40b", "train", "text", 3, 8)
    assert out == [f"wiki {i}" for i in range(3, 8)]  # bytes decoded
    assert ("load", "wiki40b", "train[3:8]") in fake.calls


def test_tfds_sharded_e2e(spark, monkeypatch):
    """read_tfds_dataset with a fake tensorflow_datasets module: driver
    reads split metadata only; executors load [lo:hi] sub-splits through
    the real sharded plumbing (the loader closure re-imports the module,
    so the monkeypatched sys.modules entry must be picklable — we inject
    via the module-level slice function instead, same pattern as HF)."""
    from deduplicate_text_datasets_spark.sources.documents import (
        _tfds_load_slice,
        read_sharded_text,
    )

    class FakeTFDS:
        def load(self, name, split=None):
            lo, hi = split[split.index("[") + 1 : -1].split(":")
            return [
                {"text": f"wiki {i}".encode()}
                for i in range(int(lo), int(hi))
            ]

        def as_numpy(self, ds):
            return iter(ds)

    def loader(lo, hi):
        return _tfds_load_slice(FakeTFDS(), "wiki40b", "train", "text", lo, hi)

    df = read_sharded_text(spark, 17, loader, "tfds://wiki40b/train/", 4)
    rows = df.orderBy("doc_id").collect()
    assert [r["text"] for r in rows] == [f"wiki {i}" for i in range(17)]
    assert rows[0]["url"] == "tfds://wiki40b/train/0"


def test_tfds_metadata_and_raise(monkeypatch):
    """Driver half of read_tfds_dataset: metadata-only sizing + clean raise
    without the package."""
    import sys

    from deduplicate_text_datasets_spark.sources import documents as docs_mod

    # without the package: clean NotImplementedError naming alternatives
    monkeypatch.setitem(sys.modules, "tensorflow_datasets", None)
    with pytest.raises((NotImplementedError, ImportError)):
        docs_mod.read_tfds_dataset(None, "wiki40b")

    # with a fake package: unknown split surfaces the available ones
    monkeypatch.setitem(sys.modules, "tensorflow_datasets", _FakeTFDS())
    with pytest.raises(ValueError, match="splits"):
        docs_mod.read_tfds_dataset(None, "wiki40b", split="validation")


# --- pure-Python xxh64 oracle (round-4 verdict item 4 groundwork) ------------


def test_xxh64_matches_spark(spark):
    """oracle.xxh64 must reproduce Spark's xxhash64 bit-for-bit for the
    shapes the gate queries hash: strings (token hashes) and array<long>
    (shingle hash-of-slice) — else the golden sidecars are garbage."""
    import random

    from deduplicate_text_datasets_spark.oracle.xxh64 import (
        xxhash64_long_array,
        xxhash64_str,
    )

    rng = random.Random(7)
    strs = [
        "", "a", "hello", "Hello World!", "x" * 7, "y" * 8, "z" * 31,
        "w" * 32, "long " * 20, "unicode é中文 mix",
    ] + ["".join(rng.choices("abcdef 0123", k=rng.randint(0, 90))) for _ in range(30)]
    arrs = [[], [0], [1, 2, 3], [-1, -(1 << 63), (1 << 63) - 1]] + [
        [rng.randint(-(1 << 63), (1 << 63) - 1) for _ in range(rng.randint(1, 12))]
        for _ in range(20)
    ]

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strs)], "i long, s string"
    ).select("i", F.xxhash64("s").alias("h"))
    got = {r["i"]: r["h"] for r in df.collect()}
    for i, s in enumerate(strs):
        assert got[i] == xxhash64_str(s), f"string mismatch: {s!r}"

    df2 = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrs)], "i long, a array<long>"
    ).select("i", F.xxhash64("a").alias("h"))
    got2 = {r["i"]: r["h"] for r in df2.collect()}
    for i, a in enumerate(arrs):
        assert got2[i] == xxhash64_long_array(a), f"array mismatch: {a!r}"


# --- expected-result generators vs the engine (verdict item 4) --------------


def test_expected_minhash_matches_engine(spark, docs):
    from deduplicate_text_datasets_spark.config import MinHashConfig
    from deduplicate_text_datasets_spark.operators.minhash import (
        doc_shingles,
        minhash_signatures,
    )
    from deduplicate_text_datasets_spark.oracle.expected import (
        minhash_signatures_expected,
    )

    cfg = MinHashConfig()
    got = sorted(
        (r["doc_id"], r["perm"], r["sig_value"])
        for r in minhash_signatures(doc_shingles(docs, cfg), cfg)
        .select("doc_id", F.posexplode("sig").alias("perm", "sig_value"))
        .collect()
    )
    pdf = docs.select("doc_id", "text").toPandas()
    want = sorted(
        map(tuple, minhash_signatures_expected(pdf, cfg).itertuples(index=False))
    )
    assert got == want


def test_expected_simhash_pairs_matches_engine(spark, docs):
    from deduplicate_text_datasets_spark.config import SimHashConfig
    from deduplicate_text_datasets_spark.operators.simhash import simhash_pairs
    from deduplicate_text_datasets_spark.oracle.expected import (
        simhash_pairs_expected,
    )

    cfg = SimHashConfig()
    got = sorted(
        (r["a"], r["b"], r["hamming"])
        for r in simhash_pairs(docs, cfg).collect()
    )
    pdf = docs.select("doc_id", "text").toPandas()
    want = sorted(
        map(tuple, simhash_pairs_expected(pdf, cfg).itertuples(index=False))
    )
    assert got == want


def test_expected_tokenized_matches_engine(spark, docs):
    from deduplicate_text_datasets_spark.config import (
        EngineConfig,
        ExactSubstrConfig,
    )
    from deduplicate_text_datasets_spark.functions.text import (
        tokenized_documents,
    )
    from deduplicate_text_datasets_spark.operators.suffix import self_similar
    from deduplicate_text_datasets_spark.plans.pipeline import (
        exactsubstr_dedup,
    )
    from deduplicate_text_datasets_spark.oracle.expected import (
        tokenized_deduped_expected,
        tokenized_self_similar_expected,
    )

    cfg = ExactSubstrConfig(
        length_threshold=40, shard_bytes=2048, overlap_bytes=512,
        with_separators=True,
    )
    pdf = docs.select("doc_id", "text").toPandas()
    tok = tokenized_documents(docs)

    got_ss = sorted(
        (r["pos"], r["cluster_id"], r["cluster_size"])
        for r in self_similar(tok, cfg).collect()
    )
    want_ss = sorted(
        map(
            tuple,
            tokenized_self_similar_expected(pdf, 40).itertuples(index=False),
        )
    )
    assert got_ss == want_ss
    spark.catalog.clearCache()

    _, deduped = exactsubstr_dedup(tok, EngineConfig(exact=cfg))
    got_dd = sorted(
        (r["doc_id"], r["sha"], r["n"])
        for r in deduped.select(
            "doc_id",
            F.sha2("deduped", 256).alias("sha"),
            F.octet_length("deduped").cast("long").alias("n"),
        ).collect()
    )
    want_dd = sorted(
        map(tuple, tokenized_deduped_expected(pdf, 40).itertuples(index=False))
    )
    assert got_dd == want_dd
    spark.catalog.clearCache()


# --- multimodal: injected decoder (round-4 verdict item 7) -------------------


@pytest.fixture(scope="module")
def media(spark):
    import pandas as pd

    from deduplicate_text_datasets_spark.operators.multimodal import (
        MEDIA_SCHEMA,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "media_type": ["image", "image", "audio"],
            "payload": [bytes([i] * (32 + i)) for i in range(3)],
            "meta": [{"w": "8"}, {"w": "8"}, {"sr": "16k"}],
        }
    )
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)


def test_extract_features_injected_decoder(media):
    """A caller-supplied decoder callable rides the seam into the Arrow
    kernel — environments with PIL/ffmpeg get the real path with no code
    edits (round-4 verdict item 7)."""
    from deduplicate_text_datasets_spark.operators.multimodal import (
        extract_features,
    )

    def my_decoder(payload, media_type, dim):
        v = np.zeros(dim)
        v[0] = len(payload)
        v[1] = 1.0 if media_type == "audio" else 0.0
        return v

    rows = {
        r["doc_id"]: r
        for r in extract_features(media, dim=4, decoder=my_decoder).collect()
    }
    assert rows[0]["feature"][0] == 32.0
    assert rows[2]["feature"][1] == 1.0  # audio flag
    assert rows[1]["n_bytes"] == 33


def test_extract_features_decoder_validation(media):
    from deduplicate_text_datasets_spark.operators.multimodal import (
        extract_features,
    )

    with pytest.raises(ValueError, match="decoder"):
        extract_features(media, decoder="ffmpeg")

    def bad_shape(payload, media_type, dim):
        return np.zeros(dim + 1)

    with pytest.raises(Exception, match="shape"):
        extract_features(media, dim=4, decoder=bad_shape).collect()


def test_extract_features_pil_decoder(media):
    """Real-decoder smoke: only runs where PIL exists (not this container)."""
    PIL_Image = pytest.importorskip("PIL.Image")

    from deduplicate_text_datasets_spark.operators.multimodal import (
        extract_features,
    )

    def pil_decoder(payload, media_type, dim):
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).convert("L").resize((dim, 1))
        return np.asarray(img, dtype=np.float64).ravel() / 255.0

    # would need real image payloads; presence of PIL is the gate
    assert PIL_Image is not None


# --- across_dedup small-side key prefilter (round-5) -------------------------


def _across_sides(spark):
    """Asymmetric split of a fresh fixture: even doc_ids -> A (bigger, gets
    the straddle docs), odd -> B. Exact-dup roles (k-1, k) with k odd give
    cross-side contamination at L=50 once docs are >= ~60 bytes."""
    pdf = synth_documents_pandas(40, size_lo=60, size_hi=200)
    docs = spark.createDataFrame(pdf, schema=DOCUMENTS_SCHEMA)
    return docs.filter(F.col("doc_id") % 2 == 0), docs.filter(
        F.col("doc_id") % 2 == 1
    )


def _across_key(res):
    """Order-free signature of all six result frames."""
    return (
        sorted(r["pos"] for r in res.dups_a.collect()),
        sorted(tuple(r) for r in res.ranges_a.collect()),
        sorted((r["doc_id"], bytes(r["deduped"])) for r in res.deduped_a.collect()),
        sorted(r["pos"] for r in res.dups_b.collect()),
        sorted(tuple(r) for r in res.ranges_b.collect()),
        sorted((r["doc_id"], bytes(r["deduped"])) for r in res.deduped_b.collect()),
    )


def test_across_dedup_prefilter_parity(spark):
    """prefilter mode must be bit-identical to the default plan on all six
    output frames, and the guard-exceeded fallback must warn and match."""
    from deduplicate_text_datasets_spark.config import EngineConfig
    from deduplicate_text_datasets_spark.plans.pipeline import across_dedup

    cfg = EngineConfig(exact=SS_CFG)
    docs_a, docs_b = _across_sides(spark)
    base = _across_key(across_dedup(docs_a, docs_b, cfg))
    assert base[0] and base[3], "fixture must contaminate both sides"
    spark.catalog.clearCache()
    pre = _across_key(across_dedup(docs_a, docs_b, cfg, prefilter=True))
    assert pre == base
    spark.catalog.clearCache()
    with pytest.warns(UserWarning, match="key set"):
        fb = across_dedup(
            docs_a, docs_b, cfg, prefilter=True, prefilter_max_keys=1,
            prefilter_sketch="set",
        )
        fb_key = _across_key(fb)
    assert fb_key == base
    spark.catalog.clearCache()


def test_across_prefilter_big_side_ships_only_candidates(spark):
    """Pass 2 on the big side must emit EXACTLY the positions whose h1
    occurs in the small side's key set — the cross-corpus analogue of the
    self_similar prefilter invariant."""
    from deduplicate_text_datasets_spark.operators.suffix import (
        window_fingerprints,
        window_keys,
    )

    docs_a, docs_b = _across_sides(spark)
    keys_b = np.sort(
        window_keys(docs_b, SS_CFG)
        .distinct()
        .toPandas()["k"]
        .to_numpy(np.int64)
    )
    fp_a_full = window_fingerprints(docs_a, SS_CFG).cache()
    expected = (
        fp_a_full.filter(
            F.col("h1").isin([int(k) for k in keys_b])
        ).count()
    )
    bc = spark.sparkContext.broadcast(keys_b)
    n_pre = window_fingerprints(docs_a, SS_CFG, dup_keys_bc=bc).count()
    assert n_pre == expected
    assert 0 < n_pre < fp_a_full.count()
    fp_a_full.unpersist()
    spark.catalog.clearCache()


# --- chunked kernel emit (stress-scale OOM fix) ------------------------------


def test_fp_kernel_chunked_emit_parity(spark, docs):
    """The iterator-form kernels must produce the identical frame at any
    emit-batch size (the classic single-batch-per-group path allocated
    ~1.5 GiB of JVM direct memory per 64 MiB shard — measured OOM in the
    stress run). Forcing 64-row slices exercises many batches per shard."""
    from deduplicate_text_datasets_spark.operators.suffix import (
        _emit_chunks,
        window_fingerprints,
        window_keys,
    )

    base = sorted(
        tuple(r) for r in window_fingerprints(docs, SS_CFG).collect()
    )
    tiny = sorted(
        tuple(r)
        for r in window_fingerprints(docs, SS_CFG, emit_rows=64).collect()
    )
    assert tiny == base and len(base) > 64
    kb = sorted(r["k"] for r in window_keys(docs, SS_CFG).collect())
    kt = sorted(
        r["k"] for r in window_keys(docs, SS_CFG, emit_rows=64).collect()
    )
    assert kt == kb
    spark.catalog.clearCache()

    import pandas as pd

    pdf = pd.DataFrame({"x": range(10)})
    chunks = list(_emit_chunks(pdf, 3))
    assert [len(c) for c in chunks] == [3, 3, 3, 1]
    assert pd.concat(chunks).equals(pdf)


# --- Salted exact pair generation for skewed LSH buckets --------------------
# north_rule: "explicit salting of skewed LSH buckets". Buckets in
# (max_bucket_size, salted_bucket_max] now pair through the grid-salted
# exact self-join instead of being dropped; only buckets beyond
# salted_bucket_max are dropped.


def _bucket_frame(spark, sizes: dict[str, int]):
    """(doc_id, band, bucket) with disjoint doc_id blocks per bucket."""
    rows, base = [], 0
    for i, (name, n) in enumerate(sorted(sizes.items())):
        rows += [(base + j, 0, hash(name) % 10**9) for j in range(n)]
        base += n
    return (
        spark.createDataFrame(rows, "doc_id long, band int, bucket long"),
        sizes,
    )


def _expected_pairs(spark_buckets, lo_keep, hi_keep):
    """Ground-truth all-pairs per bucket with lo_keep <= size <= hi_keep."""
    from collections import defaultdict
    from itertools import combinations

    members = defaultdict(list)
    for r in spark_buckets.collect():
        members[(r["band"], r["bucket"])].append(r["doc_id"])
    out = set()
    for mem in members.values():
        if lo_keep <= len(mem) <= hi_keep:
            out |= {tuple(sorted(p)) for p in combinations(mem, 2)}
    return out


def test_salted_pairs_exact_and_dropped_cap(spark):
    """candidate_pairs must emit EXACTLY the all-pairs set for every bucket
    up to salted_bucket_max (salted ones included, each pair once) and
    nothing from buckets beyond it."""
    from deduplicate_text_datasets_spark.config import MinHashConfig
    from deduplicate_text_datasets_spark.operators.minhash import (
        candidate_pairs,
        oversized_buckets,
    )
    from deduplicate_text_datasets_spark.plans.caching import cache_scope

    cfg = MinHashConfig(max_bucket_size=16, salted_bucket_max=80)
    buckets, sizes = _bucket_frame(
        spark,
        {"plain": 9, "salted_a": 17, "salted_b": 50, "salted_c": 80,
         "dropped": 81, "pair": 2, "single": 1},
    )
    with cache_scope():
        got = {
            (r["a"], r["b"]) for r in candidate_pairs(buckets, cfg).collect()
        }
    assert got == _expected_pairs(buckets, 2, 80)
    acts = {
        (r["size"], r["action"]) for r in oversized_buckets(buckets, cfg).collect()
    }
    assert acts == {(17, "salted"), (50, "salted"), (80, "salted"),
                    (81, "dropped")}


def test_salted_pairs_match_unsalted_reference(spark):
    """Forcing the salted path for EVERY bucket (cap=2) must reproduce the
    plain path's pair set bit-for-bit on a real shingle->LSH frame — the
    grid decomposition is a physical re-distribution, not a semantics
    change."""
    from deduplicate_text_datasets_spark.config import MinHashConfig
    from deduplicate_text_datasets_spark.operators.minhash import (
        candidate_pairs,
        doc_shingles,
        lsh_buckets,
        minhash_signatures,
    )
    from deduplicate_text_datasets_spark.plans.caching import cache_scope
    from deduplicate_text_datasets_spark.sources.documents import (
        DOCUMENTS_SCHEMA,
        synth_documents_pandas,
    )

    docs = spark.createDataFrame(
        synth_documents_pandas(60, size_lo=40, size_hi=160),
        schema=DOCUMENTS_SCHEMA,
    )
    plain_cfg = MinHashConfig()  # default cap: nothing salted at this scale
    buckets = lsh_buckets(
        minhash_signatures(doc_shingles(docs, plain_cfg), plain_cfg), plain_cfg
    ).cache()
    salted_cfg = MinHashConfig(max_bucket_size=2, salted_bucket_max=10**6)
    with cache_scope():
        base = {
            (r["a"], r["b"])
            for r in candidate_pairs(buckets, plain_cfg).collect()
        }
    with cache_scope():
        salted = {
            (r["a"], r["b"])
            for r in candidate_pairs(buckets, salted_cfg).collect()
        }
    assert len(base) > 0 and salted == base
    buckets.unpersist()


def test_salted_grid_replication_factor(spark):
    """Each member of a salted bucket is replicated exactly k+1 times
    across the two role frames (k left-cells + g+1 right-cells with the
    diagonal shared): the exchange cost of salting is linear in k, not
    quadratic."""
    from deduplicate_text_datasets_spark.config import MinHashConfig
    from deduplicate_text_datasets_spark.operators.minhash import _salted_pairs
    from pyspark.sql import functions as F

    cfg = MinHashConfig(max_bucket_size=16, salted_bucket_max=1000)
    buckets, _ = _bucket_frame(spark, {"hot": 100})
    hot = buckets.withColumn("bsize", F.lit(100))
    # k = ceil(100/16) = 7 -> lhs rows (k - g per member) + rhs (g + 1)
    # = k + 1 = 8 rows per member, 800 total tagged rows
    g = hot.withColumn("k", F.ceil(F.col("bsize") / F.lit(16)).cast("int"))
    assert g.select(F.max("k")).first()[0] == 7
    pairs = _salted_pairs(hot, cfg)
    assert pairs.count() == 100 * 99 // 2  # exact, duplicate-free
    assert pairs.distinct().count() == 100 * 99 // 2


def test_simhash_salted_candidates_parity(spark):
    """Forcing the salted path for every SimHash block bucket (cap=2) must
    reproduce the plain path's (a, b, hamming) set — payload fingerprints
    swap together with the ids during order normalization."""
    from deduplicate_text_datasets_spark.config import SimHashConfig
    from deduplicate_text_datasets_spark.operators.simhash import (
        simhash_candidates,
        simhash_fingerprints,
    )
    from deduplicate_text_datasets_spark.plans.caching import cache_scope
    from deduplicate_text_datasets_spark.sources.documents import (
        DOCUMENTS_SCHEMA,
        synth_documents_pandas,
    )

    docs = spark.createDataFrame(
        synth_documents_pandas(50, size_lo=40, size_hi=160),
        schema=DOCUMENTS_SCHEMA,
    )
    cfg = SimHashConfig()
    fps = simhash_fingerprints(docs).cache()
    with cache_scope():
        base = sorted(
            tuple(r)
            for r in simhash_candidates(fps, cfg, max_bucket_size=5000)
            .collect()
        )
    with cache_scope():
        salted = sorted(
            tuple(r)
            for r in simhash_candidates(
                fps, cfg, max_bucket_size=2, salted_bucket_max=10**6
            ).collect()
        )
    assert len(base) > 0 and salted == base
    fps.unpersist()


def test_ngram_salted_hot_shingles_keep_counts_exact(spark):
    """Hot shingles above the fast-path df cap must still contribute to
    intersection counts through the salted join: tiny cap + huge salted
    ceiling == fully uncapped truth, while the OLD drop policy (salted
    ceiling == cap) demonstrably loses pairs on a dup-heavy fixture."""
    from deduplicate_text_datasets_spark.config import MinHashConfig
    from deduplicate_text_datasets_spark.operators.ngram import jaccard_pairs
    from deduplicate_text_datasets_spark.plans.caching import cache_scope
    from deduplicate_text_datasets_spark.sources.documents import (
        DOCUMENTS_SCHEMA,
        synth_documents_pandas,
    )

    import pandas as pd

    pdf = synth_documents_pandas(60, size_lo=40, size_hi=160)
    # plant an identical TRIPLET: its shared shingles have df=3, so a
    # df<=2 drop policy erases the triplet's intersections entirely while
    # the salted policy must keep them exact
    trip = pd.concat(
        [pdf.iloc[[0]].assign(doc_id=1000 + i) for i in range(3)],
        ignore_index=True,
    )
    docs = spark.createDataFrame(
        pd.concat([pdf, trip], ignore_index=True), schema=DOCUMENTS_SCHEMA
    )
    cfg = MinHashConfig()

    def rows(**kw):
        with cache_scope():
            return sorted(
                tuple(r) for r in jaccard_pairs(docs, cfg, **kw).collect()
            )

    full = rows(max_shingle_df=2**31)
    salted = rows(max_shingle_df=2, salted_shingle_df=2**31)
    dropped = rows(max_shingle_df=2, salted_shingle_df=2)
    assert len(full) > 0 and salted == full
    assert dropped != full  # the old drop policy undercounts here


def test_neardup_across_matches_bipartite_truth(spark):
    """Cross-corpus near-dup pairs (even=train, odd=eval) must equal the
    exact all-pairs truth restricted to cross-parity pairs, contain no
    same-side pair, and be invariant under forcing the bipartite salted
    grid (cap=2)."""
    from deduplicate_text_datasets_spark.config import MinHashConfig
    from deduplicate_text_datasets_spark.operators.minhash import (
        near_duplicate_edges_across,
    )
    from deduplicate_text_datasets_spark.operators.ngram import jaccard_pairs
    from deduplicate_text_datasets_spark.plans.caching import cache_scope
    from deduplicate_text_datasets_spark.sources.documents import (
        DOCUMENTS_SCHEMA,
        synth_documents_pandas,
    )

    docs = spark.createDataFrame(
        synth_documents_pandas(80, size_lo=40, size_hi=160),
        schema=DOCUMENTS_SCHEMA,
    )
    docs.cache().count()
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    cfg = MinHashConfig()
    with cache_scope():
        truth_cross = {
            (r["a"], r["b"]) if r["a"] % 2 == 0 else (r["b"], r["a"])
            for r in jaccard_pairs(
                docs, cfg, max_shingle_df=2**31
            ).collect()
            if r["a"] % 2 != r["b"] % 2
        }
    with cache_scope():
        got = {
            (r["a"], r["b"])
            for r in near_duplicate_edges_across(a, b, cfg).collect()
        }
    assert len(truth_cross) > 0 and got == truth_cross
    assert all(x % 2 == 0 and y % 2 == 1 for x, y in got)
    with cache_scope():
        salted = {
            (r["a"], r["b"])
            for r in near_duplicate_edges_across(
                a, b, MinHashConfig(max_bucket_size=2, salted_bucket_max=10**6)
            ).collect()
        }
    assert salted == got
    docs.unpersist()


def test_scaling_adaptive_extra_rounds(monkeypatch):
    """run_scaling keeps adding fully-gated rounds (bounded) while the
    in-band min-wall efficiency sits below the 0.8 north-rule target, and
    stops the moment the target is met. Legs are mocked — this pins the
    protocol, not the host."""
    import importlib.util
    import json as _json
    import subprocess
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "bench_for_test",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    monkeypatch.setattr(_sys, "argv", ["bench.py"])
    spec.loader.exec_module(bench)
    monkeypatch.setenv("SPARK_GRAFT_CONTROL_GATE", "")  # rounds all in-band
    monkeypatch.setenv("SPARK_GRAFT_SCALING_EXTRA_ROUNDS", "2")

    # planned rounds read (50,20) twice -> eff 0.625 < 0.8 -> one extra
    # round improves the local8 floor to 15 s -> eff 0.833 -> stop with
    # one extra budget unit unspent.
    walls = {2: [50.0, 50.0, 70.0, 66.0], 8: [20.0, 20.0, 15.0, 15.0]}
    idx = {2: 0, 8: 0}

    def fake_run(cmd, **kw):
        cores, n = int(cmd[-2]), int(cmd[-1])
        w = walls[cores][idx[cores]]
        idx[cores] += 1

        class R:
            returncode = 0
            stderr = ""
            stdout = _json.dumps(
                {"docs": n, "wall_sec": w, "docs_per_sec": n / w,
                 "shard_bytes": 1}
            )

        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = bench.run_scaling("/root/testdata/sf0.1", n_docs=10, rounds=2)
    assert len(out["rounds"]) == 3
    assert out["efficiency"] == 0.833
    assert out["efficiency_from_in_band_rounds"] is True

    # already-at-target path: no extra rounds fire
    walls2 = {2: [80.0, 80.0], 8: [22.0, 22.0]}  # eff 0.909
    idx.update({2: 0, 8: 0})
    walls.update(walls2)
    out2 = bench.run_scaling("/root/testdata/sf0.1", n_docs=10, rounds=2)
    assert len(out2["rounds"]) == 2
    assert out2["efficiency"] >= 0.8


def test_scaling_per_leg_flank_gating(monkeypatch):
    """Per-leg width-matched flank controls (2026-08-19 protocol fix):
    a leg whose flanking spins read slow against the session's best spin
    at that width is excluded, while the OTHER level's healthy leg in the
    same round survives — the measured failure of round-coupled gating
    was discarding a healthy 57.8 s 8-core leg because the 2-core side's
    window was noisy, then keeping a poisoned 101.4 s one whose episode
    fit between the round's edge controls."""
    import importlib.util
    import json as _json
    import subprocess
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "bench_for_test2",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    monkeypatch.setattr(_sys, "argv", ["bench.py"])
    spec.loader.exec_module(bench)
    monkeypatch.setenv("SPARK_GRAFT_CONTROL_GATE", "1")
    monkeypatch.setenv("SPARK_GRAFT_SCALING_EXTRA_ROUNDS", "0")

    # round 0: healthy 2-core leg, 8-core leg in a degraded window
    # (post-flank 6.0 s vs best 3.7); round 1: the mirror image.
    walls = {2: [100.0, 140.0], 8: [60.0, 31.0]}
    # flank calls arrive in strict order: pre2 post2 pre8 post8, per round
    spin_seq = [3.7, 3.7, 3.7, 6.0, 5.5, 5.5, 3.8, 3.7]
    idx = {2: 0, 8: 0}

    def fake_spin(procs):
        return spin_seq.pop(0)

    def fake_run(cmd, **kw):
        cores, n = int(cmd[-2]), int(cmd[-1])
        w = walls[cores][idx[cores]]
        idx[cores] += 1

        class R:
            returncode = 0
            stderr = ""
            stdout = _json.dumps(
                {"docs": n, "wall_sec": w, "docs_per_sec": n / w,
                 "shard_bytes": 1}
            )

        return R()

    monkeypatch.setattr(bench, "leg_spin_wall", fake_spin)
    # the informational session pre-gate spawns a real mp.Pool, which
    # cannot pickle _spin out of this exec'd test module — stub it
    monkeypatch.setattr(
        bench,
        "control_gate",
        lambda *a, **kw: {"levels": [2, 8], "band": [0.85, 1.15],
                         "attempts": [1.0], "in_band": True, "control": {}},
    )
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    out = bench.run_scaling("/root/testdata/sf0.1", n_docs=10, rounds=2)

    # best spin 3.7, band 1.15 -> threshold 4.255: in-band legs are
    # round-0 local2 (100 s) and round-1 local8 (31 s)
    assert out["rounds"][0]["legs"]["local2"]["in_band"] is True
    assert out["rounds"][0]["legs"]["local8"]["in_band"] is False
    assert out["rounds"][1]["legs"]["local2"]["in_band"] is False
    assert out["rounds"][1]["legs"]["local8"]["in_band"] is True
    assert out["rounds"][0]["in_band"] is False  # round = all its legs
    assert out["efficiency_from_in_band_rounds"] is True
    assert out["efficiency"] == round((100.0 / 31.0) / 4, 3)
    assert out["best_spin_sec"] == {"local2": 3.7, "local8": 3.75}
    assert 0 < out["efficiency_vs_control"] <= 1.5


# --- duplicate-window census (paper's most-duplicated-substrings table) -----


def test_duplicate_window_census_vs_bruteforce(spark):
    """Census vs a driver-side brute count over the flat concatenation,
    with a planted high-frequency snippet and a duplicate window that
    straddles a document boundary (byte semantics, like the reference's
    raw corpus reads)."""
    import pandas as pd

    from deduplicate_text_datasets_spark.operators.suffix import (
        duplicate_window_census,
    )

    L = 16
    boiler = "x" * 7 + "BOILERPLATE OK " + "y" * 10  # > L, repeated often
    texts = []
    for i in range(12):
        texts.append(f"doc {i:03d} unique words " + boiler + f" tail {i}")
    # straddle: the end of doc 12 + start of doc 13 repeats the end of
    # doc 14 + start of doc 15 (windows cross doc boundaries in the flat
    # corpus, so these must count as duplicates)
    texts += ["AAA straddle-head", "straddle-tail BBB"] * 2
    import datetime

    n = len(texts)
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "url": [f"http://h/{i}" for i in range(n)],
            "warc_ts": [datetime.datetime(2024, 1, 1)] * n,
            "html": [b""] * n,
            "text": texts,
            "lang": ["en"] * n,
        }
    )
    docs = spark.createDataFrame(pdf, schema=DOCUMENTS_SCHEMA)
    cfg = ExactSubstrConfig(
        length_threshold=L, shard_bytes=256, overlap_bytes=64,
        with_separators=False,
    )
    k = 8
    got = {
        r["snippet"]: (r["cnt"], r["first_pos"])
        for r in duplicate_window_census(docs, cfg, k=k).collect()
    }

    corpus = "".join(texts)
    counts: dict[str, list] = {}
    for i in range(len(corpus) - L + 1):
        w = corpus[i : i + L]
        counts.setdefault(w, [0, i])[0] += 1
    dup = {w: (c, p) for w, (c, p) in counts.items() if c >= 2}
    want = dict(
        sorted(dup.items(), key=lambda kv: (-kv[1][0], kv[1][1]))[:k]
    )
    assert got == want
    # the straddling window is in the dup set (sanity that the fixture
    # exercises the cross-document case at all)
    assert any("headstraddle" in w.replace("-", "") or
               ("head" in w and "tail" in w) for w in dup), dup


# --- mappass dedup pass (round-5: drop the stats agg + join-back) ------------


def test_mappass_parity_with_agg_plan(spark, docs):
    """find_duplicates_mappass must be a pure physical-plan choice: output
    identical to the agg+join-back plan, including frequency_threshold
    semantics (size > threshold, main.rs:914)."""
    from deduplicate_text_datasets_spark.operators.suffix import self_similar

    spark.catalog.clearCache()
    base = sorted(
        tuple(r)
        for r in self_similar(docs, SS_CFG, dedup_pass="agg").collect()
    )
    assert len(base) > 0
    spark.catalog.clearCache()
    got = sorted(
        tuple(r)
        for r in self_similar(docs, SS_CFG, dedup_pass="mappass").collect()
    )
    assert got == base
    spark.catalog.clearCache()

    # frequency threshold: keep only clusters strictly larger than it
    sizes = sorted({r[2] for r in base})
    thr = sizes[0]  # drops at least the smallest cluster size
    cfg_t = ExactSubstrConfig(
        length_threshold=SS_CFG.length_threshold,
        frequency_threshold=thr,
        shard_bytes=SS_CFG.shard_bytes,
        overlap_bytes=SS_CFG.overlap_bytes,
        with_separators=SS_CFG.with_separators,
    )
    want_t = [t for t in base if t[2] > thr]
    got_t = sorted(
        tuple(r)
        for r in self_similar(docs, cfg_t, dedup_pass="mappass").collect()
    )
    assert got_t == want_t and len(got_t) < len(base)
    spark.catalog.clearCache()


def test_mappass_group_straddles_arrow_batches(spark, docs):
    """Force 3-row Arrow batches so every real cluster straddles batch
    boundaries inside the kernel — the pending-group reassembly must keep
    output exact; and with prefilter composed on top."""
    from deduplicate_text_datasets_spark.operators.suffix import self_similar

    spark.catalog.clearCache()
    base = sorted(
        tuple(r)
        for r in self_similar(docs, SS_CFG, dedup_pass="agg").collect()
    )
    assert any(t[2] > 3 for t in base), "fixture needs a >3-member cluster"
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "3")
    try:
        spark.catalog.clearCache()
        got = sorted(
            tuple(r)
            for r in self_similar(docs, SS_CFG, dedup_pass="mappass").collect()
        )
        assert got == base
        spark.catalog.clearCache()
        pre = sorted(
            tuple(r)
            for r in self_similar(
                docs, SS_CFG, dedup_pass="mappass", prefilter=True
            ).collect()
        )
        assert pre == base
    finally:
        spark.conf.set(key, old)
        spark.catalog.clearCache()


def test_mappass_plan_has_no_join_or_agg(spark, docs):
    """The mappass physical plan over the fingerprint frame is exchange ->
    sort -> MapInPandas: no join, no hash aggregate, no second consumer."""
    from deduplicate_text_datasets_spark.operators.suffix import (
        find_duplicates_mappass,
        window_fingerprints,
    )
    from deduplicate_text_datasets_spark.sources.corpus import with_offsets

    d = with_offsets(docs, True).cache()
    d.count()
    fp = window_fingerprints(d, SS_CFG)
    out = find_duplicates_mappass(fp, SS_CFG)
    n = out.count()
    assert n > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the cached offsets frame dumps its own BUILD plan (joins, window)
    # under InMemoryRelation — the mappass plan ends at the cache scan
    plan = plan.split("InMemoryRelation")[0]
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                "HashAggregate", "ObjectHashAggregate", "SortAggregate"):
        assert bad not in plan, f"{bad} in mappass plan:\n{plan[:2000]}"
    assert "MapInPandas" in plan
    d.unpersist()
    spark.catalog.clearCache()
