"""Engine-independent expected results for the hash-vocabulary gate queries.

TEST/ORACLE-ONLY. DuckDB cannot express xxhash64, so the four gate queries
built on it (`minhash_signatures`, `simhash_pairs`,
`tokenized_self_similar`, `tokenized_deduped_docs`) were rows-only until
round 4. This module computes their expected outputs from the raw
documents table using ONLY:

* oracle.xxh64 — pure-Python xxHash64 (public algorithm, Spark framing,
  parity pytest-pinned),
* oracle.pyref — the cited naive reference semantics (dict window
  grouping, collect_ranges fold, right-to-left strike),
* Python re / hashlib / numpy — no Spark, no engine operators.

scripts/make_expected.py materializes these as `expected_*.parquet`
sidecars per sf dir; __spark_entry__.oracle_sql() then reads them with a
plain DuckDB SELECT, which closes the four `no_oracle` gate rows
(round-4 verdict item 4). Definitions mirrored (cited where they bind):

* tokens:      functions/text.py TOKEN_SPLIT_RE (lower + [^a-z0-9]+ split)
* shingles:    operators/minhash.doc_shingles — xxhash64 of the w-long
               token-hash slice; whole-array hash for short docs; distinct
* signatures:  (a_j * (h & 0x7FFFFFFF) + b_j) mod (2^31-1), min per doc
* simhash:     bit j set iff 2*ones >= n_tokens (operators/simhash kernel)
* pairs:       all a < b with popcount(fa^fb) <= k (complete: blocking is
               pigeonhole-complete and no sf bucket nears the size cap)
* token ids:   pmod(xxhash64(bpe_token), 65536), packed '<u2'
               (functions/text.token_ids_u16 / tokenize_corpus; reference
               layout scripts/load_dataset.py:63-69)
* self-similar / strike: oracle.pyref (reference main.rs:807-960,
               finish_dedup_wiki40b.py:141-161)
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd

from . import pyref
from .xxh64 import xxhash64_long_array, xxhash64_str

TOKEN_SPLIT_RE = re.compile(r"[^a-z0-9]+")
BPE_ISH_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"
)
MERSENNE31 = (1 << 31) - 1
U64 = (1 << 64) - 1


def tokens(text: str) -> list[str]:
    return [t for t in TOKEN_SPLIT_RE.split(text.lower()) if t]


def bpe_tokens(text: str) -> list[str]:
    return [t for t in BPE_ISH_RE.findall(text) if t]


def shingle_set(text: str, w: int) -> set[int] | None:
    """Distinct shingle hashes per doc_shingles; None = excluded (no
    tokens)."""
    th = [xxhash64_str(t) for t in tokens(text)]
    if not th:
        return None
    if len(th) >= w:
        return {xxhash64_long_array(th[i : i + w]) for i in range(len(th) - w + 1)}
    return {xxhash64_long_array(th)}


def minhash_signatures_expected(docs: pd.DataFrame, cfg) -> pd.DataFrame:
    """(doc_id, perm, sig_value) — the gate query's posexploded shape."""
    from ..operators.minhash import permutation_params

    a, b = permutation_params(cfg)
    a = [int(x) for x in a]
    b = [int(x) for x in b]
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        sh = shingle_set(str(text), cfg.shingle_words)
        if sh is None:
            continue
        h32 = [h & 0x7FFFFFFF for h in sh]
        for j in range(cfg.num_perm):
            aj, bj = a[j], b[j]
            rows.append(
                (
                    int(doc_id),
                    j,
                    min((aj * h + bj) % MERSENNE31 for h in h32),
                )
            )
    return pd.DataFrame(rows, columns=["doc_id", "perm", "sig_value"])


def simhash_fingerprint(text: str) -> int | None:
    """Signed 64-bit SimHash; None = excluded (no tokens)."""
    th = [xxhash64_str(t) & U64 for t in tokens(text)]
    if not th:
        return None
    n = len(th)
    fp = 0
    for j in range(64):
        ones = sum((h >> j) & 1 for h in th)
        if 2 * ones >= n:
            fp |= 1 << j
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def simhash_pairs_expected(docs: pd.DataFrame, cfg) -> pd.DataFrame:
    """(a, b, hamming) for every doc pair within Hamming distance k."""
    fps = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        fp = simhash_fingerprint(str(text))
        if fp is not None:
            fps.append((int(doc_id), fp & U64))
    fps.sort()
    rows = []
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            d = bin(fps[i][1] ^ fps[j][1]).count("1")
            if d <= cfg.hamming_k:
                rows.append((fps[i][0], fps[j][0], d))
    return pd.DataFrame(rows, columns=["a", "b", "hamming"])


def packed_tokens(text: str) -> bytes:
    """token_ids_u16 + '<u2' packing (reference layout, 2 bytes/token)."""
    out = bytearray()
    for t in bpe_tokens(text):
        tid = xxhash64_str(t) % 65536  # pmod: non-negative
        out += tid.to_bytes(2, "little")
    return bytes(out)


def _tokenized_corpus(docs: pd.DataFrame) -> tuple[list[int], list[bytes], bytes, list[int]]:
    """doc_id-ordered packed texts + separator corpus (+ size offsets)."""
    d = docs.sort_values("doc_id")
    ids = [int(i) for i in d["doc_id"]]
    texts = [packed_tokens(str(t)) for t in d["text"]]
    out = bytearray()
    sizes = [0]
    for uid, t in zip(ids, texts):
        out += pyref.doc_bytes(uid, t, True)
        sizes.append(len(out))
    return ids, texts, bytes(out), sizes


def tokenized_self_similar_expected(
    docs: pd.DataFrame, length_threshold: int
) -> pd.DataFrame:
    """(pos, cluster_id, cluster_size) over the packed-u16 separator
    corpus — the gate query's shape (byte positions, 2 x token offsets)."""
    _, _, corpus, _ = _tokenized_corpus(docs)
    clusters = pyref.self_similar_clusters(corpus, length_threshold)
    rows = []
    for ps in clusters.values():
        head, size = min(ps), len(ps)
        rows.extend((p, head, size) for p in ps)
    return pd.DataFrame(
        sorted(rows), columns=["pos", "cluster_id", "cluster_size"]
    )


def tokenized_deduped_expected(
    docs: pd.DataFrame, length_threshold: int
) -> pd.DataFrame:
    """(doc_id, sha, n_bytes) after the full token-mode ExactSubstr
    pipeline: self-similar -> collect_ranges -> right-to-left strike."""
    ids, texts, corpus, sizes = _tokenized_corpus(docs)
    positions = pyref.self_similar_positions(corpus, length_threshold)
    ranges = pyref.collect_ranges(positions, length_threshold)
    deduped = pyref.apply_removals(texts, sizes, ranges, with_separators=True)
    return pd.DataFrame(
        {
            "doc_id": ids,
            "sha": [hashlib.sha256(t).hexdigest() for t in deduped],
            "n_bytes": [len(t) for t in deduped],
        }
    )
