"""Text functions — all JVM-side Catalyst expressions (no Python on the hot
path). Tokenization is the shared definition used by MinHash, SimHash and
the text-analysis operators, and is mirrored 1:1 in the DuckDB oracle SQL
(__spark_entry__.py) so results hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(col: Column | str) -> Column:
    """Lowercase word tokens: split on non-alphanumeric runs, drop empties."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != "")


def shingles(words: Column, w: int) -> Column:
    """w-word shingles (space-joined). Docs shorter than w words produce a
    single whole-doc shingle (Lee et al. 2021 NearDup definition)."""
    return F.when(
        F.size(words) >= w,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - w + 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, w)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))


def shingle_hashes(col: Column | str, w: int) -> Column:
    """Distinct xxhash64 values of the doc's w-word shingles."""
    return F.array_distinct(
        F.transform(shingles(tokens(col), w), lambda s: F.xxhash64(s))
    )


def doc_fingerprint(col: Column | str) -> Column:
    """Order-sensitive 64-bit document fingerprint over normalized tokens
    (rolling-hash style content address for exact-dup grouping)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.concat_ws(" ", tokens(c)))


# ---------------------------------------------------------------------------
# Tokenized-corpus emulation (reference O1 --tokenize path)
# ---------------------------------------------------------------------------
# The reference packs GPT-2 token ids as little-endian uint16 byte pairs
# (scripts/load_dataset.py:63-69), halving corpus size and making every
# byte-level operator a token-level one (offsets x2, README.md:125). The
# GPT-2 vocabulary is not available in this container, so the *mechanism*
# is reproduced with a deterministic hash vocabulary: a BPE-ish regex
# pretokenizer + xxhash64-mod-65536 ids. Swap ``token_ids`` for a real
# tokenizer UDF in production.

BPE_ISH_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"


def bpe_ish_tokens(col: Column | str) -> Column:
    """GPT-2-style pretokenization (public regex family) — keeps leading
    spaces attached, splits letters/digits/punct runs."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.regexp_extract_all(c, F.lit(f"({BPE_ISH_RE})"), 1),
        lambda x: x != "",
    )


def token_ids_u16(col: Column | str) -> Column:
    """array<int> of deterministic 16-bit token ids (hash vocabulary)."""
    return F.transform(
        bpe_ish_tokens(col), lambda t: F.pmod(F.xxhash64(t), F.lit(65536)).cast("int")
    )


def pack_u16_le(ids: Column) -> Column:
    """Pack array<int> (0..65535) to the reference's little-endian uint16
    byte layout (load_dataset.py:63-69): 2 bytes per token."""
    return F.aggregate(
        ids,
        F.lit(b""),
        lambda acc, i: F.concat(
            acc,
            F.unhex(
                F.concat(
                    F.lpad(F.hex(i % 256), 2, "0"), F.lpad(F.hex(F.floor(i / 256)), 2, "0")
                )
            ),
        ),
    )
