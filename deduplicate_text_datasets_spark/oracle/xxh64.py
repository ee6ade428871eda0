"""Pure-Python xxHash64 matching Spark's Catalyst `xxhash64` expression.

TEST/ORACLE-ONLY code (never on the Spark hot path). This is a from-spec
reimplementation of the PUBLIC xxHash64 algorithm (Yann Collet,
https://github.com/Cyan4973/xxHash — BSD) in the per-type framing Spark's
Catalyst uses (org.apache.spark.sql.catalyst.expressions.XXH64, Apache-2.0):

* string column  -> XXH64(utf8_bytes, seed)
* long element   -> the dedicated 8-byte lane round (``hash_long``)
* int element    -> the dedicated 4-byte lane round (``hash_int``)
* array column   -> fold: h = seed; for v in arr: h = hash_elem(v, h)

Spark's default seed is 42. All arithmetic is mod 2^64.

This module exists so the driver-gate golden sidecars
(scripts/make_expected.py) are computed WITHOUT touching Spark or the
engine: DuckDB cannot express xxhash64, so the four hash-vocabulary gate
queries get an `expected_*.parquet` computed here + in oracle/pyref.py,
and their oracle_sql becomes a plain SELECT over the sidecar.
Parity with Spark's expression is pinned by
tests/test_round5.py::test_xxh64_matches_spark.
"""

from __future__ import annotations

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
MASK = (1 << 64) - 1
SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def hash_long(v: int, seed: int) -> int:
    """XXH64.hashLong: one 8-byte lane round + finalize (the per-element
    step of Spark's array<long> fold)."""
    v &= MASK
    h = (seed + P5 + 8) & MASK
    h ^= (_rotl((v * P2) & MASK, 31) * P1) & MASK
    h = ((_rotl(h, 27) * P1) + P4) & MASK
    return _fmix(h)


def hash_int(v: int, seed: int) -> int:
    """XXH64.hashInt: one 4-byte round + finalize (array<int> fold step)."""
    h = (seed + P5 + 4) & MASK
    h ^= ((v & 0xFFFFFFFF) * P1) & MASK
    h = ((_rotl(h, 23) * P2) + P3) & MASK
    return _fmix(h)


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Standard XXH64 over a byte string (little-endian word reads) —
    Spark's hashUnsafeBytes framing for string/binary columns."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed & MASK
        v4 = (seed - P1) & MASK
        while i <= n - 32:
            for j, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v = (_rotl((v + k * P2) & MASK, 31) * P1) & MASK
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & MASK, 31) * P1) & MASK
            h = ((h * P1) + P4) & MASK
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i <= n - 8:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((k * P2) & MASK, 31) * P1) & MASK
        h = ((_rotl(h, 27) * P1) + P4) & MASK
        i += 8
    if i <= n - 4:
        k = int.from_bytes(data[i : i + 4], "little")
        h ^= (k * P1) & MASK
        h = ((_rotl(h, 23) * P2) + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    return _fmix(h)


def _signed(h: int) -> int:
    """uint64 -> Spark LongType two's-complement value."""
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """= F.xxhash64(string_col), as a signed 64-bit int."""
    return _signed(xxh64(s.encode("utf-8"), seed))


def xxhash64_long_array(arr, seed: int = SPARK_SEED) -> int:
    """= F.xxhash64(array<long>_col): Catalyst folds hash_long over the
    elements with the running hash as seed."""
    h = seed
    for v in arr:
        h = hash_long(int(v), h)
    return _signed(h)
