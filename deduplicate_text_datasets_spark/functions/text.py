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
