"""Grid-salted EXACT all-pairs self-join for skewed bucket keys.

north_rule names "explicit salting of skewed LSH buckets": webtext
boilerplate concentrates near-identical documents into a handful of hot
LSH buckets / SimHash blocks, and a plain self-join on the bucket key
puts a size-n bucket's n^2/2 pairs into ONE reducer task. This module
redistributes that exact pair set over a k x k grid of salt cells:

  k = ceil(n / cap) salt groups, g(doc) = hash(doc_id) mod k
  pair (a, b) with groups (p, q) belongs to cell (min(p,q), max(p,q))
  a doc carries the LEFT role in cells (g, g..k-1)
        and the RIGHT role in cells (0..g, g)

Off-diagonal cells cross two disjoint salt groups (every cross pair kept,
order-normalized so (a, b) == (b, a) collapse); the diagonal cell pairs a
group with itself (deduped by a < b). Each unordered pair is generated
exactly once, in exactly one cell, so this is a physical re-distribution
of the plain self-join — recall and output semantics are bit-identical
(pinned by tests/test_round5.py) while per-task pair work stays bounded
by ~cap^2 regardless of bucket size. Replication cost is linear: each
member appears in k+1 tagged rows.

This is the standard theta-join skew decomposition (Okcan & Riedewald,
SIGMOD'11 "1-Bucket-Theta") specialized to the self-join diagonal; the
reference repo has no analogue (its NearDup half ships only outputs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# mixed into the salt hash so salt groups decorrelate from any other
# doc_id-keyed hash partitioning in the plan
SALT_SEED = 0x5A17


def grid_salted_self_pairs(
    hot: DataFrame,
    key_cols: Sequence[str],
    cap: int,
    id_col: str = "doc_id",
    payload: Sequence[str] = (),
) -> DataFrame:
    """Exact per-bucket all-pairs over ``hot`` = bucket members carrying a
    precomputed ``bsize`` column (bucket size, > cap for every row).

    Returns (a, b, <p>_a, <p>_b ...) with a < b; each unordered pair
    appears exactly once. ``payload`` columns ride the join and are
    swapped together with the ids during order normalization.
    """
    g = hot.withColumn(
        "_k", F.ceil(F.col("bsize") / F.lit(cap)).cast("int")
    ).withColumn(
        # salt by hash, not doc_id ranges: consecutive doc_ids are crawl
        # neighbors and would otherwise land in one salt group
        "_g",
        F.pmod(F.xxhash64(id_col, F.lit(SALT_SEED)), F.col("_k")).cast("int"),
    )
    keys = list(key_cols)
    lhs = g.select(
        *keys,
        F.col("_g").alias("_ci"),
        F.explode(F.sequence("_g", F.col("_k") - F.lit(1))).alias("_cj"),
        F.col(id_col).alias("_a"),
        *[F.col(p).alias(f"_pa_{p}") for p in payload],
    )
    rhs = g.select(
        *keys,
        F.explode(F.sequence(F.lit(0), "_g")).alias("_ci"),
        F.col("_g").alias("_cj"),
        F.col(id_col).alias("_b"),
        *[F.col(p).alias(f"_pb_{p}") for p in payload],
    )
    j = lhs.join(rhs, keys + ["_ci", "_cj"]).filter(
        (F.col("_ci") < F.col("_cj")) | (F.col("_a") < F.col("_b"))
    )
    fwd = F.col("_a") < F.col("_b")
    cols = [
        F.when(fwd, F.col("_a")).otherwise(F.col("_b")).alias("a"),
        F.when(fwd, F.col("_b")).otherwise(F.col("_a")).alias("b"),
    ]
    for p in payload:
        pa, pb = F.col(f"_pa_{p}"), F.col(f"_pb_{p}")
        cols.append(F.when(fwd, pa).otherwise(pb).alias(f"{p}_a"))
        cols.append(F.when(fwd, pb).otherwise(pa).alias(f"{p}_b"))
    return j.select(*cols)


def grid_salted_cross_pairs(
    hot_a: DataFrame,
    hot_b: DataFrame,
    key_cols: Sequence[str],
    cap: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact bipartite all-pairs (A x B) inside hot buckets — the
    across-corpus analogue of :func:`grid_salted_self_pairs` (no diagonal,
    so the decomposition is a plain ka x kb block grid).

    Both inputs carry the JOINT bucket sizes ``na``/``nb`` (rows of the
    same bucket agree on them). A-members get salt group ga in [0, ka),
    ka = ceil(na/cap), and replicate once per B-block; symmetrically for
    B. Pair (a, b) is generated exactly once, in cell (ga, gb); one
    reducer task handles at most ~cap^2 pairs. Output: (a, b).
    """
    keys = list(key_cols)
    ga = hot_a.withColumn(
        "_ka", F.ceil(F.col("na") / F.lit(cap)).cast("int")
    ).withColumn(
        "_kb", F.ceil(F.col("nb") / F.lit(cap)).cast("int")
    )
    gb = hot_b.withColumn(
        "_ka", F.ceil(F.col("na") / F.lit(cap)).cast("int")
    ).withColumn(
        "_kb", F.ceil(F.col("nb") / F.lit(cap)).cast("int")
    )
    lhs = ga.select(
        *keys,
        F.pmod(F.xxhash64(id_col, F.lit(SALT_SEED)), F.col("_ka"))
        .cast("int")
        .alias("_ci"),
        F.explode(F.sequence(F.lit(0), F.col("_kb") - F.lit(1))).alias("_cj"),
        F.col(id_col).alias("a"),
    )
    rhs = gb.select(
        *keys,
        F.explode(F.sequence(F.lit(0), F.col("_ka") - F.lit(1))).alias("_ci"),
        F.pmod(F.xxhash64(id_col, F.lit(SALT_SEED)), F.col("_kb"))
        .cast("int")
        .alias("_cj"),
        F.col(id_col).alias("b"),
    )
    return lhs.join(rhs, keys + ["_ci", "_cj"]).select("a", "b")
