"""Exact n-gram (shingle) Jaccard similarity — the all-pairs ground truth
the LSH path approximates, and a standalone near-dup operator for bounded
inputs.

Plan: explode distinct shingle hashes, self-equi-join on the shingle key
(inverted index join — shuffle ~ total shingles, never |docs|^2), aggregate
pair intersection counts, join back set sizes. Jaccard thresholding is done
in exact integer arithmetic so results are engine-independent
(oracle-hashable against DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import MinHashConfig
from .minhash import doc_shingles


def jaccard_pairs(
    docs: DataFrame,
    cfg: MinHashConfig,
    threshold_num: int = 4,
    threshold_den: int = 5,
    text_col: str = "text",
    max_shingle_df: int = 10000,
    copartition: bool = True,
) -> DataFrame:
    """All doc pairs with shingle-Jaccard >= threshold_num/threshold_den.

    max_shingle_df: shingles occurring in more docs than this are skipped in
    the inverted index (stopword-shingle skew guard; identical policy to the
    LSH bucket cap). Output: (a, b, inter, size_a, size_b) — integers only.
    """
    from ..plans.caching import scoped_persist

    sh = scoped_persist(doc_shingles(docs, cfg, text_col))
    sizes = sh.select("doc_id", F.size("sh").alias("nsh"))
    inv = sh.select("doc_id", F.explode("sh").alias("g"))
    # document frequency per shingle via groupBy (map-side partial agg; a
    # count-over-window would pin a stopword-shingle's postings in one
    # WindowExec partition). df >= 2 prunes every unique shingle — the
    # overwhelming majority of webtext shingles — before the self-join;
    # df <= cap is the stopword-shingle skew guard.
    dfc = (
        inv.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= max_shingle_df))
    )
    # pruned postings feed BOTH sides of the shingle-key self-join:
    # co-partition on g before caching so the join co-locates without
    # re-exchanging each side (suffix.self_similar copartition design)
    inv = inv.join(dfc.select("g"), "g")
    if copartition:
        inv = inv.repartition("g")
    inv = scoped_persist(inv)
    a = inv.select(F.col("g").alias("g"), F.col("doc_id").alias("a"))
    b = inv.select(F.col("g").alias("g"), F.col("doc_id").alias("b"))
    inter = (
        a.join(b, "g")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("nsh").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("nsh").alias("size_b"))
    out = inter.join(sa, "a").join(sb, "b")
    # inter/(size_a+size_b-inter) >= num/den  <=>  den*inter >= num*(union)
    return out.filter(
        F.lit(threshold_den) * F.col("inter")
        >= F.lit(threshold_num) * (F.col("size_a") + F.col("size_b") - F.col("inter"))
    ).select("a", "b", "inter", "size_a", "size_b")
