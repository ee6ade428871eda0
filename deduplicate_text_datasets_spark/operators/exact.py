"""Exact document deduplication: hash-groupBy on content.

Not present as code in the reference (its exact-dup notion is byte-span
level), but mandated as a first-class training-data-pipeline operator.
Pure Catalyst: md5 of the text is grouped with map-side partial
aggregation (a text duplicated 10^6 times contributes one partial row per
mapper, not 10^6 rows to one reducer); full text never rides the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, group_id, group_size, keep): group_id = min doc_id of the
    identical-text group, keep = first member wins (deterministic).

    Two-phase: groupBy(md5) with partial aggregation, then join the (small,
    AQE-broadcastable) group stats back onto the (doc_id, md5) projection.
    Not a count-over-window: a hot text would pin every member row in one
    WindowExec partition, which AQE cannot split.
    """
    h = docs.select("doc_id", F.md5(F.col(text_col)).alias("_h"))
    g = h.groupBy("_h").agg(
        F.min("doc_id").alias("group_id"), F.count(F.lit(1)).alias("group_size")
    )
    return h.join(g, "_h").select(
        "doc_id",
        "group_id",
        "group_size",
        (F.col("doc_id") == F.col("group_id")).alias("keep"),
    )


def exact_duplicate_edges(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Edges (src=group min, dst=member) for connected-components input."""
    groups = exact_duplicates(docs, text_col).filter(F.col("group_size") >= 2)
    return groups.filter(~F.col("keep")).select(
        F.col("group_id").alias("src"), F.col("doc_id").alias("dst")
    )
