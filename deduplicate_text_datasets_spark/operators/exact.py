"""Exact document deduplication: hash-groupBy on content.

Not present as code in the reference (its exact-dup notion is byte-span
level), but mandated as a first-class training-data-pipeline operator.
Pure Catalyst: md5 of the text is grouped with map-side partial
aggregation; full text never rides the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, group_id, group_size, keep): group_id = min doc_id of the
    identical-text group, keep = first member wins (deterministic)."""
    w = Window.partitionBy(F.md5(F.col(text_col)))
    return docs.select(
        "doc_id",
        F.min("doc_id").over(w).alias("group_id"),
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
    )


def exact_duplicate_edges(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Edges (src=group min, dst=member) for connected-components input."""
    groups = exact_duplicates(docs, text_col).filter(F.col("group_size") >= 2)
    return groups.filter(~F.col("keep")).select(
        F.col("group_id").alias("src"), F.col("doc_id").alias("dst")
    )
