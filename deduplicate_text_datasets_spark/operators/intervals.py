"""Interval operators: collect-style coalescing and scalable range joins.

``collect`` in the reference (cmd_collect, src/main.rs:1408-1526) sorts all
duplicate positions (parallel sort + k-way heap merge) then folds them into
maximal byte ranges (main.rs:1505-1521). Spark-native: a range exchange
replaces the heap merge; the fold is a per-partition vectorized kernel plus
one tiny global pass over the per-partition boundary ranges — no
single-partition window over the full position set.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

RANGE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
    ]
)


def _fold_positions(pos: np.ndarray, length: int) -> np.ndarray:
    """Vectorized reference fold (main.rs:1505-1521): sorted positions ->
    [start, end) ranges, merging while p <= prev_p + L. Returns (k, 2)."""
    if len(pos) == 0:
        return np.empty((0, 2), dtype=np.int64)
    gap = np.empty(len(pos), dtype=bool)
    gap[0] = True
    gap[1:] = pos[1:] > pos[:-1] + length  # new range iff gap > L
    starts = pos[gap]
    ends = np.append(pos[np.nonzero(gap)[0][1:] - 1], pos[-1]) + length
    return np.stack([starts, ends], axis=1)


def coalesce_positions(positions: DataFrame, length: int) -> DataFrame:
    """duplicate positions (col ``pos``) -> remove_ranges(start, end).

    Stage 1: range-repartition + in-partition sort (Catalyst SortExec —
             the distributed analogue of the reference's parallel sort +
             heap merge), then a vectorized per-partition fold.
    Stage 2: per-partition range lists are already maximal except at
             partition seams; ranges are far fewer than positions, so the
             seam-merge pass (union_intervals, adjacency gap 0) runs over a
             small frame.
    """
    parts = positions.select(F.col("pos").cast("long")).repartitionByRange(
        "pos"
    ).sortWithinPartitions("pos")

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [pdf["pos"].to_numpy() for pdf in batches if len(pdf)]
        if not chunks:
            return
        ranges = _fold_positions(np.concatenate(chunks), length)
        yield pd.DataFrame({"start": ranges[:, 0], "end": ranges[:, 1]})

    local = parts.mapInPandas(fold, RANGE_SCHEMA)
    return union_intervals(local, adjacency=True)


def union_intervals(
    ranges: DataFrame, adjacency: bool = False, gap: int = 0
) -> DataFrame:
    """Merge overlapping (and, if ``adjacency``, exactly-touching) intervals
    into maximal [start, end) ranges.

    Classic running-max sessionization: sort by start, a new group begins
    where start exceeds the running max of previous ends (+gap). Uses a
    global-ordered window — intended for already-reduced range frames
    (post-coalesce seams, remove-lists), which are orders of magnitude
    smaller than position frames. For huge range sets, call
    coalesce-style two-level reduction first.
    """
    w = Window.orderBy("start", "end").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cmp = F.col("start") <= F.col("prev_max_end") + F.lit(gap) if adjacency else (
        F.col("start") < F.col("prev_max_end") + F.lit(gap)
    )
    flagged = (
        ranges.withColumn("prev_max_end", F.max("end").over(w))
        .withColumn(
            "new_grp",
            F.when(F.col("prev_max_end").isNull() | ~cmp, F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .withColumn(
            "grp",
            F.sum("new_grp").over(
                Window.orderBy("start", "end").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
    )
    return flagged.groupBy("grp").agg(
        F.min("start").alias("start"), F.max("end").alias("end")
    ).select("start", "end")


def interval_join(
    ranges: DataFrame,
    docs_with_offsets: DataFrame,
    chunk_bytes: int = 1 << 20,
) -> DataFrame:
    """Range join: remove_ranges x doc byte extents -> (doc row, start, end)
    for every overlapping pair (the two-pointer walk of
    finish_dedup_wiki40b.py:150-161, distributed).

    A naive theta-join is O(|ranges| * |docs|); instead both sides are
    exploded onto fixed-width byte chunks and equi-joined on chunk_id, then
    exact-overlap filtered — shuffle ~ data size, and Catalyst can still
    broadcast the (usually small) ranges side.
    """
    r = ranges.withColumn(
        "chunk",
        F.explode(
            F.sequence(
                F.floor(F.col("start") / chunk_bytes),
                F.floor((F.col("end") - 1) / chunk_bytes),
            )
        ),
    )
    d = docs_with_offsets.withColumn(
        "chunk",
        F.explode(
            F.sequence(
                F.floor(F.col("byte_start") / chunk_bytes),
                F.floor((F.col("byte_end") - 1) / chunk_bytes),
            )
        ),
    )
    joined = d.join(r, "chunk").filter(
        (F.col("start") < F.col("byte_end")) & (F.col("end") > F.col("byte_start"))
    )
    # a (doc, range) pair may meet in several chunks — keep one
    return joined.drop("chunk").dropDuplicates(["doc_id", "start", "end"])
