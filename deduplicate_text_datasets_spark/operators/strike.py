"""Removal application ("strike-out"): rewrite documents with duplicate
byte ranges deleted.

Reference: scripts/finish_dedup_wiki40b.py — parse global [start,end)
ranges (:141-147), map each onto documents via the `.size` offsets with the
6-byte separator-prefix clamp (:150-161), delete spans right-to-left
(:66-69), rebuild the dataset (:74-124). finish_single_file.py:20-37 is the
single-file splice variant.

Spark plan: interval join (chunked equi-join) -> per-doc clamped local
spans -> groupBy(doc).collect spans -> splice kernel. Documents with no
spans bypass Python entirely (anti-join + union), so the kernel only ever
sees the (small) affected subset.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import SEP_BYTES, ExactSubstrConfig
from .intervals import interval_join

STRIKE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("deduped", T.BinaryType(), False),
    ]
)


def doc_spans(
    docs_with_offsets: DataFrame,
    remove_ranges: DataFrame,
    cfg: ExactSubstrConfig,
) -> DataFrame:
    """Map global remove_ranges(start, end) to per-doc text-local spans
    (a, b), clamped into the doc's text region — skipping the 6-byte
    separator prefix (finish_dedup_wiki40b.py:157-158)."""
    sep = SEP_BYTES if cfg.with_separators else 0
    # dedup=False: the multi-chunk duplicate artifact is removed by
    # apply_removals' collect_set aggregation on the same exchange the
    # span grouping needs anyway (round-6: one exchange instead of two)
    hit = interval_join(remove_ranges, docs_with_offsets, dedup=False)
    return (
        hit.withColumn("text_base", F.col("byte_start") + F.lit(sep))
        .select(
            "doc_id",
            F.greatest(F.col("start"), F.col("text_base")).alias("ga"),
            F.least(F.col("end"), F.col("byte_end")).alias("gb"),
            "text_base",
        )
        .select(
            "doc_id",
            (F.col("ga") - F.col("text_base")).alias("a"),
            (F.col("gb") - F.col("text_base")).alias("b"),
        )
        .filter(F.col("b") > F.col("a"))
    )


def _driver_spans(
    docs_with_offsets: DataFrame,
    remove_ranges: DataFrame,
    cfg: ExactSubstrConfig,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray] | None:
    """Per-doc text-local spans for affected docs, computed on the driver
    from the ranges/offsets memos — or None when either memo is absent
    (caller runs the distributed join plan). Exact twin of doc_spans +
    groupBy(collect_set): ranges are disjoint and each (doc, range)
    overlap meets in exactly one place here, so no dedup is needed.

    Returns (touched_doc_ids sorted, a, b, group_offsets): doc i's spans
    are a[group_offsets[i]:group_offsets[i+1]] (ascending — splicing them
    right-to-left preserves earlier offsets, as the reference does)."""
    ranges_arr = getattr(remove_ranges, "_driver_ranges_memo", None)
    offs = getattr(docs_with_offsets, "_offsets_memo", None)
    if ranges_arr is None or offs is None:
        return None
    doc_ids, d_start, d_end = offs
    sep = SEP_BYTES if cfg.with_separators else 0
    empty = (
        np.empty(0, np.int64),
        np.empty(0, np.int64),
        np.empty(0, np.int64),
        np.zeros(1, np.int64),
    )
    if len(ranges_arr) == 0 or len(doc_ids) == 0:
        return empty
    starts = ranges_arr[:, 0]
    ends = ranges_arr[:, 1]
    # docs overlapping range i: byte_start < end_i AND byte_end > start_i
    # (the interval_join filter) — offsets are cumulative, so both bounds
    # come from one searchsorted each
    lo = np.searchsorted(d_end, starts, side="right")
    hi = np.searchsorted(d_start, ends, side="left")
    counts = np.maximum(hi - lo, 0)
    total = int(counts.sum())
    ridx = np.repeat(np.arange(len(starts)), counts)
    base = np.repeat(np.cumsum(counts) - counts, counts)
    didx = (np.arange(total) - base) + np.repeat(lo, counts)
    tb = d_start[didx] + sep  # text_base: skip the separator prefix
    a = np.maximum(starts[ridx], tb) - tb
    b = np.minimum(ends[ridx], d_end[didx]) - tb
    keep = b > a
    didx, a, b = didx[keep], a[keep], b[keep]
    if len(didx) == 0:
        return empty
    order = np.lexsort((b, a, didx))
    didx, a, b = didx[order], a[order], b[order]
    change = np.nonzero(didx[1:] != didx[:-1])[0] + 1
    g_starts = np.concatenate(([0], change))
    goff = np.concatenate((g_starts, [len(didx)])).astype(np.int64)
    return (
        doc_ids[didx[g_starts]].astype(np.int64),
        a.astype(np.int64),
        b.astype(np.int64),
        goff,
    )


def apply_removals(
    docs_with_offsets: DataFrame,
    remove_ranges: DataFrame,
    cfg: ExactSubstrConfig,
) -> DataFrame:
    """documents (+offsets) x remove_ranges -> (doc_id, url, deduped bytes).

    The per-row invariant (BASELINE.json input_hint) is byte-identical
    deduped output per url vs the reference splice semantics; ``deduped``
    is therefore BinaryType (a byte deletion may split a multi-byte UTF-8
    sequence, exactly as the reference's byte-level strike does).

    ``text`` may be a string column (byte-level corpus) or a binary column
    (tokenized mode: the packed-u16 corpus from
    functions.text.tokenized_documents). The reference's splice operates on
    the packed byte file regardless of encoding (finish_single_file.py:
    20-37), so in token mode the spans are byte spans over the packed
    layout (token offsets x2, README.md:125) and a span may legally cut a
    token in half — exactly as the reference's byte-level strike can.
    """
    text_is_binary = isinstance(
        docs_with_offsets.schema["text"].dataType, T.BinaryType
    )
    docs = docs_with_offsets.select(
        "doc_id",
        (
            F.col("url")
            if "url" in docs_with_offsets.columns
            else F.lit(None).cast("string")
        ).alias("url"),
        "text",
    )
    # Driver fast path (round-6): when BOTH the remove ranges and the doc
    # offsets are already driver-resident (the memos the coalesce /
    # with_offsets size-guarded fast paths attach), the whole span
    # assignment — chunk explode, range join, clamp, span groupBy — is two
    # numpy searchsorted calls on the driver. The span arrays ride an
    # executor broadcast into the splice kernel; the touched/untouched
    # split joins only a FLAT (doc_id) local relation, so the plan has
    # ZERO exchanges (a nested array<struct> local frame was measured at
    # seconds of Python->JVM row conversion — flat arrays avoid it). Work
    # and memory stay bounded by the upstream guards (ranges <= 2^20,
    # docs <= 2^20; ranges are disjoint so overlap pairs <= ranges +
    # docs). Above either guard a memo is absent and the distributed join
    # plan below runs unchanged. Identical output (pytest-pinned).
    fast = _driver_spans(docs_with_offsets, remove_ranges, cfg)
    if fast is not None:
        import os

        t_ids, t_a, t_b, t_off = fast
        spark = docs_with_offsets.sparkSession
        bc = spark.sparkContext.broadcast((t_ids, t_a, t_b, t_off))
        # Single-pass variant: when the whole corpus is small (total-bytes
        # memo under the guard), ship EVERY doc through one splice kernel
        # — untouched rows pass through byte-unchanged — instead of the
        # touched/untouched join split: one 32-task stage, zero joins.
        # The guard matters because the split exists to keep untouched
        # text out of the Python boundary at scale; under 256 MB the
        # round trip is cheaper than the second branch + union.
        total_memo = getattr(docs_with_offsets, "_corpus_total_memo", None)
        single_max = int(
            os.environ.get("SPARK_GRAFT_STRIKE_SINGLE_MAX", str(1 << 28))
        )
        if total_memo is not None and total_memo <= single_max:

            def splice_all(
                batches: Iterator[pd.DataFrame],
            ) -> Iterator[pd.DataFrame]:
                import numpy as _np

                ids_, a_, b_, off_ = bc.value
                for pdf in batches:
                    out = []
                    for doc_id, url, text in zip(
                        pdf["doc_id"], pdf["url"], pdf["text"]
                    ):
                        raw = (
                            bytes(text)
                            if isinstance(text, (bytes, bytearray))
                            else text.encode("utf-8")
                        )
                        k = int(_np.searchsorted(ids_, doc_id))
                        if k < len(ids_) and ids_[k] == doc_id:
                            for j in range(
                                int(off_[k + 1]) - 1, int(off_[k]) - 1, -1
                            ):
                                raw = raw[: int(a_[j])] + raw[int(b_[j]) :]
                        out.append((int(doc_id), url, raw))
                    yield pd.DataFrame(
                        out, columns=["doc_id", "url", "deduped"]
                    )

            return docs.mapInPandas(splice_all, STRIKE_SCHEMA)

        ids_df = F.broadcast(
            spark.createDataFrame(
                pd.DataFrame({"doc_id": t_ids}), "doc_id long"
            )
        )

        def splice_bc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as _np

            ids_, a_, b_, off_ = bc.value
            for pdf in batches:
                out = []
                for doc_id, url, text in zip(
                    pdf["doc_id"], pdf["url"], pdf["text"]
                ):
                    raw = (
                        bytes(text)
                        if isinstance(text, (bytes, bytearray))
                        else text.encode("utf-8")
                    )
                    k = int(_np.searchsorted(ids_, doc_id))
                    # right-to-left so earlier offsets stay valid
                    # (finish_dedup_wiki40b.py:66-69); spans are stored
                    # ascending by (a, b)
                    for j in range(int(off_[k + 1]) - 1, int(off_[k]) - 1, -1):
                        raw = raw[: int(a_[j])] + raw[int(b_[j]) :]
                    out.append((int(doc_id), url, raw))
                yield pd.DataFrame(out, columns=["doc_id", "url", "deduped"])

        struck = docs.join(ids_df, "doc_id").mapInPandas(
            splice_bc, STRIKE_SCHEMA
        )
        untouched = docs.join(ids_df, "doc_id", "left_anti").select(
            "doc_id",
            "url",
            (
                F.col("text") if text_is_binary else F.encode("text", "UTF-8")
            ).alias("deduped"),
        )
        return struck.unionByName(untouched)

    # Persist: the spans frame is small (affected docs only) but feeds TWO
    # consumers — the splice join and the untouched anti-join. Beyond the
    # obvious recompute cost (each consumer re-runs the interval join and
    # the whole remove-ranges lineage above it), materializing it once
    # makes the struck/untouched split consistent BY CONSTRUCTION: both
    # branches read the same rows, so the output row count always equals
    # the input doc count.
    from ..plans.caching import scoped_persist

    spans = scoped_persist(
        doc_spans(docs_with_offsets, remove_ranges, cfg)
        .groupBy("doc_id")
        # collect_set: doc_spans runs the interval join without its
        # dropDuplicates exchange; set semantics dedup the multi-chunk
        # artifact here, on the groupBy exchange we pay anyway
        .agg(F.array_sort(F.collect_set(F.struct("a", "b"))).alias("spans"))
    )
    touched = docs.join(spans, "doc_id")

    def splice(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, url, text, spans_ in zip(
                pdf["doc_id"], pdf["url"], pdf["text"], pdf["spans"]
            ):
                raw = (
                    bytes(text)
                    if isinstance(text, (bytes, bytearray))
                    else text.encode("utf-8")
                )
                # right-to-left so earlier offsets stay valid
                # (finish_dedup_wiki40b.py:66-69)
                for s in sorted(spans_, key=lambda r: r["a"], reverse=True):
                    raw = raw[: int(s["a"])] + raw[int(s["b"]) :]
                out.append((int(doc_id), url, raw))
            yield pd.DataFrame(out, columns=["doc_id", "url", "deduped"])

    struck = touched.mapInPandas(splice, STRIKE_SCHEMA)
    untouched = docs.join(spans.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id",
        "url",
        (
            F.col("text") if text_is_binary else F.encode("text", "UTF-8")
        ).alias("deduped"),
    )
    return struck.unionByName(untouched)
