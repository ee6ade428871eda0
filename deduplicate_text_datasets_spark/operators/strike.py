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
    docs = docs_with_offsets.select(
        "doc_id",
        (
            F.col("url")
            if "url" in docs_with_offsets.columns
            else F.lit(None).cast("string")
        ).alias("url"),
        "text",
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
