"""Paragraph-level exact deduplication across a corpus.

The RefinedWeb / C4-family pipelines dedup at three granularities:
document (operators/exact), byte-span (operators/suffix, the reference's
ExactSubstr — main.rs cmd_self_similar) and PARAGRAPH/LINE: an exact
newline-delimited unit that appears anywhere else in the corpus is removed
except for its first occurrence. This is the cheap boilerplate killer
(nav bars, cookie banners, footers) that runs before the expensive
suffix-array pass; the reference's README describes removing repeated
boilerplate as the motivating use case (README.md:10-16) but only ships
the byte-span machinery — this operator supplies the paragraph tier.

Scale shape (the strike-out design from operators/strike, re-applied):
full text crosses exactly ONE exchange. The paragraph instances that feed
the winner election are projected to (doc_id, idx, md5) map-side — 40 B
per paragraph instance — so the election groupBy and the winner join-back
never carry text. Only the final reconstruction join (docs ⋈ per-doc
drop-index arrays, a frame of ints) moves the text, and AQE broadcasts
the drop side when the dup population is small. No window over a data
key: a paragraph duplicated 10^9 times contributes one partial row per
mapper to the election and 10^9 (doc_id, idx) int pairs to the drop set,
all combinable map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: paragraphs shorter than this many characters are never deduplicated
#: (an empty line or a one-word heading repeats legitimately; nuking every
#: later blank line would destroy document structure, and real pipelines
#: bound the unit the same way — e.g. MassiveText dedups lines, Dolma
#: paragraphs, both above a minimum size).
DEFAULT_MIN_CHARS = 20


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    min_chars: int = DEFAULT_MIN_CHARS,
) -> DataFrame:
    """Remove every non-first occurrence of an exact repeated paragraph.

    Paragraphs are ``\\n``-delimited spans of ``text_col``. The kept
    occurrence is the globally first by ``(doc_id, paragraph index)``;
    paragraphs shorter than ``min_chars`` characters are exempt (always
    kept). Returns one row per input doc:

      doc_id       input key
      deduped      text with dropped paragraphs removed (survivors
                   rejoined with ``\\n`` in original order)
      n_paras      paragraph count before dedup
      kept_paras   paragraph count after

    Exactness: election groups on ``md5(paragraph)`` (128-bit — the same
    equality-by-hash contract as operators/exact document dedup).
    Determinism: the winner is ``min(struct(doc_id, idx))``, a total
    order, under any partitioning.
    """
    sep = "\n"
    arr = F.split(F.col(text_col), sep, -1)
    paras = docs.select(
        "doc_id", F.posexplode(arr).alias("idx", "para")
    ).filter(F.length("para") >= min_chars)
    inst = paras.select(
        "doc_id", "idx", F.md5("para").alias("_h")
    )
    winners = inst.groupBy("_h").agg(
        F.min(F.struct("doc_id", "idx")).alias("w")
    )
    drops = (
        inst.join(winners, "_h")
        .filter(
            (F.col("doc_id") != F.col("w.doc_id"))
            | (F.col("idx") != F.col("w.idx"))
        )
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("idx")).alias("_drop"))
    )
    drop = F.coalesce(F.col("_drop"), F.array().cast("array<integer>"))
    kept_arr: Column = F.filter(
        arr, lambda x, i: ~F.array_contains(drop, i)
    )
    return (
        docs.join(drops, "doc_id", "left")
        .select(
            "doc_id",
            F.array_join(kept_arr, sep).alias("deduped"),
            F.size(arr).cast("long").alias("n_paras"),
            (F.size(arr) - F.size(drop)).cast("long").alias("kept_paras"),
        )
    )


def repeated_paragraphs(
    docs: DataFrame,
    text_col: str = "text",
    min_chars: int = DEFAULT_MIN_CHARS,
    min_count: int = 2,
) -> DataFrame:
    """Observability twin: the repeated-paragraph census.

    (para_hash, n_occurrences, n_docs, first_doc_id, first_idx, chars)
    for every paragraph occurring at least ``min_count`` times — the
    frame an operator of the boilerplate-removal policy inspects before
    committing to a strike. Text-free after the map-side projection, one
    exchange, fully combinable.
    """
    inst = (
        docs.select("doc_id", F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("idx", "para"))
        .filter(F.length("para") >= min_chars)
        .select(
            "doc_id",
            "idx",
            F.md5("para").alias("para_hash"),
            F.length("para").cast("long").alias("chars"),
        )
    )
    return (
        inst.groupBy("para_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min(F.struct("doc_id", "idx")).alias("w"),
            F.first("chars").alias("chars"),
        )
        .filter(F.col("n_occurrences") >= min_count)
        .select(
            "para_hash",
            "n_occurrences",
            "n_docs",
            F.col("w.doc_id").alias("first_doc_id"),
            F.col("w.idx").alias("first_idx"),
            "chars",
        )
    )
