"""Incremental ingest: dedup new crawl snapshots against the existing
corpus with Structured Streaming.

The reference is strictly batch; its cross-corpus operator
(cmd_across_similar, main.rs:962-1158) is exactly the primitive an
incremental pipeline needs — "which spans of the NEW data already exist in
the OLD corpus". Here: a file-source stream of new document parquet,
processed per micro-batch with foreachBatch; each batch runs

  new docs ──► exact-dup semi-join vs indexed corpus fingerprints
          ──► MinHash LSH bucket join vs indexed signatures
          ──► verified near-dup decision per new doc

State (the index) lives in parquet tables updated per batch — the
streaming analogue of the StageStore checkpoints, resumable via the
Structured Streaming checkpointLocation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import MinHashConfig
from ..functions.text import doc_fingerprint
from ..operators.minhash import (
    doc_shingles,
    lsh_buckets,
    minhash_signatures,
    verify_pairs_across,
)


def build_index(docs: DataFrame, cfg: MinHashConfig, index_dir: str) -> None:
    """Persist the dedup index for an existing corpus: content fingerprints
    + LSH buckets + shingle sets (for verification)."""
    docs.select("doc_id", doc_fingerprint("text").alias("fingerprint")).write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/fingerprints")
    sh = doc_shingles(docs, cfg)
    sh.write.mode("overwrite").parquet(f"{index_dir}/shingles")
    sigs = minhash_signatures(sh, cfg)
    lsh_buckets(sigs, cfg).write.mode("overwrite").parquet(f"{index_dir}/buckets")


def dedup_batch(
    spark: SparkSession, new_docs: DataFrame, cfg: MinHashConfig, index_dir: str
) -> DataFrame:
    """One micro-batch: classify each new doc as exact-dup, near-dup, or
    novel vs the index. Returns (doc_id, verdict, matched_doc)."""
    fps = spark.read.parquet(f"{index_dir}/fingerprints")
    idx_buckets = spark.read.parquet(f"{index_dir}/buckets")
    idx_shingles = spark.read.parquet(f"{index_dir}/shingles")

    new_fp = new_docs.select(
        "doc_id", doc_fingerprint("text").alias("fingerprint")
    )
    exact = (
        new_fp.join(
            fps.select(
                F.col("fingerprint"), F.col("doc_id").alias("matched_doc")
            ),
            "fingerprint",
        )
        .groupBy("doc_id")
        .agg(F.min("matched_doc").alias("matched_doc"))
        .withColumn("verdict", F.lit("exact"))
    )

    new_sh = doc_shingles(new_docs, cfg)
    new_buckets = lsh_buckets(minhash_signatures(new_sh, cfg), cfg)
    cands = (
        new_buckets.join(
            idx_buckets.select(
                "band", "bucket", F.col("doc_id").alias("b")
            ),
            ["band", "bucket"],
        )
        .select(F.col("doc_id").alias("a"), "b")
        .distinct()
    )
    # two-sided verify: new-batch ids and index ids are independent spaces
    # (a colliding doc_id must not pull the wrong shingle set — ADVICE r1)
    near = (
        verify_pairs_across(cands, new_sh, idx_shingles, cfg)
        .groupBy("a")
        .agg(F.min("b").alias("matched_doc"))
        .select(F.col("a").alias("doc_id"), "matched_doc")
        .withColumn("verdict", F.lit("near"))
    )

    classified = exact.unionByName(near.join(exact.select("doc_id"), "doc_id", "left_anti"))
    novel = new_docs.select("doc_id").join(
        classified.select("doc_id"), "doc_id", "left_anti"
    ).withColumn("matched_doc", F.lit(None).cast("long")).withColumn(
        "verdict", F.lit("novel")
    )
    return classified.unionByName(novel)


def start_incremental_dedup(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: MinHashConfig,
    schema,
    available_now: bool = True,
):
    """readStream(file source) -> foreachBatch(dedup_batch) -> parquet sink.
    availableNow processes the backlog then stops (test/batch-catchup mode);
    otherwise runs continuously as new files land."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = dedup_batch(spark, batch_df, cfg, index_dir)
        out.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            output_dir
        )

    reader = spark.readStream.schema(schema).parquet(input_dir)
    writer = reader.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
