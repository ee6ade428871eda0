"""Capture .explain('formatted') for every headline bench query into
plans/<tag>/<query>_<suffix>.txt (judge deliverable + plan-diff evidence).

Usage: python scripts/capture_plans.py <tag> <suffix> [sf_dir]
  e.g. python scripts/capture_plans.py r06 before /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from deduplicate_text_datasets_spark.session import get_spark  # noqa: E402

TAG = sys.argv[1] if len(sys.argv) > 1 else "r06"
SUFFIX = sys.argv[2] if len(sys.argv) > 2 else "before"
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else bench.SF_DIR
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", TAG)


def frames(spark):
    """The DataFrame each bench query materializes (same constructors the
    frozen bench.py uses), built lazily for explain capture."""
    from deduplicate_text_datasets_spark.config import (
        EngineConfig,
        SimHashConfig,
    )
    from deduplicate_text_datasets_spark.operators.ann import cosine_topk
    from deduplicate_text_datasets_spark.operators.sa_index import (
        build_suffix_index,
        count_occurrences_indexed,
        find_training_data_indexed,
        read_suffix_index,
    )
    from deduplicate_text_datasets_spark.operators.simhash import simhash_pairs
    from deduplicate_text_datasets_spark.operators.textstats import doc_stats
    from deduplicate_text_datasets_spark.plans.pipeline import (
        exactsubstr_dedup,
        neardup_clusters,
    )

    docs = bench._docs(spark, SF_DIR)
    cfg = bench._bench_exact_cfg(spark, SF_DIR)
    out = {}
    out["neardup_clusters"] = neardup_clusters(docs, EngineConfig())
    _, deduped = exactsubstr_dedup(docs, EngineConfig(exact=cfg))
    out["exactsubstr_dedup"] = deduped
    out["sa_index_build"] = build_suffix_index(docs, cfg)
    index = read_suffix_index(spark, bench.INDEX_PATH)
    rows = docs.filter(F.col("doc_id") < 20).select("doc_id", "text").collect()
    queries = [(int(r["doc_id"]), r["text"][:60].encode()) for r in rows]
    out["count_occurrences"] = count_occurrences_indexed(index, queries)
    rows8 = docs.filter(F.col("doc_id") < 8).select("doc_id", "text").collect()
    q = ("\n".join(r["text"] for r in rows8))[:20000].encode()
    out["find_training_data"] = find_training_data_indexed(
        index, [(0, q)], step=2
    ).agg(F.sum("match_len"))
    out["simhash_pairs"] = simhash_pairs(docs, SimHashConfig())
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qdf = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out["ann_topk"] = cosine_topk(emb, qdf, k=10)
    out["textstats"] = doc_stats(docs).agg(F.sum("n_tokens"))
    return out


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(
        "capture-plans", master=f"local[{bench.CPUS}]",
        shuffle_partitions=bench.CPUS,
    )
    bench._docs(spark, SF_DIR).cache().count()
    # the index-backed queries need the index present (bench builds it first)
    if not os.path.exists(bench.INDEX_PATH):
        bench.q_sa_index_build(spark, SF_DIR)
    for name, df in frames(spark).items():
        path = os.path.join(OUT_DIR, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
