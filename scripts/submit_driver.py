"""spark-submit driver: NearDup + ExactSubstr smoke over sf0.001.

The north rule requires the pipeline to launch via
``spark-submit --py-files`` (cluster-style packaging, no editable install).
Run ``scripts/run_submit_demo.sh``; this driver imports the engine ONLY
from the shipped zip (the repo dir is not on sys.path when invoked by
spark-submit from a scratch cwd).
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.appName("submit-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    from deduplicate_text_datasets_spark.config import (
        EngineConfig,
        ExactSubstrConfig,
    )
    from deduplicate_text_datasets_spark.plans.pipeline import (
        exactsubstr_dedup,
        neardup_clusters,
    )
    from deduplicate_text_datasets_spark.sources.documents import read_documents

    docs = read_documents(spark, f"{sf_dir}/documents.parquet")
    clusters = neardup_clusters(docs, EngineConfig())
    n_docs = clusters.count()
    n_dup = clusters.filter("is_duplicate").count()
    cfg = EngineConfig(
        exact=ExactSubstrConfig(
            length_threshold=100, shard_bytes=32768, overlap_bytes=1024
        )
    )
    ranges, deduped = exactsubstr_dedup(docs, cfg)
    print(
        "SUBMIT_DEMO_RESULT "
        + json.dumps(
            {
                "docs": n_docs,
                "neardup_duplicates": n_dup,
                "remove_ranges": ranges.count(),
                "deduped_docs": deduped.count(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
