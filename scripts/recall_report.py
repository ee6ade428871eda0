"""Dup-pair recall of the LSH near-dup path vs EXACT shingle-Jaccard truth.

north_rule's headline correctness metric is "dup-pair recall >= 0.99 vs
the reference cluster assignments at identical shingle/signature config".
The per-round gate already hash-matches `neardup_clusters` against an
exact all-pairs DuckDB oracle at sf0.01 (recall = 1.0 by construction of
a hash match); this script records recall as an explicit NUMBER at any
scale, engine-vs-engine:

  truth  = operators.ngram.jaccard_pairs — exact inverted-index all-pairs
           shingle Jaccard >= tau (uncapped df so it is the full truth set)
  found  = operators.minhash.near_duplicate_edges — the production
           MinHash/LSH + exact-verify path at the same config
  recall = |found ∩ truth| / |truth|   (verify is exact => precision 1.0,
           asserted, not assumed)

Also reports end-to-end cluster agreement: connected components over
(found ∪ exact-dup) edges vs over (truth ∪ exact-dup) edges, as the
fraction of documents assigned to the identical cluster representative.

Usage: python scripts/recall_report.py [sf_dir]   (default $SPARK_GRAFT_SF_DIR
or /root/testdata/sf0.1). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from deduplicate_text_datasets_spark.config import MinHashConfig  # noqa: E402
from deduplicate_text_datasets_spark.operators.connected_components import (  # noqa: E402
    connected_components,
)
from deduplicate_text_datasets_spark.operators.exact import (  # noqa: E402
    exact_duplicate_edges,
)
from deduplicate_text_datasets_spark.operators.minhash import (  # noqa: E402
    near_duplicate_edges,
)
from deduplicate_text_datasets_spark.operators.ngram import jaccard_pairs  # noqa: E402
from deduplicate_text_datasets_spark.plans.caching import cache_scope  # noqa: E402
from deduplicate_text_datasets_spark.session import get_spark  # noqa: E402
from deduplicate_text_datasets_spark.sources.documents import (  # noqa: E402
    read_documents,
)


def _clusters(edges, nodes):
    assign = connected_components(edges, nodes=nodes)
    return assign.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def main() -> None:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    cfg = MinHashConfig()
    from fractions import Fraction

    frac = Fraction(cfg.jaccard_threshold).limit_denominator(1_000_000)
    spark = get_spark("recall-report")
    docs = read_documents(spark, f"{sf_dir}/documents.parquet").cache()
    n_docs = docs.count()

    with cache_scope():
        truth = (
            jaccard_pairs(
                docs,
                cfg,
                threshold_num=frac.numerator,
                threshold_den=frac.denominator,
                max_shingle_df=2**31,  # uncapped: the FULL truth set
            )
            .select("a", "b")
            .cache()
        )
        found = near_duplicate_edges(docs, cfg).select("a", "b").cache()
        n_truth, n_found = truth.count(), found.count()
        n_hit = found.join(truth, ["a", "b"], "left_semi").count()
        # exact-verify precision check: every found pair must be in truth
        n_false = n_found - n_hit

        ex = exact_duplicate_edges(docs).select(
            F.col("src").alias("a"), F.col("dst").alias("b")
        )
        nodes = docs.select(F.col("doc_id").alias("node"))

        def edge_frame(pairs):
            return (
                pairs.unionByName(ex)
                .select(F.col("a").alias("src"), F.col("b").alias("dst"))
                .distinct()
            )

        c_found = _clusters(edge_frame(found), nodes)
        c_truth = _clusters(edge_frame(truth), nodes)
        agree = (
            c_found.alias("f")
            .join(c_truth.alias("t"), "doc_id")
            .filter(F.col("f.cluster_id") == F.col("t.cluster_id"))
            .count()
        )

    out = {
        "sf_dir": sf_dir,
        "docs": n_docs,
        "jaccard_threshold": f"{frac.numerator}/{frac.denominator}",
        "true_pairs": n_truth,
        "found_pairs": n_found,
        "false_pairs": n_false,
        "pair_recall": round(n_hit / n_truth, 6) if n_truth else 1.0,
        "pair_precision": round(n_hit / n_found, 6) if n_found else 1.0,
        "cluster_agreement": round(agree / n_docs, 6) if n_docs else 1.0,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
