"""Recall@k of the IVF coarse-quantizer ANN path vs exact brute force.

The `ann_ivf_topk` gate checks the IVF machinery at nprobe == nlist (where
it is definitionally exact); this script records the APPROXIMATE regime as
an explicit number: for each nprobe it runs `ivf_topk` and reports
recall@k against `cosine_topk` (the exact broadcast brute-force path) on
the same embeddings table, plus the candidate fraction actually scored
(nprobe/nlist = the scan-cost reduction the index buys).

Usage: python scripts/ivf_recall.py [sf_dir] [nlist] [k]
(defaults: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1, nlist=32, k=10).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from deduplicate_text_datasets_spark.operators.ann import (  # noqa: E402
    cosine_topk,
    ivf_topk,
)
from deduplicate_text_datasets_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    nlist = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("ivf_recall", master="local[8]", shuffle_partitions=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.cache().count()
    n_queries = 50
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth: dict[int, set[int]] = {}
    for r in cosine_topk(emb, queries, k=k).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    total = sum(len(v) for v in truth.values())
    out = {
        "sf_dir": sf_dir,
        "n_vectors": emb.count(),
        "n_queries": n_queries,
        "nlist": nlist,
        "k": k,
        "recall_at_k": {},
    }
    for nprobe in (1, 2, 4, 8, nlist):
        got: dict[int, set[int]] = {}
        rows = ivf_topk(
            emb, queries, dim=64, k=k, nlist=nlist, nprobe=nprobe
        ).collect()
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        out["recall_at_k"][f"nprobe={nprobe}"] = {
            "recall": round(hits / total, 4),
            "candidate_fraction": round(nprobe / nlist, 4),
        }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
