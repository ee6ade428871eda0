"""Scaling diagnosis probe: which phase inverts between local[8] and
local[32] on this host. Usage: python scripts/scaling_probe.py MODE CORES
MODE in {jvm, kernel, shingle, fingerprint, pairs}. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from deduplicate_text_datasets_spark.config import (  # noqa: E402
    ExactSubstrConfig,
    MinHashConfig,
)
from deduplicate_text_datasets_spark.session import get_spark  # noqa: E402

N_DOCS = int(os.environ.get("PROBE_DOCS", "6000"))


def docs_frame(spark):
    from deduplicate_text_datasets_spark.sources.documents import synth_documents

    d = synth_documents(spark, N_DOCS, size_lo=300, size_hi=800).select(
        "doc_id", "url", "text"
    ).repartition(64).cache()
    d.count()
    return d


def run(mode: str, cores: int) -> dict:
    extra = {}
    if os.environ.get("SPARK_GRAFT_LEG_NOAQE"):
        extra = {"spark.sql.adaptive.enabled": "false",
                 "spark.locality.wait": "0"}
    spark = get_spark(f"probe-{mode}-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores, extra=extra)
    t_gen0 = time.time()
    out: dict = {"mode": mode, "cores": cores}

    if mode == "jvm":
        def job():
            return (
                spark.range(0, 100_000_000)
                .groupBy((F.col("id") % 997).alias("k"))
                .agg(F.count(F.lit(1)), F.sum("id"))
                .count()
            )
        job()
        t0 = time.time(); job(); out["wall"] = time.time() - t0
        spark.stop()
        return out

    d = docs_frame(spark)
    out["gen"] = round(time.time() - t_gen0, 2)
    cfg = MinHashConfig()

    if mode == "kernel":
        # signature kernel only (shingles precomputed & cached)
        from deduplicate_text_datasets_spark.operators.minhash import (
            doc_shingles,
            minhash_signatures,
        )
        sh = doc_shingles(d, cfg).cache(); sh.count()
        minhash_signatures(sh, cfg).count()
        t0 = time.time(); minhash_signatures(sh, cfg).count()
        out["wall"] = time.time() - t0
    elif mode == "shingle":
        from deduplicate_text_datasets_spark.operators.minhash import doc_shingles
        doc_shingles(d, cfg).count()
        t0 = time.time(); doc_shingles(d, cfg).count()
        out["wall"] = time.time() - t0
    elif mode == "fingerprint":
        from deduplicate_text_datasets_spark.operators.suffix import (
            window_fingerprints,
        )
        from deduplicate_text_datasets_spark.sources.corpus import (
            corpus_total_bytes,
            with_offsets,
        )
        ecfg = ExactSubstrConfig(
            length_threshold=100, shard_bytes=165533, overlap_bytes=1024
        )
        dd = with_offsets(d, True).cache()
        total = corpus_total_bytes(dd)
        window_fingerprints(dd, ecfg, total).count()
        t0 = time.time(); window_fingerprints(dd, ecfg, total).count()
        out["wall"] = time.time() - t0
    elif mode == "selfsim":
        from deduplicate_text_datasets_spark.operators.suffix import self_similar
        from deduplicate_text_datasets_spark.sources.corpus import (
            corpus_total_bytes,
            with_offsets,
        )
        ecfg = ExactSubstrConfig(
            length_threshold=100,
            shard_bytes=int(os.environ.get("PROBE_SHARD", "331066")),
            overlap_bytes=1024,
        )
        dd = with_offsets(d, True).cache()
        total = corpus_total_bytes(dd)
        self_similar(dd, ecfg, total).count()
        spark.catalog.clearCache()
        dd = with_offsets(d, True).cache(); dd.count()
        t0 = time.time(); self_similar(dd, ecfg, total).count()
        out["wall"] = time.time() - t0
    elif mode == "pairs":
        from deduplicate_text_datasets_spark.operators.minhash import (
            candidate_pairs,
            doc_shingles,
            lsh_buckets,
            minhash_signatures,
        )
        def job():
            sh = doc_shingles(d, cfg)
            return candidate_pairs(
                lsh_buckets(minhash_signatures(sh, cfg), cfg), cfg
            ).count()
        job()
        spark.catalog.clearCache(); d.unpersist(); d.persist(); d.count()
        t0 = time.time(); job(); out["wall"] = time.time() - t0
    spark.stop()
    return out


if __name__ == "__main__":
    r = run(sys.argv[1], int(sys.argv[2]))
    r["wall"] = round(r["wall"], 2)
    print(json.dumps(r))
