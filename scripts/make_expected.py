"""Materialize the engine-independent golden sidecars for the four
hash-vocabulary gate queries (round-4 verdict item 4).

Usage: python scripts/make_expected.py [sf_dir ...]
       (default: /root/testdata/sf0.001 /root/testdata/sf0.01)

For each sf dir, writes oracle_expected/<sf_name>/<query>.parquet under
the repo root, computed by oracle/expected.py (pure Python: xxh64 +
pyref + re/hashlib — NO Spark, NO engine operators). __spark_entry__.
oracle_sql() then serves these as plain DuckDB SELECTs, closing the
`no_oracle` gate rows. Gate configs mirrored from __spark_entry__:
MinHashConfig()/SimHashConfig() defaults; tokenized length_threshold=100.
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deduplicate_text_datasets_spark.config import (  # noqa: E402
    MinHashConfig,
    SimHashConfig,
)
from deduplicate_text_datasets_spark.oracle.expected import (  # noqa: E402
    minhash_signatures_expected,
    simhash_pairs_expected,
    tokenized_deduped_expected,
    tokenized_self_similar_expected,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOKENIZED_L = 100  # __spark_entry__ tokenized gate config (50 tokens x 2)


def make_for(sf_dir: str) -> None:
    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(REPO, "oracle_expected", name)
    os.makedirs(out_dir, exist_ok=True)
    docs = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    jobs = {
        "minhash_signatures": lambda: minhash_signatures_expected(
            docs, MinHashConfig()
        ),
        "simhash_pairs": lambda: simhash_pairs_expected(docs, SimHashConfig()),
        "tokenized_self_similar": lambda: tokenized_self_similar_expected(
            docs, TOKENIZED_L
        ),
        "tokenized_deduped_docs": lambda: tokenized_deduped_expected(
            docs, TOKENIZED_L
        ),
    }
    for q, fn in jobs.items():
        t0 = time.time()
        df = fn()
        path = os.path.join(out_dir, f"{q}.parquet")
        df.to_parquet(path, index=False)
        print(f"  {name}/{q}: {len(df)} rows  {time.time() - t0:.1f}s")


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    for d in dirs:
        make_for(d)
