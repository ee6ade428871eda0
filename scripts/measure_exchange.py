"""Measure the exchange bytes of the self-similar (ExactSubstr core) job
with and without fingerprint co-partitioning (round-4 optimization:
repartition the persisted fingerprint frame by (h1, h2) so the stats agg
and join-back run exchange-free).

Each mode runs in its own fresh process/session with the Spark UI enabled;
total shuffle read/write bytes come from the UI REST API (exact task
metrics, not estimates). Usage:

    python scripts/measure_exchange.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time, urllib.request
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from deduplicate_text_datasets_spark.session import get_spark
from deduplicate_text_datasets_spark.sources.documents import read_documents
from deduplicate_text_datasets_spark.sources.corpus import (
    auto_shard_bytes, corpus_total_bytes, with_offsets,
)
from deduplicate_text_datasets_spark.config import ExactSubstrConfig
from deduplicate_text_datasets_spark.operators.suffix import self_similar

copart = sys.argv[1] == "1"
sf_dir = sys.argv[2]
no_broadcast = len(sys.argv) > 3 and sys.argv[3] == "nb"
extra = {{"spark.ui.enabled": "true"}}
if no_broadcast:
    # emulate the 100-TB regime where the dup-key stats frame outgrows the
    # AQE broadcast threshold: the join-back must co-locate by shuffle
    extra["spark.sql.adaptive.autoBroadcastJoinThreshold"] = "-1"
spark = get_spark("measure-exchange", extra=extra)
docs = read_documents(spark, f"{{sf_dir}}/documents.parquet")
d = with_offsets(docs, True).cache()
total = corpus_total_bytes(d)
cfg = ExactSubstrConfig(
    length_threshold=100,
    shard_bytes=auto_shard_bytes(total, int(os.environ["SPARK_GRAFT_CPUS"])),
    overlap_bytes=1024,
)
# warm the input cache so the timed section measures the dedup job alone
d.count()
# the session's OWN UI endpoint + app id — a hardcoded :4040 would silently
# read another app's task metrics when 4040 is already taken (round-4 ADVICE)
base = f"{{spark.sparkContext.uiWebUrl}}/api/v1/applications"
app_id = spark.sparkContext.applicationId

def shuffle_totals():
    stages = json.load(urllib.request.urlopen(f"{{base}}/{{app_id}}/stages"))
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    return w, r

w0, r0 = shuffle_totals()
t0 = time.time()
out = self_similar(d, cfg, copartition=copart)
n = out.count()
wall = time.time() - t0
time.sleep(1.0)  # let the UI ingest the final task metrics
w1, r1 = shuffle_totals()
print(json.dumps({{
    "copartition": copart, "no_broadcast": no_broadcast, "rows": n,
    "wall_s": round(wall, 2),
    "shuffle_write_bytes": w1 - w0, "shuffle_read_bytes": r1 - r0,
}}))
spark.stop()
"""


def run_mode(copart: bool, sf_dir: str, no_broadcast: bool = False) -> dict:
    script = CHILD.format(repo=REPO)
    argv = [sys.executable, "-c", script, "1" if copart else "0", sf_dir]
    if no_broadcast:
        argv.append("nb")
    out = subprocess.run(argv, capture_output=True, text=True, timeout=1200)
    for line in out.stdout.splitlines()[::-1]:
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result line; stderr tail:\n{out.stderr[-2000:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    nb = "--no-broadcast" in sys.argv
    results = []
    # interleave to ride out host contention episodes; keep best per mode
    for _round in range(2):
        for copart in (False, True):
            results.append(run_mode(copart, sf_dir, nb))
            print(json.dumps(results[-1]), flush=True)
    best = {}
    for r in results:
        k = r["copartition"]
        if k not in best or r["wall_s"] < best[k]["wall_s"]:
            best[k] = r
    old, new = best[False], best[True]
    summary = {
        "sf_dir": sf_dir,
        "no_broadcast": nb,
        "old": old,
        "new": new,
        "shuffle_write_ratio": round(
            new["shuffle_write_bytes"] / max(1, old["shuffle_write_bytes"]), 3
        ),
        "wall_ratio": round(new["wall_s"] / max(1e-9, old["wall_s"]), 3),
    }
    print("FINAL " + json.dumps(summary))


if __name__ == "__main__":
    main()
