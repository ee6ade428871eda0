"""A/B the round-4 bucket co-partitioning on the NearDup flagship.

Same protocol as measure_exchange.py (which A/Bs the self-similar core):
each (mode, regime) runs in a fresh process with the Spark UI on; wall +
exact shuffle-task bytes from the UI REST API; interleaved rounds so a
host contention episode hits both modes; best-per-mode compared. Output
row counts are asserted identical across modes.

Usage: python scripts/ab_neardup.py [sf_dir] [--no-broadcast] [--rounds N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time, urllib.request
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from deduplicate_text_datasets_spark.session import get_spark
from deduplicate_text_datasets_spark.sources.documents import read_documents
from deduplicate_text_datasets_spark.config import EngineConfig
from deduplicate_text_datasets_spark.plans.pipeline import neardup_clusters

copart = sys.argv[1] == "1"
sf_dir = sys.argv[2]
no_broadcast = len(sys.argv) > 3 and sys.argv[3] == "nb"
extra = {{"spark.ui.enabled": "true"}}
if no_broadcast:
    extra["spark.sql.adaptive.autoBroadcastJoinThreshold"] = "-1"
spark = get_spark("ab-neardup", extra=extra)
docs = read_documents(spark, f"{{sf_dir}}/documents.parquet").cache()
docs.count()  # warm input so the timed section is the pipeline alone

# own UI endpoint + app id, never a hardcoded :4040 (round-4 ADVICE)
base = f"{{spark.sparkContext.uiWebUrl}}/api/v1/applications"
app_id = spark.sparkContext.applicationId

def shuffle_totals():
    stages = json.load(urllib.request.urlopen(f"{{base}}/{{app_id}}/stages"))
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    return w, r

w0, r0 = shuffle_totals()
t0 = time.time()
out = neardup_clusters(docs, EngineConfig(), copartition=copart)
n = out.count()
n_dup = out.filter("is_duplicate").count()
wall = time.time() - t0
time.sleep(1.0)
w1, r1 = shuffle_totals()
print(json.dumps({{
    "copartition": copart, "no_broadcast": no_broadcast,
    "rows": n, "dups": n_dup, "wall_s": round(wall, 2),
    "shuffle_write_bytes": w1 - w0, "shuffle_read_bytes": r1 - r0,
}}))
spark.stop()
"""


def run_mode(copart: bool, sf_dir: str, no_broadcast: bool) -> dict:
    argv = [
        sys.executable,
        "-c",
        CHILD.format(repo=REPO),
        "1" if copart else "0",
        sf_dir,
    ]
    if no_broadcast:
        argv.append("nb")
    out = subprocess.run(argv, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines()[::-1]:
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result line; stderr tail:\n{out.stderr[-2000:]}")


def main() -> None:
    nb = "--no-broadcast" in sys.argv
    rounds = 2
    argv = sys.argv[1:]
    if "--rounds" in argv:
        i = argv.index("--rounds")
        rounds = int(argv[i + 1])
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    results = []
    for _round in range(rounds):
        for copart in (False, True):
            results.append(run_mode(copart, sf_dir, nb))
            print(json.dumps(results[-1]), flush=True)
    best = {}
    for r in results:
        k = r["copartition"]
        if k not in best or r["wall_s"] < best[k]["wall_s"]:
            best[k] = r
    old, new = best[False], best[True]
    assert (old["rows"], old["dups"]) == (new["rows"], new["dups"]), (
        "mode outputs differ"
    )
    print(
        "FINAL "
        + json.dumps(
            {
                "sf_dir": sf_dir,
                "no_broadcast": nb,
                "old": old,
                "new": new,
                "shuffle_write_ratio": round(
                    new["shuffle_write_bytes"]
                    / max(1, old["shuffle_write_bytes"]),
                    3,
                ),
                "wall_ratio": round(
                    new["wall_s"] / max(1e-9, old["wall_s"]), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
