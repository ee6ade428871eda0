"""One A/B leg: run q_neardup + q_exactsubstr from the given repo tree.

Usage: python /tmp/ab_vs_r3.py <repo_path> <tag>
Runs each query twice (min-of-2, clearing cache between rounds, same as
bench main()) plus a raw-CPU control, prints one JSON line.
"""
import json
import os
import sys
import time

repo, tag = sys.argv[1], sys.argv[2]
os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "6g")
sys.path.insert(0, repo)
os.chdir(repo)

import importlib.util

spec = importlib.util.spec_from_file_location("benchmod", os.path.join(repo, "bench.py"))
bench = importlib.util.module_from_spec(spec)
sys.modules["benchmod"] = bench
spec.loader.exec_module(bench)

ctl = bench.raw_cpu_control(2, 8)

from deduplicate_text_datasets_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark("abr3", master="local[32]", shuffle_partitions=32,
                  extra={"spark.ui.enabled": "false"})
bench._docs(spark, SF).cache().count()

out = {"tag": tag, "control_eff": ctl["efficiency"]}
for name, fn in (("neardup", bench.q_neardup), ("exactsubstr", bench.q_exactsubstr)):
    walls = []
    for r in range(2):
        if r > 0:
            spark.catalog.clearCache()
            bench._docs(spark, SF).cache().count()
        t0 = time.time()
        fn(spark, SF)
        walls.append(round(time.time() - t0, 3))
    out[name] = {"walls": walls, "min": min(walls)}
spark.stop()
print("ABLEG " + json.dumps(out), flush=True)
