"""Round-6 profiling companion to bench.py (bench.py itself is frozen for
measurement). Runs the headline queries under the same session config with
the Spark UI enabled and reports, per query round: wall, job count, and the
top jobs/stages by duration with shuffle bytes — the guide §1 "measure
first" instrument.

Usage:
  python bench_extra.py [sf_dir] [query ...]     profile headline queries
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (frozen harness: reuse its query functions)
from deduplicate_text_datasets_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else bench.SF_DIR
NAMES = sys.argv[2:] or list(bench.HEADLINE)
ROUNDS = int(os.environ.get("SPARK_GRAFT_HEADLINE_ROUNDS", "2"))


def _ms(v: str) -> float:
    """Parse a '123' / '1.2 s' / '456 ms'-style metric value to ms."""
    import re

    m = re.search(r"([\d.]+)\s*(ms|s|m)?", str(v))
    if not m:
        return 0.0
    x = float(m.group(1))
    return x * {"ms": 1, "s": 1000, "m": 60000, None: 1}.get(m.group(2), 1)


def api(base: str, app_id: str, path: str):
    with urllib.request.urlopen(f"{base}/{app_id}/{path}") as r:
        return json.load(r)


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "6g")
    spark = get_spark(
        "bench-extra",
        master=f"local[{bench.CPUS}]",
        shuffle_partitions=bench.CPUS,
        extra={"spark.ui.enabled": "true"},
    )
    base = f"{spark.sparkContext.uiWebUrl}/api/v1/applications"
    app_id = spark.sparkContext.applicationId
    bench._docs(spark, SF_DIR).cache().count()

    results = {}
    for name in NAMES:
        fn = bench.HEADLINE[name]
        walls = []
        for r in range(ROUNDS):
            if r > 0:
                spark.catalog.clearCache()
                bench._docs(spark, SF_DIR).cache().count()
            sql_before = {
                e["id"] for e in api(base, app_id, "sql?offset=0&length=10000")
            }
            jobs_before = {j["jobId"] for j in api(base, app_id, "jobs")}
            spark.sparkContext.setJobDescription(f"{name} r{r}")
            t0 = time.time()
            fn(spark, SF_DIR)
            wall = time.time() - t0
            spark.sparkContext.setJobDescription(None)
            walls.append(round(wall, 3))
            jobs = [
                j
                for j in api(base, app_id, "jobs")
                if j["jobId"] not in jobs_before
            ]
            jobs.sort(key=lambda j: j["jobId"])
            print(f"\n=== {name} round {r}: {wall:.3f}s, {len(jobs)} jobs ===")
            round_stage_ids = set()
            for j in jobs:
                from datetime import datetime

                def ts(s):
                    return datetime.strptime(
                        s.split("GMT")[0], "%Y-%m-%dT%H:%M:%S.%f"
                    ).timestamp()

                dur = ts(j["completionTime"]) - ts(j["submissionTime"])
                round_stage_ids.update(j["stageIds"])
                print(
                    f"  job {j['jobId']:>4} {dur:7.3f}s stages={len(j['stageIds'])} "
                    f"tasks={j['numCompletedTasks']:>4} {j.get('description','')[:70]}"
                )
            if r == ROUNDS - 1 and os.environ.get("SPARK_GRAFT_PROF_STAGES", "1") != "0":
                st = [
                    s
                    for s in api(base, app_id, "stages?status=COMPLETE")
                    if s["stageId"] in round_stage_ids
                ]
                st.sort(key=lambda s: -(s.get("executorRunTime", 0)))
                print(f"  --- warm-round stages by core time ({name}) ---")
                for s in st[:14]:
                    det = [
                        ln.strip()
                        for ln in s.get("details", "").splitlines()
                        if "/repo/" in ln
                    ]
                    print(
                        f"  stage {s['stageId']:>4} core={s['executorRunTime']/1e3:7.2f}s "
                        f"tasks={s['numCompleteTasks']:>3} "
                        f"shW={s.get('shuffleWriteBytes',0)/1e6:7.1f}MB "
                        f"shR={s.get('shuffleReadBytes',0)/1e6:7.1f}MB  "
                        f"{s['name'][:40]} | {' <- '.join(det[:3])[:160]}"
                    )
                sqls = [
                    e
                    for e in api(
                        base, app_id, "sql?offset=0&length=10000&details=true"
                    )
                    if e["id"] not in sql_before
                ]
                sqls.sort(key=lambda e: -e.get("duration", 0))
                print(f"  --- warm-round SQL executions ({name}) ---")
                for e in sqls[:12]:
                    nodes = sorted(
                        e.get("nodes", []),
                        key=lambda nd: -max(
                            (
                                _ms(v)
                                for m in nd.get("metrics", [])
                                for v in [m.get("value", "")]
                                if "total (min, med, max" in m.get("name", "")
                                or "time" in m.get("name", "")
                            ),
                            default=0,
                        ),
                    )
                    top = ", ".join(
                        f"{nd['nodeName']}"
                        for nd in nodes[:4]
                        if nd.get("metrics")
                    )
                    print(
                        f"  sql {e['id']:>4} {e.get('duration',0)/1e3:7.2f}s "
                        f"jobs={len(e.get('successJobIds',[]))} [{top[:130]}]"
                    )
        results[name] = walls
        print(f"[prof] {name}: {walls}")

    # stage-level rollup for the whole run
    stages = api(base, app_id, "stages?status=COMPLETE")
    stages.sort(key=lambda s: -(s.get("executorRunTime", 0)))
    print("\n=== top stages by executor run time (whole session) ===")
    for s in stages[:25]:
        print(
            f"  stage {s['stageId']:>4} run={s['executorRunTime']/1e3:8.1f}cs "
            f"tasks={s['numCompleteTasks']:>4} "
            f"shW={s.get('shuffleWriteBytes',0)/1e6:8.1f}MB "
            f"shR={s.get('shuffleReadBytes',0)/1e6:8.1f}MB  {s['name'][:60]}"
        )
    print(json.dumps({"walls": results}))
    spark.stop()


if __name__ == "__main__":
    main()
