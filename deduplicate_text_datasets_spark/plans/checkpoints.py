"""Stage checkpointing with per-partition lineage counters.

north_rule requirement: every pipeline stage persists alongside a lineage
record so any stage resumes mid-run. The reference's analogue is the
spawn-verify-retry loop over suffix-array parts
(scripts/make_suffix_array.py:59-86) — it checks output sizes and re-runs
missing parts; here the Spark scheduler owns task retries and this layer
owns *stage*-level resume + invariant verification.

Lineage record (_LINEAGE.json next to each stage's parquet):
  stage name, config fingerprint, upstream stage names, total rows, and
  per-file (=per-partition) row counters read from the parquet footers
  (no extra Spark job).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable
from dataclasses import asdict, is_dataclass

from pyspark.sql import DataFrame, SparkSession


def config_fingerprint(*objs) -> str:
    def norm(o):
        if is_dataclass(o):
            return asdict(o)
        return o

    blob = json.dumps([norm(o) for o in objs], sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _partition_counters(path: str) -> dict[str, int]:
    import pyarrow.parquet as pq

    out = {}
    for name in sorted(os.listdir(path)):
        if name.endswith(".parquet"):
            out[name] = pq.ParquetFile(os.path.join(path, name)).metadata.num_rows
    return out


class StageStore:
    """Persist/resume named stages under a base directory."""

    def __init__(self, spark: SparkSession, base_dir: str, fingerprint: str = ""):
        self.spark = spark
        self.base = base_dir
        self.fingerprint = fingerprint
        os.makedirs(base_dir, exist_ok=True)

    def _paths(self, name: str) -> tuple[str, str]:
        p = os.path.join(self.base, name)
        return p, os.path.join(self.base, f"{name}._LINEAGE.json")

    def has(self, name: str) -> bool:
        path, lineage = self._paths(name)
        if not (os.path.exists(lineage) and os.path.exists(path)):
            return False
        try:
            rec = json.load(open(lineage))
        except (json.JSONDecodeError, OSError):
            return False
        return rec.get("fingerprint") == self.fingerprint and rec.get("complete")

    def stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        upstream: list[str] | None = None,
    ) -> DataFrame:
        """Return the stage DataFrame, building+persisting it if absent.
        Re-entry with the same config fingerprint resumes from parquet."""
        path, lineage = self._paths(name)
        if self.has(name):
            return self.spark.read.parquet(path)
        t0 = time.time()
        df = build()
        df.write.mode("overwrite").parquet(path)
        counters = _partition_counters(path)
        rec = {
            "stage": name,
            "fingerprint": self.fingerprint,
            "upstream": upstream or [],
            "rows": sum(counters.values()),
            "partition_counters": counters,
            "wall_s": round(time.time() - t0, 3),
            "complete": True,
        }
        with open(lineage, "w") as f:
            json.dump(rec, f, indent=1)
        return self.spark.read.parquet(path)

    def lineage(self, name: str) -> dict:
        _, lineage = self._paths(name)
        return json.load(open(lineage))
