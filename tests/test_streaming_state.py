"""Stateful streaming exact-dedup (applyInPandasWithState).

Covers: within-trigger dedup (min-doc_id canonical), cross-restart state
recovery via the checkpoint (a duplicate arriving after a restart is
flagged against the canonical seen before it), and n_prior accounting.
"""

from __future__ import annotations

import pandas as pd


def _write_batch(spark, rows, in_dir, name):
    """File-source streams only see files directly in the monitored dir
    (no recursion) — write via a scratch dir and move the part file in."""
    import glob
    import os
    import shutil

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    scratch = os.path.join(os.path.dirname(in_dir), f"_scratch_{name}")
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(scratch)
    os.makedirs(in_dir, exist_ok=True)
    (part,) = glob.glob(os.path.join(scratch, "part-*.parquet"))
    shutil.move(part, os.path.join(in_dir, f"{name}.parquet"))
    shutil.rmtree(scratch)


def _drain(spark, dirs, schema):
    from deduplicate_text_datasets_spark.streaming.stateful import (
        start_stateful_dedup,
    )

    q = start_stateful_dedup(
        spark,
        dirs["in"],
        dirs["out"],
        dirs["chk"],
        schema,
        available_now=True,
    )
    q.awaitTermination()  # availableNow terminates once the backlog drains
    return {
        r["doc_id"]: r
        for r in spark.read.parquet(dirs["out"]).collect()
    }


def test_stateful_dedup_across_restarts(spark, tmp_path):
    dirs = {
        "in": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "chk": str(tmp_path / "chk"),
    }
    schema = "doc_id long, text string"

    # trigger 1: B duplicates A within the batch; C is unique
    _write_batch(
        spark,
        [(10, "the same page body"), (11, "the same page body"), (12, "unique one")],
        dirs["in"],
        "b1",
    )
    out1 = _drain(spark, dirs, schema)
    assert out1[10]["keep"] and out1[10]["canonical"] == 10
    assert not out1[11]["keep"] and out1[11]["canonical"] == 10
    assert out1[12]["keep"]
    assert out1[10]["n_prior"] == 0 and out1[11]["n_prior"] == 0

    # trigger 2 after a full restart: D duplicates A (state recovered from
    # the checkpoint), E duplicates C, F is novel
    _write_batch(
        spark,
        [(20, "the same page body"), (21, "unique one"), (22, "brand new")],
        dirs["in"],
        "b2",
    )
    out2 = _drain(spark, dirs, schema)
    assert not out2[20]["keep"] and out2[20]["canonical"] == 10
    assert out2[20]["n_prior"] == 2  # A and B preceded it
    assert not out2[21]["keep"] and out2[21]["canonical"] == 12
    assert out2[22]["keep"] and out2[22]["canonical"] == 22

    # exactly one keep per fingerprint across the stream's lifetime
    all_rows = list(out1.values()) + [out2[k] for k in (20, 21, 22)]
    by_fp: dict[int, int] = {}
    for r in all_rows:
        by_fp[r["fingerprint"]] = by_fp.get(r["fingerprint"], 0) + int(r["keep"])
    assert set(by_fp.values()) == {1}


def test_stateful_dedup_batch_parity(spark, tmp_path):
    """Drained-stream keeps == batch exact-dedup keeps on the same rows
    (the operator is the streaming refinement of the batch groupBy)."""
    from deduplicate_text_datasets_spark.functions.text import doc_fingerprint
    import pyspark.sql.functions as F

    dirs = {
        "in": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "chk": str(tmp_path / "chk"),
    }
    rows = [(i, f"body {i % 7}") for i in range(30)]
    _write_batch(spark, rows, dirs["in"], "b1")
    out = _drain(spark, dirs, "doc_id long, text string")

    batch = (
        spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        .select("doc_id", doc_fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("canonical"))
    )
    expected_keeps = {r["canonical"] for r in batch.collect()}
    assert {d for d, r in out.items() if r["keep"]} == expected_keeps
    assert len(out) == 30
