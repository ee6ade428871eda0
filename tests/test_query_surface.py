"""Query-surface parity: positions, membership, text-corpus readers,
tokenize emulation, across-corpus pipeline."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from deduplicate_text_datasets_spark.config import EngineConfig, ExactSubstrConfig
from deduplicate_text_datasets_spark.functions.text import (
    bpe_ish_tokens,
    pack_u16_le,
    token_ids_u16,
)
from deduplicate_text_datasets_spark.operators.suffix import contains, find_positions
from deduplicate_text_datasets_spark.oracle import pyref
from deduplicate_text_datasets_spark.sources.corpus import with_offsets
from deduplicate_text_datasets_spark.sources.documents import (
    DOCUMENTS_SCHEMA,
    read_text_corpus,
    synth_documents_pandas,
)

CFG = ExactSubstrConfig(
    length_threshold=50, shard_bytes=4096, overlap_bytes=256, with_separators=True
)


@pytest.fixture(scope="module")
def fixture_pdf():
    return synth_documents_pandas(60, size_lo=30, size_hi=120)


@pytest.fixture(scope="module")
def docs(spark, fixture_pdf):
    d = with_offsets(
        spark.createDataFrame(fixture_pdf, schema=DOCUMENTS_SCHEMA), True
    )
    d.cache().count()
    return d


def test_find_positions_matches_oracle(spark, docs, fixture_pdf):
    texts = [t.encode() for t in fixture_pdf["text"]]
    corpus, _ = pyref.build_corpus(texts, with_separators=True)
    q = texts[0][:40]
    expected = []
    i = corpus.find(q)
    while i != -1:
        expected.append(i)
        i = corpus.find(q, i + 1)
    got = sorted(
        r["pos"] for r in find_positions(docs, [(0, q)], CFG).collect()
    )
    assert got == expected and expected


def test_contains(spark, docs, fixture_pdf):
    q_present = fixture_pdf["text"][3][:30].encode()
    got = {
        r["query_id"]: r["present"]
        for r in contains(docs, [(0, q_present), (1, b"zq-absent-zq")], CFG).collect()
    }
    assert got == {0: True, 1: False}


def test_read_text_corpus_jsonl(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    with open(d / "c.jsonl", "w") as f:
        for i in range(7):
            f.write(json.dumps({"text": f"doc {i} body words here"}) + "\n")
    tc = read_text_corpus(spark, str(d / "c.jsonl"))
    assert tc.count() == 7
    assert tc.columns == ["doc_id", "url", "warc_ts", "html", "text", "lang"]
    rows = {r["doc_id"]: r["text"] for r in tc.collect()}
    assert sorted(rows.values()) == sorted(f"doc {i} body words here" for i in range(7))


def test_tokenize_u16_pack(spark):
    df = spark.createDataFrame(
        [("hello world, it's 42 degrees",)], "text string"
    )
    row = df.select(
        bpe_ish_tokens("text").alias("toks"),
        F.size(token_ids_u16("text")).alias("n"),
        F.octet_length(pack_u16_le(token_ids_u16("text"))).alias("nbytes"),
        token_ids_u16("text").alias("ids"),
        pack_u16_le(token_ids_u16("text")).alias("packed"),
    ).collect()[0]
    assert row["nbytes"] == 2 * row["n"]  # uint16 LE pairs (load_dataset.py:63-69)
    import struct

    unpacked = list(struct.unpack(f"<{row['n']}H", bytes(row["packed"])))
    assert unpacked == list(row["ids"])
    assert all(0 <= i < 65536 for i in row["ids"])
    assert "".join(row["toks"]) == "hello world, it's 42 degrees"


def test_across_dedup_pipeline(spark, fixture_pdf):
    from deduplicate_text_datasets_spark.plans.pipeline import across_dedup
    from deduplicate_text_datasets_spark.sources.documents import (
        synth_documents_pandas as synth,
    )

    pdf_b = synth(20, size_lo=30, size_hi=120).copy()
    pdf_b.loc[5, "text"] = fixture_pdf["text"][2]  # contaminate B with A's doc 2
    docs_a = spark.createDataFrame(fixture_pdf, schema=DOCUMENTS_SCHEMA)
    docs_b = spark.createDataFrame(pdf_b, schema=DOCUMENTS_SCHEMA)
    cfg = EngineConfig(exact=CFG)
    dups_a, ranges_a, deduped_a = across_dedup(docs_a, docs_b, cfg)

    texts_a = [t.encode() for t in fixture_pdf["text"]]
    texts_b = [t.encode() for t in pdf_b["text"]]
    corpus_a, sizes_a = pyref.build_corpus(texts_a, True)
    corpus_b, _ = pyref.build_corpus(texts_b, True)
    exp_a, _ = pyref.across_similar_positions(corpus_a, corpus_b, CFG.length_threshold)
    assert sorted(r["pos"] for r in dups_a.collect()) == exp_a and exp_a
    exp_ranges = pyref.collect_ranges(exp_a, CFG.length_threshold)
    assert sorted((r["start"], r["end"]) for r in ranges_a.collect()) == exp_ranges
    exp_texts = pyref.apply_removals(texts_a, sizes_a, exp_ranges, True)
    got = {r["doc_id"]: bytes(r["deduped"]) for r in deduped_a.collect()}
    assert [got[k] for k in range(len(texts_a))] == exp_texts
