"""Training-data-pipeline extensions: text analysis, embedding ANN,
multimodal plumbing — vs driver-side numpy/python oracles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deduplicate_text_datasets_spark.operators.ann import (
    cosine_pairs,
    cosine_topk,
    cosine_topk_lsh,
    hyperplane_buckets,
)
from deduplicate_text_datasets_spark.operators.multimodal import (
    exact_media_duplicates,
    extract_features,
    frame_sample,
)
from deduplicate_text_datasets_spark.operators.textstats import (
    doc_stats,
    lang_id,
    quality_score,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(123)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    # plant near-identical pairs
    vecs[10] = vecs[11] + 0.001 * rng.standard_normal(16).astype(np.float32)
    vecs[20] = vecs[21]
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df.cache().count()
    return df, vecs


def _cos(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_cosine_topk_exact(spark, emb):
    df, vecs = emb
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk(df, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for q in range(3):
        sims = sorted(
            ((-_cos(vecs[q], vecs[j]), j) for j in range(200) if j != q)
        )[:5]
        expect = [j for _, j in sims]
        ranked = [n for _, n in sorted(by_q[q])]
        assert ranked == expect, f"query {q}"


def test_cosine_topk_lsh_recall(spark, emb):
    """Random-hyperplane LSH must recover truly-similar neighbors (the
    agreement probability per bit is 1-θ/π, ≈0.99 at cosine 0.999); random
    gaussian pairs (cosine ~0.3) are legitimately missed."""
    df, vecs = emb
    queries = df.filter(F.col("vec_id").isin([10, 20])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk_lsh(df, queries, dim=16, k=3, nbits=4).collect()
    }
    assert approx[(10, 1)] == 11
    assert approx[(20, 1)] == 21


def test_cosine_pairs_finds_planted(spark, emb):
    df, _ = emb
    pairs = {
        (r["a"], r["b"])
        for r in cosine_pairs(df, dim=16, threshold=0.99, method="lsh").collect()
    }
    assert (20, 21) in pairs
    assert (10, 11) in pairs


def test_cosine_pairs_lsh_matches_exact(spark, emb):
    """Banded multi-table LSH sized for 1e-5 miss at the threshold must
    reproduce the exact all-pairs result on a borderline threshold (the
    round-1 single-table variant returned 0 of 1 true pairs at c=0.5)."""
    df, vecs = emb
    exact = {
        (r["a"], r["b"], r["cos_mil"])
        for r in cosine_pairs(df, dim=16, threshold=0.6, method="exact").collect()
    }
    lsh = {
        (r["a"], r["b"], r["cos_mil"])
        for r in cosine_pairs(
            df, dim=16, threshold=0.6, method="lsh", bits=4, target_recall=0.99999
        ).collect()
    }
    assert lsh == exact
    # and the exact set agrees with numpy ground truth
    truth = {
        (a, b)
        for a in range(200)
        for b in range(a + 1, 200)
        if _cos(vecs[a], vecs[b]) >= 0.6
    }
    assert {(a, b) for a, b, _ in exact} == truth


def test_hyperplane_buckets_deterministic(spark, emb):
    df, _ = emb
    b1 = {r["vec_id"]: r["bucket"] for r in hyperplane_buckets(df, 16, 8).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in hyperplane_buckets(df, 16, 8).collect()}
    assert b1 == b2
    assert b1[20] == b1[21]  # identical vectors share a bucket


@pytest.fixture(scope="module")
def textdocs(spark):
    rows = [
        (0, "the cat and the dog sat on the mat and then the cat ran", "en"),
        (1, "der hund und die katze und der vogel und das haus", "de"),
        (2, "le chat et la maison et les arbres et des fleurs", "fr"),
        (3, "x", "und"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_doc_stats(spark, textdocs):
    got = {r["doc_id"]: r for r in doc_stats(textdocs).collect()}
    t0 = "the cat and the dog sat on the mat and then the cat ran"
    assert got[0]["n_bytes"] == len(t0)
    assert got[0]["n_tokens"] == len(t0.split())
    assert got[0]["space_ratio"] == pytest.approx(
        t0.count(" ") / len(t0), abs=1e-6
    )
    padded = f" {t0} "
    assert got[0]["en_stopwords"] == padded.count(" the ") + padded.count(" and ")


def test_lang_id(spark, textdocs):
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(textdocs).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "und"


def test_quality_score_bounds(spark, textdocs):
    got = {r["doc_id"]: r["quality"] for r in quality_score(textdocs).collect()}
    assert all(0 <= v <= 1 for v in got.values())
    assert got[3] < got[0]  # one-token doc scores below a real sentence


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", bytes(range(256)) * 4, {"w": "16", "h": "16"}),
        (1, "image", bytes(range(256)) * 4, {"w": "16", "h": "16"}),  # dup payload
        (2, "audio", b"\x00\x01" * 500, {"sr": "16000"}),
        (3, "video", bytes(range(100)) * 40, {"fps": "30"}),
    ]
    from deduplicate_text_datasets_spark.operators.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_fake_decoder(spark, media):
    got = {r["doc_id"]: r for r in extract_features(media, dim=8).collect()}
    assert len(got) == 4
    assert got[0]["content_sha"] == got[1]["content_sha"]
    assert got[0]["feature"] == got[1]["feature"]
    assert abs(sum(got[0]["feature"]) - 1.0) < 1e-9  # normalized histogram
    assert got[0]["n_bytes"] == 1024


def test_extract_features_real_decoder_stub(spark, media):
    import py4j.protocol

    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        extract_features(media, dim=8, decoder="real").collect()


def test_frame_sample(spark, media):
    frames = frame_sample(media, every_n_bytes=512, frame_bytes=64).collect()
    v = [r for r in frames if r["doc_id"] == 3]
    assert len(v) == 8  # 4000 bytes / 512
    assert all(len(r["frame"]) == 64 for r in v[:-1])


def test_exact_media_duplicates(spark, media):
    got = {r["doc_id"]: r["group_id"] for r in exact_media_duplicates(media).collect()}
    assert got[0] == got[1] == 0
    assert got[2] == 2 and got[3] == 3


def test_cosine_pairs_salted_buckets_parity(spark, emb):
    """Forcing every hyperplane bucket through the grid-salted self-join
    (cap=2) must reproduce the plain LSH path's pairs bit-for-bit —
    salting re-distributes the bucket self-join, never changes it."""
    df, _ = emb
    kw = dict(dim=16, threshold=0.6, method="lsh", bits=4,
              target_recall=0.99999)
    plain = {
        (r["a"], r["b"], r["cos_mil"])
        for r in cosine_pairs(df, **kw).collect()
    }
    salted = {
        (r["a"], r["b"], r["cos_mil"])
        for r in cosine_pairs(
            df, **kw, max_bucket_size=2, salted_bucket_max=10**6
        ).collect()
    }
    assert len(plain) > 0 and salted == plain
