"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship NearDup clustering pipeline at sf0.001.
``queries()`` exposes one entry per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives a DuckDB oracle for EVERY query (value-hash gate at
sf=0.01): SQL-expressible ones as live SQL over the input tables; the four
xxhash64-based kernels (MinHash signatures, SimHash pairs, tokenized
self-similar/strike) as plain SELECTs over engine-independent golden
sidecars (oracle_expected/, computed by oracle/expected.py — pure-Python
xxh64 + pyref semantics; regenerate via scripts/make_expected.py) and
additionally oracle-tested in pytest against brute-force Python (tests/).

Column-name/type parity: every computed column is aliased identically on
both sides and floats are avoided (or floor-scaled to integers) so the
driver's order-insensitive value hash matches bit-for-bit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deduplicate_text_datasets_spark.config import (  # noqa: E402
    EngineConfig,
    ExactSubstrConfig,
    MinHashConfig,
    SimHashConfig,
)

# Small shards at test scale so the gate exercises multi-shard ownership;
# at production scale shard_bytes is 64 MiB (config.py).
EXACT_CFG = ExactSubstrConfig(
    length_threshold=100, shard_bytes=32768, overlap_bytes=1024
)
# Separator-free variant for the SQL-gated self-similar queries: the DuckDB
# oracle rebuilds the flat corpus with string_agg, which cannot express the
# reference's \xff\xff+uid separator bytes (windows spanning separators with
# coinciding uid low-bytes are real duplicates in separator mode — covered
# by pytest against oracle/pyref.py instead).
SS_CFG = ExactSubstrConfig(
    length_threshold=100, shard_bytes=32768, overlap_bytes=1024,
    with_separators=False,
)
MH_CFG = MinHashConfig()
SH_CFG = SimHashConfig()

# deterministic point queries: (query_id, doc_id, substr start, substr len)
_COUNT_QUERIES = [(0, 0, 11, 20), (1, 1, 5, 24), (2, 2, 1, 30)]
_ABSENT_QUERY = (3, "zzqqzzqq not present zzqqzzqq")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deduplicate_text_datasets_spark.sources.documents import read_documents

    return read_documents(spark, f"{sf_dir}/documents.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: NearDup clustering (MinHash+LSH ∪ exact-dup -> connected
    components) over sf0.001 documents."""
    from deduplicate_text_datasets_spark.plans.pipeline import neardup_clusters

    docs = _docs(spark, "/root/testdata/sf0.001")
    return neardup_clusters(docs, EngineConfig())


# ---------------------------------------------------------------------------
# queries()
# ---------------------------------------------------------------------------


def _q_global_offsets(spark, sf_dir):
    from deduplicate_text_datasets_spark.sources.corpus import with_offsets

    return with_offsets(_docs(spark, sf_dir), with_separators=True).select(
        "doc_id", "byte_start", "byte_end"
    )


def _q_exact_dup_groups(spark, sf_dir):
    from deduplicate_text_datasets_spark.operators.exact import exact_duplicates

    return exact_duplicates(_docs(spark, sf_dir))


def _q_cc_clusters(spark, sf_dir):
    from deduplicate_text_datasets_spark.operators.connected_components import (
        connected_components,
    )

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    edges = nation.select(
        F.col("n_nationkey").cast("long").alias("src"),
        ((F.col("n_nationkey") * 7) % 25).cast("long").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    # restrict to nodes that appear in edges (oracle reach covers only those)
    enodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    return connected_components(edges, nodes=enodes).orderBy("node")


def _q_count_occurrences(spark, sf_dir):
    from deduplicate_text_datasets_spark.operators.suffix import count_occurrences

    docs = _docs(spark, sf_dir)
    out = count_occurrences(docs, _count_query_list(spark, sf_dir), EXACT_CFG)
    return out.select("query_id", F.col("count").alias("n_matches"))


def _count_query_list(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    rows = (
        docs.filter(F.col("doc_id").isin([d for _, d, _, _ in _COUNT_QUERIES]))
        .select("doc_id", "text")
        .collect()
    )
    texts = {r["doc_id"]: r["text"] for r in rows}
    return [
        (qid, texts[d][start - 1 : start - 1 + ln].encode())
        for qid, d, start, ln in _COUNT_QUERIES
    ] + [(_ABSENT_QUERY[0], _ABSENT_QUERY[1].encode())]


def _q_count_occurrences_indexed(spark, sf_dir):
    """Build-once / query-many parity (README.md:86 build, :98 ms lookup):
    the suffix index is persisted to parquet on first use and every later
    call answers from the stored per-shard arrays."""
    import hashlib

    from deduplicate_text_datasets_spark.operators.sa_index import (
        build_suffix_index,
        count_occurrences_indexed,
        read_suffix_index,
        write_suffix_index,
    )

    # cache key includes a data fingerprint (file sizes + mtimes): if the
    # testdata at the same path is regenerated, the index rebuilds instead
    # of answering from a stale cache
    src = f"{sf_dir}/documents.parquet"
    fp_parts = []
    for root, _dirs, files in sorted(os.walk(src)) or [(src, [], [])]:
        for f in sorted(files):
            st = os.stat(os.path.join(root, f))
            fp_parts.append(f"{f}:{st.st_size}:{int(st.st_mtime)}")
    if os.path.isfile(src):
        st = os.stat(src)
        fp_parts.append(f"{os.path.basename(src)}:{st.st_size}:{int(st.st_mtime)}")
    key = hashlib.sha1(
        f"{sf_dir}|{EXACT_CFG.shard_bytes}|{EXACT_CFG.overlap_bytes}|"
        f"{EXACT_CFG.with_separators}|v2|{'|'.join(fp_parts)}".encode()
    ).hexdigest()[:12]
    path = f"/tmp/spark_graft_sa_index/{key}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        write_suffix_index(
            build_suffix_index(_docs(spark, sf_dir), EXACT_CFG), path
        )
    index = read_suffix_index(spark, path)
    out = count_occurrences_indexed(index, _count_query_list(spark, sf_dir))
    return out.select("query_id", F.col("count").alias("n_matches"))


def _q_contains(spark, sf_dir):
    """Membership probe (O7, is_present_memory main.rs:442-485): per-shard
    SA range lookup short-circuited to a boolean."""
    from deduplicate_text_datasets_spark.operators.suffix import contains

    return contains(
        _docs(spark, sf_dir), _count_query_list(spark, sf_dir), EXACT_CFG
    )


def _q_self_similar_ranges(spark, sf_dir):
    from deduplicate_text_datasets_spark.operators.intervals import (
        coalesce_positions,
    )
    from deduplicate_text_datasets_spark.operators.suffix import self_similar

    dups = self_similar(_docs(spark, sf_dir), SS_CFG)
    return coalesce_positions(dups, SS_CFG.length_threshold).select(
        F.col("start").cast("long").alias("start"),
        F.col("end").cast("long").alias("range_end"),
    )


def _q_self_similar_positions(spark, sf_dir):
    from deduplicate_text_datasets_spark.operators.suffix import self_similar

    return self_similar(_docs(spark, sf_dir), SS_CFG).select(
        "pos", "cluster_id", "cluster_size"
    )


def _q_top_duplicate_snippets(spark, sf_dir):
    from deduplicate_text_datasets_spark.operators.suffix import (
        duplicate_window_census,
    )

    return duplicate_window_census(_docs(spark, sf_dir), SS_CFG, k=10).select(
        "snippet",
        F.col("cnt").cast("long").alias("cnt"),
        F.col("first_pos").cast("long").alias("first_pos"),
    )


def _q_interval_coalesce(spark, sf_dir):
    from deduplicate_text_datasets_spark.operators.intervals import (
        coalesce_positions,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pos = orders.select(((F.col("o_orderkey") * 37) % 100000).alias("pos"))
    return coalesce_positions(pos, 50).select(
        F.col("start").cast("long").alias("start"),
        F.col("end").cast("long").alias("range_end"),
    )


def _q_interval_join_docs(spark, sf_dir):
    from deduplicate_text_datasets_spark.operators.intervals import interval_join
    from deduplicate_text_datasets_spark.sources.corpus import (
        corpus_total_bytes,
        with_offsets,
    )

    d = with_offsets(_docs(spark, sf_dir), True)
    total = corpus_total_bytes(d)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ranges = (
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .select(((F.col("o_orderkey") * 5323) % (total - 37)).alias("start"))
        .withColumn("end", F.col("start") + 37)
    )
    return interval_join(ranges, d, chunk_bytes=4096).select(
        "doc_id",
        F.col("start").cast("long").alias("start"),
        F.col("end").cast("long").alias("range_end"),
    )


def _q_ngram_jaccard_pairs(spark, sf_dir):
    from deduplicate_text_datasets_spark.operators.ngram import jaccard_pairs

    return jaccard_pairs(
        _docs(spark, sf_dir), MH_CFG, threshold_num=1, threshold_den=20
    ).select("a", "b", "inter", "size_a", "size_b")


def _q_neardup_across_pairs(spark, sf_dir):
    """Doc-level cross-corpus contamination (train-vs-eval shape): even
    doc_ids play the training corpus, odd the eval set — the same split
    the across_similar_positions gate uses for the substring level.
    Engine path: MinHash/LSH buckets intersected ACROSS the corpora +
    exact-Jaccard verify (minhash.near_duplicate_edges_across); oracle is
    the exact bipartite shingle join."""
    from deduplicate_text_datasets_spark.operators.minhash import (
        near_duplicate_edges_across,
    )

    docs = _docs(spark, sf_dir)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    return near_duplicate_edges_across(a, b, MH_CFG).select(
        "a", "b", "inter", F.col("union").alias("usize")
    )


def _q_doc_stats(spark, sf_dir):
    from deduplicate_text_datasets_spark.functions.text import tokens
    from deduplicate_text_datasets_spark.operators.textstats import substr_count

    docs = _docs(spark, sf_dir)
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
        substr_count(F.col("text"), " ").alias("space_count"),
        (substr_count(padded, " the ") + substr_count(padded, " and ")).alias(
            "en_stopwords"
        ),
    )


def _q_quality_scores(spark, sf_dir):
    from deduplicate_text_datasets_spark.functions.text import tokens

    docs = _docs(spark, sf_dir)
    n_tokens = F.size(tokens("text")).cast("long")
    n_bytes = F.octet_length("text").cast("long")
    len_ok = F.when(n_tokens >= 20, F.lit(1.0)).otherwise(n_tokens / F.lit(20.0))
    avg_len = n_bytes / F.greatest(n_tokens, F.lit(1))
    shape_ok = F.when((avg_len >= 3) & (avg_len <= 12), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return docs.select(
        "doc_id", F.floor(len_ok * shape_ok * 1000000).cast("long").alias("quality_ppm")
    )


def _q_lang_id(spark, sf_dir):
    from deduplicate_text_datasets_spark.operators.textstats import lang_id

    return lang_id(_docs(spark, sf_dir))


def _q_ann_topk(spark, sf_dir):
    from deduplicate_text_datasets_spark.operators.ann import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(emb, queries, k=10).select("query_id", "rank", "neighbor_id")


def _q_repetition_stats(spark, sf_dir):
    """Gopher/MassiveText within-doc repetition filter signals (Rae et al.
    2021) — dup-line fraction + top/dup n-gram character coverage, integer
    ppm semantics mirrored exactly in the DuckDB oracle."""
    from deduplicate_text_datasets_spark.operators.textstats import (
        repetition_stats,
    )

    return repetition_stats(_docs(spark, sf_dir))


def _q_ann_ivf_topk(spark, sf_dir):
    """IVF coarse-quantizer ANN (operators/ann.py IVF section) run at
    nprobe == nlist, where probing every inverted list makes the index
    exactly brute force — so the machinery (train/assign/probe/score) is
    gate-checked against the same DuckDB cosine oracle as ann_topk. The
    approximate regime (nprobe < nlist) is covered by the recall pytest
    (tests/test_extensions.py::test_ivf_partial_probe_recall) with the
    measured number recorded in BASELINE.md."""
    from deduplicate_text_datasets_spark.operators.ann import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, queries, dim=64, k=10, nlist=16, nprobe=16).select(
        "query_id", "rank", "neighbor_id"
    )


def _q_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023) keep decision per embedding, run at
    nlist=1 — the single-cluster configuration where within-cluster
    all-pairs IS exact all-pairs, so the whole chain (spherical k-means
    assign -> eps-pairs -> connected components -> keep) is checkable
    against a DuckDB all-pairs + recursive-CC oracle. The clustered
    (approximate) regime and the paper's centroid-outlier keep policy are
    pytest-covered (tests/test_extensions.py::test_semantic_dedup_*)."""
    from deduplicate_text_datasets_spark.operators.semdedup import (
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semantic_dedup(emb, dim=64, eps=0.5, nlist=1, keep="min_id")


def _q_page_text_extract(spark, sf_dir):
    """HTML->text extraction invariant (input_hint: 'byte-identical
    extracted text per url'). A deterministic html payload is derived from
    each doc's text exactly like the canonical synthesizer does (plus a
    script element and a comment the extractor must drop), extracted with
    the regex-baseline extractor, and compared byte-for-byte. The DuckDB
    oracle derives the same payload and extracts with the SAME rule
    constants (functions/html.py)."""
    from deduplicate_text_datasets_spark.functions.html import extract_text

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    html = F.encode(
        F.concat(
            F.lit("<html><head><script>var x = 1 < 2;</script></head><body>"),
            F.col("text"),
            F.lit("<!-- crawler: c4 --></body></html>"),
        ),
        "UTF-8",
    )
    return raw.select(
        "doc_id",
        extract_text(html).alias("extracted"),
        (extract_text(html) == F.col("text")).alias("byte_identical"),
    )


def _q_clean_corpus(spark, sf_dir):
    """C4-style cleaning composition — the end-to-end shape of a training-
    data prep run (README.md:10 context: C4 built from Common Crawl by
    lang-ID + quality heuristics + dedup): language filter AND quality
    threshold AND near-dup cluster keep, as one declarative plan. Each
    predicate is an existing gate operator; the oracle composes the SAME
    three oracle SQLs as CTEs, so the composition itself is what this
    query verifies. Flags are emitted per doc (not just survivors) so the
    gate checks every branch of the policy."""
    from deduplicate_text_datasets_spark.operators.textstats import lang_id

    docs = _docs(spark, sf_dir)
    lang = lang_id(docs).select("doc_id", "lang_pred")
    quality = _q_quality_scores(spark, sf_dir)
    keep = _q_neardup_clusters(spark, sf_dir).select("doc_id", "keep")
    lang_ok = F.col("lang_pred") == "en"
    quality_ok = F.col("quality_ppm") >= 750000
    return (
        docs.select("doc_id")
        .join(lang, "doc_id")
        .join(quality, "doc_id")
        .join(keep, "doc_id")
        .select(
            "doc_id",
            lang_ok.alias("lang_ok"),
            quality_ok.alias("quality_ok"),
            F.col("keep").alias("dedup_keep"),
            (lang_ok & quality_ok & F.col("keep")).alias("kept"),
        )
    )


# paragraph-dedup gate: the driver documents table is single-line, so a
# paragraph-structured corpus is derived deterministically on BOTH sides —
# a cross-doc boilerplate line on every doc, a subscribe line on every 3rd,
# a within-doc full-text repeat on every 5th, and a preserved empty line on
# every 7th. Constants shared by the Spark query and the DuckDB oracle.
_PARA_SUB = "subscribe to our newsletter for weekly updates"
_PARA_CPY = "copyright example corp all rights reserved"


def _q_paragraph_dedup(spark, sf_dir):
    """Paragraph-tier exact dedup (operators/paragraphs) — the RefinedWeb/
    MassiveText line-dedup stage the reference's README motivates
    (boilerplate removal, README.md:10-16) but only ships byte-span
    machinery for. First occurrence by (doc_id, idx) wins globally;
    paragraphs under DEFAULT_MIN_CHARS are exempt (the planted empty line
    must survive)."""
    from deduplicate_text_datasets_spark.operators.paragraphs import (
        paragraph_dedup,
    )

    docs = _docs(spark, sf_dir)
    ptext = F.concat_ws(
        "\n",
        F.when(F.col("doc_id") % 3 == 0, F.lit(_PARA_SUB)),
        F.col("text"),
        F.when(F.col("doc_id") % 5 == 0, F.col("text")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("")),
        F.lit(_PARA_CPY),
    )
    return paragraph_dedup(docs.select("doc_id", ptext.alias("text")))


def _q_domain_stats(spark, sf_dir):
    """Per-host rollup (operators/webpages.domain_stats): doc counts,
    exact-dup-farm population (keep=False members of exact_duplicates
    groups) and text bytes per host, host extracted with the shared
    RE_HOST regex from the synthesized canonical URL."""
    from deduplicate_text_datasets_spark.operators.webpages import domain_stats

    return domain_stats(_docs(spark, sf_dir))


def _q_canonical_pages(spark, sf_dir):
    """Crawl-log canonicalization (input_hint web-pages shape): a
    deterministic crawl log is derived from the documents table — each doc
    yields 1-3 fetches of its page under real-crawl URL decorations
    (fragment + utm params + uppercased host + trailing slash; a ?ref=kept
    param that canonicalization must PRESERVE), and every doc_id%10==7 doc
    re-crawls its predecessor's page so keep-latest crosses documents —
    then collapsed to one row per canonical URL. The DuckDB oracle rebuilds
    the identical log and normalizes with the SAME regex constants
    (functions/url.py is the single source of truth for both sides)."""
    from deduplicate_text_datasets_spark.operators.webpages import canonical_pages

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    base = (
        F.when(F.col("doc_id") % 10 == 7, F.col("doc_id") - 1)
        .otherwise(F.col("doc_id"))
        .cast("string")
    )
    v = F.col("v")
    d = F.col("doc_id").cast("string")
    crawls = raw.select(
        "doc_id",
        "source",
        base.alias("base_id"),
        F.explode(
            F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int"))
        ).alias("v"),
    ).select(
        "doc_id",
        (F.col("doc_id") * 137 + v * 1000).cast("long").alias("ts_secs"),
        F.when(
            v == 1,
            F.concat(
                F.lit("HTTPS://"), F.upper("source"), F.lit(".EXAMPLE/page"),
                F.col("base_id"), F.lit("/?utm_source=feed&utm_campaign=c"),
                d, F.lit("#frag"), d,
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".example/page"),
                F.col("base_id"), F.lit("?ref=kept&utm_medium=email"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".example/page"),
                F.col("base_id"),
            )
        )
        .alias("url"),
    )
    return canonical_pages(crawls)


# --- rows-only (non-SQL-expressible kernels; pytest-oracled) ---------------


def _q_neardup_clusters(spark, sf_dir):
    from deduplicate_text_datasets_spark.plans.pipeline import neardup_clusters

    return neardup_clusters(_docs(spark, sf_dir), EngineConfig(minhash=MH_CFG))


def _q_minhash_signatures(spark, sf_dir):
    from deduplicate_text_datasets_spark.operators.minhash import (
        doc_shingles,
        minhash_signatures,
    )

    sigs = minhash_signatures(doc_shingles(_docs(spark, sf_dir), MH_CFG), MH_CFG)
    # scalar columns only: the driver's value-hash canonicalizer sorts rows
    # via pandas, which cannot hash an array<long> cell (round-1 crash)
    return sigs.select(
        "doc_id", F.posexplode("sig").alias("perm", "sig_value")
    )


def _q_simhash_pairs(spark, sf_dir):
    from deduplicate_text_datasets_spark.operators.simhash import simhash_pairs

    return simhash_pairs(_docs(spark, sf_dir), SH_CFG)


def _q_deduped_docs(spark, sf_dir):
    # separator-free config so the DuckDB splice oracle (string_agg corpus,
    # per-doc gap reconstruction) is expressible; the separator layout is
    # byte-identity-tested against oracle/pyref.py in pytest instead
    from deduplicate_text_datasets_spark.plans.pipeline import exactsubstr_dedup

    cfg = EngineConfig(exact=SS_CFG)
    _, deduped = exactsubstr_dedup(_docs(spark, sf_dir), cfg)
    return deduped.select("doc_id", "url", F.sha2("deduped", 256).alias("sha"))


def _q_find_training_data(spark, sf_dir):
    from deduplicate_text_datasets_spark.operators.suffix import find_training_data

    docs = _docs(spark, sf_dir)
    t = docs.filter(F.col("doc_id") == 0).collect()[0]["text"]
    q = [(0, (t[:48] + "QQXXQQXX").encode())]
    # separator-free: LCP probes over the pure-text corpus match the SQL
    # oracle exactly (with separators a uid byte could extend a 0-length
    # match by coincidence, which SQL over text cannot express)
    return find_training_data(docs, q, SS_CFG, probe_cap=256)


def _q_tokenized_self_similar(spark, sf_dir):
    """Token-mode ExactSubstr (reference --tokenize, README.md:74,125):
    self-similar over the packed-u16 corpus, byte threshold = 2 x token
    threshold. Rows-only here (the hash vocabulary uses xxhash64, not
    expressible in DuckDB); byte-exact pyref parity is pytest-gated
    (tests/test_round3.py::test_tokenized_self_similar_matches_pyref)."""
    from deduplicate_text_datasets_spark.functions.text import (
        tokenized_documents,
    )
    from deduplicate_text_datasets_spark.operators.suffix import self_similar

    tok = tokenized_documents(_docs(spark, sf_dir))
    cfg = ExactSubstrConfig(
        length_threshold=100,  # 50 tokens
        shard_bytes=32768,
        overlap_bytes=1024,
        with_separators=True,
    )
    return self_similar(tok, cfg).select("pos", "cluster_id", "cluster_size")


def _q_tokenized_deduped_docs(spark, sf_dir):
    """Token-mode ExactSubstr END TO END incl. strike-out (reference
    --tokenize + finish_single_file.py splice: the packed byte file is
    spliced regardless of encoding). Rows-only here (hash vocabulary uses
    xxhash64, not expressible in DuckDB); byte-exact splice parity vs
    oracle/pyref is pytest-gated
    (tests/test_round4.py::test_tokenized_exactsubstr_dedup_e2e)."""
    from deduplicate_text_datasets_spark.functions.text import (
        tokenized_documents,
    )
    from deduplicate_text_datasets_spark.plans.pipeline import (
        exactsubstr_dedup,
    )

    tok = tokenized_documents(_docs(spark, sf_dir))
    cfg = ExactSubstrConfig(
        length_threshold=100,  # 50 tokens
        shard_bytes=32768,
        overlap_bytes=1024,
        with_separators=True,
    )
    _, deduped = exactsubstr_dedup(tok, EngineConfig(exact=cfg))
    return deduped.select(
        "doc_id",
        F.sha2("deduped", 256).alias("sha"),
        F.octet_length("deduped").cast("long").alias("n_bytes"),
    )


def _q_embedding_cosine_pairs(spark, sf_dir):
    from deduplicate_text_datasets_spark.operators.ann import cosine_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # banded multi-table LSH sized for ~1e-5 miss probability at the
    # threshold (round-1 single-table variant had ~9% recall); candidates
    # are exactly verified, so output equals the all-pairs oracle up to
    # the sized miss rate
    return cosine_pairs(
        emb, dim=64, threshold=0.5, method="lsh", bits=4, target_recall=0.99999
    )


def _q_across_similar_positions(spark, sf_dir):
    from deduplicate_text_datasets_spark.plans.pipeline import across_dedup

    docs = _docs(spark, sf_dir)
    dups_a, _, _ = across_dedup(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        EngineConfig(exact=SS_CFG),
    )
    return dups_a.select(F.col("pos").cast("long").alias("pos"))


def _q_contamination_report(spark, sf_dir):
    """Per-eval-doc contamination scorecard (train = even doc_ids, eval =
    odd — the across gates' split): exact-copy flag, earliest near-dup
    train doc, and bytes covered by >= L-byte substrings occurring in the
    train corpus. Composes three gate-verified detectors
    (plans.pipeline.contamination_report); the oracle composes the same
    three oracle SQL bodies. contaminated_frac is left out of the gate
    frame (float; derivable as contaminated_bytes / strlen)."""
    from deduplicate_text_datasets_spark.plans.pipeline import (
        contamination_report,
    )

    docs = _docs(spark, sf_dir)
    rep = contamination_report(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        EngineConfig(exact=SS_CFG),
    )
    return rep.select(
        "doc_id",
        "exact_dup",
        F.col("near_dup_match").cast("long").alias("near_dup_match"),
        F.col("contaminated_bytes").cast("long").alias("contaminated_bytes"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "global_offsets": _q_global_offsets,
        "exact_dup_groups": _q_exact_dup_groups,
        "cc_clusters": _q_cc_clusters,
        "count_occurrences": _q_count_occurrences,
        "count_occurrences_indexed": _q_count_occurrences_indexed,
        "contains": _q_contains,
        "self_similar_ranges": _q_self_similar_ranges,
        "self_similar_positions": _q_self_similar_positions,
        "top_duplicate_snippets": _q_top_duplicate_snippets,
        "interval_coalesce": _q_interval_coalesce,
        "interval_join_docs": _q_interval_join_docs,
        "ngram_jaccard_pairs": _q_ngram_jaccard_pairs,
        "neardup_across_pairs": _q_neardup_across_pairs,
        "doc_stats": _q_doc_stats,
        "quality_scores": _q_quality_scores,
        "lang_id": _q_lang_id,
        "repetition_stats": _q_repetition_stats,
        "ann_topk": _q_ann_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "canonical_pages": _q_canonical_pages,
        "page_text_extract": _q_page_text_extract,
        "clean_corpus": _q_clean_corpus,
        "paragraph_dedup": _q_paragraph_dedup,
        "domain_stats": _q_domain_stats,
        "semantic_dedup": _q_semantic_dedup,
        "neardup_clusters": _q_neardup_clusters,
        "minhash_signatures": _q_minhash_signatures,
        "simhash_pairs": _q_simhash_pairs,
        "deduped_docs": _q_deduped_docs,
        "find_training_data": _q_find_training_data,
        "tokenized_self_similar": _q_tokenized_self_similar,
        "tokenized_deduped_docs": _q_tokenized_deduped_docs,
        "embedding_cosine_pairs": _q_embedding_cosine_pairs,
        "across_similar_positions": _q_across_similar_positions,
        "contamination_report": _q_contamination_report,
    }


# ---------------------------------------------------------------------------
# oracle_sql() — DuckDB equivalents (tables pre-registered as views)
# ---------------------------------------------------------------------------

_TOKS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
)


def _sidecar(query: str) -> str:
    """Absolute path of a golden-sidecar parquet (oracle_expected/<sf>/),
    computed by scripts/make_expected.py WITHOUT Spark or the engine."""
    sf = os.environ.get("SPARK_GRAFT_EXPECTED_SF", "sf0.01")
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "oracle_expected", sf, f"{query}.parquet",
    )


def oracle_sql() -> dict[str, str]:
    from deduplicate_text_datasets_spark.functions.html import (
        extract_text_sql as _extract_sql,
    )
    from deduplicate_text_datasets_spark.functions.url import (
        normalize_url_sql as _norm_url_sql,
        url_host_sql as _host_sql,
    )

    # Overlap-aware substring counting (reference semantics: "aaaa" contains
    # "aa" 3 times, main.rs:629-632): probe every start offset instead of
    # the replace-length trick, which counts non-overlapping occurrences.
    # Per-doc counting matches the Spark side because the separator bytes
    # (\xff\xff + uid) cannot appear inside a pure-text query at this doc
    # count (uid bytes 2-3 are zero below 2^16 docs), so no match crosses a
    # document boundary.
    count_parts = []
    for qid, d, start, ln in _COUNT_QUERIES:
        count_parts.append(
            f"""
  SELECT {qid} AS query_id, CAST(COALESCE(SUM(
      CASE WHEN substr(dd.text, t.i, strlen(q.q)) = q.q THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_matches
  FROM (SELECT substr(text, {start}, {ln}) AS q FROM documents WHERE doc_id = {d}) q
  CROSS JOIN documents dd, UNNEST(range(1, strlen(dd.text) + 1)) t(i)"""
        )
    count_parts.append(
        f"""
  SELECT {_ABSENT_QUERY[0]} AS query_id, CAST(COALESCE(SUM(
      CASE WHEN substr(dd.text, t.i, strlen('{_ABSENT_QUERY[1]}')) = '{_ABSENT_QUERY[1]}' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_matches
  FROM documents dd, UNNEST(range(1, strlen(dd.text) + 1)) t(i)"""
    )
    count_sql = " UNION ALL ".join(count_parts)

    # membership probe: EXISTS over per-doc substring search (separator
    # bytes can't appear in a pure-text query, same argument as above)
    contains_parts = []
    for qid, d, start, ln in _COUNT_QUERIES:
        contains_parts.append(
            f"""
  SELECT {qid} AS query_id, COALESCE((
    SELECT true FROM documents dd
    WHERE position((SELECT substr(text, {start}, {ln})
                    FROM documents WHERE doc_id = {d}) IN dd.text) > 0
    LIMIT 1), false) AS present"""
        )
    contains_parts.append(
        f"""
  SELECT {_ABSENT_QUERY[0]} AS query_id, COALESCE((
    SELECT true FROM documents dd
    WHERE position('{_ABSENT_QUERY[1]}' IN dd.text) > 0
    LIMIT 1), false) AS present"""
    )
    contains_sql = " UNION ALL ".join(contains_parts)

    from fractions import Fraction

    jfrac = Fraction(MH_CFG.jaccard_threshold).limit_denominator(1_000_000)
    jnum, jden = jfrac.numerator, jfrac.denominator

    # flat corpus (no separators) exactly as the Spark SS_CFG sees it
    self_similar_core = """
WITH corpus AS (
  SELECT string_agg(text, '' ORDER BY doc_id) AS c FROM documents
), wins AS (
  SELECT i - 1 AS pos, substr(c, i, 100) AS w
  FROM corpus, UNNEST(range(1, strlen(c) - 100 + 2)) AS t(i)
), sized AS (
  SELECT pos, COUNT(*) OVER (PARTITION BY w) AS c,
         MIN(pos) OVER (PARTITION BY w) AS m
  FROM wins
), dups AS (
  SELECT pos, c, m FROM sized WHERE c >= 2
)"""

    sqls = {
        "global_offsets": """
SELECT doc_id,
  CAST(COALESCE(SUM(strlen(text)+6) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS byte_start,
  CAST(COALESCE(SUM(strlen(text)+6) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + strlen(text) + 6 AS BIGINT) AS byte_end
FROM documents""",
        "exact_dup_groups": """
SELECT doc_id,
  MIN(doc_id) OVER (PARTITION BY text) AS group_id,
  COUNT(*) OVER (PARTITION BY text) AS group_size,
  doc_id = MIN(doc_id) OVER (PARTITION BY text) AS keep
FROM documents""",
        "cc_clusters": """
WITH RECURSIVE edges AS (
  SELECT CAST(n_nationkey AS BIGINT) AS a, CAST((n_nationkey * 7) % 25 AS BIGINT) AS b
  FROM nation WHERE n_nationkey <> (n_nationkey * 7) % 25
), sym AS (
  SELECT a, b FROM edges UNION SELECT b, a FROM edges
), reach(n, m) AS (
  SELECT a, b FROM sym UNION SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a
)
SELECT n AS node, LEAST(n, MIN(m)) AS component FROM reach GROUP BY n ORDER BY node""",
        "count_occurrences": count_sql,
        "count_occurrences_indexed": count_sql,
        "contains": contains_sql,
        "self_similar_ranges": self_similar_core
        + """,
flagged AS (
  SELECT pos, CASE WHEN LAG(pos) OVER (ORDER BY pos) IS NULL
                     OR pos > LAG(pos) OVER (ORDER BY pos) + 100
              THEN 1 ELSE 0 END AS f
  FROM dups
), grp AS (
  SELECT pos, SUM(f) OVER (ORDER BY pos) AS g FROM flagged
)
SELECT CAST(MIN(pos) AS BIGINT) AS start, CAST(MAX(pos) + 100 AS BIGINT) AS range_end
FROM grp GROUP BY g""",
        "self_similar_positions": self_similar_core
        + """
SELECT CAST(pos AS BIGINT) AS pos, CAST(m AS BIGINT) AS cluster_id,
       CAST(c AS BIGINT) AS cluster_size
FROM dups""",
        # top-k by (cnt DESC, first_pos ASC) is a total order (first_pos =
        # the window's min position, unique per distinct window), so the
        # LIMIT selects the same set on both sides deterministically
        "top_duplicate_snippets": self_similar_core
        + """,
grp AS (
  SELECT w, COUNT(*) AS cnt, MIN(pos) AS first_pos
  FROM wins GROUP BY w HAVING COUNT(*) >= 2
)
SELECT w AS snippet, CAST(cnt AS BIGINT) AS cnt,
       CAST(first_pos AS BIGINT) AS first_pos
FROM grp ORDER BY cnt DESC, first_pos ASC LIMIT 10""",
        "interval_coalesce": """
WITH pos AS (
  SELECT (o_orderkey * 37) % 100000 AS pos FROM orders
), flagged AS (
  SELECT pos, CASE WHEN LAG(pos) OVER (ORDER BY pos) IS NULL
                     OR pos > LAG(pos) OVER (ORDER BY pos) + 50
              THEN 1 ELSE 0 END AS f
  FROM pos
), grp AS (
  SELECT pos, SUM(f) OVER (ORDER BY pos) AS g FROM flagged
)
SELECT CAST(MIN(pos) AS BIGINT) AS start, CAST(MAX(pos) + 50 AS BIGINT) AS range_end
FROM grp GROUP BY g""",
        "interval_join_docs": """
WITH offs AS (
  SELECT doc_id,
    CAST(COALESCE(SUM(strlen(text)+6) OVER (ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS byte_start,
    CAST(strlen(text) + 6 AS BIGINT) AS doc_len
  FROM documents
), total AS (
  SELECT SUM(doc_len) AS t FROM offs
), ranges AS (
  SELECT CAST((o_orderkey * 5323) % (t - 37) AS BIGINT) AS start,
         CAST((o_orderkey * 5323) % (t - 37) + 37 AS BIGINT) AS range_end
  FROM orders, total WHERE o_orderkey % 97 = 0
)
SELECT DISTINCT o.doc_id, r.start, r.range_end
FROM offs o JOIN ranges r
  ON r.start < o.byte_start + o.doc_len AND r.range_end > o.byte_start""",
        "ngram_jaccard_pairs": f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
), sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 5
      THEN [array_to_string(w[i:i+4], ' ') FOR i IN range(1, len(w) - 3)]
      ELSE [array_to_string(w, ' ')] END) AS s
  FROM toks
), inv AS (
  SELECT doc_id, UNNEST(s) AS g FROM sh
), pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS INT) AS inter
  FROM inv x JOIN inv y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b, inter, CAST(sa.ns AS INT) AS size_a, CAST(sb.ns AS INT) AS size_b
FROM pairs
JOIN (SELECT doc_id, len(s) AS ns FROM sh) sa ON sa.doc_id = a
JOIN (SELECT doc_id, len(s) AS ns FROM sh) sb ON sb.doc_id = b
WHERE 20 * inter >= 1 * (sa.ns + sb.ns - inter)""",
        # doc-level cross-corpus contamination: even docs = train corpus,
        # odd = eval set; exact bipartite shingle join at the engine's
        # jaccard_threshold
        "neardup_across_pairs": f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
), sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 5
      THEN [array_to_string(w[i:i+4], ' ') FOR i IN range(1, len(w) - 3)]
      ELSE [array_to_string(w, ' ')] END) AS s
  FROM toks WHERE len(w) > 0
), ia AS (
  SELECT doc_id, UNNEST(s) AS g FROM sh WHERE doc_id % 2 = 0
), ib AS (
  SELECT doc_id, UNNEST(s) AS g FROM sh WHERE doc_id % 2 = 1
), pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS INT) AS inter
  FROM ia x JOIN ib y ON x.g = y.g
  GROUP BY 1, 2
)
SELECT a, b, inter, CAST(sa.ns + sb.ns - inter AS INT) AS usize
FROM pairs
JOIN (SELECT doc_id, len(s) AS ns FROM sh) sa ON sa.doc_id = a
JOIN (SELECT doc_id, len(s) AS ns FROM sh) sb ON sb.doc_id = b
WHERE {jden} * inter >= {jnum} * (sa.ns + sb.ns - inter)""",
        # contamination scorecard: composes the across-similar substring
        # oracle (B side, coalesced + clipped per doc), the bipartite
        # near-dup oracle, and plain text-equality for exact copies
        "contamination_report": f"""
WITH ca AS (
  SELECT string_agg(text, '' ORDER BY doc_id) AS c FROM documents WHERE doc_id % 2 = 0
), cb AS (
  SELECT string_agg(text, '' ORDER BY doc_id) AS c FROM documents WHERE doc_id % 2 = 1
), wb AS (
  SELECT i - 1 AS pos, substr(c, i, 100) AS w
  FROM cb, UNNEST(range(1, strlen(c) - 100 + 2)) t(i)
), wa AS (
  SELECT DISTINCT substr(c, i, 100) AS w
  FROM ca, UNNEST(range(1, strlen(c) - 100 + 2)) t(i)
), dupb AS (
  SELECT pos FROM wb WHERE w IN (SELECT w FROM wa)
), flagged AS (
  SELECT pos, CASE WHEN LAG(pos) OVER (ORDER BY pos) IS NULL
                     OR pos > LAG(pos) OVER (ORDER BY pos) + 100
              THEN 1 ELSE 0 END AS f FROM dupb
), grp AS (
  SELECT pos, SUM(f) OVER (ORDER BY pos) AS g FROM flagged
), ranges AS (
  SELECT MIN(pos) AS rs, MAX(pos) + 100 AS re FROM grp GROUP BY g
), offs AS (
  SELECT doc_id, strlen(text) AS len,
    COALESCE(SUM(strlen(text)) OVER (ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bs
  FROM documents WHERE doc_id % 2 = 1
), cov AS (
  SELECT o.doc_id,
         SUM(LEAST(r.re, o.bs + o.len) - GREATEST(r.rs, o.bs)) AS covered
  FROM offs o JOIN ranges r ON r.rs < o.bs + o.len AND r.re > o.bs
  GROUP BY o.doc_id
), toks AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
), sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 5
      THEN [array_to_string(w[i:i+4], ' ') FOR i IN range(1, len(w) - 3)]
      ELSE [array_to_string(w, ' ')] END) AS s
  FROM toks WHERE len(w) > 0
), ia AS (
  SELECT doc_id, UNNEST(s) AS g FROM sh WHERE doc_id % 2 = 0
), ib AS (
  SELECT doc_id, UNNEST(s) AS g FROM sh WHERE doc_id % 2 = 1
), np AS (
  SELECT y.doc_id AS o, x.doc_id AS e, COUNT(*) AS inter
  FROM ia x JOIN ib y ON x.g = y.g
  GROUP BY 1, 2
), nj AS (
  SELECT np.o AS o, MIN(np.e) AS near_min
  FROM np
  JOIN (SELECT doc_id, len(s) AS ns FROM sh) sa ON sa.doc_id = np.e
  JOIN (SELECT doc_id, len(s) AS ns FROM sh) sb ON sb.doc_id = np.o
  WHERE {jden} * np.inter >= {jnum} * (sa.ns + sb.ns - np.inter)
  GROUP BY np.o
)
SELECT d.doc_id,
  d.text IN (SELECT text FROM documents WHERE doc_id % 2 = 0) AS exact_dup,
  CAST(nj.near_min AS BIGINT) AS near_dup_match,
  CAST(COALESCE(cov.covered, 0) AS BIGINT) AS contaminated_bytes
FROM documents d
LEFT JOIN nj ON nj.o = d.doc_id
LEFT JOIN cov ON cov.doc_id = d.doc_id
WHERE d.doc_id % 2 = 1""",
        "doc_stats": f"""
SELECT doc_id,
  CAST(strlen(text) AS BIGINT) AS n_bytes,
  CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
  CAST((strlen(text) - strlen(replace(text, ' ', ''))) / 1 AS BIGINT) AS space_count,
  CAST((strlen(' ' || lower(text) || ' ') - strlen(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5
     + (strlen(' ' || lower(text) || ' ') - strlen(replace(' ' || lower(text) || ' ', ' and ', ''))) / 5
   AS BIGINT) AS en_stopwords
FROM documents""",
        "quality_scores": f"""
SELECT doc_id, CAST(FLOOR(
  (CASE WHEN len({_TOKS}) >= 20 THEN 1.0 ELSE len({_TOKS}) / 20.0 END)
  * (CASE WHEN strlen(text) * 1.0 / GREATEST(len({_TOKS}), 1) BETWEEN 3 AND 12
      THEN 1.0 ELSE 0.5 END) * 1000000) AS BIGINT) AS quality_ppm
FROM documents""",
        "lang_id": """
WITH s AS (
  SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents
), scores AS (
  SELECT doc_id,
    CAST((strlen(p)-strlen(replace(p,' the ','')))/5 + (strlen(p)-strlen(replace(p,' and ','')))/5
       + (strlen(p)-strlen(replace(p,' of ','')))/4 + (strlen(p)-strlen(replace(p,' to ','')))/4
       + (strlen(p)-strlen(replace(p,' in ','')))/4 AS BIGINT) AS s_en,
    CAST((strlen(p)-strlen(replace(p,' der ','')))/5 + (strlen(p)-strlen(replace(p,' und ','')))/5
       + (strlen(p)-strlen(replace(p,' die ','')))/5 + (strlen(p)-strlen(replace(p,' das ','')))/5
       + (strlen(p)-strlen(replace(p,' nicht ','')))/7 AS BIGINT) AS s_de,
    CAST((strlen(p)-strlen(replace(p,' le ','')))/4 + (strlen(p)-strlen(replace(p,' la ','')))/4
       + (strlen(p)-strlen(replace(p,' et ','')))/4 + (strlen(p)-strlen(replace(p,' les ','')))/5
       + (strlen(p)-strlen(replace(p,' des ','')))/5 AS BIGINT) AS s_fr,
    CAST((strlen(p)-strlen(replace(p,' el ','')))/4 + (strlen(p)-strlen(replace(p,' la ','')))/4
       + (strlen(p)-strlen(replace(p,' los ','')))/5 + (strlen(p)-strlen(replace(p,' que ','')))/5
       + (strlen(p)-strlen(replace(p,' de ','')))/4 AS BIGINT) AS s_es
  FROM s
)
SELECT doc_id,
  CASE WHEN s_en > 0 AND s_en = GREATEST(s_en, s_de, s_fr, s_es) THEN 'en'
       WHEN s_de > 0 AND s_de = GREATEST(s_en, s_de, s_fr, s_es) THEN 'de'
       WHEN s_fr > 0 AND s_fr = GREATEST(s_en, s_de, s_fr, s_es) THEN 'fr'
       WHEN s_es > 0 AND s_es = GREATEST(s_en, s_de, s_fr, s_es) THEN 'es'
       ELSE 'und' END AS lang_pred,
  GREATEST(s_en, s_de, s_fr, s_es) AS lang_hits
FROM scores""",
        # integer ppm semantics ((1000000 * x) DIV y) on both sides; '//'
        # is floor-div in DuckDB and DIV truncates in Spark — identical on
        # the non-negative values here
        "repetition_stats": f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
), g AS (
  SELECT doc_id, UNNEST(CASE WHEN len(w) >= 3
      THEN [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
      ELSE [] END) AS gram
  FROM toks
), gc AS (
  SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2
), ga AS (
  SELECT doc_id,
         MAX(cnt * strlen(gram)) AS top_chars,
         SUM(CASE WHEN cnt >= 2 THEN cnt * strlen(gram) END) AS dup_chars,
         SUM(cnt * strlen(gram)) AS tot_chars
  FROM gc GROUP BY 1
), ln AS (
  SELECT doc_id,
         len(list_filter(string_split(text, chr(10)), x -> x <> '')) AS nl,
         len(list_distinct(list_filter(string_split(text, chr(10)), x -> x <> ''))) AS ndl
  FROM documents
)
SELECT d.doc_id,
  CAST(CASE WHEN nl > 0 THEN (1000000 * (nl - ndl)) // nl ELSE 0 END AS BIGINT)
      AS dup_line_ppm,
  CAST(COALESCE((1000000 * top_chars) // tot_chars, 0) AS BIGINT)
      AS top_ngram_ppm,
  CAST(COALESCE((1000000 * COALESCE(dup_chars, 0)) // tot_chars, 0) AS BIGINT)
      AS dup_ngram_ppm
FROM documents d
LEFT JOIN ga ON ga.doc_id = d.doc_id
JOIN ln ON ln.doc_id = d.doc_id""",
        "ann_topk": """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
), scored AS (
  SELECT query_id, vec_id AS neighbor_id,
         list_dot_product(qv, ev) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(ev, ev))) AS cosine
  FROM q CROSS JOIN v WHERE query_id <> vec_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 10""",
        # nlist=1 makes SemDeDup exact: all-pairs cosine >= eps edges,
        # recursive-CTE connected components (the cc_clusters oracle
        # pattern), keep = group-min vec_id; singletons via left join
        "semantic_dedup": """
WITH RECURSIVE u AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), p AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM u x JOIN u y ON x.vec_id < y.vec_id
  WHERE list_dot_product(x.e, y.e) /
        (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e)))
        >= 0.5
), sym AS (
  SELECT a, b FROM p UNION SELECT b, a FROM p
), reach(n, m) AS (
  SELECT a, b FROM sym UNION SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a
), comp AS (
  SELECT n AS vec_id, LEAST(n, MIN(m)) AS component FROM reach GROUP BY n
)
SELECT u.vec_id,
       COALESCE(comp.component, u.vec_id) AS component,
       u.vec_id = COALESCE(comp.component, u.vec_id) AS keep
FROM u LEFT JOIN comp ON comp.vec_id = u.vec_id""",
        # nprobe == nlist probes every inverted list, so the IVF result is
        # definitionally the exact brute-force top-k — same oracle as
        # ann_topk (what the gate checks is the train/assign/probe/score
        # machinery, not the approximation)
        "ann_ivf_topk": """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
), scored AS (
  SELECT query_id, vec_id AS neighbor_id,
         list_dot_product(qv, ev) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(ev, ev))) AS cosine
  FROM q CROSS JOIN v WHERE query_id <> vec_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 10""",
        # Same deterministic crawl log as _q_canonical_pages; the URL
        # normalization SQL is generated from the SAME regex constants the
        # Spark Column uses (functions/url.py — single source of truth).
        # paragraph corpus derivation mirrored from _q_paragraph_dedup
        # (concat_ws skips NULL CASE arms but keeps the '' arm on both
        # engines); winner election is first (doc_id, idx) per exact
        # paragraph text, paragraphs under 20 chars exempt — the same
        # policy as operators/paragraphs.DEFAULT_MIN_CHARS
        "paragraph_dedup": f"""
WITH pdocs AS (
  SELECT doc_id, concat_ws(chr(10),
      CASE WHEN doc_id % 3 = 0 THEN '{_PARA_SUB}' END,
      text,
      CASE WHEN doc_id % 5 = 0 THEN text END,
      CASE WHEN doc_id % 7 = 0 THEN '' END,
      '{_PARA_CPY}') AS text
  FROM documents
), s AS (
  SELECT doc_id, string_split(text, chr(10)) AS arr FROM pdocs
), p AS (
  SELECT doc_id, i - 1 AS idx, arr[i] AS para
  FROM s, UNNEST(generate_series(1, len(arr))) AS t(i)
), e AS (
  SELECT doc_id, idx,
         ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, idx) AS rn
  FROM p WHERE length(para) >= 20
), d AS (
  SELECT doc_id, list(idx ORDER BY idx) AS dropped
  FROM e WHERE rn > 1 GROUP BY doc_id
)
SELECT s.doc_id,
  coalesce(array_to_string([arr[i] FOR i IN generate_series(1, len(arr))
      IF NOT list_contains(coalesce(dropped, []), i - 1)], chr(10)), '')
      AS deduped,
  CAST(len(arr) AS BIGINT) AS n_paras,
  CAST(len(arr) - len(coalesce(dropped, [])) AS BIGINT) AS kept_paras
FROM s LEFT JOIN d USING (doc_id)""",
        # url derivation mirrored from sources/documents.read_documents'
        # driver-test-shape synthesizer; host via the shared RE_HOST
        "domain_stats": f"""
WITH pages AS (
  SELECT doc_id,
         {_host_sql("'https://' || source || '.example/page' || doc_id")}
             AS host,
         strlen(text) AS bytes,
         md5(text) AS h
  FROM documents
), g AS (
  SELECT h, MIN(doc_id) AS keeper FROM pages GROUP BY h
)
SELECT host,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT)
      AS dup_docs,
  CAST((1000000 * SUM(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END))
      // COUNT(*) AS BIGINT) AS dup_ppm,
  CAST(SUM(bytes) AS BIGINT) AS total_bytes
FROM pages JOIN g USING (h) GROUP BY host""",
        "canonical_pages": f"""
WITH crawls AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 10 = 7 THEN doc_id - 1 ELSE doc_id END AS base_id,
         UNNEST(range(0, doc_id % 3 + 1)) AS v
  FROM documents
), urls AS (
  SELECT doc_id, CAST(doc_id * 137 + v * 1000 AS BIGINT) AS ts_secs,
    CASE WHEN v = 1 THEN 'HTTPS://' || upper(source) || '.EXAMPLE/page' || base_id
                         || '/?utm_source=feed&utm_campaign=c' || doc_id
                         || '#frag' || doc_id
         WHEN v = 2 THEN 'https://' || source || '.example/page' || base_id
                         || '?ref=kept&utm_medium=email'
         ELSE 'https://' || source || '.example/page' || base_id
    END AS url
  FROM crawls
)
SELECT {_norm_url_sql("url")} AS norm_url,
       CAST(COUNT(*) AS BIGINT) AS n_crawls,
       MAX(ts_secs) AS latest_ts_secs,
       arg_max(doc_id, ts_secs) AS latest_doc_id
FROM urls GROUP BY 1""",
        # html derivation mirrored from _q_page_text_extract; extraction
        # rules generated from functions/html.py constants
        "page_text_extract": f"""
WITH pages AS (
  SELECT doc_id, text,
         '<html><head><script>var x = 1 < 2;</script></head><body>'
         || text || '<!-- crawler: c4 --></body></html>' AS html
  FROM documents
)
SELECT doc_id,
       {_extract_sql("html")} AS extracted,
       {_extract_sql("html")} = text AS byte_identical
FROM pages""",
        # NearDup flagship: exact-Jaccard edges (same integer threshold math
        # as verify_pairs) ∪ exact-dup edges -> recursive-CTE connected
        # components; LSH miss probability for a true J>=0.8 pair is ~5e-8
        # at 32x4 bands, so exact set equality is testable at gate scale.
        "neardup_clusters": f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
), sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 5
      THEN [array_to_string(w[i:i+4], ' ') FOR i IN range(1, len(w) - 3)]
      ELSE [array_to_string(w, ' ')] END) AS s
  FROM toks WHERE len(w) > 0
), inv AS (
  SELECT doc_id, UNNEST(s) AS g FROM sh
), cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
  FROM inv x JOIN inv y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2
), jac AS (
  SELECT a, b FROM cand
  JOIN (SELECT doc_id, len(s) AS ns FROM sh) sa ON sa.doc_id = cand.a
  JOIN (SELECT doc_id, len(s) AS ns FROM sh) sb ON sb.doc_id = cand.b
  WHERE {jden} * inter >= {jnum} * (sa.ns + sb.ns - inter)
), ex AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM documents x JOIN documents y ON x.text = y.text AND x.doc_id < y.doc_id
), alledges AS (
  SELECT a, b FROM jac UNION SELECT a, b FROM ex
), sym AS (
  SELECT a, b FROM alledges UNION SELECT b, a FROM alledges
), reach(n, m) AS (
  SELECT a, b FROM sym UNION SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a
), comp AS (
  SELECT n AS node, LEAST(n, MIN(m)) AS component FROM reach GROUP BY n
)
SELECT d.doc_id,
  'https://' || d.source || '.example/page' || d.doc_id AS url,
  CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS cluster_id,
  COALESCE(c.component, d.doc_id) <> d.doc_id AS is_duplicate,
  COALESCE(c.component, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id""",
        "embedding_cosine_pairs": """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
), n AS (
  SELECT vec_id, ev, sqrt(list_dot_product(ev, ev)) AS nv FROM v
), p AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         list_dot_product(x.ev, y.ev) / (x.nv * y.nv) AS cosine
  FROM n x JOIN n y ON x.vec_id < y.vec_id
)
SELECT a, b, CAST(FLOOR(cosine * 1000) AS BIGINT) AS cos_mil
FROM p WHERE cosine >= 0.5""",
        # across-similar (main.rs:962-1158): positions of corpus A (even
        # doc_ids) whose length-100 window also occurs in corpus B (odd)
        "across_similar_positions": """
WITH ca AS (
  SELECT string_agg(text, '' ORDER BY doc_id) AS c FROM documents WHERE doc_id % 2 = 0
), cb AS (
  SELECT string_agg(text, '' ORDER BY doc_id) AS c FROM documents WHERE doc_id % 2 = 1
), wa AS (
  SELECT i - 1 AS pos, substr(c, i, 100) AS w
  FROM ca, UNNEST(range(1, strlen(c) - 100 + 2)) t(i)
), wb AS (
  SELECT DISTINCT substr(c, i, 100) AS w
  FROM cb, UNNEST(range(1, strlen(c) - 100 + 2)) t(i)
)
SELECT CAST(pos AS BIGINT) AS pos FROM wa WHERE w IN (SELECT w FROM wb)""",
        # find-training-data: match_len(i) = longest prefix of query[i:]
        # occurring anywhere in the (separator-free) corpus
        "find_training_data": """
WITH corpus AS (
  SELECT string_agg(text, '' ORDER BY doc_id) AS c FROM documents
), q AS (
  SELECT substr(text, 1, 48) || 'QQXXQQXX' AS qs FROM documents WHERE doc_id = 0
), pos AS (
  SELECT UNNEST(range(0, (SELECT strlen(qs) FROM q))) AS i
)
SELECT CAST(0 AS BIGINT) AS query_id, CAST(p.i AS BIGINT) AS qpos,
  CAST(COALESCE((
    SELECT MAX(t.l)
    FROM q, corpus, UNNEST(range(1, strlen(q.qs) - p.i + 1)) t(l)
    WHERE position(substr(q.qs, p.i + 1, t.l) IN corpus.c) > 0
  ), 0) AS BIGINT) AS match_len
FROM pos p""",
        # full ExactSubstr splice parity: self-similar dups -> coalesced
        # ranges -> per-doc clamped gap reconstruction -> sha256 of the
        # spliced text (byte == char here: gate corpus is pure ASCII)
        "deduped_docs": """
WITH corpus AS (
  SELECT string_agg(text, '' ORDER BY doc_id) AS c FROM documents
), wins AS (
  SELECT i - 1 AS pos, substr(c, i, 100) AS w
  FROM corpus, UNNEST(range(1, strlen(c) - 100 + 2)) t(i)
), sized AS (
  SELECT pos, COUNT(*) OVER (PARTITION BY w) AS cnt FROM wins
), dup AS (
  SELECT pos FROM sized WHERE cnt >= 2
), flagged AS (
  SELECT pos, CASE WHEN LAG(pos) OVER (ORDER BY pos) IS NULL
                     OR pos > LAG(pos) OVER (ORDER BY pos) + 100
              THEN 1 ELSE 0 END AS f
  FROM dup
), grp AS (
  SELECT pos, SUM(f) OVER (ORDER BY pos) AS g FROM flagged
), ranges AS (
  SELECT MIN(pos) AS rs, MAX(pos) + 100 AS re FROM grp GROUP BY g
), offs AS (
  SELECT doc_id, source, text, strlen(text) AS len,
    COALESCE(SUM(strlen(text)) OVER (ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bs
  FROM documents
), dr AS (
  SELECT o.doc_id, GREATEST(r.rs - o.bs, 0) AS a, LEAST(r.re - o.bs, o.len) AS b
  FROM offs o JOIN ranges r ON r.rs < o.bs + o.len AND r.re > o.bs
), gaps AS (
  SELECT doc_id, COALESCE(LAG(b) OVER (PARTITION BY doc_id ORDER BY a), 0) AS gs,
         a AS ge
  FROM dr
  UNION ALL
  SELECT o.doc_id,
         COALESCE((SELECT MAX(b) FROM dr WHERE dr.doc_id = o.doc_id), 0) AS gs,
         o.len AS ge
  FROM offs o
), pieces AS (
  SELECT g.doc_id, g.gs,
         substr(o.text, CAST(g.gs + 1 AS BIGINT), CAST(g.ge - g.gs AS BIGINT)) AS seg
  FROM gaps g JOIN offs o ON o.doc_id = g.doc_id WHERE g.ge > g.gs
), spliced AS (
  SELECT doc_id, string_agg(seg, '' ORDER BY gs) AS ded FROM pieces GROUP BY doc_id
)
SELECT o.doc_id,
  'https://' || o.source || '.example/page' || o.doc_id AS url,
  sha256(COALESCE(s.ded, '')) AS sha
FROM offs o LEFT JOIN spliced s ON s.doc_id = o.doc_id""",
        # --- golden sidecars (round-4 verdict item 4) -----------------------
        # The four hash-vocabulary queries (xxhash64 is not expressible in
        # DuckDB) read engine-INDEPENDENT expected results precomputed by
        # oracle/expected.py (pure-Python xxh64 + oracle/pyref semantics —
        # never the Spark path; parity vs Spark's xxhash64 expression is
        # pytest-pinned). scripts/make_expected.py regenerates them; the
        # sidecar sf is selected by SPARK_GRAFT_EXPECTED_SF (default sf0.01,
        # the driver's gate scale).
        "minhash_signatures": f"""
SELECT doc_id, CAST(perm AS INT) AS perm, sig_value
FROM '{_sidecar("minhash_signatures")}'""",
        "simhash_pairs": f"""
SELECT a, b, CAST(hamming AS INT) AS hamming
FROM '{_sidecar("simhash_pairs")}'""",
        "tokenized_self_similar": f"""
SELECT pos, cluster_id, cluster_size
FROM '{_sidecar("tokenized_self_similar")}'""",
        "tokenized_deduped_docs": f"""
SELECT doc_id, sha, n_bytes
FROM '{_sidecar("tokenized_deduped_docs")}'""",
    }
    # clean_corpus composes the SAME three oracle SQLs as CTEs — the
    # composition, not new semantics, is what the gate verifies here
    sqls["clean_corpus"] = f"""
WITH L AS ({sqls["lang_id"]}), Q AS ({sqls["quality_scores"]}),
     N AS ({sqls["neardup_clusters"]})
SELECT d.doc_id,
       L.lang_pred = 'en' AS lang_ok,
       Q.quality_ppm >= 750000 AS quality_ok,
       N.keep AS dedup_keep,
       (L.lang_pred = 'en' AND Q.quality_ppm >= 750000 AND N.keep) AS kept
FROM documents d
JOIN L USING (doc_id) JOIN Q USING (doc_id) JOIN N USING (doc_id)"""
    return sqls
