"""Web-page canonicalization operators (BASELINE.json input_hint shape).

The input table is a crawl log: one row per FETCH, keyed by (url, warc_ts)
— the same page appears once per crawl and once per URL decoration. Before
any text-level dedup (MinHash / SimHash / exact-substring), a web pipeline
collapses the crawl log to one canonical row per page:

    crawl log --normalize_url--> group by canonical URL --keep latest-->

The reference repo starts AFTER this step (its corpora are already
one-row-per-document); this operator supplies the step for the
Common-Crawl-style input the north rule targets.

Scale shape: a single ``groupBy(norm_url)`` — one hash exchange whose
payload is (norm_url, ts, doc_id), never text/html; map-side partial
aggregation collapses same-page crawls within a scan partition before the
shuffle. URL keys are near-unique (a page is crawled a handful of times),
so there is no skew story; AQE handles the odd hot URL. At 10^12 rows this
is the cheapest possible plan: no join, no window, one exchange of ~tens
of bytes per crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.url import normalize_url


def canonical_pages(
    crawls: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts_secs",
    id_col: str = "doc_id",
) -> DataFrame:
    """Crawl log -> one row per canonical URL, keeping the latest crawl.

    Returns (norm_url, n_crawls, latest_ts_secs, latest_doc_id):
      * ``n_crawls``     — fetches collapsed into this page (all
                            decorations + recrawls),
      * ``latest_ts_secs`` — crawl time of the kept row,
      * ``latest_doc_id``  — id of the kept row (``max_by`` on the crawl
                            time; ties broken by the engine are impossible
                            when (url, warc_ts) is a key, which the
                            input_hint guarantees).

    Keep-latest is the standard crawl policy (newest snapshot wins);
    callers that want keep-first pass a negated ts.
    """
    norm = crawls.select(
        normalize_url(url_col).alias("norm_url"),
        F.col(ts_col).cast("long").alias("ts_secs"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    return norm.groupBy("norm_url").agg(
        F.count(F.lit(1)).alias("n_crawls"),
        F.max("ts_secs").alias("latest_ts_secs"),
        F.max_by("doc_id", "ts_secs").alias("latest_doc_id"),
    )


def domain_stats(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-host corpus observability: the frame a crawl-curation pass reads
    before deciding per-domain policy (blocklists, per-domain caps, dup-farm
    detection — the C4/RefinedWeb pipelines all gate on host-level signals
    the reference computes offline).

    Returns one row per host:
      host            lowercased registered host ('' when the URL has none)
      n_docs          documents under the host
      dup_docs        docs whose full text also appears elsewhere in the
                      corpus AND that are not their group's keeper (the
                      exact_duplicates keep=False population) — a host
                      where this is high is a mirror/dup farm
      dup_ppm         (1e6 * dup_docs) DIV n_docs, integer ppm
      total_bytes     UTF-8 text bytes under the host

    Scale shape: exact-dup flags come from the md5 groupBy of
    operators/exact (text never shuffles); the host rollup is one
    groupBy(host) whose sums/counts combine map-side, so a hot host
    (wikipedia.org at web scale) costs one partial row per mapper, not a
    skewed reducer.
    """
    from ..functions.url import url_host
    from .exact import exact_duplicates

    flags = exact_duplicates(docs, text_col).select(
        id_col, (~F.col("keep")).cast("long").alias("_dup")
    )
    base = docs.select(
        F.col(id_col),
        url_host(url_col).alias("host"),
        F.octet_length(F.col(text_col)).cast("long").alias("_bytes"),
    )
    return (
        base.join(flags, id_col)
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_dup").alias("dup_docs"),
            F.sum("_bytes").alias("total_bytes"),
        )
        .select(
            "host",
            "n_docs",
            "dup_docs",
            F.expr("CAST((1000000 * dup_docs) DIV n_docs AS BIGINT)").alias(
                "dup_ppm"
            ),
            "total_bytes",
        )
    )
