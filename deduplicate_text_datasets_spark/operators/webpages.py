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
