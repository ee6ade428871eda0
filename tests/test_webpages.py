"""URL canonicalization + crawl-log keep-latest (functions/url.py,
operators/webpages.py). The canonical_pages gate query is additionally
value-hash-checked against the DuckDB oracle by the driver; these tests
pin the normalization policy case by case and the cross-document
keep-latest semantics."""

from __future__ import annotations

import duckdb
import pytest

from deduplicate_text_datasets_spark.functions.url import (
    normalize_url,
    normalize_url_sql,
)
from deduplicate_text_datasets_spark.operators.webpages import canonical_pages

CASES = [
    # (raw, expected canonical)
    ("https://a.com/p", "https://a.com/p"),
    ("https://a.com/p#section-2", "https://a.com/p"),
    ("https://a.com/p/", "https://a.com/p"),
    ("HTTPS://A.COM/Path", "https://a.com/Path"),  # path case preserved
    ("https://a.com/p?utm_source=x", "https://a.com/p"),
    ("https://a.com/p?utm_source=x&utm_medium=y", "https://a.com/p"),
    ("https://a.com/p?ref=kept&utm_medium=y", "https://a.com/p?ref=kept"),
    ("https://a.com/p?utm_a=1&real=2", "https://a.com/p?real=2"),
    ("https://a.com/p?fbclid=abc#f", "https://a.com/p"),
    ("https://a.com/p?gclid=1&fbclid=2", "https://a.com/p"),
    ("HTTP://WWW.Ex.COM/A/B/?utm_campaign=c#x", "http://www.ex.com/A/B"),
    # no scheme: pass through untouched except generic rules
    ("a.com/p/#f", "a.com/p"),
    ("https://a.com", "https://a.com"),
    ("https://a.com/", "https://a.com"),
]


def test_normalize_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["url"])
    got = [
        r["n"]
        for r in df.select(normalize_url("url").alias("n"))
        .toPandas()
        .to_dict("records")
    ]
    assert got == [e for _, e in CASES]


def test_normalize_url_sql_matches_spark():
    """The DuckDB rendering of the policy (what the gate oracle runs) must
    agree with the Spark Column on every policy case — single source of
    truth means zero drift by construction, this pins it by execution."""
    con = duckdb.connect()
    expr = normalize_url_sql("url")
    for raw, want in CASES:
        got = con.execute(
            f"SELECT {expr} AS n FROM (SELECT ? AS url)", [raw]
        ).fetchone()[0]
        assert got == want, f"duckdb {raw!r} -> {got!r}, want {want!r}"


def test_canonical_pages_keep_latest_crosses_docs(spark):
    crawls = spark.createDataFrame(
        [
            # page A: three decorations of one page, two docs
            ("https://a.com/x", 100, 1),
            ("https://a.com/x/#frag", 250, 2),  # latest
            ("HTTPS://A.COM/x?utm_source=s", 200, 3),
            # page B: single crawl
            ("https://b.com/y", 50, 4),
            # page C: ?ref=kept stays a distinct page from /x
            ("https://a.com/x?ref=kept", 300, 5),
        ],
        ["url", "ts_secs", "doc_id"],
    )
    rows = {
        r["norm_url"]: r
        for r in canonical_pages(crawls).toPandas().to_dict("records")
    }
    assert set(rows) == {
        "https://a.com/x",
        "https://b.com/y",
        "https://a.com/x?ref=kept",
    }
    a = rows["https://a.com/x"]
    assert a["n_crawls"] == 3
    assert a["latest_ts_secs"] == 250
    assert a["latest_doc_id"] == 2
    assert rows["https://b.com/y"]["n_crawls"] == 1
    assert rows["https://a.com/x?ref=kept"]["latest_doc_id"] == 5


def test_canonical_pages_plan_is_single_exchange(spark):
    """100-TB shape: one hashpartitioning exchange on norm_url, partial
    aggregation before it, no join/window/sort in the plan."""
    crawls = spark.createDataFrame(
        [("https://a.com/x", 1, 1)], ["url", "ts_secs", "doc_id"]
    )
    plan = canonical_pages(crawls)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "Window" not in plan


@pytest.mark.parametrize("bad", ["", "no-url-at-all", "://weird"])
def test_normalize_url_never_raises(spark, bad):
    df = spark.createDataFrame([(bad,)], ["url"])
    df.select(normalize_url("url")).collect()
