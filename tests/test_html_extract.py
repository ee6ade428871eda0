"""HTML->text baseline extractor (functions/html.py): policy cases, the
input_hint byte-identity invariant on synthesizer output, and Spark/DuckDB
rule parity (the gate oracle runs the SQL rendering)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from deduplicate_text_datasets_spark.functions.html import (
    extract_text,
    extract_text_sql,
    extract_text_udf_seam,
)

CASES = [
    ("<html><body>hello world</body></html>", "hello world"),
    ("<p>a</p><p>b</p>", "a b"),
    ("<script>var x = '<p>not text</p>';</script>after", "after"),
    ("<STYLE type='x'>.c { color: red }</STYLE>t", "t"),
    ("a<!-- hidden <b>bold</b> -->b", "a b"),
    ("x &amp; y &lt;z&gt; &quot;q&quot; &#39;s&#39;", "x & y <z> \"q\" 's'"),
    ("&amp;lt; stays &lt;", "&lt; stays <"),  # amp decoded last
    ("  spaced\n\nout\ttext  ", "spaced out text"),
    # '<' inside an attribute: [^>]* passes over it, the whole tag drops
    ("<div class='a' data-x='1<2'>v</div>", "v"),
    ("plain text no markup", "plain text no markup"),
]


def test_extract_text_cases(spark):
    df = spark.createDataFrame(
        [(h.encode("utf-8"),) for h, _ in CASES], "html binary"
    )
    got = [r["t"] for r in df.select(extract_text("html").alias("t")).collect()]
    assert got == [e for _, e in CASES]


def test_extract_text_sql_matches_spark_policy():
    con = duckdb.connect()
    expr = extract_text_sql("h")
    for raw, want in CASES:
        got = con.execute(
            f"SELECT {expr} AS t FROM (SELECT ? AS h)", [raw]
        ).fetchone()[0]
        assert got == want, f"duckdb {raw!r} -> {got!r}, want {want!r}"


def test_byte_identity_on_synthesized_pages(spark):
    """input_hint invariant: extracting the synthesizer's html column
    reproduces the text column byte-for-byte on every fixture doc."""
    from deduplicate_text_datasets_spark.sources.documents import (
        DOCUMENTS_SCHEMA,
        synth_documents_pandas,
    )

    docs = spark.createDataFrame(
        synth_documents_pandas(60), schema=DOCUMENTS_SCHEMA
    )
    bad = docs.filter(extract_text("html") != F.col("text")).count()
    assert bad == 0


def test_real_extractor_seam_raises():
    with pytest.raises(NotImplementedError, match="trafilatura"):
        extract_text_udf_seam(F.lit(b""))
