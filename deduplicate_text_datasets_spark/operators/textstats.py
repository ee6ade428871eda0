"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

All pure Catalyst expressions (whole-stage codegen; no Python), and each is
expressible 1:1 in ANSI SQL — the driver's DuckDB oracle runs the same
formulas (__spark_entry__.py), making every one of these a value-hash-gated
operator. Counting uses literal-substring arithmetic (length-difference
trick) rather than dialect-specific regex so Spark and DuckDB agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint, tokens

# tiny per-language stopword panels (heuristic language ID; deterministic)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "und", "die", "das", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
}


def substr_count(col: Column, needle: str) -> Column:
    """Occurrences of a literal substring (non-overlapping), via the
    length-difference identity — portable across engines."""
    return (
        (F.octet_length(col) - F.octet_length(F.replace(col, F.lit(needle))))
        / len(needle)
    ).cast("long")


def token_count(text_col: str = "text") -> Column:
    """Whitespace/punct token count (shared tokenizer definition)."""
    return F.size(tokens(text_col)).cast("long")


def doc_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_bytes, n_tokens, avg_token_len, space_ratio) — the
    length/shape features quality filters cut on."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    n_tokens = token_count(text_col)
    return docs.select(
        "doc_id",
        F.octet_length(text_col).cast("long").alias("n_bytes"),
        n_tokens.alias("n_tokens"),
        F.round(
            F.octet_length(F.replace(F.col(text_col), F.lit(" "), F.lit("")))
            / F.greatest(n_tokens, F.lit(1)),
            6,
        ).alias("avg_token_len"),
        F.round(
            substr_count(F.col(text_col), " ")
            / F.greatest(F.octet_length(text_col), F.lit(1)),
            6,
        ).alias("space_ratio"),
        (substr_count(padded, " the ") + substr_count(padded, " and "))
        .alias("en_stopwords"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, quality): a deterministic 0..1 heuristic — penalizes
    too-short docs and degenerate token shapes (Gopher/C4-style length and
    repetition rules, reduced to engine-portable arithmetic)."""
    n_tokens = token_count(text_col)
    n_bytes = F.octet_length(text_col).cast("long")
    len_ok = F.when(n_tokens >= 20, F.lit(1.0)).otherwise(n_tokens / F.lit(20.0))
    avg_len = n_bytes / F.greatest(n_tokens, F.lit(1))
    shape_ok = F.when((avg_len >= 3) & (avg_len <= 12), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return docs.select(
        "doc_id", F.round(len_ok * shape_ok, 6).alias("quality")
    )


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    return {
        lang: sum(
            (substr_count(padded, f" {w} ") for w in words), start=F.lit(0)
        )
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_hits): stopword-panel argmax with a
    deterministic tie order (en > de > fr > es), 'und' (undetermined) when
    no panel matches. N-gram-free heuristic — portable to the SQL oracle."""
    scores = lang_scores(text_col)
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(list(LANG_STOPWORDS)):  # earlier langs win ties
        pred = F.when(
            (scores[lang] > 0) & (scores[lang] == best), F.lit(lang)
        ).otherwise(pred)
    return docs.select(
        "doc_id", pred.alias("lang_pred"), best.cast("long").alias("lang_hits")
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint): token-normalized 64-bit content fingerprint."""
    return docs.select("doc_id", doc_fingerprint(text_col).alias("fingerprint"))


def repetition_stats(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    MassiveText quality pipeline) — the filter family that catches
    boilerplate/spam pages whose *internal* repetition exact-substring
    dedup does not remove. Returns per doc (all LongType, ppm-scaled so
    the gate's value hash stays float-free):

      dup_line_ppm    fraction of non-empty '\\n'-lines that are repeats
                      of an earlier line (1 - distinct/total);
      top_ngram_ppm   chars covered by the single most-repeated word
                      n-gram, as count*len(gram) / total gram chars;
      dup_ngram_ppm   chars in n-gram instances whose gram occurs >= 2
                      times in the doc, over total gram chars.

    Exact integer semantics (x DIV y, not float) so the DuckDB oracle
    matches bit-for-bit. The line stats are pure per-row Catalyst (no
    shuffle); the gram stats are one explode + two keyed aggregations —
    both keys carry doc_id, so partial aggregation combines map-side and
    no key can get hotter than the longest single document. Docs with
    fewer than n tokens have no n-grams and report 0 (unlike NearDup
    shingles there is no whole-doc fallback: repetition of a doc shorter
    than the window is meaningless)."""
    toks = tokens(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda x: x != "")
    base = docs.select(
        "doc_id",
        F.size(lines).cast("long").alias("nl"),
        F.size(F.array_distinct(lines)).cast("long").alias("ndl"),
        F.explode_outer(grams).alias("gram"),
    )
    per_gram = base.groupBy("doc_id", "nl", "ndl", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    chars = F.col("cnt") * F.length("gram").cast("long")
    agg = per_gram.groupBy("doc_id", "nl", "ndl").agg(
        F.max(F.when(F.col("gram").isNotNull(), chars)).alias("top_chars"),
        F.sum(F.when(F.col("gram").isNotNull() & (F.col("cnt") >= 2), chars)).alias(
            "dup_chars"
        ),
        F.sum(F.when(F.col("gram").isNotNull(), chars)).alias("tot_chars"),
    )
    def ppm(expr: str) -> Column:
        return F.coalesce(
            F.expr(f"CAST((1000000 * ({expr})) DIV tot_chars AS BIGINT)"),
            F.lit(0).cast("long"),
        )

    return agg.select(
        "doc_id",
        F.expr(
            "CAST(CASE WHEN nl > 0 THEN (1000000 * (nl - ndl)) DIV nl "
            "ELSE 0 END AS BIGINT)"
        ).alias("dup_line_ppm"),
        ppm("top_chars").alias("top_ngram_ppm"),
        ppm("COALESCE(dup_chars, 0)").alias("dup_ngram_ppm"),
    )
