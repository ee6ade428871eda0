"""URL canonicalization for Common-Crawl-style web pages.

BASELINE.json input_hint: the engine's input is an Iceberg table of web
pages keyed by ``url`` with a crawl timestamp ``warc_ts``. Real crawls see
the same page under many byte-distinct URLs (fragment anchors, tracking
params, case-insensitive scheme/host, trailing slash), so URL-level exact
dedup needs a canonical form FIRST — otherwise "keep latest crawl per
page" silently keeps one copy per decoration. The reference repo dedups
at text level only; URL canonicalization is part of the web-pipeline
extension surface (SURVEY.md §2.3).

The normalization policy is five regex rules applied in order. Every rule
is expressible with ``regexp_replace``/``regexp_extract`` + ``lower`` +
``concat`` ONLY — no backreferences, no lookaround — so the exact same
regexes run on Spark (Java regex) and on the DuckDB oracle (RE2), and the
gate query ``canonical_pages`` can be value-hash-checked end to end. The
regex constants below are the single source of truth: ``normalize_url``
builds the Spark Column and ``normalize_url_sql`` builds the equivalent
DuckDB SQL expression from the SAME strings.

Policy (documented, deliberately conservative):
  1. strip the fragment           (``#...`` never reaches the server)
  2. strip tracking params        (utm_*, fbclid, gclid — ad/analytics
                                   decorations; other params are KEPT:
                                   ``?ref=kept`` is a distinct page)
  3. strip dangling ``?``/``&``   (left over when rule 2 emptied the query)
  4. lowercase scheme://host      (RFC 3986 §6.2.2.1; path stays cased)
  5. strip trailing ``/``         (path-only; ``a.com/p/`` == ``a.com/p``)

NOT normalized (would need semantic knowledge regexes can't carry):
default ports (:80/:443 — needs backrefs portable to RE2), percent-encoding
case, param reordering, www-stripping.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# rule 1: fragment
RE_FRAGMENT = "#.*"
# rule 2: one tracking param + its trailing '&' if any (applied globally)
RE_TRACKING = "(utm_[a-zA-Z]+|fbclid|gclid)=[^&#]*&?"
# rule 3: dangling separators at end of string
RE_DANGLING = "[?&]+$"
# rule 4: the scheme://authority prefix (match to lowercase; rest appended)
RE_SCHEME_HOST = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
# rule 5: trailing slash(es)
RE_TRAILING_SLASH = "/+$"
# host extraction: authority minus userinfo/port (group 1). Shared by
# Spark and the DuckDB oracle like the rules above; '' when no match on
# BOTH engines (regexp_extract's no-match contract agrees).
RE_HOST = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"


def normalize_url(url: Column | str) -> Column:
    """Spark Column: canonical form of ``url`` under the module policy."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, RE_FRAGMENT, "")
    u = F.regexp_replace(u, RE_TRACKING, "")
    u = F.regexp_replace(u, RE_DANGLING, "")
    u = F.concat(
        F.lower(F.regexp_extract(u, RE_SCHEME_HOST, 0)),
        F.regexp_replace(u, RE_SCHEME_HOST, ""),
    )
    return F.regexp_replace(u, RE_TRAILING_SLASH, "")


def url_host(url: Column | str) -> Column:
    """Spark Column: lowercased registered host of ``url`` ('' if none)."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(u, RE_HOST, 1))


def url_host_sql(expr: str) -> str:
    """The SAME host extraction as a DuckDB SQL expression."""
    return f"lower(regexp_extract({expr}, '{RE_HOST}', 1))"


def normalize_url_sql(expr: str) -> str:
    """The SAME policy as a DuckDB SQL expression over ``expr`` — built
    from the same regex constants so Spark and the oracle cannot drift."""
    u = f"regexp_replace({expr}, '{RE_FRAGMENT}', '')"
    u = f"regexp_replace({u}, '{RE_TRACKING}', '', 'g')"
    u = f"regexp_replace({u}, '{RE_DANGLING}', '')"
    u = (
        f"(lower(regexp_extract({u}, '{RE_SCHEME_HOST}'))"
        f" || regexp_replace({u}, '{RE_SCHEME_HOST}', ''))"
    )
    return f"regexp_replace({u}, '{RE_TRAILING_SLASH}', '')"
