"""Web-corpus curation: URL canonicalization, registered-domain extraction,
and per-domain quota capping — the C4/RefinedWeb-style source hygiene a
web-scale training pipeline runs before any text filter (dedup by canonical
URL, cap any one domain's share of the corpus).

Everything here is pure Catalyst regex/string expressions (map-only until
the cap's per-domain window), chosen from the regex subset Java and RE2
share so the DuckDB oracles replicate bit-for-bit.

Scale shape: normalization and domain extraction are per-row projections —
zero shuffle, whole-stage codegen. ``cap_per_domain`` shuffles once on the
registered domain; domain skew is real at web scale (one domain can be 1%
of the corpus), so the rank election uses the same WindowGroupLimit
pushdown the samplers rely on — each map task pre-filters to its local
top-``cap`` before the exchange, so the hot domain's shuffle input is
``cap x n_map_tasks``, not its full row count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

# Two-level public suffixes we recognize without a full PSL (the common
# country-code second-level registrations); anything else falls back to the
# last two host labels.
_TWO_LEVEL_SUFFIX = r"(?:co|com|net|org|gov|edu|ac)\.[a-z]{2}"


def normalize_url(col: Column | str) -> Column:
    """Canonical URL: scheme stripped, host lowercased with a leading
    ``www.`` removed, query string and fragment dropped, trailing slashes
    trimmed. Path case is PRESERVED (paths are case-sensitive; hosts are
    not). Malformed inputs degrade gracefully — no exceptions, worst case
    the string passes through trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    # fragment, then query (order matters: '#' can follow '?').
    u = F.regexp_replace(F.trim(c), r"#.*$", "")
    u = F.regexp_replace(u, r"\?.*$", "")
    u = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(u, r"^([^/]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(u, r"^[^/]*(/.*)?$", 1)
    path = F.regexp_replace(path, r"/+$", "")
    return F.concat(host, path)


def registered_domain(host_or_url: Column | str) -> Column:
    """Registered (pay-level) domain of a host or normalized URL: the label
    directly under the public suffix — ``a.b.news.co.uk -> news.co.uk``,
    ``cdn.example.com -> example.com``. Uses the two-level suffix list
    above plus a last-two-labels fallback; hosts without a dot pass
    through unchanged."""
    c = F.col(host_or_url) if isinstance(host_or_url, str) else host_or_url
    host = F.lower(F.regexp_extract(c, r"^([^/]*)", 1))
    two = F.regexp_extract(host, r"([^.]+\." + _TWO_LEVEL_SUFFIX + r")$", 1)
    fallback = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(two != "", two).when(fallback != "", fallback).otherwise(host)


def cap_per_domain(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` documents per registered domain, preferring
    high ``order_col`` (quality proxy) with ``id_col`` as the
    deterministic tiebreak. Adds ``url_norm``, ``domain``, and the kept
    row's ``domain_rank`` (1-based).

    The quota is exact, not probabilistic: a per-domain row_number with
    rank<=cap compiles to WindowGroupLimit, so map tasks pre-trim before
    the domain shuffle (see module docstring for the skew math)."""
    out = df.withColumn("url_norm", normalize_url(url_col)).withColumn(
        "domain", registered_domain(F.col("url_norm"))
    )
    w = Window.partitionBy("domain").orderBy(
        F.desc(order_col), F.asc(id_col)
    )
    return (
        out.withColumn("domain_rank", F.row_number().over(w))
        .filter(F.col("domain_rank") <= int(cap))
    )
