"""URL canonicalization + URL-level dedup — the crawl-corpus identity
pass a training pipeline runs before any content dedup (the same page
fetched as http://WWW.Example.com:80/a/?utm_source=x&b=1#top and
https://example.com/a?b=1 must collapse to one identity).

RFC 3986 normalization + the standard crawl-pipeline extras: lowercase
scheme/host, strip fragments, strip default ports, drop tracking params
(utm_*, gclid, fbclid, ref), sort the surviving query params, strip a
leading www. and a trailing path slash.

Everything is a chain of JVM expressions (regexp_extract / split /
filter / array_sort / concat — whole-stage codegen, no UDF, no shuffle),
and every regex is RE2-compatible (no lookaround), so the DuckDB oracle
runs the IDENTICAL steps.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking parameters dropped during canonicalization (the common
# analytics/click-id set; matched on the param NAME before '=')
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref)(=|$)"

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"


def canonicalize_url(col: str | Column) -> Column:
    """Canonical form of an absolute URL (Column in, Column out).
    Strings without a scheme come back trimmed but otherwise untouched
    (relative references carry no authority to normalize)."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment never reaches origin
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    # default ports are identity-free: http://h:80/ == http://h/
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, r":80$", ""),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.regexp_replace(host, r":443$", ""),
    ).otherwise(host)
    path = F.regexp_extract(rest, r"^[^/?]+(/[^?]*)?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        path.substr(F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(canon)


def url_dedup(df, id_col: str = "doc_id", url_col: str = "url"):
    """One survivor (min id) per canonical URL: (canon_url, keep_id,
    n_copies). The groupBy key is the canonical string — hosts/paths are
    short; at crawl scale this is the standard first dedup pass and the
    shuffle is one narrow (url, id) relation."""
    c = df.select(
        F.col(id_col).alias("id"), canonicalize_url(url_col).alias("canon_url")
    )
    return c.groupBy("canon_url").agg(
        F.min("id").alias("keep_id"), F.count("*").alias("n_copies")
    )
