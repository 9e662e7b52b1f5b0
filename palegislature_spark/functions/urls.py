"""URL canonicalization as pure Column expressions.

The crawl-side stage that precedes content dedup in a web corpus:
the same page arrives under many spellings (host case, default
ports, tracking params, param order, trailing slash, fragments), and
canonicalizing BEFORE fetch/dedup collapses them without touching
payloads. Reference parity: the crawler builds and compares URLs by
string (crawl.py:34-47 page fetch, crawl.py:345-366 redirect cache
keyed by URL) — at web scale those keys must be canonical or the
cache and the dedup both fragment.

All rules are deterministic string algebra (regexp + array ops), so
the DuckDB oracle replays them exactly; no UDF, and the parsed parts
are let-bound (expr_util) so each regexp runs once per row.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from palegislature_spark.functions.expr_util import let

# query params that never identify content
TRACKING_PREFIX = "utm_"

SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
QUERY_RE = r"^[^#?]*\?([^#]*)"  # the ? must precede any # — a ? inside the fragment is not a query


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL:

    - scheme and host lowercased (RFC 3986 §6.2.2.1);
    - default port stripped (``:80`` for http, ``:443`` for https);
    - fragment dropped;
    - ``utm_*`` tracking params dropped, the rest sorted by full
      ``k=v`` text (byte order — stable across engines);
    - one trailing slash stripped from a non-root path (``/a/`` ==
      ``/a``; root stays ``/``); an empty path becomes ``/``.

    Path case is preserved — paths are case-sensitive.
    """

    def assemble(s: Column, hp: Column, p0: Column, q: Column) -> Column:
        default_port = F.when(s == "https", F.lit(":443")).otherwise(F.lit(":80"))
        host = F.when(
            hp.endswith(default_port),
            hp.substr(F.lit(1), F.length(hp) - F.length(default_port)),
        ).otherwise(hp)
        p1 = F.when(p0 == "", F.lit("/")).otherwise(p0)
        path = F.when(
            (F.length(p1) > 1) & p1.endswith("/"),
            p1.substr(F.lit(1), F.length(p1) - 1),
        ).otherwise(p1)
        kept = F.array_join(
            F.array_sort(
                F.filter(
                    F.split(q, "&"),
                    lambda part: (part != "")
                    & ~part.startswith(TRACKING_PREFIX),
                )
            ),
            "&",
        )
        canon = F.concat(s, F.lit("://"), host, path)
        return F.when(kept != "", F.concat(canon, F.lit("?"), kept)).otherwise(
            canon
        )

    def build(u: Column) -> Column:
        parts = F.struct(
            F.lower(F.regexp_extract(u, SCHEME_RE, 1)).alias("s"),
            F.lower(F.regexp_extract(u, HOSTPORT_RE, 1)).alias("h"),
            F.regexp_extract(u, PATH_RE, 1).alias("p"),
            F.regexp_extract(u, QUERY_RE, 1).alias("q"),
        )
        return let(parts, lambda x: assemble(x["s"], x["h"], x["p"], x["q"]))

    return let(url, build)
