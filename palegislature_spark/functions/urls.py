"""URL canonicalization as pure Column expressions.

The crawl-side stage that precedes content dedup in a web corpus:
the same page arrives under many spellings (host case, default
ports, tracking params, param order, fragments, percent-encoding),
and canonicalizing BEFORE fetch/dedup collapses them without
touching payloads. Reference parity: the crawler builds and compares
URLs by string (crawl.py:34-47 page fetch, crawl.py:345-366 redirect
cache keyed by URL) — at web scale those keys must be canonical or
the cache and the dedup both fragment.

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
HEXPAIR_RE = r"^([0-9A-Fa-f]{2})"


def pct_normalize(url: Column) -> Column:
    """RFC 3986 §6.2.2.2 percent-encoding normalization:

    - escapes of UNRESERVED characters (ALPHA / DIGIT / ``-`` ``.``
      ``_`` ``~``) are decoded (``%7E`` → ``~``, ``%41`` → ``A``);
    - every other valid escape keeps its percent form but with
      UPPERCASE hex digits (``%2f`` → ``%2F``);
    - a ``%`` not followed by two hex digits is left verbatim
      (malformed input passes through rather than erroring).

    Decoding only unreserved characters can never introduce a URL
    delimiter (``:/?#[]@&=+`` are all reserved), so this is safe to
    run on the WHOLE url string before structural parsing. Split on
    ``%``: piece 1 precedes any escape; each later piece starts with
    the two chars that followed a ``%``.
    """

    def fix(x: Column) -> Column:
        hexpair = F.regexp_extract(x, HEXPAIR_RE, 1)
        code = F.conv(F.substring(x, 1, 2), 16, 10).cast("int")
        rest = F.substring(x, F.lit(3), F.length(x))
        unreserved = (
            code.between(48, 57)   # 0-9
            | code.between(65, 90)   # A-Z
            | code.between(97, 122)  # a-z
            | code.isin(45, 46, 95, 126)  # - . _ ~
        )
        return F.when(hexpair == "", F.concat(F.lit("%"), x)).otherwise(
            F.when(unreserved, F.concat(F.char(code), rest)).otherwise(
                F.concat(F.lit("%"), F.upper(hexpair), rest)
            )
        )

    def build(pieces: Column) -> Column:
        return F.concat(
            F.element_at(pieces, 1),
            F.array_join(
                F.transform(F.slice(pieces, 2, F.size(pieces)), fix), ""
            ),
        )

    return let(F.split(url, "%", -1), build)


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL:

    - percent-encoding normalized first (``pct_normalize`` — RFC 3986
      §6.2.2.2; safe pre-parse because decoded chars are never
      delimiters);
    - scheme and host lowercased (RFC 3986 §6.2.2.1 — userinfo, when
      present, is case-preserved: only scheme and host may fold);
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

    def fold_host(authority: Column) -> Column:
        # lowercase ONLY host:port — userinfo (user:pass@) keeps its
        # case (RFC 3986 §6.2.2.1 folds scheme and host, nothing else)
        hostport = F.regexp_extract(authority, r"([^@]*)$", 1)
        userinfo = authority.substr(
            F.lit(1), F.length(authority) - F.length(hostport)
        )
        return F.concat(userinfo, F.lower(hostport))

    def build(u: Column) -> Column:
        parts = F.struct(
            F.lower(F.regexp_extract(u, SCHEME_RE, 1)).alias("s"),
            let(F.regexp_extract(u, HOSTPORT_RE, 1), fold_host).alias("h"),
            F.regexp_extract(u, PATH_RE, 1).alias("p"),
            F.regexp_extract(u, QUERY_RE, 1).alias("q"),
        )
        return let(parts, lambda x: assemble(x["s"], x["h"], x["p"], x["q"]))

    return let(pct_normalize(url), build)
