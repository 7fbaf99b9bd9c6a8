"""URL canonicalization — the crawl-side normalization a link-graph
loader applies before the url→vid dictionary, so that casing/fragment/
default-port variants of one page collapse to one vertex (the analog of
the reference loader's oid unification, arrow_fragment_loader.h).

Pure JVM-side regexp column expressions (no UDF), restricted to
constructs Spark's Java regex and DuckDB's RE2 evaluate identically
(no lookaround, no backrefs) so the driver oracle can mirror each step
verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://authority[rest] — authority ends at the first /, ?, or #
_SPLIT_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$"


def canonical_url(col: Column | str) -> Column:
    """Canonical form of an absolute URL:

    1. drop the fragment (``#...``);
    2. lowercase the scheme and the host (path/query stay case-sensitive);
    3. strip the scheme's default port (``:80`` http, ``:443`` https);
    4. a bare authority gets no trailing slash: ``http://a.ex/`` →
       ``http://a.ex``.

    Strings that don't parse as ``scheme://authority...`` are returned
    unchanged (relative links are resolved elsewhere).
    """
    c = F.col(col) if isinstance(col, str) else col
    no_frag = F.regexp_replace(c, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _SPLIT_RE, 1))
    host = F.lower(F.regexp_extract(no_frag, _SPLIT_RE, 2))
    rest = F.regexp_extract(no_frag, _SPLIT_RE, 3)
    host = F.when(
        (scheme == "http"), F.regexp_replace(host, r":80$", "")
    ).when(
        (scheme == "https"), F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    rest = F.regexp_replace(rest, r"^/$", "")
    rebuilt = F.concat(scheme, F.lit("://"), host, rest)
    return F.when(scheme == "", no_frag).otherwise(rebuilt)


def url_host(col: Column | str) -> Column:
    """Lowercase host (with any explicit non-default port stripped by
    ``canonical_url`` first if desired); '' when not an absolute URL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, _SPLIT_RE, 2))


def crawl_frontier(
    candidates,
    host_quota: int = 3,
    budget: int = 100,
    url_col: str = "url",
    host_col: str = "host",
    score_col: str = "score",
):
    """Crawl-frontier scheduling: from a scored candidate-URL table,
    take at most ``host_quota`` URLs per host (politeness — no host
    monopolizes fetch slots) and then the global top ``budget`` by
    score.  The ordering is fully deterministic (score desc, url asc).

    Plan shape at 10^12 candidates: the per-host quota is a window
    partitioned BY HOST (one shuffle on the natural key, map-side
    partial nothing — but the window never single-partitions), and the
    global budget is a distributed top-k (TakeOrderedAndProject), never
    a full sort.  Returns (url, host, score, host_rank, rank).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    wh = Window.partitionBy(host_col).orderBy(
        F.col(score_col).desc(), F.col(url_col).asc()
    )
    quota = (
        candidates.select(url_col, host_col, score_col)
        .withColumn("host_rank", F.row_number().over(wh))
        .where(F.col("host_rank") <= host_quota)
    )
    top = quota.orderBy(F.col(score_col).desc(), F.col(url_col).asc()).limit(budget)
    wg = Window.orderBy(F.col(score_col).desc(), F.col(url_col).asc())
    return top.select(
        url_col,
        host_col,
        score_col,
        "host_rank",
        F.row_number().over(wg).alias("rank"),
    )


def crawl_delta(old, new, key_col: str = "doc_id", text_col: str = "text"):
    """(key, status) diff between two crawl snapshots keyed by page
    identity: ``added`` (key only in new), ``removed`` (only in old),
    ``changed`` (content fingerprint differs), ``unchanged``.

    The incremental-recrawl primitive: downstream stages (re-extract,
    re-embed, re-index) run only on added+changed — at 10^12 pages the
    delta is typically <1% of the corpus, so this one full-outer join
    (single shuffle on the key; content compared via the 32-byte md5
    fingerprint, never the bodies) replaces a full reprocess.
    Fingerprints come from text.fingerprint → identical in DuckDB.
    """
    from pyspark.sql import DataFrame  # noqa: F401  (type doc)
    from graphscope_spark.functions.text import fingerprint

    o = old.select(F.col(key_col).alias("k"), fingerprint(text_col).alias("fp_old"))
    n = new.select(F.col(key_col).alias("k"), fingerprint(text_col).alias("fp_new"))
    return (
        o.join(n, "k", "full_outer")
        .select(
            F.col("k").alias(key_col),
            F.when(F.col("fp_old").isNull(), F.lit("added"))
            .when(F.col("fp_new").isNull(), F.lit("removed"))
            .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


def url_filter(
    df,
    url_col: str = "url",
    patterns: list[str] | None = None,
    blocked_hosts: list[str] | None = None,
):
    """Crawl-side URL blocklist gate (the robots/spam-list filter a
    Common-Crawl-style pipeline applies before fetch/extract): flags
    each URL as blocked by HOST (exact match or subdomain of a blocked
    suffix — the domain-blocklist convention) or by PATTERN (a combined
    RE2-safe regex alternation: ad/tracker paths, binary extensions),
    host precedence first.  Returns every row with (host,
    block_reason); keep = ``block_reason IS NULL``.

    Scale shape: both lists are broadcast-small by nature (blocklists
    are KBs, corpora are TBs), and both gates are pure column
    expressions compiled into the scan — zero shuffle, zero joins; the
    host extraction reuses the canonicalization regex.  Regexes are
    restricted to constructs Spark's Java regex and DuckDB's RE2
    evaluate identically (module docstring), so the oracle mirrors the
    gate verbatim.
    """
    patterns = patterns if patterns is not None else [
        r"/ads?/", r"[?&]utm_", r"\.(exe|zip|dmg)$",
    ]
    blocked_hosts = blocked_hosts if blocked_hosts is not None else []
    u = F.col(url_col)
    host = url_host(u)
    host_hit = F.lit(False)
    for h in blocked_hosts:
        host_hit = host_hit | (host == h.lower()) | host.endswith("." + h.lower())
    # patterns=[] means "no pattern gate" — rlike("") matches EVERY
    # string, so an empty alternation must compile to a constant False
    pat = "|".join(f"(?:{p})" for p in patterns)
    pat_hit = u.rlike(pat) if patterns else F.lit(False)
    reason = (
        F.when(host_hit, F.lit("host"))
        .when(pat_hit, F.lit("pattern"))
        .otherwise(F.lit(None).cast("string"))
    )
    return df.select(
        "*", host.alias("host"), reason.alias("block_reason")
    )
