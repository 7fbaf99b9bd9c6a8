"""Vectorized HTML→text and hyperlink extraction (Arrow pandas UDFs).

This is the rebuild's loader stage: the analog of GAE transforming raw
tables into graph topology (arrow_fragment_loader.h), per the input
hint — "vectorized pandas/Arrow UDFs (no per-row Python)" and the
per-row invariant: extracted text is byte-identical per url to the
stored ``text`` column.

Extraction grammar (deterministic, matching the generator's renderer):
    text  = title ++ "\\n" ++ "\\n"-joined <p> bodies
    links = href values of <a> anchors, document order

Both UDFs are Arrow-batched (``pandas_udf``): the regex work happens
per batch on pandas Series, never row-at-a-time through Py4J.  At 100TB
the html column dominates I/O — callers should select only (url, html)
before applying these so parquet column pruning drops text/lang.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

_TITLE = re.compile(r"<title>(.*?)</title>", re.S)
_PARA = re.compile(r"<p>(.*?)</p>", re.S)
_HREF = re.compile(r'<a\s+href="([^"]+)"')
_ANCHOR = re.compile(r'<a\s+href="([^"]+)"\s*>(.*?)</a>', re.S)


@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """html binary → text (title + paragraphs, newline-joined)."""

    def one(b) -> str:
        s = b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else str(b)
        parts = _TITLE.findall(s)[:1] + _PARA.findall(s)
        return "\n".join(parts)

    return html.map(one)


@pandas_udf(ArrayType(StringType()))
def extract_links(html: pd.Series) -> pd.Series:
    """html binary → array of href targets (document order)."""

    def one(b) -> list[str]:
        s = b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else str(b)
        return _HREF.findall(s)

    return html.map(one)


@pandas_udf(ArrayType(StructType([
    StructField("href", StringType()),
    StructField("anchor", StringType()),
])))
def extract_anchor_pairs(html: pd.Series) -> pd.Series:
    """html binary → array of (href, anchor-text) structs, document
    order.  Same Arrow-batched shape as extract_links; the struct array
    keeps link and its text zipped without a second pass."""

    def one(b) -> list[tuple[str, str]]:
        s = b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else str(b)
        return _ANCHOR.findall(s)

    return html.map(one)


def anchor_texts(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url, anchor) — one row per <a> occurrence (NOT
    deduplicated: anchor frequency is the ranking signal downstream).

    Column-pruned to (url, html); the explode keys the follow-on
    aggregation by dst_url, so the anchor-profile shuffle is the only
    exchange after extraction.
    """
    return pages.select(
        F.col("url").alias("src_url"),
        extract_anchor_pairs("html").alias("pairs"),
    ).select(
        "src_url",
        F.explode("pairs").alias("p"),
    ).select("src_url", F.col("p.href").alias("dst_url"), F.col("p.anchor").alias("anchor"))


def links_from_pages(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url) link set, deduplicated.

    Column-pruned: only (url, html) are read from the scan.
    """
    return (
        pages.select(F.col("url").alias("src_url"), extract_links("html").alias("hrefs"))
        .select("src_url", F.explode("hrefs").alias("dst_url"))
        .distinct()
    )
