"""Deterministic synthetic Common-Crawl-style pages table.

Matches BASELINE.json input_hint exactly:
    (url string, warc_ts timestamp, html binary, text string, lang string)

The generator is seeded and fully deterministic per (seed, page index):
it renders HTML whose :func:`graphscope_spark.sources.extract.extract_text`
output is BYTE-IDENTICAL to the stored ``text`` column (the per-row
invariant the graft requires), and whose anchor hrefs define a
power-law link graph — a few hub pages receive ~10% of all links, so
the skew-handling paths are exercised at every scale.

Reference analog: GAE's loader path (file/oss/hdfs CSV → ArrowFragment,
framework/loader.py:94-160, arrow_fragment_loader.h) — here the "load"
is parquet-write + spark.read, and topology extraction is the
vectorized UDF pipeline in sources/extract.py.

Generation is distributed: ``spark.range(n)`` partitions the id space
and a ``mapInPandas`` renders pages per batch — no driver-side
materialization, so the same code generates 10^3 or 10^9 pages.
"""

from __future__ import annotations

import datetime as _dt
import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

LANGS = ["en", "de", "fr", "es", "zh", "ja"]
EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)

WORDS = (
    "web graph rank crawl page link data spark engine node edge iter "
    "query scale index text hub site path batch shard join merge sort"
).split()


def pages_schema() -> StructType:
    return StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), False),
            StructField("html", BinaryType(), False),
            StructField("text", StringType(), False),
            StructField("lang", StringType(), False),
        ]
    )


def _h(seed: int, i: int, tag: str) -> int:
    """Deterministic 64-bit stream per (seed, row, tag)."""
    b = hashlib.sha256(f"{seed}:{i}:{tag}".encode()).digest()
    return int.from_bytes(b[:8], "big")


def url_of(i: int) -> str:
    return f"https://site{i % 97}.example/p/{i}"


def _page_row(i: int, n: int, seed: int) -> tuple[str, _dt.datetime, bytes, str, str]:
    rnd = _h(seed, i, "base")
    lang = LANGS[rnd % len(LANGS)]
    ts = EPOCH + _dt.timedelta(seconds=(rnd % 31_536_000))
    nwords = 8 + (_h(seed, i, "len") % 40)
    words = [WORDS[_h(seed, i, f"w{k}") % len(WORDS)] for k in range(nwords)]
    title = f"page {i}"
    body_sents = []
    for s in range(0, nwords, 8):
        body_sents.append(" ".join(words[s : s + 8]) + ".")
    paragraphs = body_sents
    # out-degree: power-law-ish; ~10% of links go to hub pages 0..2
    odeg = _h(seed, i, "deg") % 100
    odeg = 1 + (odeg % 3 if odeg < 70 else odeg % 12)
    targets = []
    for k in range(odeg):
        r = _h(seed, i, f"t{k}")
        if r % 10 == 0:
            t = r % 3  # hub
        else:
            t = r % n
        if t != i:
            targets.append(t)
    anchors = "".join(
        f'<a href="{url_of(t)}">ref {j}</a>\n' for j, t in enumerate(targets)
    )
    html = (
        "<html><head><title>"
        + title
        + "</title></head>\n<body>\n"
        + "".join(f"<p>{p}</p>\n" for p in paragraphs)
        + anchors
        + "</body></html>"
    )
    # text oracle: title + paragraph texts joined by newline — exactly
    # what extract_text produces from this html (the byte invariant)
    text = "\n".join([title, *paragraphs])
    return url_of(i), ts, html.encode("utf-8"), text, lang


def generate_pages(spark: SparkSession, n: int, seed: int = 42, partitions: int = 32) -> DataFrame:
    """Distributed deterministic pages table with ``n`` rows."""

    schema = pages_schema()

    def render(batches):
        for pdf in batches:
            rows = [_page_row(int(i), n, seed) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    ids = spark.range(0, n, 1, partitions)
    return ids.mapInPandas(render, schema=schema)


def write_pages(spark: SparkSession, n: int, path: str, seed: int = 42, partitions: int = 32) -> None:
    generate_pages(spark, n, seed, partitions).write.mode("overwrite").parquet(path)
