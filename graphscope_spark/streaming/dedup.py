"""Streaming exact deduplication — content-fingerprint dedup whose
state persists ACROSS micro-batches, so a document that arrived in an
earlier batch suppresses later copies.

The batch twin is ``functions.dedup.exact_duplicates`` (driver-verified
exact); this module is the incremental form a continuously-ingesting
crawl pipeline needs: new WARC drops dedup against everything already
admitted, without re-reading the corpus.

Scale (100 TB): ``dropDuplicates`` in streaming keeps one state-store
entry per distinct key, hash-partitioned by the 32-byte fingerprint
across executors — state is |distinct docs| × ~50 bytes, not the
corpus.  With an event-time column, ``dropDuplicatesWithinWatermark``
bounds state to the watermark horizon (the right mode when re-crawls
only dedup against a freshness window); without one, state grows with
distinct content — at 10^12 docs that wants RocksDB state store +
the watermarked mode.

Reference parity: the reference has no streaming surface (SURVEY.md
§2.1); this extends the Ingress-style incremental family
(streaming/incremental.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from graphscope_spark.functions.text import fingerprint

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def stream_docs(spark: SparkSession, path_glob: str) -> DataFrame:
    """File-source document stream (new parquet file = new micro-batch)."""
    return spark.readStream.schema(DOCS_SCHEMA).parquet(path_glob)


def dedup_stream(
    docs: DataFrame,
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins exact dedup on the normalized-text md5
    fingerprint.  Works on batch DataFrames too (same transformation,
    batch/stream parity tested in tests/test_streaming_dedup.py).

    With ``ts_col`` on a streaming frame, uses
    ``dropDuplicatesWithinWatermark`` so the fingerprint state store is
    bounded by the watermark horizon.
    """
    fp = docs.withColumn("fp", fingerprint("text"))
    if docs.isStreaming and ts_col is not None:
        return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["fp"])
    return fp.dropDuplicates(["fp"])
