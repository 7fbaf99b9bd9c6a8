"""Streaming trending tokens: windowed count-min registers.

The scale problem: "top tokens per hour" over a crawl stream has an
unbounded key space (window × token), so a naive
``groupBy(window, token)`` grows streaming state with the vocabulary.
The count-min form bounds state at d·w cells PER WINDOW regardless of
vocabulary size — the same md5 register placement as
:mod:`graphscope_spark.functions.sketch`, so estimates are
deterministic and one-sided (never under-count).

Batch/stream parity (the repo-wide pattern): the register
transformation is expressed once over a plain DataFrame and runs
identically in batch mode and under ``readStream`` + watermark;
``tests/test_streaming_trending.py`` pins the streamed register matrix
bit-equal to the batch one, and the heavy-hitter probe is a batch job
over the (tiny) register sink.

Reference analog: none — GraphScope has no streaming surface
(SURVEY.md §2.1); this is Spark-first crawl-pipeline machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.functions.sketch import _hex5_to_int


def _cms_cells(col: str, d: int, w: int):
    return F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                (
                    _hex5_to_int(
                        F.md5(F.concat(F.lit(f"{r}|"), F.col(col).cast("string")))
                    )
                    % w
                )
                .cast("int")
                .alias("col"),
            )
            for r in range(d)
        ]
    )


def windowed_cms_registers(
    df: DataFrame,
    value_col: str = "token",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """(win_start, row, col, cnt): one count-min register matrix per
    tumbling window.  Streaming state ≤ d·w rows per open window; the
    shuffle is bounded the same way by the map-side partial."""
    base = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return (
        base.where(F.col(value_col).isNotNull())
        .select(
            F.window(ts_col, window).alias("win"),
            F.explode(_cms_cells(value_col, d, w)).alias("c"),
        )
        .groupBy(
            F.col("win.start").alias("win_start"),
            F.col("c.row").alias("row"),
            F.col("c.col").alias("col"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def trending_from_registers(
    registers: DataFrame,
    probes: DataFrame,
    threshold: int,
    d: int = 4,
    w: int = 1024,
    value_col: str = "token",
) -> DataFrame:
    """(win_start, token, est): per-window heavy hitters — probe the
    (tiny, broadcast) register sink with candidate tokens.  Estimates
    are min-over-rows, one-sided like every CMS read; candidates are
    whatever distinct values the caller tracks (at web scale a cheap
    per-batch distinct-sample, not the full vocabulary)."""
    probed = (
        probes.where(F.col(value_col).isNotNull())
        .select(F.col(value_col).alias("token"))
        .distinct()
        .select("token", F.explode(_cms_cells("token", d, w)).alias("c"))
        .select("token", F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    )
    return (
        probed.join(F.broadcast(registers), ["row", "col"])
        .groupBy("win_start", "token")
        .agg(F.min("cnt").alias("est"), F.count(F.lit(1)).alias("nrows"))
        # a token whose d cells are not ALL set in a window has true
        # estimate 0 there (an empty cell is a zero register) — the
        # inner join must not let colliding nonzero cells fake a count
        .where((F.col("nrows") == d) & (F.col("est") >= threshold))
        .select("win_start", "token", "est")
    )
