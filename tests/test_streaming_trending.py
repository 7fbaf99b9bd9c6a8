"""Streaming windowed count-min trending: batch/stream register parity
+ heavy-hitter probe correctness vs exact per-window counts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from graphscope_spark.streaming.trending import (
    trending_from_registers,
    windowed_cms_registers,
)

SCHEMA = "ts timestamp, token string"
T0 = dt.datetime(2026, 1, 1, 10, 0, 0)


def _rows():
    rows = []
    # hour 10: "hot" x30, "warm" x10, "cold" x2
    for i in range(30):
        rows.append((T0 + dt.timedelta(minutes=i % 50), "hot"))
    for i in range(10):
        rows.append((T0 + dt.timedelta(minutes=i), "warm"))
    rows += [(T0, "cold"), (T0 + dt.timedelta(minutes=5), "cold")]
    # hour 11: "warm" becomes the heavy one
    t1 = T0 + dt.timedelta(hours=1)
    for i in range(25):
        rows.append((t1 + dt.timedelta(minutes=i % 40), "warm"))
    rows.append((t1, "hot"))
    return rows


def test_stream_registers_match_batch(spark, tmp_path):
    rows = _rows()
    batch = spark.createDataFrame(rows, SCHEMA)
    expected = {
        (r["win_start"], r["row"], r["col"]): r["cnt"]
        for r in windowed_cms_registers(batch, d=3, w=64).collect()
    }
    assert expected  # non-trivial matrix

    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    # two files -> two micro-batches (state must carry across)
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], SCHEMA).coalesce(1).write.parquet(
        str(in_dir / "f0.parquet")
    )
    spark.createDataFrame(rows[half:], SCHEMA).coalesce(1).write.parquet(
        str(in_dir / "f1.parquet")
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    q = (
        windowed_cms_registers(stream, d=3, w=64)
        .writeStream.format("memory")
        .queryName("trend_regs")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["row"], r["col"]): r["cnt"]
        for r in spark.sql("select * from trend_regs").collect()
    }
    assert got == expected


def test_trending_probe_one_sided_and_windowed(spark):
    rows = _rows()
    batch = spark.createDataFrame(rows, SCHEMA)
    regs = windowed_cms_registers(batch, d=3, w=64)
    probes = batch.select("token")
    got = {
        (r["win_start"].hour, r["token"]): r["est"]
        for r in trending_from_registers(regs, probes, threshold=10, d=3, w=64).collect()
    }
    # exact truth per window
    exact = {
        (r["h"], r["token"]): r["c"]
        for r in batch.groupBy(
            F.hour(F.window("ts", "1 hour").start).alias("h"), "token"
        ).agg(F.count(F.lit(1)).alias("c")).collect()
    }
    # every truly-heavy (win, token) present; estimates never under-count
    for k, c in exact.items():
        if c >= 10:
            assert k in got, k
    for k, est in got.items():
        assert est >= exact.get(k, 0), k
    # windowing separates regimes: hot is heavy only in hour 10, and
    # warm is heavy in both (10 in h10, 25 in h11)
    assert (10, "hot") in got and (11, "hot") not in got
    assert (10, "warm") in got and (11, "warm") in got
    assert (10, "cold") not in got
