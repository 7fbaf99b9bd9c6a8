"""Structured Streaming: batch/stream parity for windowed event counts."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from graphscope_spark.streaming.events import stream_events, windowed_event_counts

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def test_stream_matches_batch(spark, tmp_path):
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    expected = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(batch).collect()
    }

    # file-source streams read directories (new file = new micro-batch)
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    import shutil

    shutil.copy(f"{SF_DIR}/events.parquet", in_dir / "events-000.parquet")
    stream = stream_events(spark, str(in_dir))
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("evt_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from evt_counts").collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert got[k][0] == expected[k][0]
        assert abs(got[k][1] - expected[k][1]) < 1e-9
