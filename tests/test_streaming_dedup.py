"""Streaming exact dedup: fingerprint state must persist ACROSS
micro-batches (maxFilesPerTrigger=1 forces one file per batch)."""

from __future__ import annotations

import os

from graphscope_spark.functions.text import fingerprint
from graphscope_spark.streaming.dedup import DOCS_SCHEMA, dedup_stream

BATCH1 = [
    (0, "the quick brown fox jumps over the lazy dog", "en", "wiki", 43),
    (1, "an entirely original first-batch document", "en", "wiki", 41),
]
BATCH2 = [
    # same normalized text as doc 0, new id → must be suppressed
    (2, "The  quick brown fox jumps over the lazy DOG", "en", "news", 45),
    (3, "a genuinely new second-batch document", "en", "news", 37),
]


def test_dedup_stream_cross_batch(spark, tmp_path):
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    for name, rows, mtime in [("b1", BATCH1, 1_000), ("b2", BATCH2, 2_000)]:
        df = spark.createDataFrame(rows, DOCS_SCHEMA)
        df.coalesce(1).write.parquet(str(tmp_path / name))
        part = next(p for p in (tmp_path / name).iterdir() if p.suffix == ".parquet")
        dest = in_dir / f"{name}.parquet"
        part.rename(dest)
        os.utime(dest, (mtime, mtime))

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_docs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 2  # really ran as >=2 micro-batches

    rows = spark.sql("select doc_id, fp from dedup_docs").collect()
    fps = [r["fp"] for r in rows]
    assert len(fps) == len(set(fps)) == 3  # 4 docs, 1 cross-batch dup
    # batch parity: same surviving fingerprint set as the batch twin
    batch = spark.createDataFrame(BATCH1 + BATCH2, DOCS_SCHEMA)
    expected_fps = {
        r["fp"] for r in batch.select(fingerprint("text").alias("fp")).distinct().collect()
    }
    assert set(fps) == expected_fps
    # first arrival won: the duplicate's surviving doc_id is from batch 1
    dup_fp = [f for f in fps if fps.count(f) == 1]
    by_fp = {r["fp"]: r["doc_id"] for r in rows}
    b1_fp = {
        r["fp"]: r["doc_id"]
        for r in spark.createDataFrame(BATCH1, DOCS_SCHEMA)
        .select("doc_id", fingerprint("text").alias("fp"))
        .collect()
    }
    for f, did in b1_fp.items():
        assert by_fp[f] == did
