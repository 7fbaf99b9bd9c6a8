"""Iceberg-layout table format: snapshots, time travel, pruning,
commit atomicity (sources/iceberg.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from graphscope_spark.sources.iceberg import IcebergishTable, _load_metadata


@pytest.fixture()
def docs_df(spark):
    rows = [
        (i, f"text {i}", ["en", "de", "fr"][i % 3], float(i)) for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, score double")


def test_create_scan_roundtrip(spark, docs_df, tmp_path):
    t = IcebergishTable.create(spark, str(tmp_path / "t"), docs_df, partition_by=["lang"])
    got = t.scan()
    assert got.count() == 60
    assert set(got.columns) == {"doc_id", "text", "lang", "score"}
    assert (
        got.groupBy("lang").count().orderBy("lang").collect()
        == docs_df.groupBy("lang").count().orderBy("lang").collect()
    )


def test_append_overwrite_and_time_travel(spark, docs_df, tmp_path):
    path = str(tmp_path / "t")
    t = IcebergishTable.create(spark, path, docs_df, partition_by=["lang"])
    s1 = t.history()[-1]["snapshot-id"]
    extra = spark.createDataFrame(
        [(100 + i, f"new {i}", "en", 0.5) for i in range(10)],
        docs_df.schema,
    )
    t.append(extra)
    s2 = t.history()[-1]["snapshot-id"]
    assert t.scan().count() == 70
    # time travel back to the first snapshot
    assert t.scan(snapshot_id=s1).count() == 60
    t.overwrite(extra)
    assert t.scan().count() == 10
    assert t.scan(snapshot_id=s2).count() == 70
    ops = [h["operation"] for h in t.history()]
    assert ops == ["create", "append", "overwrite"]


def test_partition_pruning_reads_fewer_files(spark, docs_df, tmp_path):
    t = IcebergishTable.create(spark, str(tmp_path / "t"), docs_df, partition_by=["lang"])
    all_files = t.plan_files()
    en_files = t.plan_files(partition_filter={"lang": "en"})
    assert 0 < len(en_files) < len(all_files)
    assert all(f["partition"]["lang"] == "en" for f in en_files)
    got = t.scan(partition_filter={"lang": "en"})
    assert got.count() == 20
    assert got.where(F.col("lang") != "en").count() == 0


def test_stats_pruning(spark, tmp_path):
    # two commits with disjoint doc_id ranges -> min/max skips one
    lo = spark.createDataFrame([(i, "x") for i in range(100)], "doc_id long, text string")
    hi = spark.createDataFrame([(i, "y") for i in range(1000, 1100)], "doc_id long, text string")
    t = IcebergishTable.create(spark, str(tmp_path / "t"), lo)
    t.append(hi)
    pruned = t.plan_files(stats_filter={"doc_id": (1000, None)})
    assert sum(f["record_count"] for f in pruned) == 100  # only the hi commit
    assert len(pruned) < len(t.plan_files())
    assert t.scan(stats_filter={"doc_id": (1000, None)}).count() == 100


def test_version_hint_atomic(spark, docs_df, tmp_path):
    path = str(tmp_path / "t")
    t = IcebergishTable.create(spark, path, docs_df)
    meta1 = _load_metadata(path)
    t.append(docs_df.limit(5))
    meta2 = _load_metadata(path)
    assert meta2["current-snapshot-id"] != meta1["current-snapshot-id"]
    # old metadata version still readable (readers pinned to v1 survive)
    assert _load_metadata(path, version=1) == meta1
    assert os.path.exists(os.path.join(path, "metadata", "v2.metadata.json"))


def test_schema_evolution_add_column(spark, tmp_path):
    """Appending a batch with a NEW column evolves the table schema;
    rows from older snapshots read the new column as null."""
    from pyspark.sql import functions as F

    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    t = IcebergishTable.create(spark, str(tmp_path / "t"), v1)
    v2 = spark.createDataFrame(
        [(3, "c", 0.9)], "doc_id long, text string, score double"
    )
    t.append(v2)
    got = t.scan()
    assert set(got.columns) == {"doc_id", "text", "score"}
    rows = {r["doc_id"]: r["score"] for r in got.collect()}
    assert rows == {1: None, 2: None, 3: 0.9}
    # old snapshot still reads with the evolved schema (nulls filled)
    first = t.history()[0]["snapshot-id"]
    assert t.scan(snapshot_id=first).where(F.col("score").isNull()).count() == 2


def test_compact_and_expire(spark, tmp_path):
    """Maintenance pass: compact rewrites the current snapshot into one
    file per partition value (older snapshots untouched — time travel
    intact), then expire_snapshots reclaims the superseded files and
    makes expired ids unreadable."""
    import glob
    import os

    import pytest as _pytest

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en" if i % 2 == 0 else "de") for i in range(40)],
        "doc_id long, text string, lang string",
    )
    path = str(tmp_path / "t")
    # create + 3 appends, fragmented on purpose (4 input partitions each)
    t = IcebergishTable.create(
        spark, path, docs.where("doc_id < 10").repartition(4), partition_by=["lang"]
    )
    for lo in (10, 20, 30):
        t.append(docs.where(f"doc_id >= {lo} and doc_id < {lo + 10}").repartition(4))
    hist = t.history()
    assert len(hist) == 4
    first_snap = hist[0]["snapshot-id"]
    n_files_before = len(glob.glob(f"{path}/data/**/*.parquet", recursive=True))

    t.compact()
    # full table contents unchanged
    got = sorted((r["doc_id"], r["lang"]) for r in t.scan().collect())
    assert got == sorted((i, "en" if i % 2 == 0 else "de") for i in range(40))
    # the compacted snapshot plans exactly one file per partition value
    assert len(t.plan_files()) == 2
    # time travel to the first snapshot still works (old files alive)
    assert t.scan(snapshot_id=first_snap).count() == 10

    t.expire_snapshots(keep_last=1)
    # expired snapshot ids are gone, current scan unaffected
    with _pytest.raises(KeyError):
        t.scan(snapshot_id=first_snap)
    assert t.scan().count() == 40
    assert len(t.history()) == 1
    # storage actually reclaimed: only the compacted files remain
    n_files_after = len(glob.glob(f"{path}/data/**/*.parquet", recursive=True))
    assert n_files_after == 2 < n_files_before
    # a fresh handle (new reader) sees the same table
    t2 = IcebergishTable.load(spark, path)
    assert t2.scan().count() == 40


def test_training_corpus_export_roundtrip(spark, tmp_path):
    """End-to-end training-data export: corpus selection → Iceberg-layout
    table partitioned by a derived length bucket → pruned scan returns
    exactly the selected docs (the 100TB pipeline's hand-off shape:
    filters upstream, manifest-planned scans downstream)."""
    from pyspark.sql import functions as F

    from graphscope_spark.functions.corpus import training_corpus

    # mostly-unique tokens (the repetition gate rejects repeated
    # phrases) + marker stopwords so lang-id and quality pass
    def _text(i: int) -> str:
        k = 30 if i % 2 == 0 else 10
        return "the is of " + " ".join(f"w{i}x{j}" for j in range(k))

    docs = spark.createDataFrame(
        [(i, _text(i)) for i in range(60)], "doc_id long, text string"
    )
    sel = training_corpus(docs).withColumn(
        "len_bucket", F.when(F.col("n_tokens") >= 24, "long").otherwise("short")
    )
    path = str(tmp_path / "corpus")
    t = IcebergishTable.create(spark, path, sel, partition_by=["len_bucket"])

    back = {r["doc_id"] for r in t.scan().collect()}
    assert back == {r["doc_id"] for r in sel.collect()} and back
    # partition pruning: the "long" scan plans only long-bucket files
    longs = {r["doc_id"] for r in t.scan(partition_filter={"len_bucket": "long"}).collect()}
    exp_longs = {r["doc_id"] for r in sel.where("len_bucket = 'long'").collect()}
    assert longs == exp_longs and 0 < len(longs) < len(back)
    planned = t.plan_files(partition_filter={"len_bucket": "long"})
    assert all(f["partition"]["len_bucket"] == "long" for f in planned)
