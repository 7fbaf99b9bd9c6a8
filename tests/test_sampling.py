"""Sampling / splitting / packing / contamination ops vs pure-Python
oracles (functions/sampling.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from graphscope_spark.functions import specs
from graphscope_spark.functions.sampling import (
    BUCKETS,
    contamination,
    corpus_split,
    hash_bucket,
    pack_sequences,
    quality_resample,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a completely different document about spark shuffles"),
    (3, "der hund ist nicht schnell und der fuchs ist klug"),
    (4, "le chat est dans la maison avec les enfants"),
    (5, "the quick brown fox naps under the lazy dog"),
    (6, ""),
    (7, "solo"),
    (8, "benchmark question what is the capital of france"),
    (9, "what is the capital of france asked the benchmark"),
    (10, "tokens tokens tokens tokens tokens tokens tokens tokens"),
    (11, "short doc"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_bucket(value, seed: int) -> int:
    h = hashlib.md5(f"{seed}:{value}".encode()).hexdigest()
    return int(h[:4], 16)


def test_hash_bucket_matches_python(spark, docs_df):
    got = {
        r["doc_id"]: r["b"]
        for r in docs_df.select("doc_id", hash_bucket("doc_id", 11).alias("b")).collect()
    }
    assert got == {i: _py_bucket(i, 11) for i, _ in DOCS}


def test_corpus_split_thresholds(spark, docs_df):
    got = {
        r["doc_id"]: r["split"]
        for r in corpus_split(docs_df, seed=11).select("doc_id", "split").collect()
    }
    for i, _ in DOCS:
        b = _py_bucket(i, 11)
        exp = "train" if b < int(0.8 * BUCKETS) else (
            "val" if b < int(0.9 * BUCKETS) else "test"
        )
        assert got[i] == exp
    # deterministic across invocations
    again = {
        r["doc_id"]: r["split"]
        for r in corpus_split(docs_df, seed=11).select("doc_id", "split").collect()
    }
    assert got == again


def test_quality_resample_is_bernoulli_by_score(spark, docs_df):
    scored = docs_df.select(
        "doc_id", (F.col("doc_id") / 11.0).alias("quality_score")
    )
    kept = {
        r["doc_id"] for r in quality_resample(scored, seed=13).collect()
    }
    exp = {
        i for i, _ in DOCS if _py_bucket(i, 13) < int((i / 11.0) * BUCKETS)
    }
    assert kept == exp
    # score 0 never kept, score 1 always kept
    edges = spark.createDataFrame(
        [(100, 0.0), (101, 1.0)], "doc_id long, quality_score double"
    )
    kept2 = {r["doc_id"] for r in quality_resample(edges, seed=13).collect()}
    assert kept2 == {101}


def _py_shingles(text: str, n: int = specs.SHINGLE_N) -> set[str]:
    toks = text.strip().split()
    if not toks:
        toks = [""]
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_contamination_matches_python(spark, docs_df):
    bench = docs_df.where(F.col("doc_id") % 4 == 0)
    rest = docs_df.where(F.col("doc_id") % 4 != 0)
    got = {
        r["doc_id"]: r["hit_shingles"] for r in contamination(rest, bench).collect()
    }
    bench_sh = set().union(*(_py_shingles(t) for i, t in DOCS if i % 4 == 0))
    exp = {}
    for i, t in DOCS:
        if i % 4 == 0:
            continue
        hits = len(_py_shingles(t) & bench_sh)
        if hits:
            exp[i] = hits
    assert got == exp


def test_pack_sequences_matches_python(spark, docs_df):
    budget, shards = 10, 3
    got = {
        r["doc_id"]: (r["shard"], r["bin"], r["n_tokens"])
        for r in pack_sequences(docs_df, budget=budget, shards=shards).collect()
    }
    streams: dict[int, int] = {s: 0 for s in range(shards)}
    for i, t in sorted(DOCS):
        nt = len(t.strip().split()) if t.strip() else 0
        shard = i % shards
        exp_bin = streams[shard] // budget
        assert got[i] == (shard, exp_bin, nt)
        streams[shard] += nt
    # every bin's first doc starts within the chunk it is assigned to
    assert all(b >= 0 for _, b, _ in got.values())


def test_domain_mix_matches_python(spark):
    from graphscope_spark.functions.sampling import domain_mix

    # skewed domains: 8 'en', 3 'de', 1 'fr'
    rows = [(i, "en") for i in range(8)] + [(8, "de"), (9, "de"), (10, "de"), (11, "fr")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    alpha, seed = 0.5, 29
    got = {
        r["doc_id"]: (r["lang"], r["domain_rate"])
        for r in domain_mix(df, alpha=alpha, domain_col="lang", seed=seed).collect()
    }
    counts = {"en": 8, "de": 3, "fr": 1}
    cmin = min(counts.values())
    exp = {}
    for i, lang in rows:
        rate = round((cmin / counts[lang]) ** (1.0 - alpha), 8)
        if _py_bucket(i, seed) < int(rate * BUCKETS):
            exp[i] = (lang, rate)
    assert got == exp
    # the smallest domain is never downsampled
    assert got[11] == ("fr", 1.0)
    # dominant domain's rate is (1/8)^0.5
    rates = {lang: r for (lang, r) in exp.values()}
    assert rates["en"] == round((1 / 8) ** 0.5, 8)
