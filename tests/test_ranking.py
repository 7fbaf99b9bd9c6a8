"""TF-IDF / BM25 / n-gram stats: exact tiny-corpus oracles computed by
hand (math.log for idf), plus plan-shape checks (no UDF, no cartesian
over the corpus)."""

import math

import pytest
from pyspark.sql import functions as F

from graphscope_spark.functions.ranking import bm25, ngram_stats, tf_idf

DOCS = [
    (1, "spark shuffle join spark"),
    (2, "hash join window"),
    (3, "spark window window lag"),
    (4, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_tfidf_exact(docs):
    rows = {
        (r.doc_id, r.token): r
        for r in tf_idf(docs, topk=10).collect()
    }
    # 'spark' appears in docs 1,3 -> df=2; N=4 (empty doc counts in N)
    r = rows[(1, "spark")]
    assert r.tf == 2 and r.df == 2
    assert r.tfidf == pytest.approx(round(2 * math.log(4 / 2), 8), abs=1e-9)
    # 'lag' unique to doc 3 -> df=1, idf=ln(4)
    r = rows[(3, "lag")]
    assert r.tf == 1 and r.df == 1
    assert r.tfidf == pytest.approx(round(math.log(4.0), 8), abs=1e-9)
    # empty doc contributes no rows
    assert not any(d == 4 for d, _ in rows)
    # doc 1: spark 2*ln(2) exactly ties shuffle 1*ln(4); token asc wins
    d1 = sorted((r for (d, _), r in rows.items() if d == 1), key=lambda r: r.rank)
    assert [r.token for r in d1[:2]] == ["shuffle", "spark"]


def test_tfidf_topk_cap(docs):
    out = tf_idf(docs, topk=1)
    assert out.groupBy("doc_id").count().agg(F.max("count")).first()[0] == 1


def test_bm25_exact(docs):
    out = {r.doc_id: r.score for r in bm25(docs, ["spark", "window"]).collect()}
    # hand-computed: N=4, dl = [4,3,4,0], avgdl = 11/4
    n, avgdl, k1, b = 4.0, 11 / 4, 1.2, 0.75

    def idf(df):
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def w(tf, dl):
        return tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp1 = idf(2) * w(2, 4)              # doc1: spark tf=2
    exp3 = idf(2) * w(1, 4) + idf(2) * w(2, 4)  # doc3: spark 1, window 2
    assert out[1] == pytest.approx(round(exp1, 8), abs=1e-9)
    assert out[3] == pytest.approx(round(exp3, 8), abs=1e-9)
    assert 4 not in out  # no query terms -> no row


def test_bm25_rank_order(docs):
    rows = bm25(docs, ["spark", "window"]).collect()
    by_rank = sorted(rows, key=lambda r: r.rank)
    scores = [r.score for r in by_rank]
    assert scores == sorted(scores, reverse=True)


def test_ngram_stats_exact(docs):
    out = {r.ngram: (r.cnt, r.share) for r in ngram_stats(docs, n=2).collect()}
    # bigrams: doc1: (spark shuffle)(shuffle join)(join spark);
    # doc2: (hash join)(join window); doc3: (spark window)(window window)(window lag)
    assert out["window window"][0] == 1
    assert sum(c for c, _ in out.values()) == 8
    assert out["spark shuffle"][1] == pytest.approx(round(1 / 8, 8), abs=1e-9)
    # trigrams
    tri = {r.ngram: r.cnt for r in ngram_stats(docs, n=3).collect()}
    assert tri["spark shuffle join"] == 1
    assert sum(tri.values()) == 5


def test_ranking_plan_no_udf_no_cartesian(docs):
    for df in (tf_idf(docs), bm25(docs, ["spark"]), ngram_stats(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # only 1-row scalar broadcasts may appear as nested loop joins
        assert plan.count("CartesianProduct") == 0
    # global top-k is TakeOrderedAndProject, not a single-partition window
    for df in (bm25(docs, ["spark"]), ngram_stats(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
