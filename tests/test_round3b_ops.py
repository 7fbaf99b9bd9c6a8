"""duplicate_spans / host_reputation / quality_classifier vs pure-Python
oracles (same md5 math, left-to-right folds)."""

from __future__ import annotations

import hashlib
import math

import pytest

from graphscope_spark.functions import specs
from graphscope_spark.functions.classify import quality_classifier
from graphscope_spark.functions.corpus import host_reputation
from graphscope_spark.functions.dedup import duplicate_spans

DOCS = [
    # (doc_id, text, source) — docs 0/1 share a verbatim 6-token run,
    # doc 2 shares a 5-token run with 0; docs on host "spam" are junk.
    (0, "alpha beta gamma delta epsilon zeta unique tail zero", "wiki"),
    (1, "prefix one alpha beta gamma delta epsilon zeta other", "wiki"),
    (2, "beta gamma delta epsilon zeta completely new ending here", "news"),
    (3, "the and of to is in it the and of to is", "news"),
    (4, "short doc", "spam"),
    (5, "x x x x x x x x x x x x", "spam"),
    (6, "", "spam"),
]


@pytest.fixture(scope="module")
def docs3(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def _toks(text: str) -> list[str]:
    t = text.strip().split()
    return t if t else [""]


def test_duplicate_spans(spark, docs3):
    k, min_docs = specs.DUP_SPAN_K, specs.DUP_SPAN_MIN_DOCS
    pos: dict[int, list[str]] = {}
    for i, text, _ in DOCS:
        t = _toks(text)
        pos[i] = [
            hashlib.md5(" ".join(t[j : j + k]).encode()).hexdigest()
            for j in range(len(t) - k + 1)
        ] if len(t) >= k else []
    docs_per_span: dict[str, set[int]] = {}
    for i, spans in pos.items():
        for s in spans:
            docs_per_span.setdefault(s, set()).add(i)
    dup = {s for s, ds in docs_per_span.items() if len(ds) >= min_docs}
    exp = {}
    for i, spans in pos.items():
        nd = sum(1 for s in spans if s in dup)
        exp[i] = (len(spans), nd, round(nd / max(len(spans), 1), 8))

    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_frac"])
        for r in duplicate_spans(docs3).collect()
    }
    assert got == exp
    # the shared runs really registered as cross-doc duplicates
    assert exp[0][1] > 0 and exp[1][1] > 0 and exp[2][1] > 0
    # short/empty docs: zero spans, zero fraction
    assert exp[4] == (0, 0, 0.0) and exp[6] == (0, 0, 0.0)


def _py_quality(text: str) -> float:
    t = _toks(text)
    n_tok = 0 if not text.strip() else len(t)
    st = max(n_tok, 1)
    nu = len(set(t))
    ns = sum(1 for x in t if x in specs.STOPWORDS)
    return (
        0.4 * min(n_tok / 50.0, 1.0)
        + 0.3 * (nu / st)
        + 0.3 * min((ns / st) * 5.0, 1.0)
    )


def test_host_reputation(spark, docs3):
    by_host: dict[str, list[float]] = {}
    for _, text, src in DOCS:
        by_host.setdefault(src, []).append(_py_quality(text))
    rows = host_reputation(docs3).collect()
    assert len(rows) == len(DOCS)
    for r in rows:
        qs = by_host[r["source"]]
        assert r["host_docs"] == len(qs)
        assert abs(r["host_quality"] - sum(qs) / len(qs)) < 1e-6
        assert r["keep"] == (sum(qs) / len(qs) >= specs.HOST_MIN_QUALITY)
    keep_by_host = {r["source"]: r["keep"] for r in rows}
    assert keep_by_host["spam"] is False  # junk host filtered


def _py_classifier(text: str) -> tuple[int, float, bool]:
    B, seed = specs.QCLS_BUCKETS, specs.QCLS_SEED
    t = _toks(text)
    s = 0.0
    for tok in t:  # left-to-right, matching Spark's array fold
        b = int(hashlib.md5(f"{seed}:{tok}".encode()).hexdigest()[:4], 16) % B
        h = int(hashlib.md5(f"w{seed}:{b}".encode()).hexdigest()[:12], 16)
        s += ((h + 0.5) / float(1 << 48)) * 2.0 - 1.0
    mean = round(s / max(len(t), 1), 8)
    score = round(1.0 / (1.0 + math.exp(-mean)), 8)
    return len(t), score, score >= specs.QCLS_THRESHOLD


def test_quality_classifier(spark, docs3):
    exp = {i: _py_classifier(text) for i, text, _ in DOCS}
    got = {
        r["doc_id"]: (r["n_tokens"], r["cls_score"], r["cls_keep"])
        for r in quality_classifier(docs3).collect()
    }
    assert got == exp
    # repeated single-token doc hits one bucket: mean == that weight
    b = int(hashlib.md5(f"{specs.QCLS_SEED}:x".encode()).hexdigest()[:4], 16) % specs.QCLS_BUCKETS
    h = int(hashlib.md5(f"w{specs.QCLS_SEED}:{b}".encode()).hexdigest()[:12], 16)
    w = ((h + 0.5) / float(1 << 48)) * 2.0 - 1.0
    assert abs(got[5][1] - 1.0 / (1.0 + math.exp(-round(w, 8)))) < 1e-7


def test_chunk_text(spark, docs3):
    from graphscope_spark.functions.text import chunk_text

    c, o = specs.CHUNK_TOKENS, specs.CHUNK_OVERLAP
    stride = c - o
    exp = []
    for i, text, _ in DOCS:
        t = _toks(text)
        n = len(t)
        m = 1 + max(0, -(-(n - c) // stride)) if n > c else 1
        for j in range(m):
            s = j * stride
            exp.append((i, j, " ".join(t[s : s + c]), min(c, n - s)))
    got = [
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_text(docs3).orderBy("doc_id", "chunk_id").collect()
    ]
    assert got == sorted(exp)
    # overlap really present: consecutive chunks share o tokens
    t0 = _toks(DOCS[3][1])
    if len(t0) > c:
        c0 = [g for g in got if g[0] == 3]
        assert c0[0][2].split()[stride:] == c0[1][2].split()[: c - stride or None][:o]


def test_select_and_chunk_composition(spark, docs3):
    from graphscope_spark.functions.corpus import select_and_chunk
    from graphscope_spark.functions.text import chunk_text

    hr = {r["doc_id"] for r in host_reputation(docs3).collect() if r["keep"]}
    qc = {r["doc_id"] for r in quality_classifier(docs3).collect() if r["cls_keep"]}
    ds = {
        r["doc_id"]
        for r in duplicate_spans(docs3).collect()
        if r["dup_frac"] <= 0.2
    }
    kept = hr & qc & ds
    got = select_and_chunk(docs3).collect()
    assert {r["doc_id"] for r in got} == kept or (not kept and not got)
    exp = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_text(docs3).collect()
        if r["doc_id"] in kept
    }
    assert {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_chunk_tokens"]) for r in got
    } == exp


def test_inverted_index(spark, docs3):
    from collections import Counter

    from graphscope_spark.functions.ranking import inverted_index

    cap = 3
    tf: dict[str, Counter] = {}
    for i, text, _ in DOCS:
        for tok in _toks(text):
            tf.setdefault(tok, Counter())[i] += 1
    exp = {}
    for term, c in tf.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        exp[term] = (len(c), " ".join(f"{d}:{n}" for d, n in ranked[:cap]))
    got = {
        r["term"]: (r["df"], r["postings"])
        for r in inverted_index(docs3, max_postings=cap).collect()
    }
    assert got == exp
    # a term in >cap docs really truncates to cap postings
    wide = [t for t, (df, _) in exp.items() if df > cap]
    if wide:
        assert all(len(exp[t][1].split()) == cap for t in wide)


def test_crawl_delta(spark, docs3):
    from graphscope_spark.functions.urls import crawl_delta

    old = spark.createDataFrame(
        [(0, "same text"), (1, "old version"), (2, "gone")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(0, "same  TEXT"), (1, "new version"), (3, "brand new")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in crawl_delta(old, new).collect()}
    # doc 0: same after normalization (case+whitespace) → unchanged
    assert got == {0: "unchanged", 1: "changed", 2: "removed", 3: "added"}
