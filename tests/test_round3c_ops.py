"""salsa / cocitation / bib_coupling / semantic_dedup / count-min /
Bloom decontamination vs pure-Python replicas (same md5 math, same
tie-breaks), mirroring the reference's exact-oracle test strategy
(SURVEY.md §5)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pytest

from graphscope_spark.algorithms import bib_coupling, cocitation, salsa

ROUNDS = 4


def _salsa_replica(vertices, edges, rounds):
    od, idg = defaultdict(int), defaultdict(int)
    for s, d in edges:
        od[s] += 1
        idg[d] += 1
    n_hubs = len(od)
    hub = {v: (1.0 / n_hubs if v in od else 0.0) for v in vertices}
    auth = {v: 0.0 for v in vertices}
    for _ in range(rounds):
        na = defaultdict(float)
        for s, d in edges:
            na[d] += hub[s] / od[s]
        nh = defaultdict(float)
        for s, d in edges:
            nh[s] += na[d] / idg[d]
        hub = {v: nh.get(v, 0.0) for v in vertices}
        auth = {v: na.get(v, 0.0) for v in vertices}
    return hub, auth


def test_salsa_matches_replica_and_conserves_mass(spark, rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    hub, auth = _salsa_replica(vertices, edges, ROUNDS)
    got = {r["vid"]: (r["hub"], r["auth"]) for r in salsa(rand_graph, rounds=ROUNDS).collect()}
    assert set(got) == set(vertices)
    for v in vertices:
        assert got[v][0] == pytest.approx(hub[v], abs=1e-12)
        assert got[v][1] == pytest.approx(auth[v], abs=1e-12)
    # random-walk form: both vectors stay L1 = 1 with NO normalization step
    assert sum(h for h, _ in got.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(a for _, a in got.values()) == pytest.approx(1.0, abs=1e-9)


def _top_pairs(mid_to_members, cap, k):
    common = defaultdict(int)
    for members in mid_to_members.values():
        if len(members) > cap:
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                common[(ms[i], ms[j])] += 1
    ranked = sorted(common.items(), key=lambda kv: (-kv[1], kv[0]))
    return {(a, b, c) for (a, b), c in ranked[:k]}


def test_cocitation_matches_bruteforce(spark, rand_graph, rand_graph_data):
    _, edges = rand_graph_data
    citing = defaultdict(set)
    for s, d in edges:
        citing[s].add(d)
    exp = _top_pairs(citing, cap=64, k=50)
    got = {(r["a"], r["b"], r["common"]) for r in cocitation(rand_graph, top_k=50).collect()}
    assert got == exp


def test_bib_coupling_matches_bruteforce(spark, rand_graph, rand_graph_data):
    _, edges = rand_graph_data
    cited = defaultdict(set)
    for s, d in edges:
        cited[d].add(s)
    exp = _top_pairs(cited, cap=64, k=50)
    got = {(r["a"], r["b"], r["common"]) for r in bib_coupling(rand_graph, top_k=50).collect()}
    assert got == exp


def test_cocitation_outdeg_cap_excludes_directory_pages(spark):
    from graphscope_spark.graph import Graph

    # a "directory" page 99 cites everything; with the cap it must not
    # manufacture relatedness between otherwise-unrelated pages
    edges = [(99, i) for i in range(10)] + [(0, 1), (0, 2), (3, 1), (3, 2)]
    e = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edges(e, directed=True, num_partitions=4)
    got = {(r["a"], r["b"]): r["common"] for r in cocitation(g, max_citing_outdeg=5).collect()}
    assert got == {(1, 2): 2}


# -- semantic dedup ----------------------------------------------------


def test_semantic_dedup_marks_lower_id_survivor(spark):
    from graphscope_spark.functions.similarity import semantic_dedup

    # ids 0 and 3 are centroid seeds (stride 3); 1 duplicates 0, 4
    # duplicates 3, 2 and 5 are near-orthogonal singletons
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),
        (2, [0.2, 0.0, 0.97, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.98, 0.02, 0.0]),
        (5, [0.0, 0.2, 0.0, 0.97]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["cluster"], r["is_duplicate"])
        for r in semantic_dedup(df, stride=3, tau=0.9).collect()
    }
    assert len(got) == 6
    # duplicates are exactly the HIGHER id of each >=tau in-cluster pair
    assert {v for v, (_, d) in got.items() if d} == {1, 4}
    # survivors keep one representative per ball
    assert {v for v, (_, d) in got.items() if not d} == {0, 2, 3, 5}


# -- count-min sketch --------------------------------------------------


def _md5_pos(prefix: str, value: str, mod: int) -> int:
    return int(hashlib.md5(f"{prefix}|{value}".encode()).hexdigest()[:5], 16) % mod


def test_cms_registers_match_python_replica(spark):
    from graphscope_spark.functions.sketch import cms_registers

    values = [f"t{i % 7}" for i in range(200)] + ["heavy"] * 50
    df = spark.createDataFrame([(v,) for v in values], "value string")
    d, w = 4, 64
    exp = defaultdict(int)
    for v in values:
        for r in range(d):
            exp[(r, _md5_pos(str(r), v, w))] += 1
    got = {(r["row"], r["col"]): r["cnt"] for r in cms_registers(df, "value", d=d, w=w).collect()}
    assert got == dict(exp)


def test_cms_heavy_hitters_one_sided_error(spark):
    from graphscope_spark.functions.sketch import cms_heavy_hitters

    values = [f"t{i % 7}" for i in range(140)] + ["heavy"] * 60 + ["mid"] * 25
    df = spark.createDataFrame([(v,) for v in values], "value string")
    truth = defaultdict(int)
    for v in values:
        truth[v] += 1
    got = {r["value"]: r["est"] for r in cms_heavy_hitters(df, "value", threshold=25, d=4, w=64).collect()}
    # CMS never under-counts, so every value truly >= threshold is present
    for v, c in truth.items():
        if c >= 25:
            assert v in got
    for v, est in got.items():
        assert est >= truth[v]


# -- Bloom decontamination ---------------------------------------------


def test_bloom_contamination_matches_python_replica(spark):
    from graphscope_spark.functions.dedup import shingles
    from graphscope_spark.functions.sketch import bloom_contamination

    bench_rows = [(100, "alpha beta gamma delta"), (101, "one two three four five")]
    doc_rows = [
        (0, "alpha beta gamma delta epsilon"),  # shares bench shingles
        (1, "two three four five six"),
        (2, "totally unrelated clean text here"),
    ]
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    k, m = 3, 4096

    def _sh(text, n=3):
        t = text.strip().split()
        if len(t) < n:
            return {" ".join(t)}
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    bloom = set()
    for _, txt in bench_rows:
        for s in _sh(txt):
            for i in range(k):
                bloom.add(_md5_pos(str(i), s, m))
    exp = {}
    for did, txt in doc_rows:
        hits = sum(
            1 for s in _sh(txt) if all(_md5_pos(str(i), s, m) in bloom for i in range(k))
        )
        if hits:
            exp[did] = hits
    got = {r["doc_id"]: r["bloom_hits"] for r in bloom_contamination(docs, bench, k=k, m=m).collect()}
    assert got == exp
    assert 0 in got and 1 in got  # genuinely contaminated docs are caught


# -- k-means ------------------------------------------------------------


def test_kmeans_matches_lloyd_replica(spark):
    from graphscope_spark.functions.similarity import kmeans_fit

    vecs = [
        (0, [0.0, 0.0]), (1, [0.2, 0.1]), (2, [0.1, 0.3]),
        (3, [5.0, 5.0]), (4, [5.2, 4.9]), (5, [4.8, 5.1]),
        (6, [0.0, 5.0]), (7, [0.3, 4.7]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    stride, iters = 3, 2

    cent = {i: list(v) for i, v in vecs if i % stride == 0}

    def _assign(c):
        out = {}
        for i, v in vecs:
            best = min(
                c.items(),
                key=lambda kv: (sum((a - b) ** 2 for a, b in zip(v, kv[1])), kv[0]),
            )
            out[i] = (best[0], sum((a - b) ** 2 for a, b in zip(v, best[1])))
        return out

    for _ in range(iters):
        a = _assign(cent)
        new = {}
        for cid in {c for c, _ in a.values()}:
            members = [v for i, v in vecs if a[i][0] == cid]
            new[cid] = [sum(col) / len(members) for col in zip(*members)]
        cent = new
    exp = _assign(cent)

    got = {r["vec_id"]: (r["cluster"], r["dist"])
           for r in kmeans_fit(df, iters=iters, stride=stride).collect()}
    assert set(got) == set(exp)
    for i, (c, d) in exp.items():
        assert got[i][0] == c
        assert got[i][1] == pytest.approx(d, abs=1e-12)
    # the three planted blobs separate
    assert len({c for c, _ in got.values()}) == 3


# -- bigram LM perplexity -------------------------------------------------


def test_lm_perplexity_matches_replica(spark):
    from graphscope_spark.functions.classify import ngram_lm_perplexity

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat"),
        (2, "zq xv"),          # rare bigram -> high xent
        (3, "one"),            # too short: excluded
        (4, ""),               # empty: excluded
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    k = 0.5

    toks = {i: t.strip().split() for i, t in docs}
    bigrams = {i: list(zip(t, t[1:])) for i, t in toks.items() if len(t) >= 2}
    c12, c1 = {}, {}
    for bs in bigrams.values():
        for b in bs:
            c12[b] = c12.get(b, 0) + 1
            c1[b[0]] = c1.get(b[0], 0) + 1
    vocab = len({w for t in toks.values() for w in t if w})
    exp = {}
    for i, bs in bigrams.items():
        lps = [math.log((c12[b] + k) / (c1[b[0]] + k * vocab)) for b in bs]
        exp[i] = (len(bs), -sum(lps) / len(lps))

    got = {r["doc_id"]: (r["n_bigrams"], r["xent"])
           for r in ngram_lm_perplexity(df, k=k).collect()}
    assert set(got) == set(exp)
    for i, (n, x) in exp.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(x, abs=1e-12)
    # boilerplate scores lower than gibberish
    assert got[0][1] < got[2][1]


def test_semantic_dedup_skew_guard_bounds_candidates(spark):
    """VERDICT r3 task 7: a pathologically oversized cluster must not
    go quadratic — with max_cluster set, big clusters are sub-banded
    with sign-LSH while results on true near-duplicates still hold."""
    import numpy as np

    from graphscope_spark.functions.similarity import (
        ivf_assign,
        ivf_centroids,
        semantic_candidates,
        semantic_dedup,
    )

    rng = np.random.RandomState(7)
    rows = []
    # planted near-identical trio 0/1/2 (cosine ~1)
    base = rng.randn(16)
    for i in range(3):
        rows.append((i, (base + 1e-4 * rng.randn(16)).tolist()))
    # 37 diverse-sign vectors — NOT near-duplicates of anything
    for i in range(3, 40):
        rows.append((i, rng.randn(16).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # stride > n → single centroid → ONE 40-vector mega-cluster
    cent = ivf_centroids(df, stride=64)
    assigned = ivf_assign(df, cent)
    all_pairs = semantic_candidates(assigned).count()
    assert all_pairs == 40 * 39 // 2

    capped = semantic_candidates(assigned, max_cluster=8)
    n_capped = capped.count()
    # sub-banding must cut candidate volume hard on a diverse cluster
    assert n_capped < all_pairs / 3
    # ... but near-identical mates agree on every band: trio survives
    trio = {(r["a_id"], r["b_id"]) for r in capped.collect()}
    assert {(0, 1), (0, 2), (1, 2)} <= trio

    got = {
        r["vec_id"]: r["is_duplicate"]
        for r in semantic_dedup(df, stride=64, tau=0.99, max_cluster=8).collect()
    }
    assert got[0] is False and got[1] is True and got[2] is True
    assert sum(got.values()) == 2  # no false positives among the diverse 37


def test_semantic_dedup_cap_is_noop_when_clusters_fit(spark):
    """With every cluster at/below the cap, the guarded path must be
    IDENTICAL to the exact all-pairs path."""
    from graphscope_spark.functions.similarity import semantic_dedup

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),
        (2, [0.2, 0.0, 0.97, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.98, 0.02, 0.0]),
        (5, [0.0, 0.2, 0.0, 0.97]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    exact = {
        r["vec_id"]: (r["cluster"], r["is_duplicate"])
        for r in semantic_dedup(df, stride=3, tau=0.9).collect()
    }
    capped = {
        r["vec_id"]: (r["cluster"], r["is_duplicate"])
        for r in semantic_dedup(df, stride=3, tau=0.9, max_cluster=10).collect()
    }
    assert exact == capped
