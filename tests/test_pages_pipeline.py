"""End-to-end pages pipeline: generation, byte-identical extraction,
link graph construction, PageRank over the crawled web."""

from __future__ import annotations

import numpy as np

from graphscope_spark.algorithms import pagerank, wcc
from graphscope_spark.sources.extract import extract_text, links_from_pages
from graphscope_spark.sources.linkgraph import graph_from_pages
from graphscope_spark.sources.pages import _page_row, generate_pages, url_of
from pyspark.sql import functions as F

from tests import oracle

N_PAGES = 200


def test_pages_deterministic(spark):
    a = generate_pages(spark, 50, seed=42, partitions=4).collect()
    b = generate_pages(spark, 50, seed=42, partitions=2).collect()
    ka = sorted((r["url"], r["text"], bytes(r["html"])) for r in a)
    kb = sorted((r["url"], r["text"], bytes(r["html"])) for r in b)
    assert ka == kb  # partitioning-invariant determinism


def test_extract_text_byte_identical(spark):
    """The per-row invariant: extract_text(html) == stored text, per url."""
    pages = generate_pages(spark, N_PAGES, partitions=4)
    mismatches = (
        pages.select("url", "text", extract_text("html").alias("ext"))
        .where(F.col("text") != F.col("ext"))
        .count()
    )
    assert mismatches == 0


def test_links_match_generator(spark):
    pages = generate_pages(spark, N_PAGES, partitions=4)
    got = {
        (r["src_url"], r["dst_url"]) for r in links_from_pages(pages).collect()
    }
    exp = set()
    for i in range(N_PAGES):
        _, _, html, _, _ = _page_row(i, N_PAGES, 42)
        import re

        for t in re.findall(r'<a\s+href="([^"]+)"', html.decode()):
            exp.add((url_of(i), t))
    assert got == exp


def test_linkgraph_pagerank(spark):
    """PageRank over the extracted link graph matches the oracle run on
    the generator's ground-truth edge set."""
    pages = generate_pages(spark, N_PAGES, partitions=4)
    g, vertex_map = graph_from_pages(pages, num_partitions=4)

    url2vid = {r["url"]: r["vid"] for r in vertex_map.collect()}
    edges, vset = set(), set(url2vid.values())
    for i in range(N_PAGES):
        _, _, html, _, _ = _page_row(i, N_PAGES, 42)
        import re

        for t in re.findall(r'<a\s+href="([^"]+)"', html.decode()):
            edges.add((url2vid[url_of(i)], url2vid[t]))
    exp = oracle.pagerank_oracle(sorted(edges), sorted(vset))

    got = {r["vid"]: r["rank"] for r in pagerank(g).collect()}
    assert set(got) == set(exp)
    gv = np.array([got[v] for v in sorted(got)])
    ev = np.array([exp[v] for v in sorted(exp)])
    assert np.allclose(gv, ev, atol=1e-6)

    # hubs (pages 0-2) receive ~10% of all links → all in the top-5;
    # page 0 is the global top
    ranked = pagerank(g).orderBy(F.desc("rank")).limit(5).collect()
    hub_vids = {url2vid[url_of(i)] for i in range(3)}
    assert ranked[0]["vid"] == url2vid[url_of(0)]
    assert hub_vids <= {r["vid"] for r in ranked}


def test_iceberg_pages_to_pagerank(spark, tmp_path):
    """North-rule input path end-to-end: the pages table stored in the
    Iceberg-style layout (lang-partitioned), scanned back with manifest
    planning, text byte-identical through the round trip, and PageRank
    over the link graph matching the direct in-memory path to 1e-9."""
    from graphscope_spark.sources.iceberg import IcebergishTable

    pages = generate_pages(spark, N_PAGES, partitions=4)
    tbl = IcebergishTable.create(
        spark, str(tmp_path / "pages_tbl"), pages, partition_by=["lang"]
    )
    back = tbl.scan()

    # byte-identical (url, text, html) through the Iceberg round trip
    a = sorted((r["url"], r["text"], bytes(r["html"])) for r in back.collect())
    b = sorted((r["url"], r["text"], bytes(r["html"])) for r in pages.collect())
    assert a == b
    # the extraction invariant holds on the Iceberg-scanned frame too
    assert (
        back.select("text", extract_text("html").alias("ext"))
        .where(F.col("text") != F.col("ext"))
        .count()
        == 0
    )

    # partition pruning: a one-lang scan plans strictly fewer data files
    langs = sorted(r["lang"] for r in pages.select("lang").distinct().collect())
    pruned = tbl.plan_files(partition_filter={"lang": langs[0]})
    assert 0 < len(pruned) < len(tbl.plan_files())
    one = tbl.scan(partition_filter={"lang": langs[0]})
    assert {r["lang"] for r in one.select("lang").distinct().collect()} == {langs[0]}

    # PageRank parity: Iceberg-scanned pages produce the same ranks
    g1, vm1 = graph_from_pages(pages, num_partitions=4)
    g2, vm2 = graph_from_pages(back, num_partitions=4)
    r1 = {r["vid"]: r["rank"] for r in pagerank(g1).collect()}
    r2 = {r["vid"]: r["rank"] for r in pagerank(g2).collect()}
    assert set(r1) == set(r2)
    v1 = np.array([r1[v] for v in sorted(r1)])
    v2 = np.array([r2[v] for v in sorted(r2)])
    assert np.allclose(v1, v2, atol=1e-9)


def test_linkgraph_wcc(spark):
    pages = generate_pages(spark, N_PAGES, partitions=4)
    g, vertex_map = graph_from_pages(pages, num_partitions=4)
    url2vid = {r["url"]: r["vid"] for r in vertex_map.collect()}
    edges = set()
    for i in range(N_PAGES):
        _, _, html, _, _ = _page_row(i, N_PAGES, 42)
        import re

        for t in re.findall(r'<a\s+href="([^"]+)"', html.decode()):
            edges.add((url2vid[url_of(i)], url2vid[t]))
    exp = oracle.wcc_oracle(sorted(edges), sorted(url2vid.values()))
    got = {r["vid"]: r["comp"] for r in wcc(g).collect()}
    assert got == exp


def _py_host_edges(n_pages: int) -> dict[tuple[str, str], float]:
    """Ground-truth host-contracted weighted edges from the generator."""
    import re
    from collections import Counter

    def host(u: str) -> str:
        return re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", u).group(1).lower()

    links = set()  # the engine dedupes page-level links (extract.py)
    for i in range(n_pages):
        _, _, html, _, _ = _page_row(i, n_pages, 42)
        for t in re.findall(r'<a\s+href="([^"]+)"', html.decode()):
            links.add((url_of(i), t))
    c: Counter = Counter((host(s), host(d)) for s, d in links)
    return {k: float(v) for k, v in c.items()}


def test_host_graph_contraction(spark):
    """host_graph_from_pages == contract the generator's ground-truth
    page edges by url host; weights are link multiplicities and host
    ids are the dense rank of the sorted host strings."""
    from graphscope_spark.sources.linkgraph import host_graph_from_pages

    pages = generate_pages(spark, N_PAGES, partitions=4)
    hg, host_ids = host_graph_from_pages(pages, num_partitions=4)

    h2g = {r["host"]: r["gid"] for r in host_ids.collect()}
    assert sorted(h2g.values()) == list(range(len(h2g)))
    assert list(sorted(h2g)) == [h for h, _ in sorted(h2g.items(), key=lambda kv: kv[1])]

    exp = {
        (h2g[a], h2g[b]): w for (a, b), w in _py_host_edges(N_PAGES).items()
    }
    got = {
        (r["src"], r["dst"]): r["weight"] for r in hg.edges.collect()
    }
    assert got == exp


def test_weighted_pagerank_on_host_graph(spark):
    """Weighted PageRank over the contracted host graph matches a
    numpy power iteration with rank·w/Σw contributions."""
    from graphscope_spark.sources.linkgraph import host_graph_from_pages

    pages = generate_pages(spark, N_PAGES, partitions=4)
    hg, host_ids = host_graph_from_pages(pages, num_partitions=4)
    n = hg.num_vertices()
    rounds = 8
    alpha = 0.85

    got = {
        r["vid"]: r["rank"]
        for r in pagerank(hg, alpha=alpha, max_iter=rounds, tol=None,
                          sync_every=rounds, weight="weight").collect()
    }

    h2g = {r["host"]: r["gid"] for r in host_ids.collect()}
    ew = {
        (h2g[a], h2g[b]): w for (a, b), w in _py_host_edges(N_PAGES).items()
    }
    out_w = {}
    for (s, _), w in ew.items():
        out_w[s] = out_w.get(s, 0.0) + w
    r = {v: 1.0 / n for v in range(n)}
    for _ in range(rounds):
        dang = sum(r[v] for v in range(n) if out_w.get(v, 0.0) == 0.0)
        nxt = {v: (1 - alpha) / n + alpha * dang / n for v in range(n)}
        for (s, d), w in ew.items():
            nxt[d] += alpha * r[s] * w / out_w[s]
        r = nxt
    assert set(got) == set(r)
    assert np.allclose(
        [got[v] for v in sorted(got)], [r[v] for v in sorted(r)], atol=1e-12
    )


def test_anchor_texts_match_generator(spark):
    """Anchor extraction parity: every (src, dst, anchor) occurrence the
    generator rendered comes back exactly (order-insensitive multiset)."""
    import re
    from collections import Counter

    from graphscope_spark.sources.extract import anchor_texts

    pages = generate_pages(spark, N_PAGES, partitions=4)
    got = Counter(
        (r["src_url"], r["dst_url"], r["anchor"])
        for r in anchor_texts(pages).collect()
    )
    exp = Counter()
    for i in range(N_PAGES):
        _, _, html, _, _ = _page_row(i, N_PAGES, 42)
        for href, text in re.findall(
            r'<a\s+href="([^"]+)"\s*>(.*?)</a>', html.decode(), re.S
        ):
            exp[(url_of(i), href, text)] += 1
    assert got == exp


def test_anchor_profile_hand_oracle(spark):
    from graphscope_spark.functions.ranking import anchor_profile

    rows = [
        ("s1", "d1", "big red site"),
        ("s2", "d1", "red site"),
        ("s3", "d1", "red"),
        ("s4", "d2", ""),
        ("s5", "d2", "only"),
    ]
    df = spark.createDataFrame(rows, "src_url string, dst_url string, anchor string")
    out = {
        (r.dst_url, r.rank): (r.token, r.cnt)
        for r in anchor_profile(df, topk=2).collect()
    }
    assert out[("d1", 1)] == ("red", 3)
    assert out[("d1", 2)] == ("site", 2)
    assert out[("d2", 1)] == ("only", 1)  # empty anchor contributes nothing
    assert ("d2", 2) not in out
