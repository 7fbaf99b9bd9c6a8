"""Incremental near-dup index (streaming/neardup.py): flags from the
stream must exactly match a pure-Python whole-corpus LSH+verify replay,
after every batch."""

from __future__ import annotations

import hashlib
import itertools

from graphscope_spark.functions import specs
from graphscope_spark.streaming.neardup import IncrementalNearDup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "a completely different document about spark shuffle plans"),
    (3, "the quick brown fox jumps over the lazy cat tonight"),
    (4, "count min sketch register matrices for trending tokens"),
    (5, "the quick brown fox jumps over the lazy dog today"),
    (6, "another unrelated piece of text entirely on its own"),
    (7, "a completely different document about spark shuffle stages"),
    (8, "short"),
    (9, "count min sketch register matrices for trending words"),
]


def _shingle_set(text: str) -> set[str]:
    toks = text.split()
    n = specs.SHINGLE_N
    if len(toks) < n:
        return {text}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _bands_of(text: str) -> set[str]:
    sh = _shingle_set(text)
    k, w = specs.MINHASH_K, specs.LSH_BAND_WIDTH
    mh = [
        min(hashlib.md5(f"{j}:{s}".encode()).hexdigest() for s in sh)
        for j in range(k)
    ]
    return {
        "|".join([str(b)] + [mh[b * w + i] for i in range(w)])
        for b in range(k // w)
    }


def _expected(docs: list[tuple[int, str]], threshold: float) -> dict:
    bands = {i: _bands_of(t) for i, t in docs}
    sh = {i: _shingle_set(t) for i, t in docs}
    out: dict[int, tuple[int, float]] = {}
    for (a, _), (b, _) in itertools.combinations(sorted(docs), 2):
        if not (bands[a] & bands[b]):
            continue
        inter = len(sh[a] & sh[b])
        jac = inter / (len(sh[a]) + len(sh[b]) - inter)
        if jac >= threshold and (b not in out or a < out[b][0]):
            out[b] = (a, round(jac, 8))
    return out


def test_incremental_neardup_matches_replay(spark, tmp_path):
    thr = 0.5
    inc = IncrementalNearDup(spark, str(tmp_path / "nd_state"), threshold=thr)
    batches = [DOCS[:4], DOCS[4:7], DOCS[7:]]
    seen: list = []
    for i, b in enumerate(batches):
        inc.process_batch(spark.createDataFrame(b, "doc_id long, text string"), i)
        seen.extend(b)
        got = {
            r["doc_id"]: (r["dup_of"], r["jaccard"])
            for r in inc.current_dups().collect()
        }
        assert got == _expected(seen, thr), (i, got)
    # the exact pair 0/1 and the near pair 3 -> 0 must be present (doc 5
    # differs in 2 of 8 shingles and happens not to band-collide at
    # k=8/w=2 — the recall<1 LSH trade-off, same in both engines)
    final = _expected(DOCS, thr)
    assert final[1][0] == 0 and final[1][1] == 1.0
    assert final[3][0] == 0


def test_incremental_neardup_via_stream(spark, tmp_path):
    from graphscope_spark.streaming.incremental import stream_edges  # noqa: F401

    in_dir = tmp_path / "nd_incoming"
    in_dir.mkdir()
    batches = [DOCS[:5], DOCS[5:]]
    for i, b in enumerate(batches):
        spark.createDataFrame(b, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(in_dir / f"batch_{i}"))
    inc = IncrementalNearDup(spark, str(tmp_path / "nd_state2"), threshold=0.5)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "batch_*"))
    )
    q = inc.attach(stream)
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["dup_of"], r["jaccard"])
        for r in inc.current_dups().collect()
    }
    assert got == _expected(DOCS, 0.5)


def test_incremental_neardup_out_of_order_ids(spark, tmp_path):
    """ADVICE r3 (medium): a batch may carry doc_ids SMALLER than
    already-indexed docs; the pair must still verify, with the verdict
    landing on the OLD (larger-id) doc — and an existing verdict must
    improve to the new smaller dup_of."""
    thr = 0.5
    # batch order deliberately violates id order: the exact-dup group
    # {0, 1, 7} arrives as 7, then 1, then 0.
    docs = {
        7: "the quick brown fox jumps over the lazy dog tonight",
        1: "the quick brown fox jumps over the lazy dog tonight",
        0: "the quick brown fox jumps over the lazy dog tonight",
        5: "a completely different document about spark shuffle plans",
        2: "a completely different document about spark shuffle stages",
    }
    batches = [[7, 5], [1, 2], [0]]
    inc = IncrementalNearDup(spark, str(tmp_path / "nd_ooo"), threshold=thr)
    seen: list = []
    for i, ids in enumerate(batches):
        b = [(j, docs[j]) for j in ids]
        inc.process_batch(spark.createDataFrame(b, "doc_id long, text string"), i)
        seen.extend(b)
        got = {
            r["doc_id"]: (r["dup_of"], r["jaccard"])
            for r in inc.current_dups().collect()
        }
        assert got == _expected(seen, thr), (i, got)
    # final state: 1 and 7 both point at 0 (1's verdict REFRESHED from
    # dup_of=7 after batch 0 arrived), and 5 at 2
    final = {
        r["doc_id"]: r["dup_of"] for r in inc.current_dups().collect()
    }
    assert final[1] == 0 and final[7] == 0 and final[5] == 2
