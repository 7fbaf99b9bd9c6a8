"""Text / dedup / similarity / multimodal ops vs pure-Python oracles."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphscope_spark.functions import specs
from graphscope_spark.functions.dedup import (
    exact_duplicates,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash,
    simhash_near_duplicates,
)
from graphscope_spark.functions.similarity import cosine_topk, lsh_topk
from graphscope_spark.functions.text import fingerprint, lang_id, quality_features, token_count

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (1, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
    (2, "The  quick brown fox  jumps over the lazy DOG", "en"),  # normalized dup
    (3, "der hund ist nicht schnell und der fuchs ist klug", "de"),
    (4, "le chat est dans la maison avec les enfants", "fr"),
    (5, "el perro corre por la calle pero los gatos duermen", "es"),
    (6, "the quick brown fox jumps over the sleepy dog today", "en"),  # near-dup of 0
    (7, "completely different words about spark engines and shuffles", "en"),
    (8, "", "und"),
    (9, "solo", "und"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )


def _py_shingles(text: str, n: int = specs.SHINGLE_N) -> set[str]:
    toks = text.strip().split()
    if not toks:
        toks = [""]
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_token_count(docs_df):
    got = {
        r["doc_id"]: r["n"]
        for r in docs_df.select("doc_id", token_count("text").alias("n")).collect()
    }
    exp = {i: len(t.split()) for i, t, _ in DOCS}
    assert got == exp


def test_fingerprint_md5(docs_df):
    got = {
        r["doc_id"]: r["fp"]
        for r in docs_df.select("doc_id", fingerprint("text").alias("fp")).collect()
    }
    for i, t, _ in DOCS:
        norm = " ".join(t.lower().strip().split())
        assert got[i] == hashlib.md5(norm.encode()).hexdigest()


def test_exact_duplicates(docs_df):
    got = {
        r["doc_id"]: (r["canonical_id"], r["is_duplicate"])
        for r in exact_duplicates(docs_df).collect()
    }
    assert got[0] == (0, False)
    assert got[1] == (0, True)
    assert got[2] == (0, True)  # case/whitespace-normalized dup
    assert got[7] == (7, False)


def test_shingles_match_python(docs_df):
    got = {}
    for r in shingles(docs_df).collect():
        got.setdefault(r["doc_id"], set()).add(r["shingle"])
    for i, t, _ in DOCS:
        assert got[i] == _py_shingles(t), i


def test_minhash_lsh_finds_near_dup(docs_df):
    sh = shingles(docs_df)
    sig = minhash_signatures(sh)
    pairs = {(r["a"], r["b"]) for r in lsh_candidate_pairs(sig).collect()}
    assert (0, 1) in pairs  # identical shingle sets always collide
    # minhash signature of identical shingle sets is identical
    rows = {tuple(r[1:]) for r in sig.where(F.col("doc_id").isin(0, 1)).collect()}
    assert len(rows) == 1


def test_jaccard_pairs(docs_df):
    got = {(r["a"], r["b"]): r["jaccard"] for r in jaccard_pairs(docs_df).collect()}
    for (a, b), j in got.items():
        sa, sb = _py_shingles(DOCS[a][1]), _py_shingles(DOCS[b][1])
        exp = len(sa & sb) / len(sa | sb)
        assert abs(j - exp) < 1e-12
    assert got[(0, 1)] == 1.0


def test_simhash_vs_python(docs_df):
    def py_simhash(text: str, bits: int = specs.SIMHASH_BITS) -> int:
        toks = sorted(set(text.strip().split() or [""]))
        if text.strip() == "":
            toks = [""]
        sums = [0] * bits
        for t in set(toks):
            h = hashlib.md5(t.encode()).hexdigest()
            for j in range(bits):
                d = int(h[j // 4], 16)
                bit = (d >> (j % 4)) & 1
                sums[j] += bit * 2 - 1
        return sum(2**j for j in range(bits) if sums[j] > 0)

    got = {r["doc_id"]: r["simhash"] for r in simhash(docs_df).collect()}
    for i, t, _ in DOCS:
        assert got[i] == py_simhash(t), i


def test_simhash_near_duplicates(docs_df):
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_duplicates(docs_df, max_hamming=6).collect()}
    assert pairs[(0, 1)] == 0  # identical token sets → identical simhash


def test_lang_id(docs_df):
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs_df).collect()}
    assert got[0] == "en" and got[3] == "de" and got[4] == "fr" and got[5] == "es"
    assert got[8] == "und" and got[9] == "und"


def test_quality_features(docs_df):
    rows = {r["doc_id"]: r for r in quality_features(docs_df).collect()}
    assert rows[8]["n_tokens"] == 0
    t0 = DOCS[0][1].split()
    assert rows[0]["n_tokens"] == len(t0)
    assert abs(rows[0]["uniq_token_ratio"] - len(set(t0)) / len(t0)) < 1e-12
    assert 0.0 <= rows[0]["quality_score"] <= 1.0


EMB = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0, 0.0]),
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [0.0, 0.9, 0.2, 0.0]),
    (4, [-1.0, 0.0, 0.0, 0.0]),
    (5, [0.5, 0.5, 0.5, 0.5]),
]


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(EMB, "vec_id long, embedding array<float>")


def _py_cosine(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_cosine_topk(emb_df):
    res = cosine_topk(emb_df, emb_df.where(F.col("vec_id") == 0), k=3)
    rows = sorted(res.collect(), key=lambda r: r["rank"])
    exp = sorted(
        ((i, _py_cosine(EMB[0][1], v)) for i, v in EMB if i != 0),
        key=lambda t: (-t[1], t[0]),
    )[:3]
    assert [r["neighbor_id"] for r in rows] == [i for i, _ in exp]
    for r, (_, c) in zip(rows, exp):
        assert abs(r["cosine"] - c) < 1e-6


def test_lsh_topk_same_bucket(emb_df):
    """vectors 0,1,5 share the all-positive sign bucket (planes=4)."""
    res = lsh_topk(emb_df, emb_df.where(F.col("vec_id") == 0), k=5, planes=4)
    nbrs = {r["neighbor_id"] for r in res.collect()}
    assert 1 in nbrs and 4 not in nbrs  # opposite-sign vector pruned


def test_ivf_assign_and_topk(emb_df):
    """Python replay of the IVF pipeline: stride=2 seeds centroids
    {0,2,4}; assignment/probing by (cosine desc, cid asc)."""
    from graphscope_spark.functions.similarity import ivf_assign, ivf_centroids, ivf_topk

    stride, nprobe, k = 2, 2, 3
    cents = [(i, v) for i, v in EMB if i % stride == 0]

    def top_cents(v, n):
        return [
            c
            for c, _ in sorted(
                ((c, _py_cosine(v, cv)) for c, cv in cents),
                key=lambda t: (-t[1], t[0]),
            )[:n]
        ]

    assign = {i: top_cents(v, 1)[0] for i, v in EMB}
    got_assign = {
        r["vec_id"]: r["cluster"]
        for r in ivf_assign(emb_df, ivf_centroids(emb_df, stride)).collect()
    }
    assert got_assign == assign

    for qid, qv in EMB:
        probed = set(top_cents(qv, nprobe))
        cand = [
            (i, _py_cosine(qv, v)) for i, v in EMB if i != qid and assign[i] in probed
        ]
        exp = sorted(cand, key=lambda t: (-t[1], t[0]))[:k]
        rows = sorted(
            ivf_topk(
                emb_df,
                emb_df.where(F.col("vec_id") == qid),
                k=k,
                stride=stride,
                nprobe=nprobe,
            ).collect(),
            key=lambda r: r["rank"],
        )
        assert [r["neighbor_id"] for r in rows] == [i for i, _ in exp]
        for r, (_, c) in zip(rows, exp):
            assert abs(r["cosine"] - c) < 1e-6


def test_multimodal_image_features(spark):
    from graphscope_spark.functions.multimodal import IMAGE_FEATURE_DIM, image_features

    df = spark.createDataFrame(
        [(0, b"imagebytes-0"), (1, b"imagebytes-1")], "id long, payload binary"
    )
    rows = {r["id"]: r for r in image_features(df).collect()}
    assert len(rows) == 2
    f0 = np.array(rows[0]["feature"])
    assert f0.shape == (IMAGE_FEATURE_DIM,)
    assert abs(np.linalg.norm(f0) - 1.0) < 1e-5
    # determinism
    rows2 = {r["id"]: r for r in image_features(df).collect()}
    assert rows2[0]["feature"] == rows[0]["feature"]


def test_multimodal_real_bmp_decoder(spark):
    """decoder='real' end-to-end: generate an uncompressed 24-bit BMP,
    run it through the Arrow-batched image_features stage, and pin the
    exact expected 16-bin luma-histogram feature."""
    from graphscope_spark.functions.multimodal import (
        IMAGE_FEATURE_DIM,
        encode_bmp,
        image_features,
    )

    # 2x4 image: 4 black px (gray 0 -> bin 0), 2 white px (255 -> bin 15),
    # 1 pure red (76.245 -> bin 4), 1 mid gray 130 (-> bin 8; 128 itself
    # sits on the bin edge where float luma rounds to 127.999…)
    px = np.zeros((2, 4, 3), dtype=np.uint8)
    px[0, 0] = (255, 255, 255)
    px[0, 1] = (255, 255, 255)
    px[0, 2] = (255, 0, 0)
    px[0, 3] = (130, 130, 130)
    payload = encode_bmp(px)
    df = spark.createDataFrame([(7, payload)], "id long, payload binary")
    rows = image_features(df, decoder="real").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["width"], r["height"]) == (4, 2)
    expected = np.zeros(IMAGE_FEATURE_DIM, dtype=np.float32)
    expected[0], expected[4], expected[8], expected[15] = 4, 1, 1, 2
    expected /= np.linalg.norm(expected)
    assert np.allclose(np.array(r["feature"]), expected, atol=1e-6)
    # width not divisible by 4 exercises row padding
    px2 = np.full((3, 3, 3), 200, dtype=np.uint8)
    df2 = spark.createDataFrame([(8, encode_bmp(px2))], "id long, payload binary")
    r2 = image_features(df2, decoder="real").collect()[0]
    assert (r2["width"], r2["height"]) == (3, 3)
    exp2 = np.zeros(IMAGE_FEATURE_DIM, dtype=np.float32)
    exp2[12] = 9  # gray 200 -> bin 12
    exp2 /= np.linalg.norm(exp2)
    assert np.allclose(np.array(r2["feature"]), exp2, atol=1e-6)
    # non-BMP payload names the gap instead of decoding garbage
    df3 = spark.createDataFrame([(9, b"\xff\xd8jpegish")], "id long, payload binary")
    with pytest.raises(Exception, match="BMP"):
        image_features(df3, decoder="real").collect()


def test_multimodal_frame_sample(spark):
    from graphscope_spark.functions.multimodal import frame_sample

    payload = bytes(range(256)) * 25  # 25 pseudo-frames
    df = spark.createDataFrame([(0, payload)], "id long, payload binary")
    rows = frame_sample(df, every_n=10).collect()
    assert [r["frame_index"] for r in sorted(rows, key=lambda r: r["frame_index"])] == [0, 10, 20]


# ---------------------------------------------------------------------
# repetition features + training-corpus selection
# ---------------------------------------------------------------------

REP_DOCS = DOCS + [
    (10, "spam spam spam spam spam spam spam spam spam spam", "en"),  # repetitious
    (11, "the cat sat on the mat and the cat sat on the mat again", "en"),
]


def _py_repetition(text: str) -> tuple[float, float]:
    toks = text.strip().split() if text.strip() else []
    bgs = [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
    tgs = [f"{toks[i]} {toks[i + 1]} {toks[i + 2]}" for i in range(len(toks) - 2)]
    tbf = max(Counter(bgs).values()) / len(bgs) if bgs else 0.0
    dtf = 1.0 - len(set(tgs)) / len(tgs) if tgs else 0.0
    return tbf, dtf


def test_repetition_features(spark):
    from graphscope_spark.functions.text import repetition_features

    df = spark.createDataFrame(
        [(i, t) for i, t, _ in REP_DOCS], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["top_bigram_frac"], r["dup_trigram_frac"])
        for r in repetition_features(df).collect()
    }
    assert set(got) == {i for i, _, _ in REP_DOCS}
    for i, t, _ in REP_DOCS:
        tbf, dtf = _py_repetition(t)
        assert got[i][0] == pytest.approx(tbf, abs=1e-12), (i, t)
        assert got[i][1] == pytest.approx(dtf, abs=1e-12), (i, t)
    # the all-same-token doc is maximally repetitious: every bigram is
    # the mode, and only 1 of its 8 trigram occurrences is distinct
    assert got[10] == (1.0, 0.875)
    # empty + single-token docs are defined as 0
    assert got[8] == (0.0, 0.0)
    assert got[9] == (0.0, 0.0)


def _py_quality_score(text: str) -> float:
    toks = text.strip().split() if text.strip() else [""]
    n_tok = len(text.strip().split()) if text.strip() else 0
    st = max(n_tok, 1)
    nu = len(set(toks))
    ns = sum(1 for t in toks if t in specs.STOPWORDS)
    return (
        0.4 * min(n_tok / 50.0, 1.0)
        + 0.3 * (nu / st)
        + 0.3 * min((ns / st) * 5.0, 1.0)
    )


def _py_lang(text: str) -> str:
    toks = text.strip().split() if text.strip() else []
    hits = Counter()
    for lang, ws in specs.LANG_MARKERS.items():
        hits[lang] = sum(1 for t in toks if t in ws)
    best = [l for l, h in hits.items() if h == max(hits.values()) and h > 0]
    return min(best) if best else "und"


def test_training_corpus(spark):
    import re

    from graphscope_spark.functions.corpus import training_corpus

    df = spark.createDataFrame(
        [(i, t) for i, t, _ in REP_DOCS], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_tokens"] for r in training_corpus(df).collect()}

    expected = {}
    fp_seen = {}
    for i, t, _ in REP_DOCS:
        tbf, dtf = _py_repetition(t)
        if (
            _py_lang(t) == specs.CORPUS_LANG
            and round(_py_quality_score(t), 8) >= specs.CORPUS_MIN_QUALITY
            and round(tbf, 8) <= specs.CORPUS_MAX_TOP_BIGRAM
            and round(dtf, 8) <= specs.CORPUS_MAX_DUP_TRIGRAM
        ):
            fp = hashlib.md5(
                re.sub(r"\s+", " ", t.strip().lower()).encode()
            ).hexdigest()
            if fp not in fp_seen:
                fp_seen[fp] = i
                expected[i] = len(t.strip().split()) if t.strip() else 0
    assert got == expected
    # the gates actually fire on this corpus: dup of 0 deduped away,
    # repetitious doc 10 rejected, non-English docs rejected
    assert 0 in got and 1 not in got and 2 not in got
    assert 10 not in got and 3 not in got and 4 not in got and 5 not in got


def test_canonical_url(spark):
    from graphscope_spark.functions.urls import canonical_url, url_host

    cases = [
        # (input, canonical)
        ("HTTP://Example.COM:80/Path#frag", "http://example.com/Path"),
        ("https://A.example:443/", "https://a.example"),
        ("https://a.example:8443/x", "https://a.example:8443/x"),  # non-default kept
        ("http://a.example/", "http://a.example"),
        ("http://a.example/p/1?q=UP#x", "http://a.example/p/1?q=UP"),  # query case kept
        ("ftp://Host.Example:80/f", "ftp://host.example:80/f"),  # :80 only for http
        ("not-a-url", "not-a-url"),  # passthrough
        ("relative/path#frag", "relative/path"),  # fragment still stripped
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], "i long, u string")
    got = {r["i"]: r["c"] for r in df.select("i", canonical_url("u").alias("c")).collect()}
    for i, (u, exp) in enumerate(cases):
        assert got[i] == exp, (u, got[i], exp)
    hosts = {r["i"]: r["h"] for r in df.select("i", url_host("u").alias("h")).collect()}
    assert hosts[0] == "example.com:80" and hosts[5] == "host.example:80"
    assert hosts[6] == "" and hosts[7] == ""


def test_redact(spark):
    from graphscope_spark.functions.text import redact, redaction_counts

    cases = [
        (0, "mail me at a.b+c@sub.example.org today", "mail me at <EMAIL> today", (0, 1, 0)),
        (1, "see https://a.example/p?q=1#f and http://b.example", "see <URL> and <URL>", (2, 0, 0)),
        (2, "card 1234567890 pin 12345", "card <NUM> pin 12345", (0, 0, 1)),  # 5 digits kept
        # the email inside the url is swallowed by the url (order matters)
        (3, "go https://x.example/u@example.com now", "go <URL> now", (1, 0, 0)),
        (4, "plain text only", "plain text only", (0, 0, 0)),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _, _ in cases], "i long, t string")
    nu, ne, nn = redaction_counts("t")
    got = {
        r["i"]: (r["r"], (r["u"], r["e"], r["n"]))
        for r in df.select(
            "i", redact("t").alias("r"), nu.alias("u"), ne.alias("e"), nn.alias("n")
        ).collect()
    }
    for i, _, exp_r, exp_c in cases:
        assert got[i][0] == exp_r, (i, got[i][0])
        assert got[i][1] == exp_c, (i, got[i][1])


def test_segment_dedup(spark):
    """CCNet-style segment dedup vs a pure-Python replay: 3-token
    segments, drop segments appearing in >1 distinct docs, reassemble
    survivors in order; docs with no surviving segment vanish."""
    from graphscope_spark.functions.dedup import segment_dedup

    docs = [
        (0, "a b c d e f g h i"),          # "a b c" shared with doc 1
        (1, "a b c x y z"),                # shares "a b c"
        (2, "p q r s t u"),                # unique throughout
        (3, "a b c a b c a b c"),          # only the shared segment -> dropped row
        (4, "x y z w"),                    # "x y z" shared with doc 1; tail "w" kept
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["kept_segs"], r["dropped_segs"])
        for r in segment_dedup(df, seg_tokens=3, max_doc_freq=1).collect()
    }

    # python replay
    K, T = 3, 1
    segs = {}  # (doc, pos) -> seg
    from collections import defaultdict

    docfreq = defaultdict(set)
    for i, t in docs:
        ts = t.split(" ")
        for p in range((len(ts) + K - 1) // K):
            s = " ".join(ts[p * K : p * K + K])
            segs[(i, p)] = s
            docfreq[s].add(i)
    expected = {}
    for i, _ in docs:
        kept = [s for (d, p), s in sorted(segs.items()) if d == i and len(docfreq[s]) <= T]
        dropped = sum(1 for (d, _), s in segs.items() if d == i and len(docfreq[s]) > T)
        if kept:
            expected[i] = (" ".join(kept), len(kept), dropped)
    assert got == expected
    assert 3 not in got  # all-boilerplate doc removed entirely
    assert got[4][0] == "w" and got[4][2] == 1


def test_multimodal_real_wav_decoder(spark):
    """decoder='real' audio end-to-end: generate a PCM WAV (with an
    extra RIFF chunk before data, like real crawled files), run it
    through the Arrow-batched audio_features stage, pin exact features."""
    import pytest as _pytest

    from graphscope_spark.functions.multimodal import (
        audio_features,
        encode_wav,
    )

    # 1 second of a 50 Hz square wave at 16 kHz, amplitude 8192 (=0.25)
    rate, freq, amp = 16000, 50, 8192
    t = np.arange(rate)
    samples = (amp * np.sign(np.sin(2 * np.pi * freq * t / rate))).astype(np.int16)
    payload = encode_wav(samples, rate)
    # splice a LIST chunk between fmt and data (chunk-walk exercise)
    fmt_end = payload.index(b"data")
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    payload2 = payload[:fmt_end] + extra + payload[fmt_end:]
    payload2 = payload2[:4] + (len(payload2) - 8).to_bytes(4, "little") + payload2[8:]

    df = spark.createDataFrame(
        [(1, payload), (2, payload2)], "id long, payload binary"
    )
    rows = {r["id"]: r for r in audio_features(df, decoder="real").collect()}
    x = samples.astype(np.float64) / 32768.0
    exp_rms = float(np.sqrt((x * x).mean()))
    exp_zc = float((np.diff(np.signbit(x)) != 0).sum() / (rate - 1))
    for rid in (1, 2):
        r = rows[rid]
        assert r["sample_rate"] == rate and r["channels"] == 1
        assert r["n_samples"] == rate and abs(r["duration_sec"] - 1.0) < 1e-6
        assert abs(r["rms"] - exp_rms) < 1e-6 and abs(r["peak"] - 0.25) < 1e-6
        assert abs(r["zero_cross_rate"] - exp_zc) < 1e-6

    # stereo: L = square wave, R = silence -> rms halves under mean? no:
    # rms is over BOTH channels' samples -> amp/sqrt(2) of mono rms
    st = np.stack([samples, np.zeros_like(samples)], axis=1)
    df2 = spark.createDataFrame([(3, encode_wav(st, rate))], "id long, payload binary")
    r3 = audio_features(df2, decoder="real").collect()[0]
    assert r3["channels"] == 2 and r3["n_samples"] == rate
    assert abs(r3["rms"] - exp_rms / np.sqrt(2)) < 1e-6

    # compressed/unknown formats name the gap
    bad = spark.createDataFrame([(4, b"OggS-vorbis")], "id long, payload binary")
    with _pytest.raises(Exception, match="RIFF/WAVE"):
        audio_features(bad, decoder="real").collect()

    # fake decoder keeps the plumbing testable and deterministic
    got1 = audio_features(df, decoder="fake").orderBy("id").collect()
    got2 = audio_features(df, decoder="fake").orderBy("id").collect()
    assert [r.asDict() for r in got1] == [r.asDict() for r in got2]


def test_image_resize_exact(spark):
    import numpy as np
    from graphscope_spark.functions.multimodal import (
        decode_bmp_pixels,
        encode_bmp,
        image_resize,
        resize_nearest,
    )

    # 2x2 checkerboard upscaled to 4x4: each pixel becomes a 2x2 block
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    df = spark.createDataFrame([(1, bytearray(encode_bmp(px)))], "id long, payload binary")
    out = image_resize(df, 4, 4).collect()[0]
    assert (out.width, out.height) == (4, 4)
    got = decode_bmp_pixels(bytes(out.payload))
    exp = px.repeat(2, axis=0).repeat(2, axis=1)
    assert (got == exp).all()
    # downscale back: pixel centers land on the original samples
    back = resize_nearest(got, 2, 2)
    assert (back == px).all()


def test_url_filter(spark):
    from graphscope_spark.functions.urls import url_filter

    rows = [
        (0, "http://spam.bad.com/p/1"),          # blocked host (exact)
        (1, "http://www.bad.com/p/1"),           # blocked host (subdomain)
        (2, "http://ok.com/ads/banner"),         # pattern: ad path
        (3, "http://ok.com/p/2?utm_source=x"),   # pattern: utm
        (4, "http://ok.com/get/file.zip"),       # pattern: extension
        (5, "http://ok.com/p/3"),                # clean
        (6, "http://bad.com/ads/x"),             # host wins over pattern
        (7, "not-a-url"),                        # no host, no pattern
    ]
    df = spark.createDataFrame(rows, "i long, url string")
    got = {
        r["i"]: (r["host"], r["block_reason"])
        for r in url_filter(
            df, blocked_hosts=["bad.com", "spam.bad.com"]
        ).collect()
    }
    assert got[0] == ("spam.bad.com", "host")
    assert got[1] == ("www.bad.com", "host")
    assert got[2] == ("ok.com", "pattern")
    assert got[3] == ("ok.com", "pattern")
    assert got[4] == ("ok.com", "pattern")
    assert got[5] == ("ok.com", None)
    assert got[6] == ("bad.com", "host")
    assert got[7] == ("", None)

    # ADVICE r3 (low): patterns=[] must mean "no pattern gate", not
    # rlike("") (which matches everything)
    empty = {
        r["i"]: r["block_reason"]
        for r in url_filter(
            df, patterns=[], blocked_hosts=["bad.com", "spam.bad.com"]
        ).collect()
    }
    assert empty == {0: "host", 1: "host", 2: None, 3: None, 4: None,
                     5: None, 6: "host", 7: None}
