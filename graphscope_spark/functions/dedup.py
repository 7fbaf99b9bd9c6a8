"""Deduplication ops: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design constraints:
- Distributed end-to-end: no driver-side pairwise loops; candidate
  generation is always a bucket self-join (hash-partitionable), never
  all-pairs.
- Cross-engine deterministic: every hash is built from md5() hex
  strings, which Spark and DuckDB compute identically — the DuckDB
  oracles in __spark_entry__.py replay the exact same math.

Scale notes (100TB): exact dedup is one shuffle on a 32-byte key;
MinHash/LSH shuffles shingles (≈ tokens × SHINGLE_N) once to build
signatures, then self-joins tiny band buckets; skewed buckets (boiler-
plate shingles) are bounded by banding and AQE skew splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.functions import specs
from graphscope_spark.functions.text import fingerprint, tokens
from graphscope_spark.superstep import stats_barrier


# -- exact ------------------------------------------------------------
def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_id, is_duplicate): groups rows whose
    normalized text is identical (hash-groupBy on the md5 fingerprint);
    canonical = min doc_id of the group."""
    fp = docs.select(F.col(id_col), fingerprint(text_col).alias("fp"))
    canon = fp.groupBy("fp").agg(F.min(id_col).alias("canonical_id"))
    return (
        fp.join(canon, "fp")
        .select(
            id_col,
            "canonical_id",
            (F.col(id_col) != F.col("canonical_id")).alias("is_duplicate"),
        )
    )


# -- shingles / MinHash / LSH ----------------------------------------
def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int | None = None) -> DataFrame:
    """(doc_id, shingle): distinct n-word shingles per document.
    Documents shorter than n words yield their whole text as the
    single shingle."""
    n = n or specs.SHINGLE_N
    # materialize the token array in its own projection: referencing the
    # split() EXPRESSION inside the per-element lambda makes codegen
    # re-split the text for every element (O(len^2) per doc, measured
    # ~3x on the sf0.1 corpus); a materialized column is read once
    base = docs.select(F.col(id_col), tokens(text_col).alias("_t"))
    t = F.col("_t")
    sh = F.when(
        F.size(t) < n, F.array(F.concat_ws(" ", t))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
        )
    )
    return (
        base.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .distinct()
    )


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id", k: int | None = None) -> DataFrame:
    """(doc_id, mh_0..mh_{k-1}): MinHash signature.

    Permutation j of shingle s ≈ md5(j || ':' || s); the signature
    component is the lexicographic MIN hex string — a valid min-hash
    family, and bit-identical in any engine with md5().  One hash
    aggregate computes all k components (k mins in a single groupBy)."""
    k = k or specs.MINHASH_K
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"mh_{j}")
        for j in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str = "doc_id", k: int | None = None, band_width: int | None = None
) -> DataFrame:
    """(a, b) candidate near-duplicate pairs (a < b): documents sharing
    at least one LSH band (band = concatenation of band_width adjacent
    signature components).  The self-join runs per band value — bucket
    sizes are tiny for non-duplicate data, so this scales as the number
    of true near-dups, not |docs|²."""
    k = k or specs.MINHASH_K
    w = band_width or specs.LSH_BAND_WIDTH
    bands = [
        F.concat_ws("|", F.lit(str(b)), *[F.col(f"mh_{b * w + i}") for i in range(w)]).alias("band")
        for b in range(k // w)
    ]
    banded = sig.select(F.col(id_col), F.explode(F.array(*bands)).alias("band"))
    left = banded.select(F.col("band"), F.col(id_col).alias("a"))
    right = banded.select(F.col("band"), F.col(id_col).alias("b"))
    return (
        left.join(right, "band")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


# -- n-gram Jaccard ----------------------------------------------------
def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.0,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(a, b, jaccard) over candidate pairs (default: LSH candidates).

    jaccard = |Sa ∩ Sb| / |Sa ∪ Sb| over distinct word-shingle sets,
    computed distributively: shingle-join for the intersection size,
    plus per-doc set sizes — no arrays collected to the driver."""
    sh = shingles(docs, id_col, text_col).cache()
    if candidates is None:
        candidates = lsh_candidate_pairs(minhash_signatures(sh, id_col), id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    # intersection size: join shingles of a with shingles of b on value
    sa = sh.select(F.col(id_col).alias("a"), "shingle")
    sb = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        candidates.join(sa, "a").join(sb, ["b", "shingle"]).groupBy("a", "b").agg(
            F.count(F.lit(1)).alias("n_inter")
        )
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b")), "b")
        .select(
            "a",
            "b",
            (F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def jaccard_all_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.0,
) -> DataFrame:
    """(a, b, jaccard) for EVERY pair sharing ≥1 shingle (a < b).

    One shingle self-join + count gives the intersection sizes
    directly — the same result as feeding the shared-shingle candidate
    pairs to :func:`jaccard_pairs`, which would re-join the shingle
    table twice more (measured ~3× the shuffled bytes).  Skew note: a
    stop-word shingle shared by k docs contributes k² join rows in any
    all-pairs formulation; at scale, cap or drop top-frequency shingles
    BEFORE this join (the LSH path in :func:`jaccard_pairs` is the
    10^12-document route)."""
    sh = shingles(docs, id_col, text_col).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col(id_col).alias("a"), "shingle")
    sb = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b")), "b")
        .select(
            "a",
            "b",
            (F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )


def near_duplicate_groups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    max_rounds: int = 50,
) -> DataFrame:
    """End-to-end near-dup assignment — the full MinHash→LSH→verify→
    group pipeline a training-data run needs:

      1. LSH candidate pairs (banded MinHash self-join),
      2. exact n-gram Jaccard verification at ``threshold``,
      3. connected components over the surviving similarity graph
         (min-label propagation — duplicate clusters are transitive),
      4. canonical id = min doc_id of the component.

    Returns (doc_id, canonical_id, is_duplicate).  The component loop
    runs on the tiny verified-pair graph (size ~ true duplicates, not
    |docs|), so rounds are cheap and few; at 100TB the heavy stages are
    the two shuffles in steps 1-2, both bounded by banding.
    """
    sh = shingles(docs, id_col, text_col).cache()
    cand = lsh_candidate_pairs(minhash_signatures(sh, id_col), id_col)
    verified = jaccard_pairs(docs, id_col, text_col, threshold=threshold,
                             candidates=cand).select("a", "b")
    sym = verified.unionByName(
        verified.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).transform(stats_barrier)
    comp = (
        sym.select(F.col("a").alias(id_col))
        .distinct()
        .select(id_col, F.col(id_col).alias("comp"))
        .transform(stats_barrier)
    )
    for _ in range(max_rounds):
        msgs = (
            sym.join(comp, sym["a"] == comp[id_col])
            .groupBy(F.col("b").alias(id_col))
            .agg(F.min("comp").alias("mc"))
        )
        nxt = comp.join(msgs, id_col, "left").select(
            comp[id_col],
            F.least(F.col("comp"), F.coalesce("mc", F.col("comp"))).alias("comp"),
            (F.coalesce("mc", F.col("comp")) < F.col("comp")).alias("_ch"),
        ).transform(stats_barrier)
        changed = nxt.agg(F.sum(F.col("_ch").cast("long"))).collect()[0][0] or 0
        comp = nxt.select(id_col, "comp")
        if changed == 0:
            break
    canon = comp.groupBy("comp").agg(F.min(id_col).alias("canonical_id"))
    grouped = comp.join(canon, "comp").select(id_col, "canonical_id")
    return (
        docs.select(id_col)
        .join(grouped, id_col, "left")
        .select(
            id_col,
            F.coalesce("canonical_id", F.col(id_col)).alias("canonical_id"),
            (F.coalesce("canonical_id", F.col(id_col)) != F.col(id_col)).alias(
                "is_duplicate"
            ),
        )
    )


# -- SimHash -----------------------------------------------------------
def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int | None = None) -> DataFrame:
    """(doc_id, simhash long): n-bit SimHash over distinct tokens.

    Bit j of token t is extracted from md5(t)'s hex digits with pure
    arithmetic (digit value via instr into '0123456789abcdef'), so the
    identical computation runs in DuckDB for the oracle.  The per-doc
    reduction (sum of ±1 per bit, then sign) is one hash aggregate with
    ``bits`` sum expressions."""
    bits = bits or specs.SIMHASH_BITS
    tok = docs.select(F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("t"))
    h = F.md5(F.col("t"))
    digit_chars = "0123456789abcdef"
    cols = []
    for j in range(bits):
        hex_pos = j // 4 + 1  # 1-based position in the hex string
        bit_in_digit = j % 4
        d = F.instr(F.lit(digit_chars), F.substring(h, hex_pos, 1)) - 1
        bit = F.floor(d / (2 ** bit_in_digit)) % 2
        cols.append(F.sum(bit * 2 - 1).alias(f"s{j}"))
    sums = tok.groupBy(id_col).agg(*cols)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select(F.col(id_col), fp.cast("long").alias("simhash"))


def simhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int | None = None,
) -> DataFrame:
    """(a, b, hamming) pairs with Hamming distance ≤ max_hamming.

    Candidate generation: split the fingerprint into (max_hamming+1)
    chunks — any pair within distance max_hamming shares ≥1 exact chunk
    (pigeonhole), so candidates come from chunk-equality self-joins,
    never an all-pairs scan."""
    bits = bits or specs.SIMHASH_BITS
    sh = simhash(docs, id_col, text_col, bits).cache()
    n_chunks = max_hamming + 1
    width = bits // n_chunks
    chunks = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(c)),
                (F.shiftright(F.col("simhash"), c * width) % (2**width)).cast("string"),
            )
            for c in range(n_chunks)
        ]
    )
    keyed = sh.select(F.col(id_col), F.col("simhash"), F.explode(chunks).alias("ck"))
    a = keyed.select(F.col("ck"), F.col(id_col).alias("a"), F.col("simhash").alias("ha"))
    b = keyed.select(F.col("ck"), F.col(id_col).alias("b"), F.col("simhash").alias("hb"))
    cand = a.join(b, "ck").where(F.col("a") < F.col("b")).select("a", "b", "ha", "hb").distinct()
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select("a", "b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


# -- segment-level (CCNet-style line/boilerplate) dedup ----------------
def segment_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 5,
    max_doc_freq: int = 1,
) -> DataFrame:
    """CCNet-style segment-level dedup / boilerplate removal.

    Splits each document into consecutive non-overlapping windows of
    ``seg_tokens`` whitespace tokens ("segments" — the stand-in for
    newline-delimited paragraphs, which the synthetic corpus lacks),
    counts how many DISTINCT documents each exact segment occurs in,
    drops every segment present in more than ``max_doc_freq`` documents
    (the classic "remove lines duplicated across documents" boilerplate
    rule from CCNet / Gopher pipelines), and reassembles the surviving
    segments in document order.

    Returns (doc_id, clean_text, kept_segs, dropped_segs) for documents
    that retain at least one segment.

    Scale notes (100TB): two shuffles — the segment-frequency groupBy
    (map-side partial aggregation collapses repeated boilerplate before
    the exchange, which is also the skew story: a segment shared by 10^9
    docs arrives at the reducer as one partial count per map partition)
    and the per-document reassembly groupBy. The frequency join keys on
    the segment string for exactness; at petabyte scale key on
    ``xxhash64(seg)`` instead (64-bit keys, collision risk ≈ n²/2⁶⁴).
    Everything is JVM-side column expressions — no Python in the path.
    """
    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_ts")
    )
    n_segs = F.ceil(F.size("_ts") / F.lit(float(seg_tokens))).cast("int")
    segs = toks.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_segs - 1),
                lambda i: F.array_join(
                    F.slice("_ts", i * seg_tokens + 1, seg_tokens), " "
                ),
            )
        ).alias("seg_pos", "seg"),
    )
    freq = segs.groupBy("seg").agg(
        F.count_distinct(F.col(id_col)).alias("_df")
    )
    flagged = segs.join(freq, "seg").select(
        F.col(id_col),
        "seg_pos",
        "seg",
        (F.col("_df") <= max_doc_freq).alias("_keep"),
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_keep"), F.struct("seg_pos", "seg"))
                )
            ).alias("_kept"),
            F.sum(F.when(~F.col("_keep"), 1).otherwise(0)).alias("dropped_segs"),
        )
        .where(F.size("_kept") > 0)
        .select(
            id_col,
            F.array_join(
                F.transform("_kept", lambda s: s["seg"]), " "
            ).alias("clean_text"),
            F.size("_kept").alias("kept_segs"),
            F.col("dropped_segs").cast("long").alias("dropped_segs"),
        )
    )


# -- duplicate spans (exact-substring dedup signal) ---------------------
def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int | None = None,
    min_docs: int | None = None,
) -> DataFrame:
    """Per-document exact-substring duplication signal (the corpus-level
    dedup of Lee et al. 2022, at k-token granularity): every position
    yields the md5 of its k-token span; a span hash held by >=
    ``min_docs`` DISTINCT documents is corpus-duplicated.

    Returns (id, n_spans, n_dup_spans, dup_frac) for EVERY input doc —
    docs shorter than k tokens have n_spans = 0, dup_frac = 0.0.

    Scale (100 TB): one shuffle — groupBy on the 32-byte span hash with
    map-side partial counts (count_distinct over doc_id rewrites to a
    two-level aggregate) — then one hash join back to the positioned
    spans.  No self-join anywhere, so a boilerplate span shared by a
    million documents costs one aggregate row, not 10^12 pairs.
    Reference parity: the reference has no substring dedup; this is the
    training-pipeline extension grounded in the paper's method.
    """
    k = k or specs.DUP_SPAN_K
    min_docs = min_docs or specs.DUP_SPAN_MIN_DOCS
    # token array materialized first — see shingles() for why
    base = docs.select(F.col(id_col), tokens(text_col).alias("_t"))
    t = F.col("_t")
    span_arr = F.when(
        F.size(t) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - k),
            lambda i: F.md5(F.concat_ws(" ", F.slice(t, i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    spans = base.select(F.col(id_col), F.explode_outer(span_arr).alias("span"))
    dup = (
        spans.where(F.col("span").isNotNull())
        .groupBy("span")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("span", F.lit(1).alias("_dup"))
    )
    n_spans = F.count(F.col("span"))
    n_dup = F.count(F.col("_dup"))
    return (
        spans.join(dup, "span", "left")
        .groupBy(id_col)
        .agg(
            n_spans.alias("n_spans"),
            n_dup.alias("n_dup_spans"),
            F.round(
                F.count(F.col("_dup")).cast("double")
                / F.greatest(F.count(F.col("span")), F.lit(1)),
                8,
            ).alias("dup_frac"),
        )
    )
