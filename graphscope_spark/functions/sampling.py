"""Deterministic corpus sampling, splitting, packing, contamination —
the selection/arrangement stage of a training-data pipeline, downstream
of the gates in ``corpus.py``.

Reference analog: the loader-side sampling hooks of the learning engine
(graph-learn negative/neighbor samplers seed per-worker RNG); as with
walks (algorithms/walks.py), per-worker RNG is not reproducible across
engines, so every "random" choice here is an explicit md5-derived
bucket — Spark and the DuckDB oracle compute bit-identical decisions.

Scale notes (the point of each design):

* ``hash_bucket`` / ``corpus_split`` / ``quality_resample`` are pure
  column expressions — no shuffle, no state; they collapse into the
  scan and survive any corpus size.
* ``contamination`` joins document shingles against the BENCHMARK
  shingle set, which is small by nature (evaluation suites are MBs,
  corpora are TBs) — broadcast it; the corpus side is never shuffled.
* ``pack_sequences`` is the GPT-style concatenate-and-chunk packing.
  A single global token stream would serialize on one ordered window;
  instead the corpus is sharded deterministically (``doc_id % shards``)
  and each shard packs its own stream — shards are independent, so the
  window sort is per-shard and the whole op is one shuffle.  At 100 TB
  you raise ``shards`` to keep each shard's window in one task's
  memory; bins are (shard, bin) pairs, globally unique.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphscope_spark.functions.dedup import shingles
from graphscope_spark.functions.text import token_count

HEX_DIGITS = "0123456789abcdef"
BUCKETS = 65536  # 4 md5 hex digits


def hash_bucket(col: Column | str, seed: int = 0) -> Column:
    """Deterministic bucket in [0, 65536): the first 4 hex digits of
    md5(seed ':' value) via pure digit arithmetic (instr into the hex
    alphabet) — the identical expression runs in DuckDB, so sampling
    decisions replay exactly cross-engine."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(F.lit(f"{seed}:"), c.cast("string")))
    b = None
    for i in range(4):
        d = F.instr(F.lit(HEX_DIGITS), F.substring(h, i + 1, 1)) - 1
        b = d if b is None else b * 16 + d
    return b.cast("long")


def corpus_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    seed: int = 11,
) -> DataFrame:
    """Adds a ``split`` column: deterministic hash split of the corpus
    into named fractions (thresholds are floor(cum_fraction * 65536),
    so the split is exact integer arithmetic — no float boundary can
    flip a document between engines).  Pure column expression."""
    total = sum(f for _, f in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    b = hash_bucket(id_col, seed)
    expr = None
    cum = 0.0
    for name, frac in fractions[:-1]:
        cum += frac
        thr = int(cum * BUCKETS)
        cond = b < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = fractions[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return docs.withColumn("split", expr)


def quality_resample(
    scored: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality_score",
    seed: int = 13,
) -> DataFrame:
    """Deterministic importance sampling: keep each row with
    probability equal to its score in [0, 1] (Bernoulli-by-quality —
    the standard way to temperature a training mix without a global
    sort).  Kept iff hash_bucket < floor(score * 65536); the score is
    pre-rounded to 8 decimals by the scoring ops, and the multiply is
    one exact IEEE op, so the floor is engine-stable."""
    keep = hash_bucket(id_col, seed) < F.floor(
        F.col(score_col) * F.lit(BUCKETS)
    ).cast("long")
    return scored.where(keep)


def domain_mix(
    docs: DataFrame,
    alpha: float = 0.7,
    domain_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 29,
) -> DataFrame:
    """Temperature-based domain mixture sampling (the Pile / LLaMA
    corpus-mixing step): re-weight the corpus so the per-domain share
    follows count^alpha instead of raw count.  alpha=1 keeps the
    natural distribution, alpha=0 equalizes all domains, alpha in
    (0, 1) downsamples dominant domains toward balance.

    Realized as a per-row Bernoulli with domain acceptance rate
    ``(c_min / c_d) ** (1 - alpha)`` (the smallest domain keeps
    everything, a domain k-times larger keeps ``k^(alpha-1)`` of its
    rows), decided by the deterministic md5 bucket — bit-replayable in
    any engine.  The only float op is one ``pow``, rounded to 8
    decimals before the 1/65536-granular floor, so the keep decision is
    engine-stable (same argument as ``quality_resample``).

    Scale shape: one partial-agg groupBy on the domain key (output =
    #domains rows — safe however skewed the corpus), a 1-row min
    broadcast, a broadcast join of the rate table back onto the corpus
    (the corpus itself is never shuffled), and a scan-level filter.

    Returns the kept rows as (id, domain, domain_rate).
    """
    counts = docs.groupBy(domain_col).agg(F.count(F.lit(1)).alias("dcount"))
    cmin = counts.agg(F.min("dcount").alias("cmin"))
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        domain_col,
        F.round(
            F.pow(
                F.col("cmin").cast("double") / F.col("dcount").cast("double"),
                F.lit(1.0 - alpha),
            ),
            8,
        ).alias("domain_rate"),
    )
    keep = hash_bucket(id_col, seed) < F.floor(
        F.col("domain_rate") * F.lit(BUCKETS)
    ).cast("long")
    return (
        docs.join(F.broadcast(rates), domain_col)
        .where(keep)
        .select(id_col, domain_col, "domain_rate")
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int | None = None,
) -> DataFrame:
    """(doc_id, hit_shingles): corpus documents sharing at least one
    n-word shingle with the BENCHMARK document set — the standard
    eval-set decontamination scan.  The benchmark shingle set is tiny
    relative to the corpus and is broadcast; the corpus side streams
    through one shuffle-free join + one aggregation."""
    bench_sh = (
        shingles(benchmark, id_col=id_col, text_col=text_col, n=n)
        .select("shingle")
        .distinct()
    )
    doc_sh = shingles(docs, id_col=id_col, text_col=text_col, n=n)
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hit_shingles"))
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
    shards: int = 8,
) -> DataFrame:
    """(doc_id, shard, bin, n_tokens): concatenate-and-chunk sequence
    packing.  Documents are sharded by ``doc_id % shards``; within a
    shard the token stream is concatenated in ``doc_id`` order and
    chunked every ``budget`` tokens — a document's bin is the chunk its
    FIRST token lands in.  (shard, bin) is the globally-unique pack id.
    One shuffle (the per-shard window); shards scale the sort."""
    base = docs.select(
        F.col(id_col),
        (F.col(id_col) % shards).cast("long").alias("shard"),
        token_count(text_col).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col,
        "shard",
        F.floor(cum_before / budget).cast("long").alias("bin"),
        "n_tokens",
    )


def hash_uniform(col: Column | str, seed: int = 0) -> Column:
    """Deterministic uniform in (0, 1): the first 12 md5 hex digits as
    a 48-bit integer, mapped to (h + 0.5) / 2**48.  48 + 1 fraction
    bits fit a double exactly and the divisor is a power of two, so the
    value is bit-identical in any IEEE engine (the DuckDB oracle runs
    the same digit arithmetic)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(F.lit(f"{seed}:"), c.cast("string")))
    b = None
    for i in range(12):
        d = (F.instr(F.lit(HEX_DIGITS), F.substring(h, i + 1, 1)) - 1).cast("long")
        b = d if b is None else b * 16 + d
    return (b.cast("double") + F.lit(0.5)) / F.lit(float(1 << 48))


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES): key = ln(u_i) / w_i with u_i = hash_uniform(id), keep the k
    LARGEST keys.  Inclusion probability is proportional to weight at
    the margin; the whole draw is one deterministic expression + a
    distributed top-k (TakeOrderedAndProject) — no RNG state, no
    collect, replayable on any engine.

    Rows with weight <= 0 are excluded (they can never be drawn).
    Returns (id, weight, es_key, rank); ties (key desc, id asc).
    """
    w = F.col(weight_col).cast("double")
    key = F.log(hash_uniform(F.col(id_col), seed)) / w
    scored = docs.where(w > 0).select(
        F.col(id_col), w.alias("weight"), key.alias("es_key")
    )
    top = scored.orderBy(F.col("es_key").desc(), F.col(id_col).asc()).limit(k)
    win = Window.orderBy(F.col("es_key").desc(), F.col(id_col).asc())
    return top.select(
        id_col,
        "weight",
        F.round("es_key", 8).alias("es_key"),
        F.row_number().over(win).alias("rank"),
    )


def hash_uniform_sql(expr: str, seed: int = 0) -> str:
    """DuckDB twin of ``hash_uniform`` (generated, shared constants)."""
    digits = " + ".join(
        f"(instr('{HEX_DIGITS}', substr(md5('{seed}:' || cast({expr} as varchar)), {i + 1}, 1)) - 1) * {16 ** (11 - i)}"
        for i in range(12)
    )
    return (
        f"((cast(({digits}) as double) + 0.5)"
        f" / cast({float(1 << 48)!r} as double))"
    )
