"""Hashed-n-gram linear text classifier (fastText architecture:
hashing-trick embedding buckets -> mean -> linear layer -> sigmoid),
fully columnar.

The production pattern at 100 TB: a LEARNED weight vector (|B| floats)
is broadcast to executors and the per-document score is a pure array
expression over the token list — zero shuffles, whole-stage codegen,
no Python in the hot path.  Here the weight for bucket b is derived
from md5 (w(b) = 2*u(b) - 1 with u the 48-bit md5 uniform), which
keeps the weights bit-identical in the DuckDB oracle; swapping in
learned weights changes one lambda, not the plan.

Reference parity: the reference has no model-based quality scoring;
this is the training-pipeline extension (CCNet / fastText-style
quality filtering) the build brief asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.functions import specs
from graphscope_spark.functions.sampling import HEX_DIGITS
from graphscope_spark.functions.text import tokens


def _bucket(tok: Column, buckets: int, seed: int) -> Column:
    """Hashing-trick bucket id for a token: first 4 md5 hex digits
    (16 bits) mod |B| — identical digit arithmetic in DuckDB."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), tok))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % buckets


def _weight(bucket: Column, seed: int) -> Column:
    """Deterministic weight in (-1, 1) for a bucket id: 2*u - 1 with
    u = (first-48-md5-bits + 0.5) / 2^48 of 'w{seed}:' || bucket."""
    h = F.md5(F.concat(F.lit(f"w{seed}:"), bucket.cast("string")))
    b = None
    for i in range(12):
        d = (F.instr(F.lit(HEX_DIGITS), F.substring(h, i + 1, 1)) - 1).cast("long")
        b = d if b is None else b * 16 + d
    u = (b.cast("double") + F.lit(0.5)) / F.lit(float(1 << 48))
    return u * 2.0 - 1.0


def quality_classifier(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int | None = None,
    seed: int | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """(id, n_tokens, cls_score, cls_keep): sigmoid(mean bucket weight)
    over the document's tokens — the fastText scoring pass as one
    Catalyst expression.

    The mean is rounded to 8 decimals BEFORE the sigmoid (and the score
    after) so Spark's in-array left-to-right fold and the oracle's
    row-wise SUM agree exactly despite float addition order.

    Scale (100 TB): no shuffle at all — per-row array fold, pipelined
    with the scan; the weight table is implicit (hash-derived) or a
    broadcast array when learned.
    """
    buckets = buckets or specs.QCLS_BUCKETS
    seed = specs.QCLS_SEED if seed is None else seed
    thr = specs.QCLS_THRESHOLD if threshold is None else threshold
    t = tokens(text_col)
    wsum = F.aggregate(
        t,
        F.lit(0.0),
        lambda acc, tok: acc + _weight(_bucket(tok, buckets, seed), seed),
    )
    n_tok = F.size(t)
    mean = F.round(wsum / F.greatest(n_tok, F.lit(1)), 8)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-mean)), 8)
    return docs.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        score.alias("cls_score"),
        (score >= thr).alias("cls_keep"),
    )


def bucket_sql(tok_expr: str, buckets: int, seed: int) -> str:
    """DuckDB twin of ``_bucket`` (generated from the same specs)."""
    digits = " + ".join(
        f"(instr('{HEX_DIGITS}', substr(md5('{seed}:' || {tok_expr}), {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({digits}) % {buckets})"


def weight_sql(bucket_expr: str, seed: int) -> str:
    """DuckDB twin of ``_weight``."""
    digits = " + ".join(
        f"(instr('{HEX_DIGITS}', substr(md5('w{seed}:' || cast({bucket_expr} as varchar)), {i + 1}, 1)) - 1) * {16 ** (11 - i)}"
        for i in range(12)
    )
    return (
        f"(((cast(({digits}) as double) + 0.5) / cast({float(1 << 48)!r} as double))"
        f" * 2.0 - 1.0)"
    )


def ngram_lm_perplexity(
    docs: DataFrame,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality filter (Wenzek et al. 2020
    shape): score every document by the per-token cross-entropy of an
    add-k-smoothed BIGRAM model trained on the corpus itself —
    boilerplate-ish text (frequent bigrams) scores low, gibberish
    scores high; filter on a quantile of ``xent``.  Returns
    (doc_id, n_bigrams, xent) for docs with >= 2 tokens, where
    xent = -(1/n)·Σ log((c(w1,w2)+k) / (c(w1)+k·V)).

    A KenLM trained on a reference corpus drops in by swapping the
    count tables for its broadcast model; the plan shape is unchanged.

    Scale shape: bigram extraction is a zero-shuffle array expression,
    immediately collapsed to per-(doc, bigram) COUNTS — one shuffle on
    (doc, w1, w2) that every later stage rides: the corpus bigram and
    unigram tables are second-level aggregates of it (map-side
    partial), the per-bigram log-prob table is a bigram-vocab-sized
    join (NOT broadcast: a web-corpus bigram vocabulary is large), and
    scoring joins doc-bigram COUNTS — the distinct-bigram stream, a
    strict subset of the raw token stream — then one per-doc weighted
    aggregate.  V rides as a 1-row broadcast.  No UDF anywhere."""
    # token array materialized first (dedup.shingles has the why: an
    # inline split() expression re-evaluates per lambda element)
    base = docs.select(F.col(id_col), tokens(text_col).alias("_t"))
    t = F.col("_t")
    bigrams = base.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(t) >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - 2),
                    lambda i: F.struct(
                        F.element_at(t, i + 1).alias("w1"),
                        F.element_at(t, i + 2).alias("w2"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    doc_bg = (
        bigrams.groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    big_c = doc_bg.groupBy("w1", "w2").agg(F.sum("n").alias("c12"))
    uni_c = doc_bg.groupBy("w1").agg(F.sum("n").alias("c1"))
    vocab = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .where(F.col("w") != "")
        .agg(F.countDistinct("w").alias("v"))
    )
    lp = (
        big_c.join(uni_c, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("c12") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("v"))
            ).alias("lp"),
        )
    )
    return doc_bg.join(lp, ["w1", "w2"]).groupBy(id_col).agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        (-(F.sum(F.col("n") * F.col("lp")) / F.sum("n"))).alias("xent"),
    )


def ngram_lm_oracle_sql(k: float = 0.5) -> str:
    """DuckDB twin of ngram_lm_perplexity over the documents view."""
    return rf"""
      with toks as (
        select doc_id, regexp_split_to_array(trim(text), '\s+') as t
        from documents
      ),
      bigrams as (
        select doc_id, t[i] as w1, t[i+1] as w2
        from toks, unnest(generate_series(1, len(t)-1)) as g(i)
        where len(t) >= 2
      ),
      doc_bg as (
        select doc_id, w1, w2, count(*) as n from bigrams group by 1, 2, 3
      ),
      big_c as (select w1, w2, sum(n) as c12 from doc_bg group by 1, 2),
      uni_c as (select w1, sum(n) as c1 from doc_bg group by 1),
      vocab as (
        select count(distinct x) as v
        from (select unnest(t) as x from toks) where x <> ''
      ),
      scored as (
        select b.doc_id, b.n,
               ln((bc.c12 + {k}) / (uc.c1 + {k} * (select v from vocab))) as lp
        from doc_bg b
        join big_c bc using(w1, w2)
        join uni_c uc using(w1)
      )
      select doc_id, cast(sum(n) as bigint) as n_bigrams,
             round(-(sum(n * lp) / sum(n)), 8) as xent
      from scored group by 1
    """


def classifier_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dims: int = 32,
    seed: int = 17,
) -> DataFrame:
    """(id, dim, val): long-form hashed bag-of-tokens features — dim 0
    is the bias (val 1.0), dims 1..dims-1 are md5 token buckets with
    val = token_count/n_tokens.  Long form keeps the trainer fully
    relational (feature rows sharded by document, weights broadcast) —
    the layout a 100 TB trainer needs, and one DuckDB mirrors exactly."""
    from graphscope_spark.functions.text import token_count

    t = tokens(text_col)
    base = docs.select(F.col(id_col), t.alias("_t"), token_count(text_col).alias("_n"))
    bias = base.select(
        F.col(id_col), F.lit(0).alias("dim"), F.lit(1.0).alias("val")
    )
    feat = (
        base.select(F.col(id_col), "_n", F.explode("_t").alias("_tok"))
        .where(F.length("_tok") > 0)  # split('') yields [''] — no real token
        .select(
            F.col(id_col),
            (F.lit(1) + _bucket(F.col("_tok"), dims - 1, seed)).cast("int").alias("dim"),
            "_n",
        )
        .groupBy(id_col, "dim")
        .agg((F.count(F.lit(1)) / F.first("_n")).alias("val"))
    )
    return bias.unionByName(feat)


def train_classifier(
    docs: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    dims: int = 32,
    seed: int = 17,
    steps: int = 3,
    lr: float = 1.0,
) -> DataFrame:
    """Distributed logistic-regression trainer: full-batch gradient
    descent for ``steps`` fixed iterations from w = 0.  Returns
    (dim, weight) — the learned vector that drops into the
    quality_classifier scoring pass as a broadcast array.

    Per step (all relational, deterministic):
      z_i   = round(Σ_d w[d]·x_i[d], 8)        (broadcast join on dim)
      p_i   = σ(z_i)
      g[d]  = round(Σ_i (p_i − y_i)·x_i[d] / N, 8)   (groupBy dim)
      w[d] ← round(w[d] − lr·g[d], 8)

    The 8-decimal rounding points are the repo's cross-engine parity
    discipline (classify.py module docstring): z is rounded BEFORE the
    sigmoid so both engines exponentiate the identical double; sums
    carry only ~1e-15 order noise into an 1e-8 rounding.

    Scale shape: the feature table never moves — each step is one
    broadcast join + one |rows|→dims aggregation; the weight vector
    (dims rows) is the only state.  This is exactly how the "learned
    weights" the scoring pass broadcasts get produced at corpus scale.
    """
    spark = docs.sparkSession
    xs = classifier_features(docs, id_col, text_col, dims, seed).localCheckpoint(
        eager=True
    )
    lab = docs.select(F.col(id_col), label.cast("double").alias("_y")).localCheckpoint(
        eager=True
    )
    n_docs = lab.count()
    w = spark.createDataFrame(
        [(d, 0.0) for d in range(dims)], "dim int, weight double"
    )
    for _ in range(steps):
        z = (
            xs.join(F.broadcast(w), "dim")
            .groupBy(id_col)
            .agg(F.round(F.sum(F.col("val") * F.col("weight")), 8).alias("_z"))
        )
        err = lab.join(z, id_col, "left").select(
            F.col(id_col),
            (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.coalesce("_z", F.lit(0.0))))
                - F.col("_y")
            ).alias("_e"),
        )
        grad = (
            xs.join(err, id_col)
            .groupBy("dim")
            .agg(F.round(F.sum(F.col("val") * F.col("_e")) / n_docs, 8).alias("_g"))
        )
        w = (
            w.join(grad, "dim", "left")
            .select(
                "dim",
                F.round(
                    F.col("weight") - lr * F.coalesce("_g", F.lit(0.0)), 8
                ).alias("weight"),
            )
            .localCheckpoint(eager=True)
        )
    return w


def train_classifier_oracle_sql(
    label_sql: str,
    dims: int = 32,
    seed: int = 17,
    steps: int = 3,
    lr: float = 1.0,
) -> str:
    """DuckDB twin of train_classifier over the ``documents`` view.
    ``label_sql``: boolean/0-1 expression over documents columns."""
    bucket = bucket_sql("tok", dims - 1, seed)
    parts = [
        rf"""with toks as (
          select doc_id,
                 case when length(trim(text)) = 0 then []::varchar[]
                      else regexp_split_to_array(trim(text), '\s+') end as t
          from documents
        )""",
        rf"""xs as materialized (
          select doc_id, 0 as dim, 1.0 as val from documents
          union all
          select doc_id, dim, cast(count(*) as double) / any_value(n) as val
          from (
            select doc_id, 1 + {bucket} as dim, len(t) as n
            from (select doc_id, unnest(t) as tok, t from toks)
          ) group by doc_id, dim
        )""",
        f"""lab as materialized (
          select doc_id, cast({label_sql} as double) as y from documents
        )""",
        "nn as materialized (select cast(count(*) as double) as n from lab)",
        f"""w0 as materialized (
          select unnest(generate_series(0, {dims - 1})) as dim, 0.0 as weight
        )""",
    ]
    for k in range(steps):
        parts.append(
            f"""z{k} as materialized (
              select doc_id, round(sum(val * weight), 8) as z
              from xs join w{k} using(dim) group by doc_id
            )"""
        )
        parts.append(
            f"""e{k} as materialized (
              select l.doc_id,
                     1.0 / (1.0 + exp(-coalesce(z.z, 0.0))) - l.y as e
              from lab l left join z{k} z using(doc_id)
            )"""
        )
        parts.append(
            f"""g{k} as materialized (
              select dim, round(sum(val * e) / (select n from nn), 8) as g
              from xs join e{k} using(doc_id) group by dim
            )"""
        )
        parts.append(
            f"""w{k + 1} as materialized (
              select w.dim,
                     round(w.weight - {lr!r} * coalesce(g.g, 0.0), 8) as weight
              from w{k} w left join g{k} g using(dim)
            )"""
        )
    return ",\n".join(parts) + f"\nselect dim, weight from w{steps}"
