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
