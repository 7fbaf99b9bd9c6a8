"""Text-analysis ops for large-scale training-data pipelines.

All pure DataFrame expressions — JVM-side, whole-stage-codegen'd, no
Python in the hot path.  Tokenization model: whitespace split of the
trimmed text (specs.TOKEN_SPLIT_RE).  Every op has a DuckDB-equivalent
oracle in ``__spark_entry__.py`` built from the same specs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.functions import specs


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), specs.TOKEN_SPLIT_RE)


def token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(tokens(c))
    ).cast("long")


BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_tokens(col: Column | str) -> Column:
    """BPE-ish pre-tokenization (GPT-2-style shape, simplified to a
    portable regex): letter runs, single digits, single punctuation
    marks.  ``regexp_extract_all`` keeps it JVM-side; DuckDB runs the
    identical pattern for the oracle."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0)


def bpe_token_count(col: Column | str) -> Column:
    return F.size(bpe_tokens(col)).cast("long")


def normalized(col: Column | str) -> Column:
    """Canonical text: lowercase, whitespace collapsed to single spaces."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    md5 is identical across Spark and DuckDB, making this fingerprint a
    portable dedup key (and the oracle-parity anchor)."""
    return F.md5(normalized(col))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + score.

    Columns added: n_chars, n_tokens, avg_token_len, stopword_ratio,
    uniq_token_ratio, quality_score.  The score is a fixed linear blend
    — the point is deterministic, cheap, fully-columnar scoring at
    100TB (a pre-filter before expensive model-based scoring).
    """
    t = tokens(text_col)
    n_tok = token_count(text_col)
    stop_arr = F.array(*[F.lit(s) for s in specs.STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    n_uniq = F.size(F.array_distinct(t))
    safe_tok = F.greatest(n_tok, F.lit(1))
    return docs.select(
        "*",
        F.length(F.col(text_col)).cast("long").alias("n_chars_m"),
        n_tok.alias("n_tokens"),
        (F.length(F.col(text_col)) / safe_tok).alias("avg_token_len"),
        (n_stop / safe_tok).alias("stopword_ratio"),
        (n_uniq / safe_tok).alias("uniq_token_ratio"),
    ).withColumn(
        "quality_score",
        (
            0.4 * F.least(F.col("n_tokens") / 50.0, F.lit(1.0))
            + 0.3 * F.col("uniq_token_ratio")
            + 0.3 * F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
        ),
    )


def redact(col: Column | str) -> Column:
    """PII-style scrub (the C4/RefinedWeb pre-training step): replace
    urls, then emails, then 6+-digit runs with fixed tokens — strictly
    in that order, since urls contain digits and host-only emails.
    Pure JVM-side regexp chain; specs.REDACT_* patterns are RE2-safe so
    the DuckDB oracle applies the identical pipeline."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.regexp_replace(c, specs.REDACT_URL_RE, specs.REDACT_TOKENS["url"])
    t = F.regexp_replace(t, specs.REDACT_EMAIL_RE, specs.REDACT_TOKENS["email"])
    return F.regexp_replace(t, specs.REDACT_NUM_RE, specs.REDACT_TOKENS["num"])


def redaction_counts(col: Column | str) -> tuple[Column, Column, Column]:
    """(n_urls, n_emails, n_nums), counted on the same intermediate
    strings the redaction chain produces (so an email inside a url is
    counted once, as a url)."""
    c = F.col(col) if isinstance(col, str) else col
    n_urls = F.regexp_count(c, F.lit(specs.REDACT_URL_RE))
    t1 = F.regexp_replace(c, specs.REDACT_URL_RE, specs.REDACT_TOKENS["url"])
    n_emails = F.regexp_count(t1, F.lit(specs.REDACT_EMAIL_RE))
    t2 = F.regexp_replace(t1, specs.REDACT_EMAIL_RE, specs.REDACT_TOKENS["email"])
    n_nums = F.regexp_count(t2, F.lit(specs.REDACT_NUM_RE))
    return n_urls, n_emails, n_nums


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition features per document (the n=2/n=3
    analogues of Rae et al.'s repetitious-text filters):

    - ``top_bigram_frac``: share of all word-bigram occurrences taken by
      the single most frequent bigram (0 when < 2 tokens);
    - ``dup_trigram_frac``: fraction of word-trigram occurrences that
      are duplicates, ``1 - distinct/total`` (0 when < 3 tokens).

    Plan shape for 100 TB: ONE posexplode of the token array, a window
    ``lead`` to form bigrams/trigrams (shuffle keyed by doc), then hash
    aggregates with map-side partial aggregation — no UDF, no per-row
    quadratic work.  (A per-row ``transform(..., tok[i+1])`` lambda was
    measured O(tokens²): Catalyst's project-collapse re-inlines the
    regex split into every element access.)
    """
    from pyspark.sql.window import Window

    t = tokens(text_col)
    tok = F.when(F.length(F.trim(F.col(text_col))) == 0, F.array()).otherwise(t)
    w = Window.partitionBy(id_col).orderBy("pos")
    grams = (
        docs.select(F.col(id_col), F.posexplode(tok).alias("pos", "w0"))
        .select(
            F.col(id_col),
            "w0",
            F.lead("w0", 1).over(w).alias("w1"),
            F.lead("w0", 2).over(w).alias("w2"),
        )
        .select(
            F.col(id_col),
            F.when(
                F.col("w1").isNotNull(), F.concat_ws(" ", "w0", "w1")
            ).alias("bg"),
            F.when(
                F.col("w2").isNotNull(), F.concat_ws(" ", "w0", "w1", "w2")
            ).alias("tg"),
        )
    )
    top = (
        grams.where(F.col("bg").isNotNull())
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg((F.max("c") / F.sum("c")).alias("top_bigram_frac"))
    )
    tri = (
        grams.where(F.col("tg").isNotNull())
        .groupBy(id_col)
        .agg(
            (1.0 - F.count_distinct(F.col("tg")) / F.count(F.lit(1))).alias(
                "dup_trigram_frac"
            )
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(top, id_col, "left")
        .join(tri, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
            F.coalesce("dup_trigram_frac", F.lit(0.0)).alias("dup_trigram_frac"),
        )
    )


def length_quantiles(
    docs: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "lang",
    ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Exact per-group quantiles of a numeric column (the corpus
    length-distribution diagnostic every filtering decision starts
    from).  Uses Spark's exact ``percentile`` (linear interpolation at
    rank p·(n−1) — the same definition as DuckDB's ``quantile_cont``,
    so the oracle matches bitwise-to-8dp).  Exact percentile shuffles
    each group's values to its reducer: fine for grouped stats where
    |group| ≪ corpus (languages, sources); for a single global quantile
    at 100 TB prefer approx_percentile.

    Returns (group, p, value) one row per group × p.
    """
    arr = ", ".join(f"CAST({p} AS DOUBLE)" for p in ps)
    q = docs.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, array({arr}))").alias("qs")
    )
    pcol = F.array(*[F.lit(float(p)) for p in ps])
    return (
        q.select(group_col, F.posexplode("qs").alias("i", "v"))
        .select(
            group_col,
            F.element_at(pcol, F.col("i") + 1).alias("p"),
            F.round("v", 8).alias("value"),
        )
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """N-gram-free language ID: count marker-stopword hits per language,
    argmax with (count desc, lang asc) tie-break; no hits → 'und'.

    Plan: explode tokens → broadcast-join the tiny marker table →
    two hash aggregates.  No UDF, no shuffle beyond the groupBys.
    """
    spark = docs.sparkSession
    markers = spark.createDataFrame(
        [(lang, w) for lang, ws in specs.LANG_MARKERS.items() for w in ws],
        "cand_lang string, word string",
    )
    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("word"))
    scores = (
        tok.join(F.broadcast(markers), "word")
        .groupBy(id_col, "cand_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    # min(struct(-hits, lang)) == most hits, ties → smaller lang code
    picked = scores.groupBy(id_col).agg(
        F.min(F.struct((-F.col("hits")).alias("neg"), F.col("cand_lang").alias("l"))).alias("top")
    ).select(id_col, F.col("top.l").alias("pred_lang"))
    return docs.select(id_col).join(picked, id_col, "left").select(
        id_col, F.coalesce("pred_lang", F.lit("und")).alias("pred_lang")
    )


def chunk_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int | None = None,
    overlap: int | None = None,
) -> DataFrame:
    """(id, chunk_id, chunk_text, n_chunk_tokens): fixed-size token
    windows with overlap — the context-window chunking every RAG /
    eval-slice pipeline applies before embedding or scoring.

    chunk i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the last chunk may be short; a doc
    with <= chunk_tokens tokens yields exactly one chunk (its whole
    text, empty docs included).

    Scale (100 TB): zero shuffles — one array expression (sequence →
    transform → slice) pipelined with the scan; output rows ≈ input
    tokens / stride, so the fan-out is bounded and linear.
    """
    c = chunk_tokens or specs.CHUNK_TOKENS
    o = specs.CHUNK_OVERLAP if overlap is None else overlap
    stride = c - o
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    # token array materialized first (dedup.shingles has the why: an
    # inline split() expression re-evaluates per lambda element)
    base = docs.select(F.col(id_col), tokens(text_col).alias("_t"))
    t = F.col("_t")
    n = F.size(t)
    # m = 1 + ceil(max(n - c, 0) / stride), integer arithmetic
    m = F.lit(1) + F.floor(
        (F.greatest(n - c, F.lit(0)) + F.lit(stride - 1)) / F.lit(stride)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), m - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.slice(t, i * stride + 1, c)).alias("chunk_text"),
            F.least(F.lit(c), n - i * stride).cast("long").alias("n_chunk_tokens"),
        ),
    )
    return base.select(F.col(id_col), F.explode(chunks).alias("ch")).select(
        id_col, "ch.chunk_id", "ch.chunk_text", "ch.n_chunk_tokens"
    )
