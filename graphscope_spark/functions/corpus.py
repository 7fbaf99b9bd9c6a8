"""End-to-end training-corpus selection — the composition the other
``functions/`` ops exist for: language gate → quality gate → repetition
gate → exact dedup, producing the retained document set a pretraining
pipeline would feed to tokenization.

Analog of the reference's loader-side pipeline role (raw tables →
computation-ready form, ``arrow_fragment_loader.h``), applied to the
training-data domain per the build brief.  Every stage is a pure
DataFrame transform; the whole selection is one Catalyst plan — filters
collapse into the scans, the only shuffles are the language/bigram
aggregates and the dedup groupBy, all with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.functions import specs
from graphscope_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_features,
    repetition_features,
)


def training_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str | None = None,
    min_quality: float | None = None,
    max_top_bigram: float | None = None,
    max_dup_trigram: float | None = None,
) -> DataFrame:
    """Retained training documents: (doc_id, n_tokens, quality_score).

    Keeps documents that (1) language-ID to ``lang``, (2) score at least
    ``min_quality``, (3) pass both repetition gates, and (4) survive
    exact dedup — the smallest ``doc_id`` per normalized-text
    fingerprint wins, and only competes against other documents that
    passed gates 1-3 (dedup last, so a filtered-out duplicate cannot
    shadow a kept one).
    """
    lang = specs.CORPUS_LANG if lang is None else lang
    min_quality = specs.CORPUS_MIN_QUALITY if min_quality is None else min_quality
    max_top_bigram = (
        specs.CORPUS_MAX_TOP_BIGRAM if max_top_bigram is None else max_top_bigram
    )
    max_dup_trigram = (
        specs.CORPUS_MAX_DUP_TRIGRAM if max_dup_trigram is None else max_dup_trigram
    )

    quality = quality_features(docs, text_col=text_col).select(
        id_col, "n_tokens", "quality_score"
    )
    langs = lang_id(docs, id_col=id_col, text_col=text_col)
    reps = repetition_features(docs, id_col=id_col, text_col=text_col)
    fps = docs.select(F.col(id_col), fingerprint(text_col).alias("fp"))

    passed = (
        quality.join(langs, id_col)
        .join(reps, id_col)
        .where(
            # gates compare 8-decimal-rounded features: double arithmetic
            # can differ in the last ulps across engines (and summation
            # orders), and a boundary document must not flip in or out
            (F.col("pred_lang") == lang)
            & (F.round("quality_score", 8) >= min_quality)
            & (F.round("top_bigram_frac", 8) <= max_top_bigram)
            & (F.round("dup_trigram_frac", 8) <= max_dup_trigram)
        )
        .join(fps, id_col)
    )
    # dedup as ONE window pass (min doc_id per fingerprint) — a
    # groupBy-then-semi-join would recompute the whole gate pipeline
    # (lang explode + bigram aggregates) a second time
    from pyspark.sql.window import Window

    return (
        passed.withColumn("_min", F.min(id_col).over(Window.partitionBy("fp")))
        .where(F.col(id_col) == F.col("_min"))
        .select(id_col, "n_tokens", "quality_score")
    )


def host_reputation(
    docs: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "source",
    min_quality: float | None = None,
) -> DataFrame:
    """Host-level quality gate (the URL/domain-reputation filter every
    web-scale corpus applies before per-document scoring — cheap,
    because one aggregate covers millions of pages per host).

    Per host: document count + mean quality_score; each document gets
    its host's aggregates and keep = host_quality >= min_quality.

    Scale (100 TB): one groupBy on the host key (heavily skewed —
    large hosts — but it is an AVG, so map-side partial aggregation
    bounds the shuffle to one row per task per host) and one join
    back.  The host table is tiny relative to pages (millions of hosts
    vs trillions of docs) → Catalyst/AQE broadcasts it.
    """
    floor = specs.HOST_MIN_QUALITY if min_quality is None else min_quality
    q = quality_features(docs).select(F.col(id_col), F.col(host_col), "quality_score")
    hosts = q.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("host_docs"),
        F.avg("quality_score").alias("host_quality"),
    )
    return (
        q.join(F.broadcast(hosts), host_col)
        .select(
            id_col,
            host_col,
            "host_docs",
            F.round("host_quality", 8).alias("host_quality"),
            (F.col("host_quality") >= floor).alias("keep"),
        )
    )


def select_and_chunk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_frac: float = 0.2,
) -> DataFrame:
    """The round-3 corpus gates composed into ONE Catalyst plan — host
    reputation AND classifier keep AND duplicate-span fraction <= cap,
    then context-window chunking of the survivors.

    Demonstrates the operators are closed under composition: three
    independent per-doc signals (one broadcast-joined host aggregate,
    one zero-shuffle classifier fold, one span-hash groupBy) meet in
    doc_id-keyed joins that AQE plans together; chunking adds no
    shuffle.  At 100 TB the only wide stages are the two aggregates
    each gate already pays on its own.
    """
    from graphscope_spark.functions.classify import quality_classifier
    from graphscope_spark.functions.dedup import duplicate_spans
    from graphscope_spark.functions.text import chunk_text

    hr = host_reputation(docs, id_col=id_col).where(F.col("keep")).select(id_col)
    qc = (
        quality_classifier(docs, id_col=id_col, text_col=text_col)
        .where(F.col("cls_keep"))
        .select(id_col)
    )
    ds = (
        duplicate_spans(docs, id_col=id_col, text_col=text_col)
        .where(F.col("dup_frac") <= max_dup_frac)
        .select(id_col)
    )
    kept = docs.join(hr, id_col).join(qc, id_col).join(ds, id_col)
    return chunk_text(kept, id_col=id_col, text_col=text_col)
