"""Corpus ranking / keyword ops: TF-IDF, BM25, corpus n-gram stats.

The search-indexing half of a web-text pipeline (the reference's GIE/GAE
stack feeds a search tier; these are the classic relevance primitives a
user of the reference's webtext corpus runs downstream).  All pure
DataFrame expressions — explode / hash-aggregate / window — no UDFs, so
the whole plan is whole-stage-codegen'd and every aggregate gets a
map-side partial.

Scale notes (100 TB):
- tf is one shuffle keyed by (doc, token) with partial aggregation;
- df is one shuffle keyed by token (partial count-distinct via the
  (token, doc) pre-aggregate that tf already produced — reused, not
  recomputed);
- corpus scalars (N docs, avg doc length) are 1-row lazy broadcasts,
  the same pattern as the PageRank dangling-mass all-reduce;
- top-k per doc is a window over the (doc, token) aggregate — keyed by
  doc, so it rides the tf shuffle (no extra exchange after AQE);
- corpus-wide top-k n-grams is a two-level aggregate (partial per
  partition, final on the gram key) followed by ONE global sort of the
  per-gram counts LIMIT k — never a sort of the raw token stream.

Tokenization model: whitespace split (specs.TOKEN_SPLIT_RE), same as
text.py, so DuckDB oracles reproduce token streams exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphscope_spark.functions.text import tokens


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, token, tf) — one explode + one hash aggregate."""
    tok = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.array()
    ).otherwise(tokens(text_col))
    return (
        docs.select(F.col(id_col), F.explode(tok).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tf_idf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    topk: int = 5,
) -> DataFrame:
    """Top-k keywords per document by TF-IDF.

    idf = ln(N / df) with df = #docs containing the token (no smoothing:
    df >= 1 for every token that appears, so the ratio is always
    defined).  Ties broken (tfidf desc, token asc) for determinism.

    Returns (id, token, tf, df, tfidf, rank) — tfidf rounded to 8 dp so
    the DuckDB oracle hashes identically.
    """
    tf = term_frequencies(docs, id_col, text_col)
    df_tbl = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_tbl, "token")
        .join(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(
            id_col,
            "token",
            "tf",
            "df",
            F.round("tfidf", 8).alias("tfidf"),
            "rank",
        )
    )


def bm25(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
) -> DataFrame:
    """BM25 ranking of documents against a bag of query terms.

    Robertson/Sparck-Jones BM25 with the standard smoothed idf
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` (always positive).  The
    query is a tiny literal list — it broadcasts; the corpus is touched
    exactly twice (token stats + doc lengths), both single-shuffle
    aggregates.  Returns (id, score, rank) for the topk docs, ties
    (score desc, id asc).
    """
    spark = docs.sparkSession
    q = spark.createDataFrame([(t,) for t in sorted(set(query_terms))], "token string")
    tf = term_frequencies(docs, id_col, text_col).join(F.broadcast(q), "token")
    df_tbl = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    lengths = docs.select(
        F.col(id_col),
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
        .otherwise(F.size(tokens(text_col)))
        .cast("double")
        .alias("dl"),
    )
    stats = lengths.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = (
        tf.join(df_tbl, "token")
        .join(lengths, id_col)
        .join(F.broadcast(stats))
        .withColumn(
            "contrib",
            idf
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(id_col)
        .agg(F.sum("contrib").alias("score"))
    )
    # distributed top-k (TakeOrderedAndProject), then rank the k
    # survivors — a global row_number window would single-partition the
    # whole scored-doc aggregate
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(topk)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.select(
        id_col,
        F.round("score", 8).alias("score"),
        F.row_number().over(w).alias("rank"),
    )


def anchor_profile(
    anchors: DataFrame,
    dst_col: str = "dst_url",
    anchor_col: str = "anchor",
    topk: int = 3,
) -> DataFrame:
    """Inbound anchor-text profile per link target: the top-k tokens of
    all anchor texts pointing AT a page (the classic search-index
    signal — anchor text describes the target better than the target's
    own body; also how a host graph gets entity names).

    Input is the (src, dst, anchor) occurrence table from
    ``sources.extract.anchor_texts`` (or any table of that shape).
    Plan: explode anchor tokens → one hash aggregate keyed
    (dst, token) with map-side partials → per-dst window top-k that
    rides the same shuffle key.  Ties (count desc, token asc).
    Returns (dst, token, cnt, rank).
    """
    tok = F.when(
        F.length(F.trim(F.col(anchor_col))) == 0, F.array()
    ).otherwise(tokens(anchor_col))
    counts = (
        anchors.select(F.col(dst_col), F.explode(tok).alias("token"))
        .groupBy(dst_col, "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(dst_col).orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(dst_col, "token", "cnt", "rank")
    )


def ngram_stats(
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    topk: int = 100,
) -> DataFrame:
    """Corpus-wide top-k word n-grams with counts and corpus share.

    The LM-data diagnostic (boilerplate discovery, contamination
    screening feeds off the same table).  Plan: posexplode + window
    ``lead`` per doc to form grams (same shape as
    text.repetition_features), two-level hash aggregate on the gram,
    then ONE global top-k sort over the (gram, count) aggregate — the
    sorted set is |distinct grams|, never |tokens|.  Ties (count desc,
    gram asc).  Returns (ngram, cnt, share, rank); share rounded 8 dp.
    """
    tok = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.array()
    ).otherwise(tokens(text_col))
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    cols = [F.col("w0")] + [
        F.lead("w0", i).over(w_doc).alias(f"w{i}") for i in range(1, n)
    ]
    grams = (
        docs.select(F.col(id_col), F.posexplode(tok).alias("pos", "w0"))
        .select(F.col(id_col), *cols)
        .where(F.col(f"w{n-1}").isNotNull())
        .select(F.concat_ws(" ", *[f"w{i}" for i in range(n)]).alias("ngram"))
    )
    counts = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    # distributed top-k over the per-gram aggregate, then rank the k
    # survivors (a global row_number would single-partition all
    # |distinct grams| rows)
    top = counts.orderBy(F.col("cnt").desc(), F.col("ngram").asc()).limit(topk)
    w = Window.orderBy(F.col("cnt").desc(), F.col("ngram").asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .join(F.broadcast(total))
        .select(
            "ngram",
            "cnt",
            F.round(F.col("cnt") / F.col("total"), 8).alias("share"),
            "rank",
        )
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 10,
) -> DataFrame:
    """(term, df, postings): the search-index artifact itself — per
    term, document frequency and the top-``max_postings`` posting list
    "doc:tf" ranked by tf desc then doc asc, serialized as one string
    so the row is engine-comparable.

    Scale (100 TB): tf is the (doc, token) partial-agg shuffle;
    the posting-list build is ONE more shuffle keyed by term (the
    window's rank rides it) — stopword-skewed terms are bounded because
    only ``max_postings`` rows per term survive the rank filter and the
    final list is built from those survivors, never the full posting.
    A real deployment shards the index by term hash — which is exactly
    the partitioning this plan already produces.
    """
    tf = (
        docs.select(F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("term", "doc")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("term").orderBy(F.col("tf").desc(), F.col("doc").asc())
    top = tf.withColumn("rnk", F.row_number().over(w))
    return (
        top.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rnk") <= max_postings,
                                F.struct(
                                    F.col("rnk").alias("r"),
                                    F.concat_ws(":", F.col("doc").cast("string"), F.col("tf").cast("string")).alias("p"),
                                ),
                            )
                        )
                    ),
                    lambda s: s["p"],
                ),
            ).alias("postings"),
        )
    )
