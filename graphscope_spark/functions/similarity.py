"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — brute-force cosine top-k, the correctness
  baseline.  All arithmetic in double via higher-order array functions
  (zip_with + aggregate) — JVM-side, codegen'd, no UDF.
- :func:`lsh_topk` — a scale path: sign-LSH bucketing (bucket key =
  sign pattern of the first ``planes`` dimensions), search within the
  query's bucket only.  Recall < 1 by design; bucket count 2^planes
  partitions the corpus so per-bucket brute force is |corpus|/2^planes.
- :func:`ivf_topk` — the other scale path: IVF-flat.  A small set of
  deterministic seed centroids coarse-quantizes the corpus (each vector
  assigned to its max-cosine centroid); a query probes only its
  ``nprobe`` nearest centroids' inverted lists.  Candidate set is
  ~|corpus|·nprobe/C instead of |corpus|.

At 100TB the corpus side is the big table: all variants broadcast the
(small) query set, keeping the corpus un-shuffled; lsh_topk groups the
corpus by bucket once and can be pre-materialized as a bucketed table;
ivf_assign's output is the IVF index — at scale you write it ONCE as a
table partitioned by ``cluster`` so probes become partition-pruned
scans, and only the (tiny) centroid table is ever broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): exact top-k neighbors of
    each query in the corpus (self-matches excluded).

    Ties broken by neighbor id (deterministic across partitionings)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def sign_bucket(vec: Column, planes: int = 4) -> Column:
    """LSH bucket id from the sign bits of the first ``planes`` dims."""
    b = F.lit(0)
    for i in range(planes):
        b = b + F.when(F.element_at(vec, i + 1) >= 0, F.lit(2**i)).otherwise(F.lit(0))
    return b.cast("int")


def banded_sign_keys(vec: Column, bands: int = 4, planes_per_band: int = 4) -> Column:
    """array<string> of ``bands`` LSH band keys; key j encodes the sign
    bits of dims j·r+1 .. j·r+r (1-based), prefixed with the band id —
    the sign-LSH analog of MinHash banding (dedup.lsh_candidate_pairs)."""
    keys = []
    for j in range(bands):
        bits = F.lit(0)
        for i in range(planes_per_band):
            d = j * planes_per_band + i + 1
            bits = bits + F.when(
                F.element_at(vec, d) >= 0, F.lit(2**i)
            ).otherwise(F.lit(0))
        keys.append(F.concat_ws("|", F.lit(str(j)), bits.cast("string")))
    return F.array(*keys)


def cosine_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.9,
    bands: int = 4,
    planes_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cosine) with
    cosine ≥ threshold, a < b.

    Candidates come from MULTI-BAND sign-LSH (b bands × r planes, the
    same banding shape as the MinHash path in dedup.py): a pair is a
    candidate if it agrees on ALL r sign bits of at least one band.
    Bucket population shrinks as corpus_size/2^r per band — raise r
    with corpus size to keep per-bucket self-joins bounded, and raise b
    to recover recall (a near-identical pair disagrees on a given sign
    bit with probability θ/π ≈ 0.14 at cosine 0.9, so b=4, r=4 keeps
    ~90% recall while cutting bucket mass 2^r-fold per band).  The
    single-band 2^planes variant this replaces kept a CONSTANT 16
    buckets, i.e. (N/16)² per-bucket work at 100 TB.  Verification
    re-joins the two vectors by id (hash joins on the corpus), never
    carrying vectors through the banded self-join."""
    e = corpus.select(F.col(id_col), F.col(vec_col).alias("v"))
    keyed = corpus.select(
        F.col(id_col),
        F.explode(
            banded_sign_keys(F.col(vec_col), bands, planes_per_band)
        ).alias("bk"),
    )
    a = keyed.select("bk", F.col(id_col).alias("a"))
    b = keyed.select("bk", F.col(id_col).alias("b"))
    cand = (
        a.join(b, "bk")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return (
        cand.join(e.select(F.col(id_col).alias("a"), F.col("v").alias("va")), "a")
        .join(e.select(F.col(id_col).alias("b"), F.col("v").alias("vb")), "b")
        .select("a", "b", cosine(F.col("va"), F.col("vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def ivf_centroids(
    corpus: DataFrame,
    stride: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic seed centroids: every ``stride``-th corpus vector
    by id → (cid, cv).  A trained coarse quantizer (k-means) is a
    drop-in replacement — assignment/probe below are unchanged; seeded
    selection keeps the whole pipeline reproducible and oracle-exact.
    Centroid count is |corpus|/stride, small enough to broadcast."""
    return corpus.where(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )


def _argmax_centroid(scored: DataFrame, part_col: str, n: int) -> DataFrame:
    """Keep each row's top-n centroids by (cosine desc, cid asc)."""
    w = Window.partitionBy(part_col).orderBy(F.desc("ccos"), F.asc("cid"))
    return scored.withColumn("crk", F.row_number().over(w)).where(F.col("crk") <= n)


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The index build: assign every corpus vector to its max-cosine
    centroid (ties → min cid).  One broadcast join over the un-shuffled
    corpus — the |corpus|×C scoring is embarrassingly parallel and runs
    once; persist the result partitioned by ``cluster``."""
    scored = corpus.join(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cid"),
        cosine(F.col(vec_col), F.col("cv")).alias("ccos"),
    )
    return (
        _argmax_centroid(scored, id_col, 1)
        .select(id_col, vec_col, F.col("cid").alias("cluster"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    stride: int = 37,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF-flat: brute force restricted to the
    query's ``nprobe`` nearest centroids' inverted lists.  Same output
    schema as :func:`cosine_topk`; recall misses only neighbors quantized
    into unprobed cells (the standard IVF trade, tuned by nprobe)."""
    cent = ivf_centroids(corpus, stride, id_col, vec_col)
    assigned = ivf_assign(corpus, cent, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        "cluster",
    )
    qs = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    probed = _argmax_centroid(
        qs.join(F.broadcast(cent)).select(
            "query_id", "qv", "cid", cosine(F.col("qv"), F.col("cv")).alias("ccos")
        ),
        "query_id",
        nprobe,
    ).select("query_id", "qv", F.col("cid").alias("cluster"))
    scored = (
        assigned.join(F.broadcast(probed), "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: brute force restricted to the query's sign-LSH
    bucket.  Same output schema as :func:`cosine_topk`."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sign_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def semantic_candidates(
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = None,
    bands: int = 4,
    planes_per_band: int = 4,
) -> DataFrame:
    """(a_id, b_id) candidate pairs for SemDeDup verification over an
    IVF-assigned corpus (columns id, vec, cluster).

    Without ``max_cluster``: all pairs within each cluster.  With it
    (the skew guard, VERDICT r3 task 7): clusters at or under the cap
    still do all-pairs, but OVERSIZED clusters — the pathological case
    on a near-duplicate-heavy corpus, which is exactly when dedup
    runs — are sub-banded with multi-band sign-LSH
    (:func:`banded_sign_keys`), so a pair inside a big cluster is a
    candidate only if it agrees on all sign bits of some band.  Work
    per oversized cluster drops from |C|² to Σ_bucket |bucket|² with
    ~|C|/2^r per bucket; genuinely near-identical mates still collide
    on every band, so high-τ recall stays high while a diverse mega-
    cluster (quantizer failure mode) can no longer go quadratic.
    Deterministic either way — the DuckDB oracle replicates both paths
    bit-for-bit."""
    base = assigned.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), "cluster"
    )
    if max_cluster is None:
        a = base.select(F.col("_id").alias("a_id"), "cluster")
        b = base.select(F.col("_id").alias("b_id"), "cluster")
        return (
            a.join(b, "cluster")
            .where(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
        )
    sizes = base.groupBy("cluster").agg(F.count(F.lit(1)).alias("_cn"))
    sized = base.join(sizes, "cluster")
    small = sized.where(F.col("_cn") <= max_cluster)
    big = sized.where(F.col("_cn") > max_cluster)
    cand_small = (
        small.select(F.col("_id").alias("a_id"), "cluster")
        .join(small.select(F.col("_id").alias("b_id"), "cluster"), "cluster")
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
    )
    big_keyed = big.select(
        F.col("_id"),
        "cluster",
        F.explode(banded_sign_keys(F.col("_v"), bands, planes_per_band)).alias("bk"),
    )
    cand_big = (
        big_keyed.select(F.col("_id").alias("a_id"), "cluster", "bk")
        .join(
            big_keyed.select(F.col("_id").alias("b_id"), "cluster", "bk"),
            ["cluster", "bk"],
        )
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    return cand_small.unionByName(cand_big)


def semantic_dedup(
    corpus: DataFrame,
    stride: int = 37,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = None,
    bands: int = 4,
    planes_per_band: int = 4,
) -> DataFrame:
    """SemDeDup-style embedding-space deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the corpus (here the
    deterministic IVF quantizer — a trained k-means drops in), then
    within each cluster mark a vector a duplicate iff some LOWER-id
    cluster-mate has cosine ≥ tau.  Returns every corpus row as
    (vec_id, cluster, is_duplicate) — filter !is_duplicate to keep one
    representative per ε-ball.

    Scale shape: the all-pairs comparison is confined to clusters, so
    per-cluster cost is (|cluster|)², bounded by the quantizer fanout
    (clusters = |corpus|/stride grows WITH the corpus — unlike a fixed
    bucket count, mean cluster population stays ~stride); the pair join
    shuffles on the cluster key and AQE splits skewed cells.  No UDF,
    no driver collect.  ``max_cluster`` arms the skewed-cluster guard:
    a pathologically popular cluster (near-duplicate-heavy corpus —
    exactly when dedup runs) is sub-banded with sign-LSH instead of
    going quadratic; see :func:`semantic_candidates`."""
    cent = ivf_centroids(corpus, stride, id_col, vec_col)
    assigned = ivf_assign(corpus, cent, id_col, vec_col)
    cand = semantic_candidates(
        assigned, id_col, vec_col, max_cluster, bands, planes_per_band
    )
    e = assigned.select(F.col(id_col), F.col(vec_col).alias("_v"))
    dup_ids = (
        cand.join(
            e.select(F.col(id_col).alias("a_id"), F.col("_v").alias("av")), "a_id"
        )
        .join(e.select(F.col(id_col).alias("b_id"), F.col("_v").alias("bv")), "b_id")
        .where(cosine(F.col("av"), F.col("bv")) >= tau)
        .select(F.col("b_id").alias("dup_id"))
        .distinct()
    )
    return assigned.join(
        dup_ids, assigned[id_col] == dup_ids["dup_id"], "left"
    ).select(
        id_col,
        "cluster",
        F.col("dup_id").isNotNull().alias("is_duplicate"),
    )


def _sq_l2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign_l2(corpus: DataFrame, centroids: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, cluster, dist): nearest centroid by squared L2 (ties →
    min cid).  Broadcast join over the un-shuffled corpus."""
    scored = corpus.join(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cid"),
        _sq_l2(F.col(vec_col), F.col("cv")).alias("d2"),
    )
    w = Window.partitionBy(id_col).orderBy(F.asc("d2"), F.asc("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(id_col, vec_col, F.col("cid").alias("cluster"), F.col("d2").alias("dist"))
    )


def kmeans_fit(
    corpus: DataFrame,
    iters: int = 2,
    stride: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd k-means over an embedding column: returns the
    final assignment (vec_id, cluster, dist) after ``iters`` full
    assign→update rounds from the deterministic seeded init (every
    ``stride``-th vector, the same init ivf_centroids uses — so this IS
    the "trained coarse quantizer" that drops into ivf_topk /
    semantic_dedup: feed its final centroids as their ``centroids``).

    Scale shape per round: the corpus is NEVER shuffled — assignment is
    a broadcast join (k centroids × dim doubles), and the centroid
    update is posexplode → groupBy(cluster, pos) mean, which partial-
    aggregates map-side down to k·dim rows before the (tiny) shuffle;
    the new centroid table is rebuilt from those k·dim rows.  Clusters
    that lose all members drop out (deterministic; the replayed oracle
    does the same).  No UDF, no driver-side loop over data — only the
    ``iters`` plan-building loop.

    Reference analog: GraphScope's registry has no clustering-model op;
    this is training-pipeline surface (the quantizer behind SemDeDup /
    IVF ANN at 100 TB)."""
    cent = corpus.where(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )
    for _ in range(iters):
        assigned = _assign_l2(corpus, cent, id_col, vec_col)
        # materialize the k-row centroid table each round: it is tiny,
        # and leaving it lazy makes round r's plan re-derive every
        # earlier round (nested window+broadcast plans — measured ~12 s
        # for 500 vectors without this, ~3 s with)
        cent = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("c"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"],
                ).alias("cv")
            )
            .select(F.col("cluster").alias("cid"), "cv")
            .localCheckpoint(eager=True)
        )
    return _assign_l2(corpus, cent, id_col, vec_col).select(
        id_col, "cluster", "dist"
    )


def ivf_index_write(
    corpus: DataFrame,
    path: str,
    stride: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF index to disk: ``<path>/centroids`` (the tiny
    quantizer table) and ``<path>/lists`` — the inverted lists written
    ``partitionBy("cluster")`` so each cluster is its own directory.
    This is the layout a deployed ANN service wants at 100 TB: a probe
    touches ``nprobe`` directories and Spark's partition pruning skips
    every other file (PartitionFilters in the scan — pinned by the
    plan test), so search I/O scales with nprobe·|cluster|, not
    |corpus|."""
    cent = ivf_centroids(corpus, stride, id_col, vec_col)
    assigned = ivf_assign(corpus, cent, id_col, vec_col)
    cent.write.mode("overwrite").parquet(f"{path}/centroids")
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(
        f"{path}/lists"
    )


def ivf_index_search(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine search against a persisted :func:`ivf_index_write`
    index.  The probed cluster ids (≤ |queries|·nprobe values, the ANN
    service's in-memory routing step) become a LITERAL ``isin`` filter
    on the partition column, so the inverted-list scan plans with
    PartitionFilters and reads only the probed directories.  Results
    are identical to :func:`ivf_topk` with the same stride/nprobe."""
    cent = spark.read.parquet(f"{path}/centroids")
    qs = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    probed = _argmax_centroid(
        qs.join(F.broadcast(cent)).select(
            "query_id", "qv", "cid", cosine(F.col("qv"), F.col("cv")).alias("ccos")
        ),
        "query_id",
        nprobe,
    ).select("query_id", "qv", F.col("cid").alias("cluster"))
    clusters = [r["cluster"] for r in probed.select("cluster").distinct().collect()]
    lists = (
        spark.read.parquet(f"{path}/lists")
        .where(F.col("cluster").isin(clusters))
        .select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cluster"
        )
    )
    scored = (
        lists.join(F.broadcast(probed), "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
