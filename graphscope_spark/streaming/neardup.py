"""Incremental NEAR-duplicate detection over a document stream.

The training-pipeline reality at 10^12 documents: the corpus arrives as
crawl batches, and near-dup filtering (MinHash+LSH, functions/dedup.py)
must run against everything seen so far — recomputing the LSH index per
batch is quadratic in history.  This module maintains the banded MinHash
index as streaming state and charges each batch only batch-sized work:

  1. shingle + MinHash-sign the NEW docs (the batch);
  2. candidate pairs = new bands ⋈ accumulated band index (plus the
     new×new pairs inside the batch) — never old×old;
  3. verify candidates exactly (shingle-hash Jaccard ≥ threshold) using
     the stored shingle hashes of BOTH sides;
  4. the larger-id doc of each verified pair is a duplicate of the
     SMALLEST smaller-id doc it verifies against — regardless of which
     side arrived first, so ids need NOT be monotone with arrival
     order (a batch carrying a smaller id than an indexed doc flags
     the OLD doc); append (doc_id, dup_of, jaccard) to the output and
     resolve multi-batch verdicts to min dup_of on read;
  5. append the batch's bands and shingle hashes to the state.

Exactly the "memoized index" shape of the Ingress idea applied to the
dedup stage (cf. incremental.py for PR/WCC/triangles): per-batch parity
with a cold whole-corpus run is pinned in tests/test_streaming_neardup.py
— same bands, same candidates, same verification, so the stream and the
batch replay agree EXACTLY.

Scale shape: the band index is the join key's natural shard (store
partitioned by band hash at cluster scale); each batch joins its own
bands against it — index-side rows touched only where a band matches,
the classic small-probe/big-build join AQE broadcasts from the batch
side.  Shingle storage holds md5 hashes, not text (fixed 32-byte rows);
Jaccard over hashes equals Jaccard over shingles.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphscope_spark.functions import specs
from graphscope_spark.functions.dedup import minhash_signatures, shingles


def _bands(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    k, w = specs.MINHASH_K, specs.LSH_BAND_WIDTH
    cols = [
        F.concat_ws(
            "|", F.lit(str(b)), *[F.col(f"mh_{b * w + i}") for i in range(w)]
        ).alias("band")
        for b in range(k // w)
    ]
    return sig.select(F.col(id_col), F.explode(F.array(*cols)).alias("band"))


def _sh_hashes(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return shingles(docs, id_col=id_col, text_col=text_col).select(
        id_col, F.md5("shingle").alias("sh")
    )


def _verified_dups(
    cand: DataFrame, sh_all: DataFrame, threshold: float
) -> DataFrame:
    """(doc_id, dup_of, jaccard): for each later doc in ``cand``
    (columns a=earlier, b=later), the smallest earlier partner with
    shingle-hash Jaccard >= threshold."""
    # only candidate participants' shingles matter — semi-join first so
    # the per-doc size aggregates never scan the full history
    parts = (
        cand.select(F.col("a").alias("doc_id"))
        .unionByName(cand.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    sh_p = sh_all.join(parts, "doc_id", "semi")
    sa = sh_p.select(F.col("doc_id").alias("a"), F.col("sh"))
    sb = sh_p.select(F.col("doc_id").alias("b"), F.col("sh"))
    na = sa.groupBy("a").agg(F.count(F.lit(1)).alias("_na"))
    nb = sb.groupBy("b").agg(F.count(F.lit(1)).alias("_nb"))
    inter = (
        cand.join(sa, "a")
        .join(sb, ["b", "sh"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("_ni"))
    )
    jac = (
        inter.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            (
                F.col("_ni") / (F.col("_na") + F.col("_nb") - F.col("_ni"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return (
        jac.groupBy(F.col("b").alias("doc_id"))
        .agg(
            F.min("a").alias("dup_of"),
            F.round(F.min_by("jaccard", F.col("a")), 8).alias("jaccard"),
        )
    )


class IncrementalNearDup:
    """foreachBatch processor: near-dup flags against ALL earlier docs.

    State layout (all per-batch ``batch=<id>/`` partitions, each
    written with overwrite so an at-least-once retry is a no-op):
    ``bands/`` (doc_id, band) — the LSH index; ``shingles/``
    (doc_id, sh) — md5 shingle hashes for exact verification;
    ``dups/`` (doc_id, dup_of, jaccard) — per-batch verdicts, resolved
    to min dup_of per doc on read; ``metrics.jsonl`` one line per batch.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        threshold: float = 0.5,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.threshold = threshold
        self.id_col = id_col
        self.text_col = text_col
        os.makedirs(state_dir, exist_ok=True)
        self.batches_seen = 0

    def _dir(self, name: str) -> str:
        return os.path.join(self.state_dir, name)

    def _read(self, name: str, schema: str, before: int | None = None) -> DataFrame:
        from graphscope_spark.streaming.incremental import _read_batches

        return _read_batches(self.spark, self._dir(name), schema, before=before)

    def current_dups(self) -> DataFrame:
        """(doc_id, dup_of, jaccard): smallest verified earlier partner
        per flagged doc.  ``dups/`` is append-only and a doc can gain a
        BETTER (smaller-id) partner in a later batch — e.g. when a
        small-id doc arrives after a larger near-duplicate was indexed —
        so the read side takes the min-dup_of row per doc."""
        raw = self._read("dups", "doc_id long, dup_of long, jaccard double")
        return raw.groupBy("doc_id").agg(
            F.min("dup_of").alias("dup_of"),
            F.min_by("jaccard", F.col("dup_of")).alias("jaccard"),
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        bid = int(batch_id)
        docs = batch_df.select(self.id_col, self.text_col)
        new_sh = _sh_hashes(docs, self.id_col, self.text_col).localCheckpoint(
            eager=True
        )
        sig = minhash_signatures(
            shingles(docs, id_col=self.id_col, text_col=self.text_col),
            id_col=self.id_col,
        )
        new_bands = _bands(sig, self.id_col).localCheckpoint(eager=True)
        # history = strictly-prior batch partitions: a retry's own
        # half-written partition never joins against itself, and the
        # per-batch overwrite below makes the whole batch replay-safe
        # (ADVICE r3: plain appends re-added bands/shingles on retry,
        # which would double _na/_nb shingle counts and corrupt Jaccard)
        old_bands = self._read("bands", "doc_id long, band string", before=bid)
        old_sh = self._read("shingles", "doc_id long, sh string", before=bid)

        # candidate pairs: new-vs-old plus new-vs-new.  Normalize to
        # (a=least id, b=greatest id) BEFORE the a<b orientation — a
        # batch may carry a doc_id SMALLER than an already-indexed doc,
        # and that pair must still verify (with the verdict landing on
        # the old, larger-id doc).  The pre-fix code pinned old=a/new=b
        # and silently dropped those pairs (ADVICE r3).
        no = old_bands.select(F.col("band"), F.col("doc_id").alias("a")).join(
            new_bands.select(F.col("band"), F.col("doc_id").alias("b")), "band"
        )
        nn = new_bands.select(F.col("band"), F.col("doc_id").alias("a")).join(
            new_bands.select(F.col("band"), F.col("doc_id").alias("b")), "band"
        )
        cand = (
            no.unionByName(nn)
            .where(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            )
            .distinct()
        )
        sh_all = old_sh.unionByName(new_sh)
        dups = _verified_dups(cand, sh_all, self.threshold).localCheckpoint(
            eager=True
        )
        from graphscope_spark.streaming.incremental import _write_batch

        _write_batch(dups, self._dir("dups"), bid)
        _write_batch(new_bands, self._dir("bands"), bid)
        _write_batch(new_sh, self._dir("shingles"), bid)
        self.batches_seen += 1
        rec = {
            "batch_id": int(batch_id),
            "batch_docs": docs.count(),
            "flagged": dups.count(),
            "seconds": round(time.time() - t0, 3),
            "ts": time.time(),
        }
        with open(os.path.join(self.state_dir, "metrics.jsonl"), "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    def attach(self, doc_stream: DataFrame, trigger_available_now: bool = True):
        """Wire onto a streaming document DataFrame; returns the query."""
        w = doc_stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", self._dir("_checkpoint")
        )
        if trigger_available_now:
            w = w.trigger(availableNow=True)
        return w.start()
