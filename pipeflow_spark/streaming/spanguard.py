"""Streaming ExactSubstr guard: cut duplicated token spans from arriving
documents, measured against the FULL ingest history.

The streaming member of the span-dedup pair (batch =
``operators/dedupe.exact_substr_spans`` / ``remove_dup_spans``): a token
span of ``min_len`` words in an arriving doc is duplicated iff its gram's
total occurrence count over *history + the current micro-batch* reaches
``min_count`` — so boilerplate that repeats across the stream is stripped
the moment its second occurrence arrives, while the first occurrence (which
was unique when it was committed) stays intact.  Prefix semantics, same
contract shape as :class:`~pipeflow_spark.streaming.neardup.NearDupGuardSink`
novelty: decisions are made against what has arrived so far, never
retroactively rewritten.

Mechanics per micro-batch (all plain batch algebra inside ``foreachBatch``):

1. Positional gram posting for the batch
   (``operators/dedupe.gram_hash_positions`` — 8-byte xxhash64 longs).
2. Gram totals = intra-batch counts + the accumulated count STORE
   (``store/<ns>/batch_id=K`` parquet dirs of ``(gh, cnt)``, only ``K <
   current`` read).  Grams reaching ``min_count`` mark their seed positions.
3. Island-merge seeds into maximal spans
   (``dedupe.spans_from_dup_positions``), cut them (``dedupe.cut_spans``),
   commit the cleaned rows through an
   :class:`~pipeflow_spark.streaming.exactly_once.ExactlyOnceSink` ledger.
4. Append the batch's ``(gh, cnt)`` aggregate to the store — written BEFORE
   the cleaned-commit, overwrite-idempotent into the batch's own dir.

Replay safety: a replayed batch reads only ``batch_id < N`` store dirs, so
it recomputes the identical span set, overwrites its own store dir, and the
ledger no-ops the cleaned-commit.

Compaction: counts are NOT duplicate-tolerant (the neardup store's
crash-safety argument does not transfer — double-counting a gram could cut
a span that was never duplicated), so the folded segment carries a
``_folded.json`` manifest naming the batch ids it absorbed and readers
EXCLUDE any listed dir that still exists: a crash between segment commit and
old-dir removal leaves both on disk but each gram still counts exactly once.

Scale shape: the store is one row per distinct gram hash with a long count —
the aggregate, not the posting; the per-batch join is gram-keyed equi
(hash-partitioned, AQE-splittable on hot boilerplate grams).  Nothing is
all-pairs, nothing rescans history rows — history is pre-aggregated into
counts exactly once per batch.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .exactly_once import ExactlyOnceSink

__all__ = ["SpanGuardSink"]


class SpanGuardSink:
    """``foreachBatch`` sink: span-clean each micro-batch against the gram
    count store, commit cleaned rows exactly-once under ``root/clean``,
    accumulate gram counts under ``root/store``."""

    def __init__(
        self,
        root: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        min_len: int = 12,
        min_count: int = 2,
        namespace: str = "main",
        auto_compact_every: int | None = None,
    ):
        self.root = root
        self.text_col, self.id_col = text_col, id_col
        self.min_len, self.min_count = min_len, min_count
        self.namespace = namespace
        self.auto_compact_every = auto_compact_every
        self.store_dir = os.path.join(root, "store")
        self.ns_dir = os.path.join(self.store_dir, namespace)
        os.makedirs(self.ns_dir, exist_ok=True)
        self.clean = ExactlyOnceSink(os.path.join(root, "clean"))

    # -- store layout -----------------------------------------------------------
    @staticmethod
    def _folded_ids(ns_dir: str) -> set[int]:
        """Batch ids absorbed into committed compacted segments."""
        out: set[int] = set()
        for d in os.listdir(ns_dir):
            meta = os.path.join(ns_dir, d, "_folded.json")
            if d.startswith("batch_id=-") and os.path.exists(meta):
                with open(meta) as f:
                    out.update(json.load(f))
        return out

    def _store_dirs(self, below: int) -> list[str]:
        if not os.path.isdir(self.ns_dir):
            return []
        folded = self._folded_ids(self.ns_dir)
        out = []
        for d in os.listdir(self.ns_dir):
            if not d.startswith("batch_id="):
                continue
            k = int(d.split("=")[1])
            committed = os.path.exists(os.path.join(self.ns_dir, d, "_SUCCESS"))
            if not committed or k in folded:
                # a dir named in a committed segment's manifest is already
                # counted there — even another SEGMENT (crash between
                # re-compaction commit and old-dir removal leaves both)
                continue
            if k < 0 or k < below:
                out.append(os.path.join(self.ns_dir, d))
        return sorted(out)

    def _history(self, spark, below: int) -> DataFrame | None:
        dirs = self._store_dirs(below)
        if not dirs:
            return None
        return spark.read.parquet(*dirs).groupBy("gh").agg(
            F.sum("cnt").alias("hist_cnt")
        )

    # -- the foreachBatch hook ----------------------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.clean.is_committed(batch_id):
            return

        from ..operators.dedupe import (
            cut_spans,
            gram_hash_positions,
            spans_from_dup_positions,
        )

        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            posting = gram_hash_positions(
                batch_df, self.text_col, self.id_col, self.min_len
            ).persist()
            try:
                intra = posting.groupBy("gh").agg(F.count("*").alias("cnt"))

                # store append FIRST (idempotent overwrite of our own dir;
                # also the materialization point — the cleaned-commit plan
                # below reads the counts BACK from this parquet, so the
                # dominant gram aggregate runs once per batch, not twice)
                part = os.path.join(self.ns_dir, f"batch_id={batch_id}")
                if os.path.exists(part):
                    shutil.rmtree(part)
                intra.write.mode("overwrite").parquet(part)
                intra_r = spark.read.parquet(part)

                hist = self._history(spark, batch_id)
                if hist is not None:
                    totals = intra_r.join(hist, "gh", "left").select(
                        "gh",
                        "cnt",
                        (F.col("cnt") + F.coalesce("hist_cnt", F.lit(0))).alias(
                            "total"
                        ),
                    )
                else:
                    totals = intra_r.select("gh", "cnt", F.col("cnt").alias("total"))
                hot = totals.filter(F.col("total") >= self.min_count).select("gh")
                dup = posting.join(hot, "gh").select("id", "pos")
                spans = spans_from_dup_positions(dup, self.min_len, self.id_col)
                cleaned = cut_spans(batch_df, spans, self.text_col, self.id_col)
                self.clean(cleaned, batch_id)
            finally:
                posting.unpersist()
            if (
                self.auto_compact_every
                and batch_id > 0
                and batch_id % self.auto_compact_every == 0
            ):
                self.compact_store(spark)
        finally:
            batch_df.unpersist()

    # -- maintenance ---------------------------------------------------------------
    def compact_store(self, spark) -> int:
        """Fold committed per-batch count dirs (batch ≤ the ledger high-water
        mark, plus earlier segments) into ONE summed segment.  Exactly-once
        counting across crashes comes from the ``_folded.json`` manifest:
        the segment names the ids it absorbed, readers skip those dirs even
        if a crash left them behind.  Same concurrency contract as the
        neardup store: call from the query's own foreachBatch thread
        (``auto_compact_every``) or with the query stopped."""
        hi = self.clean._ledger.contiguous_committed_through()
        if hi < 0:
            return 0
        # garbage-collect dirs a committed segment already absorbed (a crash
        # between rename and removal leaves them; _store_dirs excludes them
        # from reads, but nothing else would ever delete them)
        folded_now = self._folded_ids(self.ns_dir)
        for d in list(os.listdir(self.ns_dir)):
            if d.startswith("batch_id=") and int(d.split("=")[1]) in folded_now:
                shutil.rmtree(os.path.join(self.ns_dir, d), ignore_errors=True)
        olds = self._store_dirs(hi + 1)
        if len(olds) <= 1:
            return 0
        folded: set[int] = set(self._folded_ids(self.ns_dir))
        for p in olds:
            # absorbed ids — positive batches AND negative prior segments —
            # all go in the manifest so a crash-left copy is never re-read
            folded.add(int(os.path.basename(p).split("=")[1]))
        seqs = [int(os.path.basename(p).split("=")[1]) for p in olds]
        seg = os.path.join(self.ns_dir, f"batch_id={min(min(seqs), 0) - 1}")
        # stage → manifest → atomic rename: the manifest must exist the
        # instant the segment is visible, or a crash in between would leave
        # a committed segment with no exclusion list (double counting)
        staging = os.path.join(self.ns_dir, "." + os.path.basename(seg) + ".staging")
        shutil.rmtree(staging, ignore_errors=True)
        (
            spark.read.parquet(*olds)
            .groupBy("gh")
            .agg(F.sum("cnt").alias("cnt"))
            .write.mode("overwrite")
            .parquet(staging)
        )
        with open(os.path.join(staging, "_folded.json"), "w") as f:
            json.dump(sorted(folded), f)
        shutil.rmtree(seg, ignore_errors=True)
        os.rename(staging, seg)
        for p in olds:
            shutil.rmtree(p, ignore_errors=True)
        return len(olds)

    # -- read-back -------------------------------------------------------------------
    def read_clean(self, spark) -> DataFrame:
        return self.clean.read_committed(spark)
