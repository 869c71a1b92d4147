"""Streaming near-duplicate ingest guard: SimHash store across micro-batches.

The missing streaming member of the dedupe family (exact streaming dedupe =
``dedupe_within_watermark``; batch near-dup = MinHash/SimHash/Jaccard in
``operators/dedupe.py``): drop an arriving document iff it is within Hamming
``max_hamming`` of ANY earlier-arrived document — "have I seen something like
this before?".  Earlier means earlier in arrival order, kept or dropped: a
near-dup of a dropped doc is itself a near-dup of whatever got the dropped
doc dropped *or of nothing the user kept*, and the guard's contract is
novelty vs the full ingest history, not vs the survivor set (the survivor-set
variant is the batch greedy — ``operators/dedupe.keep_list`` on clustered
pairs — with different, chain-dependent semantics).

Mechanics per micro-batch (inside ``foreachBatch``, so everything below is
plain batch DataFrame algebra):

1. SimHash the batch (one Arrow pass, ``operators/dedupe.simhash64``) and
   explode into pigeonhole blocks (``simhash_blocks``).
2. Candidate-join the batch's blocks against the accumulated signature STORE
   (parquet, ``store/<namespace>/batch_id=K`` dirs, only ``K < current`` read — see
   replay safety) on ``(blk, bval)``; verify ``bit_count(xor) ≤ max_hamming``
   JVM-side.  Any match ⇒ drop.
3. Intra-batch: the same pigeonhole self-join within the batch; the LARGER id
   of a verified pair drops (arrival order within a batch is id order).
4. Anti-join the dropped ids, commit survivors through an
   :class:`~pipeflow_spark.streaming.exactly_once.ExactlyOnceSink` ledger,
   and append the batch's signatures (ALL of them, kept and dropped) to the
   store.

Replay safety: the store is written to its own ``batch_id=N`` dir in
overwrite mode BEFORE the kept-commit, and candidate retrieval reads only
``batch_id < N`` dirs — so a replayed batch never sees its own (possibly
partial) signatures, recomputes the identical drop set (SimHash is
deterministic), overwrites its store dir, and the ledger makes the
kept-commit a no-op if it already happened.

Scale shape: state is 4 longs × docs-seen, partitioned by arrival batch; the
candidate join is an equi-join on 16-bit block values against only the
block-matching slice of the store (at cluster scale, lay the store out
bucketed by ``bval`` so the probe prunes).  Nothing is ever all-pairs.

Oracle: with arrival staged in doc-id order, kept ≡
``SELECT d FROM docs d WHERE NOT EXISTS (earlier doc within Hamming k)`` —
the DuckDB twin reproduces the md5-token sketch bit-for-bit
(``stream_neardup_guard_oracle``).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .exactly_once import ExactlyOnceSink


class NearDupGuardSink:
    """``foreachBatch`` sink: novelty-gate each micro-batch against the
    signature store, commit survivors exactly-once under ``root/kept``,
    accumulate signatures under ``root/store``."""

    def __init__(
        self,
        root: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        max_hamming: int = 3,
        blocks: int = 4,
        store_dir: str | None = None,
        namespace: str = "main",
        auto_compact_every: int | None = None,
    ):
        """``store_dir`` defaults under ``root`` but may point at a SHARED
        signature store so several ingest queries gate against one combined
        novelty history (each query keeps its own ledger/kept output under
        its own root).  Each query writes under its own ``namespace``
        subdirectory — batch ids are only monotone per query, so namespaces
        prevent two queries' ``batch_id=N`` dirs from colliding.  Candidate
        retrieval reads the own namespace with the strictly-earlier batch
        exclusion (exact within-query semantics) plus EVERY committed dir of
        other namespaces (cross-query novelty is best-effort by arrival —
        the race window is the other query's in-flight batch, unavoidable
        without cross-query coordination).

        ``auto_compact_every=K`` folds the store every K batches FROM INSIDE
        the foreachBatch hook — the only thread that reads the store — which
        is the safe way to compact a live query (see :meth:`compact_store`'s
        concurrency contract)."""
        self.root = root
        self.kept = ExactlyOnceSink(os.path.join(root, "kept"))
        self.store_dir = store_dir or os.path.join(root, "store")
        self.namespace = namespace
        self.ns_dir = os.path.join(self.store_dir, namespace)
        os.makedirs(self.ns_dir, exist_ok=True)
        self.text_col, self.id_col = text_col, id_col
        self.max_hamming, self.blocks = max_hamming, blocks
        self.auto_compact_every = auto_compact_every

    # -- store ----------------------------------------------------------------
    @staticmethod
    def _committed_dirs(ns_dir: str, below: int | None) -> list[str]:
        """Committed ``batch_id=K`` dirs in one namespace; ``below`` bounds K
        (None = all).  Negative ids are compacted segments — strictly-older
        batches by construction, so they always pass the bound."""
        out = []
        if not os.path.isdir(ns_dir):
            return out
        for d in os.listdir(ns_dir):
            if not d.startswith("batch_id="):
                continue
            k = int(d.split("=")[1])
            if (k < 0 or below is None or k < below) and os.path.exists(
                os.path.join(ns_dir, d, "_SUCCESS")
            ):
                out.append(os.path.join(ns_dir, d))
        return sorted(out)

    def _store_batches(self, below: int) -> list[str]:
        dirs = self._committed_dirs(self.ns_dir, below)
        for ns in os.listdir(self.store_dir):
            full = os.path.join(self.store_dir, ns)
            if ns != self.namespace and os.path.isdir(full):
                dirs.extend(self._committed_dirs(full, None))
        return dirs

    def _read_store(self, spark, below: int) -> DataFrame | None:
        dirs = self._store_batches(below)
        if not dirs:
            return None
        # schema from the parquet footers, NOT hardcoded: simhash_blocks
        # keeps the caller's id type (string doc ids are common) — forcing
        # `id long` here would crash the store join on the second batch
        return spark.read.parquet(*dirs)

    # -- the foreachBatch hook --------------------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.kept.is_committed(batch_id):
            return  # replay: store dir was written before the ledger commit

        from ..operators.dedupe import simhash_blocks

        spark = batch_df.sparkSession
        blocked = simhash_blocks(
            batch_df, self.text_col, self.id_col, self.blocks
        ).persist()
        try:
            drops = None

            store = self._read_store(spark, batch_id)
            if store is not None:
                vs_store = (
                    blocked.alias("x")
                    .join(
                        store.alias("s"),
                        (F.col("x.blk") == F.col("s.blk"))
                        & (F.col("x.bval") == F.col("s.bval")),
                    )
                    .filter(
                        F.bit_count(F.col("x.sk").bitwiseXOR(F.col("s.sk")))
                        <= self.max_hamming
                    )
                    .select(F.col("x.id").alias("id"))
                )
                drops = vs_store

            intra = (
                blocked.alias("x")
                .join(
                    blocked.alias("y"),
                    (F.col("x.blk") == F.col("y.blk"))
                    & (F.col("x.bval") == F.col("y.bval"))
                    & (F.col("x.id") < F.col("y.id")),
                )
                .filter(
                    F.bit_count(F.col("x.sk").bitwiseXOR(F.col("y.sk")))
                    <= self.max_hamming
                )
                .select(F.col("y.id").alias("id"))
            )
            drops = intra if drops is None else drops.unionByName(intra)
            drops = drops.distinct()

            # store append FIRST (idempotent overwrite of our own dir), so a
            # crash between store write and kept-commit replays cleanly
            part = os.path.join(self.ns_dir, f"batch_id={batch_id}")
            if os.path.exists(part):
                shutil.rmtree(part)
            blocked.write.mode("overwrite").parquet(part)

            kept_rows = batch_df.join(
                drops, F.col(self.id_col) == drops["id"], "left_anti"
            )
            self.kept(kept_rows, batch_id)
            # same-thread maintenance: this batch's store reads already ran,
            # the next batch re-lists — no in-flight plan can reference a
            # dir compaction removes
            if (
                self.auto_compact_every
                and batch_id > 0
                and batch_id % self.auto_compact_every == 0
            ):
                self.compact_store(spark)
        finally:
            blocked.unpersist()

    def compact_store(self, spark) -> int:
        """Fold the committed per-batch signature dirs into ONE compacted
        segment (``batch_id=-<seq>``) — without this the store grows a
        directory per micro-batch forever (a day at 1 s triggers = 86 k
        dirs; file listing, not data, becomes the bottleneck).

        Only dirs for batches ≤ the kept ledger's high-water mark are folded
        (those batches can never replay — the ledger skips them — so no
        future read needs their per-batch identity).  Crash-safety is
        BY SEMANTICS, not by atomicity: the new segment is committed
        (``_SUCCESS``) before any old dir is removed, and a crash anywhere
        leaves signatures present POSSIBLY TWICE — duplicate candidate rows
        change nothing (the drop set is a semi-join; dups add candidates that
        verify identically).  Signatures are never absent at any crash
        point, which is the direction that would corrupt results
        (a re-admitted near-dup).  Returns the number of dirs folded.

        Concurrency contract: the deletes are NOT safe against a live
        query's in-flight micro-batch — its lazy store read may still
        reference a dir this removes (task-level FileNotFound → query
        failure, recoverable only by restart).  Run it from the query's own
        foreachBatch thread (``auto_compact_every`` does exactly that),
        between runs, or while the query is stopped — never from a separate
        maintenance thread against a running query."""
        hi = self.kept._ledger.contiguous_committed_through()
        if hi < 0:
            return 0
        # own namespace only: k <= hi plus prior compacted segments
        olds = self._committed_dirs(self.ns_dir, hi + 1)
        if len(olds) <= 1:
            return 0
        seq = min(
            (int(os.path.basename(p).split("=")[1]) for p in olds), default=0
        )
        seg = os.path.join(self.ns_dir, f"batch_id={min(seq, 0) - 1}")
        spark.read.parquet(*olds).write.mode("overwrite").parquet(seg)
        for p in olds:
            shutil.rmtree(p, ignore_errors=True)
        return len(olds)

    # -- read-back ---------------------------------------------------------------
    def read_kept(self, spark) -> DataFrame:
        return self.kept.read_committed(spark)
