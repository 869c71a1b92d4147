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
   (parquet, ``store/batch_id=K`` dirs, only ``K < current`` read — see
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
    ):
        self.root = root
        self.kept = ExactlyOnceSink(os.path.join(root, "kept"))
        self.store_dir = os.path.join(root, "store")
        os.makedirs(self.store_dir, exist_ok=True)
        self.text_col, self.id_col = text_col, id_col
        self.max_hamming, self.blocks = max_hamming, blocks

    # -- store ----------------------------------------------------------------
    def _store_batches(self, below: int) -> list[str]:
        out = []
        for d in os.listdir(self.store_dir):
            if not d.startswith("batch_id="):
                continue
            k = int(d.split("=")[1])
            if k < below and os.path.exists(os.path.join(self.store_dir, d, "_SUCCESS")):
                out.append(os.path.join(self.store_dir, d))
        return sorted(out)

    def _read_store(self, spark, below: int) -> DataFrame | None:
        dirs = self._store_batches(below)
        if not dirs:
            return None
        return spark.read.schema("id long, sk long, blk int, bval long").parquet(*dirs)

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
            part = os.path.join(self.store_dir, f"batch_id={batch_id}")
            if os.path.exists(part):
                shutil.rmtree(part)
            blocked.write.mode("overwrite").parquet(part)

            kept_rows = batch_df.join(
                drops, F.col(self.id_col) == drops["id"], "left_anti"
            )
            self.kept(kept_rows, batch_id)
        finally:
            blocked.unpersist()

    # -- read-back ---------------------------------------------------------------
    def read_kept(self, spark) -> DataFrame:
        return self.kept.read_committed(spark)
