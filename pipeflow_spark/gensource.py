"""Python DataSource generators: transcripts synthesized ON THE EXECUTORS.

Two PySpark-4 custom data sources (``pyspark.sql.datasource``) that
materialize the BASELINE.json ``input_hint`` table — ``(conv_id:string,
turn_idx:int32, role:string, text:string, tool:string, ts:timestamp)`` —
without any file ever being written:

* ``pipeflow.transcripts`` — batch: ``spark.read.format(...)`` over conv-range
  partitions; each partition synthesizes its own slice as Arrow RecordBatches
  inside the Python worker, so a 10^12-turn benchmark load never crosses the
  driver and never touches disk (contrast
  :func:`..streaming.transcripts.synthesize_transcripts`, which builds the
  whole table in driver pandas and writes parquet — right for small replay
  fixtures, wrong as the load generator at cluster scale).
* ``pipeflow.transcripts_stream`` — streaming: a rate-controlled unbounded
  source (a Kafka stand-in) whose offsets are conversation counts
  (``{"conv": n}``); ``latestOffset`` admits ``convs_per_batch`` new
  conversations per trigger and ``partitions(start, end)`` splits the admitted
  range into executor-side generator partitions.  Replay is exact by
  construction: every row is a pure function of ``(seed, conv_k, turn)``, so a
  re-planned ``(start, end)`` range regenerates bit-identical rows — the
  property checkpoint recovery and exactly-once sinks need from a source.

Purity is the load-bearing design decision.  The generator keeps NO cross-call
state that affects row content: conversation length, start time, text, and
tool are all counter-based hashes (splitmix64) of the conversation index, so
any partition, any retry, any cluster size, and any batch boundary yields the
same rows.  This is what makes the source usable as scaling-benchmark input —
`local[8]` and `local[32]` see byte-identical data (reference analog: the
reference benchmarks generate rows in a driver loop,
``PipeFlow.Benchmarks/Program.cs``; there is no distributed-generation
equivalent to cite).

Restart semantics (stream): Spark restores the checkpointed offset but a
fresh reader object starts with its admission counter at zero — and the
DataSourceStreamReader API never hands the reader the checkpointed position
before the first ``latestOffset()`` call.  Verified behavior on this engine
(Spark 4.1, pinned by ``test_stream_gen_clean_restart_no_duplicates``): the
micro-batch engine does NOT plan a batch whose end offset is behind the
checkpoint — the restarted query idles while the counter re-advances over
empty triggers, then resumes exactly where the checkpoint left off, zero
duplicates.  The ``progress_path`` option (a tiny file atomically replaced
on every ``latestOffset``) removes that catch-up lag by restoring the
counter at-or-above the checkpoint on restart; an over-advanced counter
(query died between admission and commit) is harmless because the next
batch's START still comes from the checkpoint and content is pure.  As
belt-and-suspenders against a future engine that DOES plan a regressed
range, ``partitions`` fails fast on ``end < start`` instead of silently
re-generating.
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .streaming.transcripts import BASE_TS, ROLES, TOOLS, _WORDS

_MASK = (1 << 64) - 1


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a vectorized counter-based hash (uint64 in/out)."""
    with np.errstate(over="ignore"):  # modular 2^64 arithmetic is the point
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_MASK)
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_MASK)
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(_MASK)
        return x ^ (x >> np.uint64(31))


def _hash_u01(seed: int, stream: int, k: np.ndarray) -> np.ndarray:
    """Uniform (0, 1] from hash(seed, stream, k) — pure, partition-independent."""
    h = _mix64(k.astype(np.uint64) ^ _mix64(np.uint64((seed * 1315423911 + stream) & _MASK)))
    # map to (0,1]: (h+1) / 2^64 — never 0, so the power-law inverse is finite
    return (h.astype(np.float64) + 1.0) / float(1 << 64)


def conv_sizes(seed: int, lo: int, hi: int, zipf_a: float = 1.6, max_turns: int = 400) -> np.ndarray:
    """Turn count per conversation k in [lo, hi) — Zipf-tailed via inverse
    transform: P(X >= x) ~ x^-(a-1), matching the skew shape of the driver
    synthesizer without its sequential RNG stream (sequential draws can't be
    computed per-partition)."""
    k = np.arange(lo, hi, dtype=np.int64)
    u = _hash_u01(seed, 1, k)
    raw = np.ceil(u ** (-1.0 / (zipf_a - 1.0))).astype(np.int64)
    return np.minimum(raw * 3, max_turns)


def gen_conv_block(
    seed: int,
    lo: int,
    hi: int,
    zipf_a: float = 1.6,
    max_turns: int = 400,
    turn_step_sec: int = 20,
    start_window_sec: int = 6 * 3600,
    roles: frozenset | None = None,
    t_lo: int = 0,
    t_hi: int | None = None,
    late_frac: float = 0.0,
    late_part: str | None = None,
):
    """Synthesize conversations [lo, hi) as one Arrow RecordBatch.

    Same text/role/tool laws as the driver synthesizer (affine word hash,
    role = turn mod 3, tool on tool-turns) so downstream operators see the
    same value distributions; sizes/starts come from counter hashes instead
    of a sequential RNG so any sub-range is computable in isolation.

    ``roles`` / ``t_lo`` / ``t_hi`` are the PUSHED-DOWN predicates (see
    ``_GenBatchReader.pushFilters``): turn bounds clamp the per-conv ranges
    before any row materializes (generation work shrinks, not just output);
    the role filter masks post-hoc (role is t mod 3, so it cannot shrink the
    arange but does shrink every downstream array and the Arrow transfer).
    """
    import pyarrow as pa

    sizes = conv_sizes(seed, lo, hi, zipf_a, max_turns)
    ks = np.arange(lo, hi, dtype=np.int64)
    starts = (_hash_u01(seed, 2, ks) * start_window_sec).astype(np.int64)

    if t_hi is not None:
        sizes = np.minimum(sizes, max(t_hi, 0))
    t_lo = max(t_lo, 0)
    counts = np.maximum(sizes - t_lo, 0)
    conv_k = np.repeat(ks, counts)
    t = (
        np.concatenate([np.arange(t_lo, s) for s in sizes if s > t_lo])
        if counts.sum()
        else np.array([], dtype=np.int64)
    )
    if late_part is not None:
        # turn-level late selection — a pure hash of (conv, turn), so the
        # on-time and late halves partition the row set exactly and any
        # reader computes either half in isolation (max_turns < 512 keeps
        # conv*512+t collision-free)
        is_late = _hash_u01(seed, 3, conv_k * 512 + t) < late_frac
        keep = is_late if late_part == "late" else ~is_late
        conv_k, t = conv_k[keep], t[keep]

    if roles is not None:
        # role = t mod 3: the pushed role set is a residue-class mask on t
        res = np.array([i for i, r in enumerate(ROLES) if r in roles])
        keep = np.isin(t % 3, res)
        conv_k, t = conv_k[keep], t[keep]

    conv_names = np.array([f"conv_{k:07d}" for k in ks])
    conv_ids = conv_names[conv_k - lo]
    role_col = np.array(ROLES)[t % 3]
    base = (conv_k * 31 + t * 7) % len(_WORDS)
    suffix_table = np.array(
        [" ".join(_WORDS[(b + 13 * j) % len(_WORDS)] for j in range(6)) for b in range(len(_WORDS))]
    )
    texts = np.fromiter(
        (f"{c}#{ti} {s}" for c, ti, s in zip(conv_ids, t, suffix_table[base])),
        dtype=object,
        count=len(t),
    )
    tools = np.where(role_col == "tool", np.array(TOOLS)[base % len(TOOLS)], None)
    # BASE_TS is naive; .timestamp() alone would interpret it in the OS-local
    # timezone, making generated epochs (and the literal-pinned
    # gen_transcripts_profile oracle) machine-dependent — pin it to UTC,
    # matching the Spark session's pinned UTC timezone
    epoch_us = np.int64(int(BASE_TS.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000))
    # gather per-row (conv_k-indexed) instead of repeat: stays correct under
    # both the turn-bound clamps and the role residue mask
    ts_us = epoch_us + (starts[conv_k - lo] + t * turn_step_sec) * 1_000_000

    return pa.RecordBatch.from_arrays(
        [
            pa.array(conv_ids, pa.string()),
            pa.array(t.astype(np.int32), pa.int32()),
            pa.array(role_col, pa.string()),
            pa.array(texts, pa.string()),
            pa.array(tools, pa.string()),
            pa.array(ts_us, pa.timestamp("us")),
        ],
        names=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )


TRANSCRIPT_DDL = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"

# one generator partition per this many conversations unless the caller pins
# `partitions`; ~64 convs * avg ~6 turns keeps Arrow batches comfortably sized
_DEFAULT_CONVS_PER_PART = 4096


class _ConvRange(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


def _opts(options) -> dict:
    return {
        "seed": int(options.get("seed", 42)),
        "zipf_a": float(options.get("zipf_a", 1.6)),
        "max_turns": int(options.get("max_turns", 400)),
        "turn_step_sec": int(options.get("turn_step_sec", 20)),
        "start_window_sec": int(options.get("start_window_sec", 6 * 3600)),
    }


def _split(lo: int, hi: int, parts: int) -> list[_ConvRange]:
    if hi <= lo:
        return [_ConvRange(lo, lo)]
    parts = max(1, min(parts, hi - lo))
    step = (hi - lo + parts - 1) // parts
    return [_ConvRange(i, min(i + step, hi)) for i in range(lo, hi, step)]


class _GenBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_convs = int(options.get("n_convs", 1000))
        self.parts = int(
            options.get("partitions", max(1, self.n_convs // _DEFAULT_CONVS_PER_PART))
        )
        self.gen = _opts(options)
        # pushed-down predicates (pushFilters): consumed filters MUST be
        # fully enforced here — Spark will not re-apply them
        self.roles_pushed: frozenset | None = None
        self.t_lo: int = 0
        self.t_hi: int | None = None

    def pushFilters(self, filters):
        """Absorb the predicates the generator can enforce at the source
        (requires ``spark.sql.python.filterPushdown.enabled=true``): role
        equality/membership (role is ``turn mod 3`` — a residue-class mask)
        and ``turn_idx`` bounds (clamp the per-conv ranges BEFORE any row
        materializes — generation work shrinks, not just output).  Everything
        else is yielded back for Spark to evaluate."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr and len(attr) == 1 else None
            if col == "role" and isinstance(f, (EqualTo, In)):
                vals = {f.value} if isinstance(f, EqualTo) else set(f.value)
                cur = self.roles_pushed if self.roles_pushed is not None else frozenset(ROLES)
                self.roles_pushed = frozenset(cur & vals)
            elif col == "turn_idx" and isinstance(f, LessThan) and isinstance(f.value, int):
                self.t_hi = f.value if self.t_hi is None else min(self.t_hi, f.value)
            elif col == "turn_idx" and isinstance(f, LessThanOrEqual) and isinstance(f.value, int):
                v = f.value + 1
                self.t_hi = v if self.t_hi is None else min(self.t_hi, v)
            elif col == "turn_idx" and isinstance(f, GreaterThanOrEqual) and isinstance(f.value, int):
                self.t_lo = max(self.t_lo, f.value)
            elif col == "turn_idx" and isinstance(f, GreaterThan) and isinstance(f.value, int):
                self.t_lo = max(self.t_lo, f.value + 1)
            else:
                yield f

    def partitions(self):
        return _split(0, self.n_convs, self.parts)

    def read(self, partition: _ConvRange):
        # chunk within the partition so one huge range still streams through
        # bounded Arrow batches instead of one giant allocation
        for lo in range(partition.lo, partition.hi, _DEFAULT_CONVS_PER_PART):
            hi = min(lo + _DEFAULT_CONVS_PER_PART, partition.hi)
            yield gen_conv_block(
                lo=lo,
                hi=hi,
                roles=self.roles_pushed,
                t_lo=self.t_lo,
                t_hi=self.t_hi,
                **self.gen,
            )


class TranscriptGenSource(DataSource):
    """``spark.read.format("pipeflow.transcripts")`` — executor-side synthetic
    transcripts.  Options: ``n_convs``, ``partitions``, ``seed``, ``zipf_a``,
    ``max_turns``, ``turn_step_sec``, ``start_window_sec``."""

    @classmethod
    def name(cls):
        return "pipeflow.transcripts"

    def schema(self):
        return TRANSCRIPT_DDL

    def reader(self, schema):
        return _GenBatchReader(self.options)


class _GenStreamReader(DataSourceStreamReader):
    """Offsets are conversation counts; each trigger admits
    ``convs_per_batch`` more conversations (bounded by ``n_convs`` unless 0 =
    unbounded).  All state that matters for row CONTENT lives in the hash
    laws; the only mutable state is the admission counter, which checkpoint
    offsets dominate (fast-forwarded in ``partitions``)."""

    def __init__(self, options):
        self.n_convs = int(options.get("n_convs", 0))  # 0 = unbounded
        self.cpb = int(options.get("convs_per_batch", 1024))
        self.parts = int(options.get("partitions", 8))
        self.gen = _opts(options)
        # late-arrival emulation: a pure-hash late_frac of turns is DUE
        # late_delay_convs conversations after its home position, so
        # arrival is genuinely out of event-time order (what a watermark
        # engine must actually be fed) while replay stays exact — every
        # row's due position is a pure function of (seed, conv, turn)
        self.late_frac = float(options.get("late_frac", 0.0))
        self.late_delay = int(options.get("late_delay_convs", 0))
        self.progress_path = options.get("progress_path")
        self._cur = 0
        if self.progress_path and os.path.exists(self.progress_path):
            with open(self.progress_path) as f:
                self._cur = int(f.read().strip() or 0)

    def initialOffset(self):
        return {"conv": 0}

    def _persist(self) -> None:
        if not self.progress_path:
            return
        tmp = f"{self.progress_path}.tmp"
        with open(tmp, "w") as f:
            f.write(str(self._cur))
        os.replace(tmp, self.progress_path)  # atomic on POSIX

    def latestOffset(self):
        nxt = self._cur + self.cpb
        if self.n_convs:
            # the offset range extends past n_convs by the late-delay horizon
            # so the final conversations' delayed turns still get a due batch
            nxt = min(nxt, self.n_convs + (self.late_delay if self.late_frac else 0))
        self._cur = nxt
        self._persist()
        return {"conv": self._cur}

    def partitions(self, start, end):
        lo, hi = int(start["conv"]), int(end["conv"])
        if hi < lo:
            # a fresh reader's counter lagged the checkpoint: latestOffset
            # already returned a regressed end, and Spark would chain the
            # NEXT batch off it — silently re-admitting committed convs.
            # Fail fast with the remedy instead of duplicating.
            raise ValueError(
                f"pipeflow.transcripts_stream offset regressed ({lo} -> {hi}): "
                "restarting from a checkpoint requires the progress_path "
                "option (a small file persisting the admission counter) so "
                "the reader resumes at-or-above the committed offset"
            )
        self._cur = max(self._cur, hi)
        return _split(lo, hi, self.parts)

    def _clamp(self, lo: int, hi: int) -> tuple[int, int]:
        n = self.n_convs or None
        lo, hi = max(lo, 0), (min(hi, n) if n else hi)
        return lo, max(hi, lo)

    def read(self, partition: _ConvRange):
        for lo in range(partition.lo, partition.hi, _DEFAULT_CONVS_PER_PART):
            hi = min(lo + _DEFAULT_CONVS_PER_PART, partition.hi)
            if not self.late_frac:
                yield gen_conv_block(lo=lo, hi=hi, **self.gen)
                continue
            # due-position semantics: on-time turns of convs [lo,hi) plus the
            # LATE turns of convs [lo-delay, hi-delay) — each row appears in
            # exactly one due range, so replay and restart stay exact
            on_lo, on_hi = self._clamp(lo, hi)
            if on_hi > on_lo:
                yield gen_conv_block(
                    lo=on_lo, hi=on_hi,
                    late_frac=self.late_frac, late_part="on_time", **self.gen,
                )
            lt_lo, lt_hi = self._clamp(lo - self.late_delay, hi - self.late_delay)
            if lt_hi > lt_lo:
                yield gen_conv_block(
                    lo=lt_lo, hi=lt_hi,
                    late_frac=self.late_frac, late_part="late", **self.gen,
                )

    def commit(self, end):
        pass


class TranscriptStreamGenSource(DataSource):
    """``spark.readStream.format("pipeflow.transcripts_stream")`` — the
    rate-controlled unbounded twin (options of ``pipeflow.transcripts`` plus
    ``convs_per_batch``; ``n_convs=0`` streams forever; set ``progress_path``
    to make the admission counter survive query restarts).

    Trigger caveat: Python stream sources don't support
    ``Trigger.AvailableNow`` — Spark logs a warning and falls back to
    single-batch execution, which ignores ``convs_per_batch`` pacing.  For
    rate-controlled runs use a continuous trigger (``available_now=False``
    on the ``start_*`` helpers) and drain by watching source offsets."""

    @classmethod
    def name(cls):
        return "pipeflow.transcripts_stream"

    def schema(self):
        return TRANSCRIPT_DDL

    def streamReader(self, schema):
        return _GenStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Register both generator sources on the session (idempotent).

    Also enables ``spark.sql.python.filterPushdown.enabled`` (runtime-settable
    SQL conf): Spark REFUSES to plan a Python reader that implements
    ``pushFilters`` while the conf is off, so registration without it would
    arm a delayed AnalysisException on first read."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TranscriptGenSource)
    spark.dataSource.register(TranscriptStreamGenSource)
