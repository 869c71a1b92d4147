"""Deterministic synthetic transcripts (the BASELINE.json ``input_hint`` table).

Schema: ``conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp`` (FIXTURES.md F6).  Seed-42 generation with:

* **Zipf-skewed conversation sizes** — a few hot conv_ids dominate, so the
  skew-salting path has something real to chew on;
* **monotone per-conv event times** with a controlled fraction of rows that
  *arrive* late (their event time is old relative to what has already
  arrived) — drives watermark late-drop tests;
* arrival order materialized as numbered part files, so a file-source stream
  with ``maxFilesPerTrigger=1`` replays the exact arrival sequence.

No external data; everything derived from the seed.
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pandas as pd

BASE_TS = dt.datetime(2025, 1, 1, 0, 0, 0)
ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "python", "browser", "calculator"]
_WORDS = [
    "alpha", "beta", "gamma", "delta", "query", "result", "table", "join",
    "window", "stream", "state", "batch", "turn", "reply", "call", "plan",
]


def synthesize_transcripts(
    n_convs: int = 200,
    seed: int = 42,
    zipf_a: float = 1.6,
    max_turns: int = 400,
    turn_step_sec: int = 20,
    late_frac: float = 0.05,
    late_delay_batches: int = 3,
    n_files: int = 10,
) -> pd.DataFrame:
    """Return the full transcript table as pandas, with an ``arrival_file``
    column (dropped before writing each part file).

    Determinism: same args → identical rows, identical file assignment.
    """
    rng = np.random.default_rng(seed)
    sizes = np.minimum(rng.zipf(zipf_a, size=n_convs) * 3, max_turns).astype(np.int64)
    starts = rng.integers(0, 6 * 3600, size=n_convs)  # conv start within 6h

    # fully vectorized row construction (pure numpy — generates 10^7 turns in
    # seconds, which the scaling benchmark needs)
    conv_k = np.repeat(np.arange(n_convs), sizes)
    t = np.concatenate([np.arange(s) for s in sizes]) if len(sizes) else np.array([], dtype=np.int64)
    conv_names = np.array([f"conv_{k:05d}" for k in range(n_convs)])
    conv_ids = conv_names[conv_k]
    roles = np.array(ROLES)[t % 3]
    # text is a pure function of (conv_id, turn_idx): six words indexed by the
    # affine hash (k·31 + t·7 + j·13) mod |WORDS| — which depends on j only
    # through a 16-way base, so the word suffix comes from a 16-entry table
    # (keeps generation vectorized at 10^7-turn scale for the scaling bench)
    base = (conv_k * 31 + t * 7) % len(_WORDS)
    suffix_table = np.array(
        [" ".join(_WORDS[(b + 13 * j) % len(_WORDS)] for j in range(6)) for b in range(len(_WORDS))]
    )
    suffixes = suffix_table[base]
    texts = np.fromiter(
        (f"{c}#{ti} {s}" for c, ti, s in zip(conv_ids, t, suffixes)),
        dtype=object,
        count=len(t),
    )
    tools = np.where(roles == "tool", np.array(TOOLS)[base % len(TOOLS)], None)
    ts = pd.to_datetime(BASE_TS) + pd.to_timedelta(starts[conv_k] + t * turn_step_sec, unit="s")
    pdf = pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": t,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )

    # arrival: order by event time, chunk into n_files; then delay a sample of
    # rows by `late_delay_batches` files → they arrive after newer data
    pdf = pdf.sort_values("ts", kind="mergesort").reset_index(drop=True)
    file_of = (np.arange(len(pdf)) * n_files // len(pdf)).astype(int)
    late_mask = rng.random(len(pdf)) < late_frac
    file_of = np.where(late_mask, np.minimum(file_of + late_delay_batches, n_files - 1), file_of)
    pdf["arrival_file"] = file_of
    pdf["is_late_arrival"] = late_mask
    return pdf


SENTINEL_CONV = "__sentinel__"


def write_transcript_parquet(pdf: pd.DataFrame, path: str) -> None:
    """Write a transcript chunk honoring TRANSCRIPT_SCHEMA physical types:
    ``turn_idx`` int32 (pandas defaults to int64) and microsecond timestamps
    (pandas defaults to ns) — Spark's vectorized parquet reader refuses both
    mismatches under an explicit schema."""
    import pyarrow as pa

    out = pdf.copy()
    out["turn_idx"] = out["turn_idx"].astype("int32")
    # all-null object columns (e.g. tool) must not infer to a non-string type
    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    out.to_parquet(
        path,
        index=False,
        schema=schema,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
        # small row groups so Spark's byte-range splits give scan parallelism
        # within a single arrival file (row group = split granularity)
        row_group_size=65536,
    )


def write_sentinel_file(
    out_dir: str, ts: dt.datetime, file_idx: int = 99999, role: str = "user"
) -> str:
    """Append a far-future punctuation row as the last arrival file.

    Event-time streams only emit append-mode windows once the watermark passes
    them; with a finite file source nothing closes the final windows.  The
    sentinel advances the watermark beyond every real window — the file-source
    stand-in for an event-time heartbeat.  Its own window never closes, and
    its conv_id is reserved so pipelines/tests can exclude it.

    ``role`` matters for multi-input queries: Catalyst pushes non-event-time
    predicates BELOW the ``EventTimeWatermark`` node, so a side filtered to
    ``role != 'user'`` never lets a user-role sentinel reach its watermark
    node and the global (min-policy) watermark stalls at the last real event.
    Stream-stream joins over role-partitioned sides need one sentinel per
    side's filter — write a second file with ``role='assistant'`` and a
    distinct ``file_idx``.  The non-user sentinel gets ``turn_idx = 1`` so a
    user+assistant sentinel pair self-matches in ``join_replies`` (one
    matched row, trivially excluded by conv_id) instead of parking two
    forever-unmatched rows in outer-join state.
    """
    pdf = pd.DataFrame(
        [(SENTINEL_CONV, 0 if role == "user" else 1, role, "", None, ts)],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    p = os.path.join(out_dir, f"part-{file_idx:05d}.parquet")
    write_transcript_parquet(pdf, p)
    return p


def write_arrival_files(pdf: pd.DataFrame, out_dir: str) -> list[str]:
    """Materialize arrival order as ``part-0000N.parquet`` files (one stream
    micro-batch each under ``maxFilesPerTrigger=1``)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in sorted(pdf.arrival_file.unique()):
        chunk = pdf[pdf.arrival_file == i].drop(columns=["arrival_file", "is_late_arrival"])
        p = os.path.join(out_dir, f"part-{i:05d}.parquet")
        write_transcript_parquet(chunk, p)
        paths.append(p)
    return paths
