"""CEP processors over per-key state: tool-call-loop detection.

Reference analog: none (PipeFlow has no state at all — its only stateful
construct is the RemoveDuplicates closure HashSet, ``PipeFlow/PipeFlow.cs:
226-231``); this is north-rule surface (custom stateful CEP over transcript
streams).

The detection rule lives in one pure kernel (:func:`tool_loop_step`) wrapped
for both arbitrary-state APIs:

* :func:`tool_loop_apply_fn` — ``applyInPandasWithState`` (v1), runs anywhere;
* :class:`ToolLoopDetector` — ``transformWithStateInPandas`` (v2: typed named
  state slots, timers, initial state).  v2's state-server protocol needs the
  ``protobuf`` package, which this sandbox lacks — the engine gates it with a
  clear error (``engine.transform_with_state``); on a normal deployment both
  paths run and v2 is preferred.

Scale posture: state is one fixed-width tuple per conversation, partitioned
by the grouping key across the state stores; nothing here scans more than the
arriving batch per key.
"""

from __future__ import annotations

import pandas as pd

TOOL_LOOP_OUTPUT_SCHEMA = "conv_id string, streak int, end_turn_idx int"
TOOL_LOOP_STATE_SCHEMA = "streak int, last_turn_idx int"


def has_transform_with_state_runtime() -> bool:
    """transformWithStateInPandas needs protobuf for its state-server
    protocol; absent → the v2 API crashes at query start."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def tool_loop_step(
    streak: int, last_idx: int, turns: pd.DataFrame, conv_id: str, threshold: int
) -> tuple[int, int, list[tuple[str, int, int]]]:
    """Advance the per-conversation run state over one batch of turns.

    A run = consecutive ``role='tool'`` turns (contiguous turn_idx).  Emits an
    event when a run of ≥ threshold closes, plus a progress report if a
    qualifying run is still open at batch end.  Turns are processed in
    ``turn_idx`` order within the batch; cross-batch ordering is the source's
    arrival contract (the in-order assumption every CEP engine makes).
    """
    out: list[tuple[str, int, int]] = []
    turns = turns.sort_values("turn_idx")
    for turn_idx, role in zip(turns["turn_idx"], turns["role"]):
        if role == "tool":
            streak = streak + 1 if turn_idx == last_idx + 1 and streak > 0 else 1
        else:
            if streak >= threshold:
                out.append((conv_id, streak, int(last_idx)))
            streak = 0
        last_idx = int(turn_idx)
    if streak >= threshold:  # open run at batch end: report progress
        out.append((conv_id, streak, last_idx))
    return streak, last_idx, out


def tool_loop_apply_fn(threshold: int = 3):
    """The detector as an ``applyInPandasWithState`` function
    (use with ``StreamingPipeline.stateful_per_key(keys=['conv_id'],
    fn=tool_loop_apply_fn(n), output_schema=TOOL_LOOP_OUTPUT_SCHEMA,
    state_schema=TOOL_LOOP_STATE_SCHEMA)``)."""

    def fn(key, pdfs, state):
        # v1 GroupState: `.get` is a property (tuple), `.exists` a property
        streak, last_idx = state.get if state.exists else (0, -1)
        events: list[tuple[str, int, int]] = []
        for pdf in pdfs:
            streak, last_idx, out = tool_loop_step(streak, last_idx, pdf, key[0], threshold)
            events.extend(out)
        state.update((streak, last_idx))
        if events:
            yield pd.DataFrame(events, columns=["conv_id", "streak", "end_turn_idx"])

    return fn


try:  # v2 API — importable only where pyspark exposes it
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor, StatefulProcessorHandle

    class ToolLoopDetector(StatefulProcessor):
        """The same detector on transformWithStateInPandas: named ValueState
        slot instead of the v1 positional state tuple."""

        def __init__(self, threshold: int = 3):
            self.threshold = threshold

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("run", TOOL_LOOP_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            streak, last_idx = self._state.get() if self._state.exists() else (0, -1)
            events: list[tuple[str, int, int]] = []
            for pdf in rows:
                streak, last_idx, out = tool_loop_step(streak, last_idx, pdf, key[0], self.threshold)
                events.extend(out)
            self._state.update((streak, last_idx))
            if events:
                yield pd.DataFrame(events, columns=["conv_id", "streak", "end_turn_idx"])

        def close(self) -> None:
            pass

except ImportError:  # pragma: no cover
    ToolLoopDetector = None  # type: ignore[assignment]
