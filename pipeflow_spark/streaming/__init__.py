"""Structured Streaming micro-batch CEP engine over transcript tables.

The north-rule surface: tumbling/sliding/session windows with watermark-driven
late-turn drop, stateful dedupe, stream-stream join of user turns vs
assistant/tool turns, custom stateful per-conversation operators, and an
exactly-once idempotent sink resumable from checkpoint.
"""

from .engine import StreamingPipeline, TRANSCRIPT_SCHEMA  # noqa: F401
from .exactly_once import ExactlyOnceSink, FanoutSink, QuarantiningSink  # noqa: F401
from .neardup import NearDupGuardSink  # noqa: F401
from .spanguard import SpanGuardSink  # noqa: F401
from .state_reader import (  # noqa: F401
    read_state,
    read_state_changes,
    state_metadata,
    state_skew_summary,
)
from .transcripts import synthesize_transcripts, write_arrival_files  # noqa: F401
