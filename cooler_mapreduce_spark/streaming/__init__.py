"""Structured Streaming pipelines over the events stream.

The reference is batch-only (jobs poll a state machine to completion,
SURVEY.md §2.4 "Streaming: Absent"); this package adds the streaming tier
Spark-natively. Design rule: every streaming aggregation has a *batch
twin* registered in the query registry — ``window``/``session_window``
expressions evaluate identically over bounded input, so the DuckDB oracle
verifies the semantics and the streaming tests verify the incremental
execution (watermarks, state, output modes) produces the same rows.
"""

from .dedup import run_session_stream, run_streaming_dedup  # noqa: F401
from .windows import run_sliding_stream, run_tumbling_stream  # noqa: F401
