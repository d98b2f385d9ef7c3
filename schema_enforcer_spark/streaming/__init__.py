from schema_enforcer_spark.streaming.validate import (
    stream_row_violations,
    stream_verdicts,
    stream_dedup,
    stream_drift,
    stream_match_against_index,
    stream_quarantine,
    stream_session_stats,
    stream_equals_table,
    stream_outlier,
)
from schema_enforcer_spark.streaming.stateful import (
    stream_rate_limit,
    stream_stateful_contiguity,
)

__all__ = [
    "stream_row_violations",
    "stream_verdicts",
    "stream_dedup",
    "stream_drift",
    "stream_match_against_index",
    "stream_quarantine",
    "stream_session_stats",
    "stream_equals_table",
    "stream_outlier",
    "stream_rate_limit",
    "stream_stateful_contiguity",
]
