from schema_enforcer_spark.streaming.validate import (
    stream_row_violations,
    stream_verdicts,
    stream_dedup,
    stream_session_stats,
)

__all__ = ["stream_row_violations", "stream_verdicts", "stream_dedup", "stream_session_stats"]
