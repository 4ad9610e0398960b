"""Event-time windowed aggregation + sessionization (batch AND streaming).

The engine's event-stream operators over the ``events`` table
(event_id, ts, user_id, event_type, value, props). Each has ONE
implementation that runs identically as a batch DataFrame op and as a
Structured Streaming query — ``F.window`` / ``F.session_window`` are
supported in both modes, which is the parity contract the tests pin
(batch result == streaming result over the same rows).

Scale shapes (100 TB):
- ``windowed_event_counts``: map-side partial aggregation, shuffle keyed
  by (window, event_type) — key cardinality is windows x event types,
  independent of event count. Streaming: incremental state per live
  window; the watermark bounds state (windows older than it are
  finalized and evicted).
- ``sessionize``: shuffle keyed by user_id. Batch uses the classic
  gaps-and-islands form (lag + cumulative sum — one window pass, no
  self-join); streaming uses ``F.session_window`` whose state store
  merges per-user session fragments and the watermark closes sessions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import TimestampNTZType

__all__ = ["windowed_event_counts", "windowed_event_counts_oracle_sql",
           "sessionize", "sessionize_oracle_sql", "epoch_us"]


def epoch_us(df: DataFrame, col: str) -> Column:
    """Wall-clock epoch MICROSECONDS of a timestamp column, exact and
    session-timezone-independent for both TIMESTAMP and TIMESTAMP_NTZ.

    Parquet written by pyarrow reads back as TIMESTAMP_NTZ, whose wall
    value DuckDB's ``epoch_us`` treats as UTC; ``unix_micros`` rejects NTZ
    and casting NTZ→LTZ shifts by the session zone, so we difference
    against an epoch literal of the SAME type — pure wall arithmetic.
    """
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        origin = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"
    else:
        origin = "TIMESTAMP'1970-01-01 00:00:00+00:00'"
    return F.expr(f"timestampdiff(MICROSECOND, {origin}, {col})")


def windowed_event_counts(events: DataFrame, window: str = "10 minutes",
                          watermark: str | None = None,
                          ts_col: str = "ts") -> DataFrame:
    """Tumbling event-time windows per event_type: count + value stats.

    ``watermark``: set for streaming input (bounds state and admits
    late rows up to the delay); ignored semantically in batch mode.
    Output: (window_start, window_end, event_type, n_events, total_value,
    avg_value) — deterministic order in batch mode.
    """
    src = events
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    out = (src.groupBy(F.window(F.col(ts_col), window).alias("w"),
                       "event_type")
           .agg(F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("total_value"),
                F.round(F.avg("value"), 4).alias("avg_value"))
           .select(F.col("w.start").alias("window_start"),
                   F.col("w.end").alias("window_end"),
                   "event_type", "n_events", "total_value", "avg_value"))
    if not out.isStreaming:
        out = out.orderBy("window_start", "event_type")
    return out


def windowed_event_counts_oracle_sql(window_sec: int = 600,
                                     table: str = "events") -> str:
    """DuckDB twin: epoch-floor bucketing == Spark's tumbling ``F.window``
    (both align windows to the 1970-01-01 UTC epoch). Boundaries are
    emitted as epoch MICROSECOND integers — exact across engines and
    immune to session-timezone rendering of timestamps."""
    w_us = window_sec * 1_000_000
    return f"""
SELECT (epoch_us(ts) // {w_us}) * {w_us} AS window_start_us,
       (epoch_us(ts) // {w_us}) * {w_us} + {w_us} AS window_end_us,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value,
       ROUND(AVG(value), 4) AS avg_value
FROM {table}
GROUP BY 1, 2, 3
ORDER BY window_start_us, event_type
"""


def sessionize(events: DataFrame, gap: str = "30 minutes",
               watermark: str | None = None,
               ts_col: str = "ts") -> DataFrame:
    """Per-user sessions: a session ends after ``gap`` of inactivity.

    Output: (user_id, session_start, session_end_ts, n_events,
    total_value) where session_end_ts is the LAST EVENT's timestamp
    (not the gap-extended window end, so batch and oracle agree exactly).

    Batch: gaps-and-islands — lag over (user_id ORDER BY ts, event_id),
    new-session flag when the gap is exceeded, cumulative sum for the
    session id, one aggregation. Two window passes over a user_id
    shuffle, no self-join. Streaming: ``F.session_window`` (state-store
    merged, watermark-closed) with the same output columns.
    """
    gap_sec = _interval_seconds(gap)
    if events.isStreaming:
        src = events if watermark is None else \
            events.withWatermark(ts_col, watermark)
        return (src.groupBy(F.session_window(F.col(ts_col), gap), "user_id")
                .agg(F.count("*").alias("n_events"),
                     F.round(F.sum("value"), 4).alias("total_value"),
                     F.max(ts_col).alias("session_end_ts"),
                     F.min(ts_col).alias("session_start_"))
                .select("user_id",
                        F.col("session_start_").alias("session_start"),
                        "session_end_ts", "n_events", "total_value"))
    from pyspark.sql import Window
    gap_us = int(gap_sec * 1_000_000)   # exact integer-micros comparison
    ts_us = epoch_us(events, ts_col)
    w = Window.partitionBy("user_id").orderBy(ts_col, "event_id")
    flagged = events.withColumn(
        "new_sess",
        F.when(ts_us - F.lag(ts_us).over(w) > gap_us,
               F.lit(1)).otherwise(F.lit(0)))
    sess = flagged.withColumn(
        "sess_id", F.sum("new_sess").over(
            Window.partitionBy("user_id").orderBy(ts_col, "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id", "sess_id")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end_ts"),
                 F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .select("user_id", "session_start", "session_end_ts",
                    "n_events", "total_value")
            .orderBy("user_id", "session_start"))


def sessionize_oracle_sql(gap_sec: int = 1800, table: str = "events") -> str:
    """DuckDB twin of the batch sessionizer (gaps-and-islands). Session
    boundaries come back as epoch MICROSECOND integers (same rationale as
    :func:`windowed_event_counts_oracle_sql`); the gap test is the same
    exact integer-micros comparison the Spark op uses."""
    gap_us = gap_sec * 1_000_000
    return f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)) > {gap_us}
              THEN 1 ELSE 0 END AS new_sess
  FROM {table}
),
sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
)
SELECT user_id,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts)) AS session_end_us,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM sess
GROUP BY user_id, sess_id
ORDER BY user_id, session_start_us
"""


def _interval_seconds(s: str) -> float:
    n, unit = s.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    return float(n) * mult
