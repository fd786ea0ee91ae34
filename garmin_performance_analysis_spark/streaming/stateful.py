"""Streaming-native operators beyond the reference's batch surface.

The reference has no streaming (SURVEY.md §2.12) — its sync is batch
cron.  A live Garmin feed, however, is exactly the workload Structured
Streaming models: per-second metrics arriving per activity, late and
out of order.  Two streaming-native renditions of catalog semantics:

- ``watermarked_window_stats``: A2/A7's time-bucket stats as a
  watermarked tumbling-window aggregation — late rows inside the
  watermark still land in their window; older ones are dropped with
  bounded state.
- ``sustained_runs_stateful``: T3's gaps-and-islands sustained-run
  filter as an ``applyInPandasWithState`` operator — the island state
  (current run start/last/count) lives in the state store per key, so
  runs that span micro-batches close correctly; a processing-time
  timeout flushes a dangling open run when its stream goes quiet.

Scale notes: state is O(1) per key (three numbers), not O(rows); the
watermark bounds the window state; both operators shuffle once on the
grouping key — the same key the batch twins shuffle on.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def watermarked_window_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    value_col: str = "v",
    key_col: str | None = None,
    window: str = "5 minutes",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window COUNT/SUM/AVG/MIN/MAX with late-data handling —
    the streaming twin of ``operators/stats.time_range_stats`` (A2).

    The watermark is what bounds state at scale: windows older than
    (max event time − watermark) finalize and leave the store.
    """
    keys = [F.window(ts_col, window).alias("win")]
    if key_col is not None:
        keys.append(F.col(key_col))
    v = F.col(value_col)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).alias("value_sum"),
            F.avg(v).alias("value_avg"),
            F.min(v).alias("value_min"),
            F.max(v).alias("value_max"),
        )
    )


_RUNS_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("island_start", T.LongType()),
        T.StructField("island_end", T.LongType()),
        T.StructField("island_rows", T.LongType()),
    ]
)

_RUNS_STATE = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("last", T.LongType()),
        T.StructField("rows", T.LongType()),
    ]
)


def _sustained_runs_fn(max_gap: int, min_span: int, timeout_ms: int | None):
    """Build the per-key state function. Rows arrive as (key, seq)
    already flagged; state carries the open island. Emits an island
    when a gap > max_gap closes it (or on timeout), keeping only spans
    >= min_span — byte-for-byte T3 semantics
    (``form_anomaly_detector.py:289-328``)."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            if state.exists:
                start, last, rows = state.get
                state.remove()
                if last - start + 1 >= min_span:
                    yield pd.DataFrame(
                        {
                            "key": [key[0]],
                            "island_start": [start],
                            "island_end": [last],
                            "island_rows": [rows],
                        }
                    )
            return
        seqs: list[int] = []
        for pdf in pdfs:
            seqs.extend(int(s) for s in pdf["seq"])
        seqs.sort()
        start, last, rows = state.get if state.exists else (None, None, 0)
        out_start, out_end, out_rows = [], [], []
        for s in seqs:
            if start is None:
                start, last, rows = s, s, 1
            elif s - last <= max_gap:
                if s != last:
                    last, rows = s, rows + 1
            else:
                if last - start + 1 >= min_span:
                    out_start.append(start)
                    out_end.append(last)
                    out_rows.append(rows)
                start, last, rows = s, s, 1
        state.update((start, last, rows))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if out_start:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(out_start),
                    "island_start": out_start,
                    "island_end": out_end,
                    "island_rows": out_rows,
                }
            )

    return fn


def sustained_runs_stateful(
    flagged: DataFrame,
    key_col: str,
    seq_col: str,
    max_gap: int = 2,
    min_span: int = 5,
    timeout_ms: int | None = None,
) -> DataFrame:
    """T3 sustained-run detection over a STREAM of flagged rows.

    Batch T3 (``operators/windows.sustained_islands``) needs the whole
    partition; here the open island lives in the state store so a run
    spanning micro-batches still closes correctly. Completed islands
    emit as soon as a gap closes them.

    ``timeout_ms`` arms a processing-time timeout that flushes the
    final open island of a quiet key — use it for CONTINUOUS queries.
    Leave it ``None`` for ``Trigger.AvailableNow`` drains: a pending
    timeout makes AvailableNow spin "no new data but cleaning up
    state" micro-batches indefinitely instead of terminating (observed
    on Spark 4.1: 140+ empty batches before the drain was killed), and
    the open island correctly survives in the store for the next drain
    anyway.
    """
    rows = flagged.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(seq_col).cast("long").alias("seq"),
    )
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return rows.groupBy("key").applyInPandasWithState(
        _sustained_runs_fn(max_gap, min_span, timeout_ms),
        outputStructType=_RUNS_OUTPUT,
        stateStructType=_RUNS_STATE,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def sessionized_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str | None = None,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T9's gap-sessionization as a STREAMING query: Spark's native
    ``session_window`` merges events separated by less than ``gap``
    into one growing window per key; a session finalizes (and emits,
    in append mode) once the event-time watermark passes its close.

    This is the streaming twin of the batch t9 entry (LAG + running
    sum) — the batch and streaming paths agree because both define a
    session break as ``gap_to_previous > gap`` (cross-validated for
    the batch operator against session_window in
    ``tests/test_property_semantics.py``).  State is one open window
    per active key, bounded by the watermark — the shape that survives
    an unbounded feed.
    """
    keys = [F.session_window(F.col(ts_col), gap).alias("session"), F.col(key_col)]
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    return stream.withWatermark(ts_col, watermark).groupBy(*keys).agg(*aggs)
