"""Click-to-view attribution: the stream-stream interval join.
[north_rule extension — the reference is batch-BSP only]

The canonical last-touch attribution rule: a click is credited to the
MOST RECENT view by the same user within a lookback window. One rule,
two modes (the streaming/dedup.py pattern):

* batch: interval equi-join (user_id + time bounds) then a
  max-struct argmax per click — deterministic (latest view_ts, ties
  to the larger view id), SQL-oracle-friendly;
* streaming: both sides watermarked, the SAME join condition as a
  Structured Streaming stream-stream interval join — Spark bounds the
  view-side state by `lookback + watermark` and the click-side by the
  watermark (the capability this module exists to exercise; the
  PER-PAIR output is the streaming contract, the argmax reduction
  runs downstream of the join exactly as in batch).

Parity: the stream pairs equal the batch pairs for any arrival order
the watermark admits — pinned in tests/test_attribution.py.

100-TB shape: the join exchanges both sides hash-partitioned by
user_id once; state per live user is (views in lookback horizon) —
bounded by the watermark, not history. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _window_cond(clicks: DataFrame, views: DataFrame, lookback_minutes: int):
    """The one interval-join predicate both batch and stream share:
    same user, click within [view_ts, view_ts + lookback]."""
    return (
        (clicks["user_id"] == views["v_user"])
        & (clicks["click_ts"] >= views["view_ts"])
        & (
            clicks["click_ts"]
            <= views["view_ts"]
            + F.expr(f"INTERVAL {int(lookback_minutes)} MINUTES")
        )
    )


def _split(events: DataFrame):
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return views, clicks


def attribution_pairs(
    events: DataFrame, lookback_minutes: int = 30
) -> DataFrame:
    """-> every (click, candidate view) pair within the lookback
    window — the raw interval-join output both modes share."""
    views, clicks = _split(events)
    cond = _window_cond(clicks, views, lookback_minutes)
    return clicks.join(views, cond, "inner").select(
        "click_id", "user_id", "click_ts", "view_id", "view_ts"
    )


def attributed_clicks(
    events: DataFrame, lookback_minutes: int = 30
) -> DataFrame:
    """Batch last-touch attribution -> one row PER CLICK:
    (click_id, user_id, click_ts, view_id, view_ts, lag_seconds),
    view columns NULL when no view precedes the click in the window.
    Deterministic argmax: latest view_ts, ties to the larger view_id
    (one max-struct aggregate — map-side combinable, no window over
    the pair set)."""
    views, clicks = _split(events)
    pairs = attribution_pairs(events, lookback_minutes)
    best = pairs.groupBy("click_id").agg(
        F.max(F.struct("view_ts", "view_id")).alias("best")
    )
    return (
        clicks.join(best, "click_id", "left")
        .select(
            "click_id",
            "user_id",
            "click_ts",
            F.col("best.view_id").alias("view_id"),
            F.col("best.view_ts").alias("view_ts"),
            (
                F.unix_timestamp("click_ts")
                - F.unix_timestamp(F.col("best.view_ts"))
            ).alias("lag_seconds"),
        )
    )


def attribution_pairs_stream(
    events_stream: DataFrame,
    lookback_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming form of attribution_pairs: the same interval join
    with both sides watermarked, so Spark can expire view-side state
    past (lookback + watermark) and click-side state past the
    watermark. Feed the result to the SAME downstream argmax as
    batch (per microbatch or via foreachBatch for exact last-touch)."""
    views, clicks = _split(events_stream)
    views = views.withWatermark("view_ts", watermark)
    clicks = clicks.withWatermark("click_ts", watermark)
    cond = _window_cond(clicks, views, lookback_minutes)
    return clicks.join(views, cond, "inner").select(
        "click_id", "user_id", "click_ts", "view_id", "view_ts"
    )
