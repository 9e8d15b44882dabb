package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.streaming.EventStreams

/** Batch twins of the streaming operators (SURVEY.md §2B E17).
  *
  * The same EventStreams transform runs here on a batch frame so the
  * DuckDB oracle can value-check windowing/session semantics;
  * StreamingSpec replays identical rows through readStream micro-
  * batches and asserts row-for-row agreement with these plans.
  */
object Streaming extends Catalog {

  private def events(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "events")

  override def queries: Map[String, Q] = Map(

    // ----- tumbling window agg --------------------------------------
    "q37_tumbling_window" -> Q(
      fn = (s, d) => EventStreams.tumblingCounts(events(s, d), withWatermarkCol = false),
      sql = Some("""
        SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP)) AS w_start,
               event_type, count(*) AS n, sum(value) AS sum_value
        FROM events GROUP BY 1, 2"""),
      scaleNote = "map-side partial agg per (window,type); watermark (streaming twin) bounds state to ~1 h per key"),

    // ----- sliding window agg ---------------------------------------
    "q38_sliding_window" -> Q(
      fn = (s, d) => EventStreams.slidingCounts(events(s, d), withWatermarkCol = false),
      sql = Some("""
        SELECT epoch_us(time_bucket(INTERVAL 30 MINUTE, ts::TIMESTAMP)
                 - o * INTERVAL 30 MINUTE) AS w_start,
               count(*) AS n, avg(value) AS avg_value
        FROM (SELECT ts, value, unnest([0, 1]) AS o FROM events)
        GROUP BY 1"""),
      scaleNote = "1h/30min slide = 2 windows per event, expanded before the shuffle — same Expand strategy as rollup"),

    // ----- session windows (5 min gap) ------------------------------
    "q39_session_window" -> Q(
      fn = (s, d) => EventStreams.sessionCounts(events(s, d), withWatermarkCol = false),
      sql = Some("""
        WITH marked AS (
          SELECT user_id, ts::TIMESTAMP AS ts, value,
                 CASE WHEN ts::TIMESTAMP - lag(ts::TIMESTAMP) OVER w >= INTERVAL 5 MINUTE
                      OR lag(ts::TIMESTAMP) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sessions AS (
          SELECT user_id, ts, value,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM marked)
        SELECT user_id,
               epoch_us(min(ts)) AS s_start,
               epoch_us(max(ts) + INTERVAL 5 MINUTE) AS s_end,
               count(*) AS n, sum(value) AS sum_value
        FROM sessions GROUP BY user_id, sid"""),
      scaleNote = "session_window is a first-class Spark operator — one shuffle on user_id, sessions merged in-state; the SQL twin is the gaps-and-islands equivalent")
  )
}
