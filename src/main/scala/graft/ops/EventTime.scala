package graft.ops

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Tier C — event-time windowing over the `events` table (SURVEY.md §2.C).
  *
  * The reference is batch-only with no notion of time (nothing in any file
  * handles timestamps); these are the batch twins of the Structured
  * Streaming queries in `graft.streaming` — same `window()`/session logic,
  * so the streaming path is oracle-checked through its batch twin.
  *
  * Scale notes: `window()` is a plain projection (each row maps to 1 or
  * `ceil(len/slide)` windows) feeding a partial+final hash aggregation —
  * no driver-side state; sessionization uses one shuffle by `user_id`
  * (the natural 100-TB partitioning for per-user state) and in streaming
  * maps to `session_window` with watermark-bounded state.
  */
object EventTime {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Seq[Q] = Seq(

    // ── tumbling 1-day event-time window ─────────────────────────────────
    Q("q_tumbling_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sumDec2(col("value")).as("sum_val"))
        .select(col("w.start").as("ws"), col("event_type"), col("cnt"), col("sum_val"))
        .orderBy("ws", "event_type"),
      Some("""SELECT date_trunc('day', ts) AS ws, event_type,
                count(*) AS cnt,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
              FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ── sliding 3-day window, 1-day slide ────────────────────────────────
    // Each event lands in exactly 3 windows (starts d-2, d-1, d); Spark's
    // window() is epoch-aligned, so the oracle enumerates the same starts.
    Q("q_sliding_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "3 days", "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sumDec2(col("value")).as("sum_val"))
        .select(col("w.start").as("ws"), col("event_type"), col("cnt"), col("sum_val"))
        .orderBy("ws", "event_type"),
      Some("""SELECT ws, event_type, count(*) AS cnt,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
              FROM (SELECT unnest(generate_series(
                      date_trunc('day', ts) - INTERVAL 2 DAY,
                      date_trunc('day', ts), INTERVAL 1 DAY)) AS ws,
                    event_type, value
                    FROM events)
              GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ── sessionization: 30-min inactivity gap per user ───────────────────
    // Batch formulation: lag + cumulative-sum of session-start flags —
    // one shuffle by user_id, then a per-user sort inside WindowExec.
    // Streaming twin: session_window($"ts", "30 minutes") in
    // graft.streaming.StreamingOps.
    Q("q_sessionize",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
        t(s, dir, "events")
          .withColumn("new_sess",
            when(gapUs.isNull || gapUs > 1800L * 1000000L, 1L).otherwise(0L))
          .withColumn("sess_id",
            sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "sess_id")
          .agg(min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"),
            count(lit(1)).as("n_events"), sumDec2(col("value")).as("sum_val"))
          .orderBy("user_id", "sess_id")
      },
      Some("""WITH x AS (
                SELECT user_id, event_id, ts, value,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              y AS (
                SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS sess_id
                FROM x)
              SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
                min(ts) AS sess_start, max(ts) AS sess_end,
                count(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
              FROM y GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
