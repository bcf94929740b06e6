package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** Structured Streaming surface (SURVEY §2.C).
  *
  * The reference is batch-only (no file in it handles time); the north
  * star requires the `events` stream analog. Each transform here is a
  * plain `DataFrame => DataFrame` applied identically to a batch read or
  * a `readStream` — the twin-pair design that lets the DuckDB oracle
  * check streaming logic through its batch twin (`q_tumbling_window`,
  * `q_sliding_window`, `q_sessionize`) while StreamingSpec drives the
  * genuinely-streaming behaviors (incremental triggers, watermark
  * late-data drop, stateful sessionization) through a file source.
  *
  * Scale notes: all aggregations are keyed on (window, event_type) or
  * user_id, so streaming state partitions by the shuffle key exactly as
  * the batch shuffles do; watermarks bound state size — without one, a
  * 100-TB/day stream's window state grows forever.
  */
object StreamingOps {

  /** Schema of the prepared event batches (ts already micros). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet batches. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  // ── twin transforms (batch DataFrame or stream, same code) ───────────

  /** Tumbling 1-day window — streaming twin of `q_tumbling_window`. */
  def tumbling(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_val"))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"), col("sum_val"))

  /** Sliding 3-day/1-day window — streaming twin of `q_sliding_window`. */
  def sliding(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "3 days", "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"))

  /** Session windows with a 30-min gap via the built-in session_window —
    * works in batch AND streaming, and must agree with the batch
    * lag+cumsum formulation (`q_sessionize`); StreamingSpec asserts both.
    */
  def sessionWindows(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"),
        sum(col("value").cast(DecimalType(18, 2))).as("sum_dec"))
      .select(col("user_id"), col("sw.start").as("sess_start"),
        col("sw.end").as("sess_end"), col("n_events"),
        col("last_ts"), col("sum_dec"))

  /** Finish the drained [[sessionWindows]] state to EXACTLY the batch
    * q_sessionize output: per-user sess_id by session start (sessions
    * are disjoint per user, so rank-by-start reproduces the lag+cumsum
    * numbering), sess_end = last event ts (session_window's own `end`
    * is last + gap), DECIMAL value sum surfaced as double. Equality is
    * bit-for-bit PROVIDED no inter-event gap is exactly 30 min (the
    * built-in starts a new session at gap ≥ gap-duration, the lag
    * formulation at gap > it); StreamingSpec asserts that precondition
    * on the data before asserting the twin.
    */
  def sessionizeFinish(sessions: DataFrame): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("sess_start")
    sessions
      .withColumn("sess_id", row_number().over(byUser).cast("long"))
      .select(col("user_id"), col("sess_id"), col("sess_start"),
        col("last_ts").as("sess_end"), col("n_events"),
        col("sum_dec").cast("double").as("sum_val"))
      .orderBy("user_id", "sess_id")
  }

  /** Finish the SAME drained session state to the batch q_session_stats
    * duration-bucket census (one live state, two readouts — the
    * rolling-median/pinball discipline): all-integer durations and
    * counts, so drain ≡ batch at any trigger.
    */
  def sessionStatsFinish(sessions: DataFrame): DataFrame =
    sessions
      .select(col("n_events"),
        expr("(unix_micros(last_ts) - unix_micros(sess_start)) div 1000000")
          .as("dur_s"))
      .groupBy(length(bin(greatest(col("dur_s"), lit(1L)))).cast("long")
        .as("dur_bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        min(col("dur_s")).as("min_dur_s"),
        max(col("dur_s")).as("max_dur_s"))
      .orderBy("dur_bucket")

  /** Exact in-stream dedup by event_id, state bounded by the watermark. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Stream-stream inner join: purchases within one day of the same
    * user's signup. Both sides carry watermarks and the join condition
    * bounds event time on BOTH ends — that is what lets Spark expire
    * join state (without the time bound, both sides' state grows
    * forever; with it, state is capped at watermark + 1 day). Works
    * identically as a batch self-join — StreamingSpec asserts the twin
    * agreement.
    */
  def purchaseWithinDayOfSignup(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"))
      .withWatermark("signup_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", watermark)
    signups.join(purchases,
      col("s_user") === col("p_user")
        && col("purchase_ts") >= col("signup_ts")
        && col("purchase_ts") <= col("signup_ts") + expr("INTERVAL 1 DAY"))
      .select(col("s_user").as("user_id"), col("signup_ts"),
        col("purchase_ts"), col("value"))
  }

  /** Stream-static enrichment join: each micro-batch joins the stream
    * against a STATIC dimension snapshot. Stateless — no watermark and
    * no join state (the static side is re-planned per micro-batch, which
    * is also what picks up dimension updates between batches), and the
    * broadcast hint keeps the streaming side shuffle-free. The canonical
    * 100-TB enrichment shape: facts stream, dims broadcast.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  // ── custom state: flatMapGroupsWithState sessionizer ─────────────────

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long, value: Double)
  final case class SessState(sessionCount: Int, lastTs: Long, inSession: Long)
  final case class UserSessions(user_id: Long, sessions: Int, events: Long)

  /** Per-user session counting with explicit state — the
    * `flatMapGroupsWithState` fallback SURVEY §7.4-5 calls for when
    * session semantics outgrow `session_window` (e.g. per-user dynamic
    * gaps). ProcessingTimeTimeout keeps it runnable under
    * Trigger.AvailableNow in tests; production uses EventTimeTimeout to
    * expire state at the watermark.
    */
  def statefulSessionCount(events: Dataset[Ev]): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, UserSessions](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (uid, evs, state: GroupState[SessState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessState(0, Long.MinValue, 0))
          sorted.foreach { e =>
            val t = e.ts.getTime
            st =
              if (st.lastTs == Long.MinValue || t - st.lastTs > gapMs)
                SessState(st.sessionCount + 1, t, st.inSession + 1)
              else SessState(st.sessionCount, t, st.inSession + 1)
          }
          state.update(st)
          Iterator.single(UserSessions(uid, st.sessionCount, st.inSession))
      }
  }

  final case class OpenSession(start: Long, last: Long, n: Long)
  final case class ClosedSession(user_id: Long, sess_start: Timestamp,
      sess_end: Timestamp, n_events: Long)

  /** Event-time sessionizer with explicit state + EventTimeTimeout: a
    * session closes when a successor event arrives past the 30-min gap
    * (event-driven) OR when the watermark passes sess_end + gap
    * (timeout-driven) — so each user's non-final sessions emit as data
    * flows and the final one emits once the watermark clears it. This is
    * the full production shape `session_window` can't express when
    * per-session logic needs custom state.
    *
    * Input must already carry `withWatermark("ts", ...)` — event-time
    * timeouts are defined by that watermark.
    */
  def sessionizeWithTimeout(events: Dataset[Ev], gapMs: Long = 30L * 60 * 1000): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    // state tracks MICROsecond event times — Timestamp.getTime truncates
    // to millis, which would shave micros off emitted session bounds
    def us(t: Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000
    def tsOf(u: Long): Timestamp =
      Timestamp.from(java.time.Instant.ofEpochSecond(u / 1000000L, (u % 1000000L) * 1000))
    val gapUs = gapMs * 1000
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, evs, state: GroupState[OpenSession]) =>
          def closed(s: OpenSession) =
            ClosedSession(uid, tsOf(s.start), tsOf(s.last), s.n)
          if (state.hasTimedOut) {
            val out = closed(state.get)
            state.remove()
            Iterator.single(out)
          } else {
            val sorted = evs.toSeq.sortBy(e => (us(e.ts), e.event_id))
            val emitted = Seq.newBuilder[ClosedSession]
            var open = state.getOption
            sorted.foreach { e =>
              val t = us(e.ts)
              open match {
                case Some(s) if t - s.last <= gapUs =>
                  open = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  emitted += closed(s)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // timeout must be beyond the current watermark (ms API)
              state.setTimeoutTimestamp(
                math.max(s.last / 1000 + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            emitted.result().iterator
          }
      }
  }

  // ── stateful conversion funnel (streaming twin of q_funnel) ──────────

  final case class TypedEv(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String)
  /** Long.MinValue = stage not reached; micros otherwise. */
  final case class FunnelState(tView: Long, tClick: Long, tPurchase: Long)
  final case class FunnelRow(user_id: Long, t_view: Option[Timestamp],
      t_click: Option[Timestamp], t_purchase: Option[Timestamp], stage: Long)

  /** Incremental view → click → purchase funnel with explicit per-user
    * state: each stage time is the FIRST qualifying event at-or-after
    * the previous stage, exactly q_funnel's batch semantics, maintained
    * per micro-batch instead of by rescanning history. Assumes per-user
    * event-time-ordered delivery across batches (the streaming-funnel
    * norm — correcting an out-of-order earlier `view` would need
    * retraction); WITHIN a batch, events sort by (ts, stage-priority,
    * event_id) so a click sharing its timestamp with the first view
    * still counts, as the batch `>=` does. State is three longs per
    * user, emitted as an Update-mode row whenever the user has traffic;
    * `stage` is monotone, so the row with max stage is the final state.
    */
  def statefulFunnel(events: Dataset[TypedEv]): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    def us(t: Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000
    def tsOf(u: Long): Option[Timestamp] =
      if (u == Long.MinValue) None
      else Some(Timestamp.from(
        java.time.Instant.ofEpochSecond(u / 1000000L, (u % 1000000L) * 1000)))
    val prio = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
    val unset = Long.MinValue
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelRow](GroupStateTimeout.NoTimeout()) {
        case (uid, evs, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(unset, unset, unset))
          evs.toSeq.filter(e => prio.contains(e.event_type))
            .sortBy(e => (us(e.ts), prio(e.event_type), e.event_id))
            .foreach { e =>
              val t = us(e.ts)
              e.event_type match {
                case "view" if st.tView == unset =>
                  st = st.copy(tView = t)
                case "click" if st.tView != unset && st.tClick == unset
                    && t >= st.tView =>
                  st = st.copy(tClick = t)
                case "purchase" if st.tClick != unset && st.tPurchase == unset
                    && t >= st.tClick =>
                  st = st.copy(tPurchase = t)
                case _ => ()
              }
            }
          state.update(st)
          val stage = Seq(st.tView, st.tClick, st.tPurchase)
            .count(_ != unset).toLong
          FunnelRow(uid, tsOf(st.tView), tsOf(st.tClick), tsOf(st.tPurchase), stage)
      }
  }

  // ── stateful transition deltas (streaming twin of q_transitions) ─────

  /** One observed next-event transition (an increment row). */
  final case class TransitionDelta(user_id: Long, cur: String, nxt: String)
  /** Per-user tail of the event timeline: the latest event's (micros,
    * event_id, type) — all a transition counter must remember.
    */
  final case class LastEv(tUs: Long, eventId: Long, eventType: String)

  /** Incremental per-user next-event pairs with explicit state: each
    * micro-batch sorts its group's events by (ts, event_id) — the batch
    * `lead` window's exact order — prepends the remembered tail, and
    * emits one Append-mode delta row per consecutive pair. Downstream
    * counting (groupBy(cur, nxt)) turns the delta stream into the live
    * Markov transition matrix q_transitions computes by rescan. State is
    * one (long, long, string) per user — bounded by the user population,
    * not the stream; assumes per-user event-time-ordered delivery across
    * batches (same contract as [[statefulFunnel]] — correcting an
    * out-of-order arrival would need retraction).
    */
  def statefulTransitions(events: Dataset[TypedEv]): Dataset[TransitionDelta] = {
    import events.sparkSession.implicits._
    def us(t: Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEv, TransitionDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, evs, state: GroupState[LastEv]) =>
          val sorted = evs.toSeq.sortBy(e => (us(e.ts), e.event_id))
          val tail = state.getOption
          val timeline = tail.map(l => l.eventType).toSeq ++ sorted.map(_.event_type)
          val deltas = timeline.sliding(2).collect {
            case Seq(cur, nxt) => TransitionDelta(uid, cur, nxt)
          }.toVector
          sorted.lastOption.foreach(e =>
            state.update(LastEv(us(e.ts), e.event_id, e.event_type)))
          deltas.iterator
      }
  }

  // ── stateful weekly churn (streaming twin of q_churn) ────────────────

  /** A user's event collapsed to its calendar week (the input shape —
    * truncation stays columnar via `date_trunc("week", ts)`; callers
    * watermark the `wk` column, which is what the timeout reads).
    */
  final case class UserWeek(user_id: Long, wk: Timestamp)
  /** One (user, week) activity or churn observation. kind = "active"
    * on a user's first event in a calendar week; kind = "churn" for week
    * w once the user is known inactive in week w+7d.
    */
  final case class ChurnDelta(user_id: Long, wk: Timestamp, kind: String)
  /** Per-user state: the last active week's start (micros). */
  final case class LastWeek(wkUs: Long)

  /** Incremental weekly churn with explicit state + EventTimeTimeout.
    * Input is the (user_id, wk) stream with wk ALREADY truncated by the
    * same `date_trunc("week", ts)` the batch query uses (truncation
    * stays columnar; the state logic only compares week starts). Churn
    * at week w is decided two ways, exactly once per (user, w):
    *   - event-driven: the user's next active week arrives and is
    *     > w + 7d (the week w+7d passed empty);
    *   - timeout-driven: the watermark passes w + 14d (end of week
    *     w+7d) with no newer activity — `state.hasTimedOut` emits the
    *     churn and clears the user.
    * Downstream `groupBy(wk, kind)` folds the delta stream into the
    * live n_active/n_churned/rate table q_churn computes by rescan.
    * State is one long per user — bounded by the live (non-churned)
    * population, NOT the stream length, because timeout-closure evicts
    * inactive users; that is what makes this runnable forever at
    * 100-TB/day. Same per-user event-time-ordered delivery contract
    * across batches as [[statefulFunnel]]/[[statefulTransitions]].
    */
  def statefulChurn(weeks: Dataset[UserWeek]): Dataset[ChurnDelta] = {
    import weeks.sparkSession.implicits._
    def us(t: Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000
    def tsOf(u: Long): Timestamp =
      Timestamp.from(java.time.Instant.ofEpochSecond(u / 1000000L, (u % 1000000L) * 1000))
    val weekUs = 7L * 86400 * 1000000
    weeks
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastWeek, ChurnDelta](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, evs, state: GroupState[LastWeek]) =>
          if (state.hasTimedOut) {
            val out = ChurnDelta(uid, tsOf(state.get.wkUs), "churn")
            state.remove()
            Iterator.single(out)
          } else {
            val newWeeks = evs.map(e => us(e.wk)).toVector.distinct.sorted
            val timeline = state.getOption.map(_.wkUs).toVector ++
              newWeeks.dropWhile(w => state.getOption.exists(_.wkUs >= w))
            val deltas = Vector.newBuilder[ChurnDelta]
            // first touch of each week after the remembered one → active
            timeline.drop(if (state.getOption.isDefined) 1 else 0)
              .foreach(w => deltas += ChurnDelta(uid, tsOf(w), "active"))
            // consecutive pair with a skipped week → churn at the earlier
            timeline.sliding(2).foreach {
              case Vector(w1, w2) if w2 > w1 + weekUs =>
                deltas += ChurnDelta(uid, tsOf(w1), "churn")
              case _ => ()
            }
            timeline.lastOption.foreach { w =>
              state.update(LastWeek(w))
              // decidable once the watermark passes w + 14d (the empty
              // successor week has fully elapsed)
              state.setTimeoutTimestamp(
                math.max(w / 1000 + 14L * 86400 * 1000,
                  state.getCurrentWatermarkMs() + 1))
            }
            deltas.result().iterator
          }
      }
  }

  // ── stateful time-weighted average (twin of q_time_weighted_avg) ─────

  /** One CLOSED holding interval: duration + value-held × duration in
    * exact integer (cents × micros) — the same quantity the batch
    * query's decimal Σ(v·Δt) carries, scaled by 100.
    */
  final case class TwaDelta(user_id: Long, dt_us: Long, num_c: Long)
  /** Per-user carry: the OPEN interval's start micros + held cents. */
  final case class HeldValue(tUs: Long, cents: Long)

  /** Incremental duration-weighted value: state is the one OPEN holding
    * interval per user (a value "holds" until the user's next event).
    * Each arriving event CLOSES the open interval and emits its exact
    * (Δt, cents·Δt) delta in Append mode — cents via the same HALF_UP
    * 2-decimal rounding as the batch `dec2` cast, so the downstream
    * per-user fold Σnum_c / (100·ΣΔt) reproduces oracled
    * q_time_weighted_avg bit-for-bit (integer sums are order-free; the
    * division operands end up identical). Same per-user
    * event-time-ordered delivery contract as the other twins.
    */
  def statefulTwa(events: Dataset[Ev]): Dataset[TwaDelta] = {
    import events.sparkSession.implicits._
    def us(t: Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000
    def cents(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[HeldValue, TwaDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, evs, state: GroupState[HeldValue]) =>
          val sorted = evs.toSeq.sortBy(e => (us(e.ts), e.event_id))
          val pts = state.getOption.map(h => (h.tUs, h.cents)).toSeq ++
            sorted.map(e => (us(e.ts), cents(e.value)))
          // a same-instant successor still closes a (Δt = 0) interval —
          // the batch lead() counts it, so the twin must too
          val deltas = pts.sliding(2).collect {
            case Seq((t1, c1), (t2, _)) => TwaDelta(uid, t2 - t1, c1 * (t2 - t1))
          }.toVector
          pts.lastOption.foreach { case (t, c) =>
            state.update(HeldValue(t, c))
          }
          deltas.iterator
      }
  }

  // ── stateful EWMA (streaming twin of q_ewma) ─────────────────────────

  final case class EwmaDelta(user_id: Long, event_id: Long, ewma: Double,
      late: Boolean)
  /** Per-user carry: the running EWMA double plus the (micros, event_id)
    * high-water mark of everything already folded.
    */
  final case class EwmaState(s: Double, lastUs: Long, lastId: Long)

  /** Incremental per-user EWMA: state is ONE double plus an order
    * high-water mark. Each event folds s ← s/2 + v/2 in (ts, event_id)
    * order — the IDENTICAL IEEE op sequence as batch q_ewma's
    * sorted-array left fold, so after the stream drains, the last
    * emitted delta per user is bit-equal to the batch value
    * (StreamingSpec pins this).
    *
    * Unlike the order-free census twins, this fold is order-SENSITIVE:
    * sorting happens only within a micro-batch, so an event delivered in
    * a LATER micro-batch than its (ts, event_id) successor folds out of
    * order and batch bit-equality is void for that user. That violation
    * is detected, not silent: each delta carries `late` = "this event
    * sorted at or before the state's high-water mark", so a consumer
    * (or the parity spec) can count contract breaches instead of
    * trusting the delivery blindly. Append mode: every event emits its
    * post-fold running average — the live feature value a serving store
    * would ingest.
    */
  def statefulEwma(events: Dataset[Ev]): Dataset[EwmaDelta] = {
    import events.sparkSession.implicits._
    def us(t: Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, evs, state: GroupState[EwmaState]) =>
          val st = state.getOption.getOrElse(EwmaState(0.0, Long.MinValue,
            Long.MinValue))
          var s = st.s
          var hwUs = st.lastUs
          var hwId = st.lastId
          val out = evs.toSeq.sortBy(e => (us(e.ts), e.event_id)).map { e =>
            val eUs = us(e.ts)
            val late = eUs < hwUs || (eUs == hwUs && e.event_id <= hwId)
            if (!late) { hwUs = eUs; hwId = e.event_id }
            s = s * 0.5 + e.value * 0.5
            EwmaDelta(uid, e.event_id, s, late)
          }
          state.update(EwmaState(s, hwUs, hwId))
          out.iterator
      }
  }

  // ── stateful velocity flags (streaming twin of q_velocity_flags) ─────

  final case class VelocityFlag(user_id: Long, event_id: Long,
      event_type: String, velocity: Long, flagged: Boolean)
  /** Per-user carry: event micros within the trailing hour, ascending —
    * the sliding-window deque a live rate limiter keeps. Bounded by the
    * user's own event rate over ONE hour, never their history.
    */
  final case class VelState(recentUs: List[Long])

  /** Incremental trailing-hour velocity: each event folds into the
    * per-user deque (evicting entries older than an hour) and emits its
    * velocity + flag — the live rate-limiter decision stream. Same
    * (ts, event_id)-ordered per-user delivery contract as the other
    * stateful twins. Batch parity note: the batch RANGE window also
    * counts same-microsecond PEERS that sort after the current event;
    * the incremental fold cannot see the future, so bit-parity holds
    * exactly when (user, ts) pairs are unique — true of the generator,
    * asserted by the census-equality spec rather than assumed.
    */
  def statefulVelocity(events: Dataset[TypedEv]): Dataset[VelocityFlag] = {
    import events.sparkSession.implicits._
    def us(t: Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[VelState, VelocityFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, evs, state: GroupState[VelState]) =>
          var recent = state.getOption.map(_.recentUs).getOrElse(Nil)
          val out = evs.toSeq.sortBy(e => (us(e.ts), e.event_id)).map { e =>
            val eUs = us(e.ts)
            recent = (recent :+ eUs).filter(_ >= eUs - 3600L * 1000000L)
            VelocityFlag(uid, e.event_id, e.event_type,
              recent.size.toLong, recent.size >= 3)
          }
          state.update(VelState(recent))
          out.iterator
      }
  }

  // ── stateful last-touch attribution (streaming twin of q_attribution) ─

  final case class ValEv(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  /** Last marketing touch per user: micros + channel. */
  final case class TouchState(tUs: Long, channel: String)
  final case class AttributedPurchase(user_id: Long, event_id: Long,
      channel: String, value: Double)

  /** Incremental last-touch attribution: state is ONE (micros, channel)
    * per user — the only thing attribution needs to remember. Each
    * micro-batch walks its group's events in (ts, event_id) order
    * (q_attribution's exact window order): click/view updates the
    * remembered touch, purchase emits an Append-mode attribution delta
    * against the touch STRICTLY preceding it (7-day lookback, else
    * 'direct'). Downstream groupBy(channel) folds the delta stream into
    * the live census the batch query computes by rescan. Same
    * per-user event-time-ordered delivery contract as the other twins.
    */
  def statefulAttribution(events: Dataset[ValEv]): Dataset[AttributedPurchase] = {
    import events.sparkSession.implicits._
    def us(t: Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000
    val lookbackUs = 7L * 86400 * 1000000
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, AttributedPurchase](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, evs, state: GroupState[TouchState]) =>
          val out = Vector.newBuilder[AttributedPurchase]
          var touch = state.getOption
          evs.toSeq.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            e.event_type match {
              case "click" | "view" =>
                touch = Some(TouchState(us(e.ts), e.event_type))
              case "purchase" =>
                val ch = touch match {
                  case Some(t) if us(e.ts) - t.tUs <= lookbackUs => t.channel
                  case _ => "direct"
                }
                out += AttributedPurchase(uid, e.event_id, ch, e.value)
              case _ => ()
            }
          }
          touch.foreach(state.update)
          out.result().iterator
      }
  }

  // ── streaming heavy-hitter candidates (twin of q_heavy_hitters) ──────

  /** The Misra-Gries buffer AS streaming state: a global `graft_mg` agg
    * whose partials merge per micro-batch, so the live candidate set is
    * maintained in O(k) state for an unbounded stream — the streaming
    * half of q_heavy_hitters' two-pass design (the exact verify stays a
    * batch pass over candidates). Complete/Update output mode; the
    * no-false-negative guarantee (freq > n/(k+1) survives) holds at
    * every trigger because merge preserves it.
    */
  /** Running OLS trend moments per event type — streaming twin of
    * `q_regression`. The whole regression is five MERGEABLE sums
    * (n, Σx, Σx², Σy, Σxy), so the streaming state is exactly those
    * sums per event type (constant cardinality — state does not grow
    * with the stream), and Complete-mode output equals the batch
    * moments at any point the stream is drained. y-sums stay in
    * DECIMAL while streaming; [[trendFromMoments]] applies the same
    * integral-BIGINT rounding + finalization as the batch query.
    */
  def trendMoments(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        datediff(col("ts").cast("date"), lit("2024-01-01")).cast("long").as("x"),
        col("value").cast(DecimalType(18, 2)).as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y")).as("sy_dec"),
        sum(col("x") * col("y")).as("sxy_dec"))

  /** Finalize [[trendMoments]] state to (event_type, n, slope,
    * intercept) — identical arithmetic to the batch `q_regression`, so
    * a drained stream folds to the oracled batch answer bit-for-bit.
    */
  def trendFromMoments(m: DataFrame): DataFrame = {
    val sy = round(col("sy_dec"), 0).cast("long").cast("double")
    val sxy = round(col("sxy_dec"), 0).cast("long").cast("double")
    val slope = (col("n") * sxy - col("sx") * sy) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    m.select(col("event_type"), col("n").cast("long").as("n"),
      slope.as("slope"),
      ((sy - slope * col("sx")) / col("n")).as("intercept"))
  }

  def heavyHitterCandidates(tokens: DataFrame, k: Int = 64): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(tokens.sparkSession)
    tokens.agg(call_function("graft_mg", col("token"), lit(k)).as("cands"))
  }

  /** Per-type HLL audience sketches AS streaming state — the streaming
    * half of q_overlap_sketch: sketch buffers merge per micro-batch
    * (constant state per type, never user ids), so the live overlap
    * census is available at every trigger by the same
    * inclusion–exclusion read the batch query runs. HLL merge is
    * commutative/associative and deterministic, so a drained stream's
    * estimates equal the batch ones EXACTLY (StreamingSpec asserts
    * equality, not tolerance). Complete output mode.
    */
  def overlapSketches(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      .select(col("event_type"), hll_sketch_estimate(col("sk")).as("est"),
        col("sk"))

  /** Schema of the documents table (for the doc-ingest stream twins). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a directory of document parquet batches. */
  def readDocStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Streaming half of q_ks_drift: the per-(source, length) count
    * census as Complete-mode state — counts merge per micro-batch, and
    * the state is bounded by sources × distinct lengths (quantize the
    * length in production), never by docs seen. At any trigger,
    * [[graft.ops.Curation.ksFinish]] over the drained state yields the
    * live drift readout, and because the statistic is all-integer the
    * drained stream equals batch q_ks_drift EXACTLY (StreamingSpec
    * asserts equality, not tolerance) — the drift-monitor shape: a
    * pipeline flags a source the moment its KS stat crosses threshold,
    * without ever rescanning ingested history.
    */
  def driftCounts(docs: DataFrame): DataFrame =
    graft.ops.Curation.ksCounts(docs)

  /** Streaming half of q_tvd_drift — the categorical drift monitor.
    * Identical contract to [[driftCounts]]: the per-(source, lang)
    * census is mergeable Complete-mode state bounded by the catalog
    * (sources × langs, never docs seen), and because the TVD statistic
    * is all-integer until one final division,
    * [[graft.ops.Curation.tvdFinish]] over the drained state equals
    * batch q_tvd_drift EXACTLY at any trigger.
    */
  def langDriftCounts(docs: DataFrame): DataFrame =
    graft.ops.Curation.tvdCounts(docs)

  /** Streaming half of q_psi — the live serving-drift monitor. Identical
    * contract to [[driftCounts]]: the per-bin ref/cur count census is
    * mergeable Complete-mode state bounded by the score-bin grid (never
    * by events seen), and because the census is all-integer,
    * [[graft.ops.ModelEval.psiFinish]] over the drained state equals
    * batch q_psi EXACTLY at any trigger — a scoring service re-reads its
    * PSI gauge per trigger without rescanning event history.
    */
  def psiCounts(events: DataFrame): DataFrame =
    graft.ops.ModelEval.psiCensus(events)

  /** Streaming half of q_calibration — the live reliability diagram.
    * Same contract as [[psiCounts]]: per-bin (count, positives, exact
    * decimal score sum) as Complete-mode state bounded by the bin grid;
    * [[graft.ops.ModelEval.calibFinish]] over the drained state equals
    * batch q_calibration EXACTLY at any trigger.
    */
  def calibCounts(events: DataFrame): DataFrame =
    graft.ops.ModelEval.calibCensus(events)

  /** Streaming half of q_log_loss — the live cross-entropy monitor.
    * (p_mill, pos) count census as Complete-mode state bounded by the
    * 999×2 grid; [[graft.ops.ModelEval.logLossFinish]] over the drained
    * state equals batch q_log_loss EXACTLY at any trigger.
    */
  def logLossCounts(events: DataFrame): DataFrame =
    graft.ops.ModelEval.logLossCensus(events)

  /** Streaming half of q_confusion_multi — the live confusion monitor.
    * ≤25-cell census as Complete-mode state;
    * [[graft.ops.ModelEval.confusionFinish]] over the drained state
    * equals batch q_confusion_multi exactly.
    */
  def confusionCounts(events: DataFrame): DataFrame =
    graft.ops.ModelEval.confusionCells(events)

  /** Streaming half of q_anova — the live variance-decomposition
    * monitor. ≤5-row exact-decimal moment census as Complete-mode
    * state; [[graft.ops.ModelEval.anovaFinish]] over the drained state
    * equals batch q_anova exactly.
    */
  def anovaCounts(events: DataFrame): DataFrame =
    graft.ops.ModelEval.anovaCensus(events)

  /** Streaming half of q_mcnemar — the live paired-model comparison.
    * 2×2 agreement census as Complete-mode state (4 rows max);
    * [[graft.ops.ModelEval.mcnemarFinish]] over the drained state
    * equals batch q_mcnemar exactly at any trigger — two models stay
    * under a running significance readout without an event rescan.
    */
  def mcnemarCounts(events: DataFrame): DataFrame =
    graft.ops.ModelEval.mcnemarCensus(events)

  /** Streaming half of q_decayed_popularity — live recency-weighted
    * engagement. (type, day) census as Complete-mode state (calendar
    * bounded); [[graft.ops.EventTime.decayFinish]] re-anchors the
    * exact 2^-age weights on the state's CURRENT max date at every
    * trigger, so the readout tracks the stream head without any
    * event rescan — a pre-weighted running sum could never re-anchor.
    */
  def decayCounts(events: DataFrame): DataFrame =
    graft.ops.EventTime.decayCensus(events)

  /** Streaming half of q_poisson_dispersion — live burstiness monitor.
    * (type, day) count census as Complete-mode state (calendar
    * bounded); [[graft.ops.EventTime.poisFinish]] over the drained
    * state equals batch q_poisson_dispersion at any trigger.
    */
  def poisCounts(events: DataFrame): DataFrame =
    graft.ops.EventTime.poisCensus(events)

  /** Schema of the orders table (for the order-ingest stream twins). */
  val orderSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  /** File-source stream over a directory of orders parquet batches. */
  def readOrderStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(orderSchema).parquet(dir)

  /** Streaming half of q_changepoint — the live mean-shift monitor.
    * Identical contract to [[driftCounts]]: the (priority, day) revenue
    * census is mergeable Complete-mode state bounded by the calendar
    * (priorities × days, never orders seen), and because the CUSUM
    * statistic is all-integer until its two final divisions,
    * [[graft.ops.EventTime.cusumFinish]] over the drained state equals
    * batch q_changepoint EXACTLY at any trigger — a pipeline re-scores
    * the changepoint each trigger without rescanning order history.
    */
  def cusumCounts(orders: DataFrame): DataFrame =
    graft.ops.EventTime.cusumDaily(orders)

  /** Streaming half of q_calendar_gaps AND q_freshness — the live
    * ingest-health monitor. ONE Complete-mode (priority, day) count
    * census (bounded by priorities × calendar), TWO readouts:
    * [[graft.ops.EventTime.gapsFinish]] and
    * [[graft.ops.EventTime.freshnessFinish]] over the drained state
    * equal their batch queries EXACTLY at any trigger — the chi2/tvd
    * one-state-two-readouts discipline for feed monitoring.
    */
  def feedCounts(orders: DataFrame): DataFrame =
    graft.ops.EventTime.feedDaily(orders)

  /** Streaming half of q_error_burn — the live error-budget monitor.
    * The per-day (total, errors) census is mergeable Complete-mode
    * state bounded by the calendar; counts are exact, so
    * [[graft.ops.EventTime.errorFinish]] over the drained state equals
    * batch q_error_burn EXACTLY at any trigger — the burn-rate alert
    * re-scores each micro-batch without an event-history rescan.
    */
  def errorCounts(events: DataFrame): DataFrame =
    graft.ops.EventTime.errorDaily(events)

  /** Streaming half of q_rolling_median AND q_pinball_loss — the live
    * robust-smoother / quantile-forecast-loss monitors. The per-day
    * revenue census is ONE mergeable Complete-mode state bounded by the
    * calendar; all-integer, so [[graft.ops.EventTime.medianFinish]] and
    * [[graft.ops.EventTime.pinballFinish]] over the drained state equal
    * their batch queries EXACTLY at any trigger (one live census, two
    * readouts — the ANOVA/Tukey discipline).
    */
  def medianCounts(orders: DataFrame): DataFrame =
    graft.ops.EventTime.medianDaily(orders)

  /** Streaming half of the two-sample battery: the urgent-vs-rest
    * (v, c1, c2) value census is mergeable Complete-mode state —
    * [[graft.ops.ModelEval.tukeyQuickFinish]] /
    * [[graft.ops.ModelEval.cvmTwoSampleFinish]] over the drained
    * state equal their batch queries bit-for-bit (all-integer census,
    * one pinned division each).
    */
  def ansariValueCounts(orders: DataFrame): DataFrame =
    graft.ops.ModelEval.ansariCounts(orders)

  /** Streaming half of the ranking-quality battery (round-12 fourth
    * twin family — the live model monitor): the per-score
    * (value → count, positives) census is mergeable Complete-mode
    * state; [[graft.ops.ModelEval.aucFinish]] /
    * [[graft.ops.ModelEval.prCurveFinish]] /
    * [[graft.ops.ModelEval.ksModelFinish]] /
    * [[graft.ops.ModelEval.aucDelongFinish]] over the drained state
    * equal their batch queries bit-for-bit (all-integer census; the
    * finishes' divisions are pinned). One live state, four readouts.
    */
  def scoreCounts(events: DataFrame): DataFrame =
    graft.ops.ModelEval.scoreCensus(events)

  /** Streaming half of q_seasonality — the live calendar-profile
    * baseline. The dow×type census (counts + exact decimal value sums)
    * is mergeable Complete-mode state bounded at ≤7×|types| rows;
    * [[graft.ops.EventTime.seasonFinish]] over the drained state equals
    * batch q_seasonality EXACTLY at any trigger (counts and decimal
    * sums are order-free, the shares one IEEE division each).
    */
  def seasonalityCounts(events: DataFrame): DataFrame =
    graft.ops.EventTime.seasonCounts(events)

  /** Streaming half of q_seasonality_index — the live weekday-profile
    * monitor. The ≤7×|types| dow×type count census is mergeable
    * Complete-mode state; [[graft.ops.EventTime.seasonIdxFinish]] over
    * the drained state equals batch q_seasonality_index EXACTLY at any
    * trigger (exact counts, two IEEE divisions per cell).
    */
  def seasonIdxCounts(events: DataFrame): DataFrame =
    graft.ops.EventTime.seasonIdxCounts(events)

  /** Streaming half of q_psi_timeline — the live distribution-drift
    * monitor. State = the (week, value-bin) count census (calendar ×
    * bins bounded); [[graft.ops.EventTime.psiTimelineFinish]] over the
    * drained state equals batch q_psi_timeline EXACTLY at any trigger
    * (the Laplace smoothing and pinned folds live in the finish).
    */
  def psiTimelineCells(events: DataFrame): DataFrame =
    graft.ops.EventTime.psiTimelineCells(events)

  /** Streaming half of q_type_share_drift — the live mix-shift monitor.
    * State = the calendar × types weekly count census (grows with time,
    * not volume); [[graft.ops.EventTime.typeShareFinish]] over the
    * drained state equals batch q_type_share_drift EXACTLY at any
    * trigger.
    */
  def typeShareCounts(events: DataFrame): DataFrame =
    graft.ops.EventTime.typeShareCounts(events)

  private val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  /** File-source stream over a directory of customer parquet batches —
    * the population-ingest feed a live privacy monitor watches.
    */
  def readCustomerStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(customerSchema).parquet(dir)

  /** Streaming half of q_k_anonymity — the live privacy monitor. The
    * quasi-id equivalence-class census is mergeable Complete-mode state
    * bounded by the combo space (never the population);
    * [[graft.ops.Relational.kAnonFinish]] over the drained state equals
    * batch q_k_anonymity EXACTLY at any trigger (exact counts) — each
    * ingest micro-batch re-audits re-identification risk without a
    * population rescan.
    */
  /** Streaming half of q_jarque_bera — live normality monitor. Per-
    * segment exact power sums as Complete-mode state (≤segments rows);
    * [[graft.ops.ModelEval.jbFinish]] over the drained state equals
    * batch q_jarque_bera EXACTLY at any trigger (exact DECIMAL sums).
    */
  def jbCounts(customers: DataFrame): DataFrame =
    graft.ops.ModelEval.jbCensus(customers)

  def kAnonCounts(customers: DataFrame): DataFrame =
    graft.ops.Relational.kAnonCensus(customers)

  /** Streaming half of q_effect_sizes — live effect-size monitor for
    * the BUILDING/AUTOMOBILE balance split. The distinct-cent value
    * census is Complete-mode state bounded by the acctbal domain grid;
    * [[graft.ops.ModelEval.effectFinish]] over the drained state equals
    * batch q_effect_sizes EXACTLY at any trigger (exact counts).
    */
  def effectCounts(customers: DataFrame): DataFrame =
    graft.ops.ModelEval.effectCensus(customers)

  /** Streaming half of q_export_shards — the live export manifest. The
    * 16-row per-shard census (counts, token sums, order-free XOR
    * fingerprints) is mergeable Complete-mode state;
    * [[graft.ops.Curation.shardFinish]] over the drained state equals
    * batch q_export_shards EXACTLY at any trigger — the manifest a
    * loader validates is maintained during ingest, not recomputed by a
    * corpus rescan at export time.
    */
  def shardCounts(docs: DataFrame): DataFrame =
    graft.ops.Curation.shardCensus(docs)

  /** Streaming half of q_fairness_gaps — the live parity monitor. The
    * 5-row cohort confusion census is all counts (mergeable
    * Complete-mode state); [[graft.ops.ModelEval.fairnessFinish]] over
    * the drained state equals batch q_fairness_gaps EXACTLY at any
    * trigger — the release gate's fairness audit re-scores per
    * micro-batch without an event-history rescan.
    */
  def fairnessCounts(events: DataFrame): DataFrame =
    graft.ops.ModelEval.fairnessCensus(events)

  /** Run a stream to completion with Trigger.AvailableNow into a memory
    * sink; returns the sink table contents.
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }

  /** Production sink shape: foreachBatch → one parquet directory per
    * microbatch (`batch_id=N/`). Restart-idempotent: a replayed batch id
    * overwrites its own directory and no other — the standard
    * exactly-once-by-partition contract for file sinks.
    */
  def runToParquet(df: DataFrame, outDir: String, checkpoint: String,
      mode: OutputMode = OutputMode.Append()): Unit = {
    val q = df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
