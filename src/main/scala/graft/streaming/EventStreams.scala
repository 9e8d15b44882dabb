package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operators over the `events` table (SURVEY.md §2B E17).
  *
  * The reference has no streaming semantics (STDIN is a finite batch),
  * so correctness is anchored on BATCH EQUIVALENCE: every transform
  * here is a plain DataFrame→DataFrame function that works identically
  * on a batch frame (where the DuckDB oracle checks it) and on a
  * `readStream` frame (where StreamingSpec replays the same rows
  * through micro-batches and asserts the same result).
  *
  * Scale: all of these are keyed-state operators — state is
  * partitioned by (window/key), watermark bounds state size, and
  * nothing here ever collects to the driver.
  */
object EventStreams {

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** tumbling 1 h counts per event_type; watermark bounds state */
  def tumblingCounts(events: DataFrame, withWatermarkCol: Boolean = true): DataFrame = {
    val src = if (withWatermarkCol) events.withWatermark("ts", "10 minutes") else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("w_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** sliding 1 h / 30 min revenue-ish windows */
  def slidingCounts(events: DataFrame, withWatermarkCol: Boolean = true): DataFrame = {
    val src = if (withWatermarkCol) events.withWatermark("ts", "10 minutes") else events
    src.groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))
      .select(unix_micros(col("window.start")).as("w_start"),
        col("n"), col("avg_value"))
  }

  /** per-user session windows with a 5 min inactivity gap */
  def sessionCounts(events: DataFrame, withWatermarkCol: Boolean = true): DataFrame = {
    val src = if (withWatermarkCol) events.withWatermark("ts", "10 minutes") else events
    src.groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("s_start"),
        unix_micros(col("session_window.end")).as("s_end"),
        col("n"), col("sum_value"))
  }

  /** per-hour OHLC bars per event_type — q123's transform, shared so
    * the streaming replay and the batch oracle check the same plan.
    * Ordering key is the scalar ts (not a struct): fixed-width agg
    * buffer keeps both the batch HashAggregate and the streaming
    * state row compact; see q123's determinism precondition.
    */
  def ohlcBars(events: DataFrame, withWatermarkCol: Boolean = true): DataFrame = {
    val src = if (withWatermarkCol) events.withWatermark("ts", "10 minutes") else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        count(lit(1)).as("n"),
        // round(,6): the only non-pick aggregate — the double sum
        // merges partials in partition order, so raw low bits differ
        // across engines/replays (q117's canonicalization discipline)
        round(sum(col("value")), 6).as("volume"))
      .select(unix_micros(col("window.start")).as("bar_start"),
        col("event_type"), col("open"), col("high"), col("low"),
        col("close"), col("n"), col("volume"))
  }

  /** exactly-once-per-id view under late/duplicate delivery: streaming
    * dedup whose state expires with the watermark
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** stream-stream interval join: every error is matched to the same
    * user's clicks in the preceding 30 minutes. Both sides carry
    * watermarks, so the join's buffered state expires instead of
    * growing with the stream — the property that matters at 100 TB/day.
    * Works identically on batch frames (withWatermark is a no-op there),
    * which is how StreamingSpec anchors its correctness.
    *
    * `joinType` extends the same plan to the OUTER variants a real
    * sessionization pipeline needs: "left_outer" emits every error —
    * null-padded when no click preceded it — and "full_outer"
    * additionally emits clicks that never led to an error. In
    * streaming, the null-padded rows are held back until the
    * watermark passes the interval's end (only then is "no match"
    * final); in batch they appear immediately, so the end state is
    * identical — which is exactly what StreamingSpec asserts.
    */
  def clickErrorJoin(clicks: DataFrame, errors: DataFrame,
      joinType: String = "inner"): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_uid"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "10 minutes")
    val e = errors
      .select(col("user_id"), col("ts").as("err_ts"),
        col("event_id").as("err_id"))
      .withWatermark("err_ts", "10 minutes")
    e.join(c,
        col("user_id") === col("c_uid") &&
        col("click_ts") >= col("err_ts") - expr("INTERVAL 30 MINUTES") &&
        col("click_ts") <= col("err_ts"),
        joinType)
      // full outer: unmatched clicks have a null user_id on the error
      // side — surface the click's own user so every output row is
      // attributable
      .select(col("err_id"), col("click_id"),
        coalesce(col("user_id"), col("c_uid")).as("user_id"),
        unix_micros(col("err_ts")).as("err_us"),
        unix_micros(col("click_ts")).as("click_us"))
  }

  final case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  final case class EwmaPoint(user_id: Long, rn: Long, ewma: Double)

  /** streaming twin of batch q114: per-user EWMA as keyed sequential
    * state. Rows inside a micro-batch are sorted by (ts, event_id)
    * before folding — the group iterator's order after the shuffle is
    * not contractual — and the recurrence then continues across
    * batches from the stored (rn, ewma). Same 0.3/0.7 literals as the
    * batch query, so a ts-ordered replay is bit-identical to it
    * (StreamingSpec asserts exactly that). Contract: the series order
    * IS per-key arrival order across batches — a cross-batch late
    * event folds at the position it ARRIVES, not at its timestamp
    * (re-folding history would mean buffering the full series per
    * key; feed the stream in order, or accept processing-order
    * semantics — applies equally to [[ewmaPerUserV2]]).
    */
  def ewmaPerUser(events: Dataset[Event]): Dataset[EwmaPoint] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaPoint, EwmaPoint](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[EwmaPoint]) =>
          var rn = state.getOption.map(_.rn).getOrElse(0L)
          var s = state.getOption.map(_.ewma).getOrElse(0.0)
          val out = rows.toSeq
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
            .map { e =>
              s = if (rn == 0L) e.value else 0.3 * e.value + 0.7 * s
              rn += 1
              EwmaPoint(uid, rn, s)
            }
          if (out.nonEmpty) state.update(out.last)
          out.iterator
      }
  }

  final case class CusumRow(key: String, d: Long, x: Long, k: Long, h: Long)
  final case class CusumPoint(key: String, d: Long, x: Long, s: Long, alarm: Long)
  final case class CusumState(p: Long, minp: Long)

  /** Streaming twin of batch q194: Page's CUSUM as keyed sequential
    * state — per key just TWO longs, the running prefix sum P and the
    * prefix minimum (seeded 0, the virtual empty prefix the batch
    * closed form also carries), folding exactly the recurrence
    * S_t = max(0, S_{t−1} + x − k). The caller supplies each row's
    * reference k and threshold h (in production they come from a
    * trained window and broadcast-join onto the daily feed). Rows
    * inside a micro-batch fold in day order ([[ewmaPerUser]]'s
    * stance); across batches the contract is ordered ingestion per
    * key — a late day folds where it arrives. StreamingSpec asserts a
    * chunked replay is row-identical to the batch q194 detector.
    */
  def cusumPerKey(rows: Dataset[CusumRow]): Dataset[CusumPoint] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, CusumPoint](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[CusumRow], state: GroupState[CusumState]) =>
          var p = state.getOption.map(_.p).getOrElse(0L)
          var minp = state.getOption.map(_.minp).getOrElse(0L)
          val out = it.toSeq.sortBy(_.d).map { r =>
            p += r.x - r.k
            if (p < minp) minp = p
            val s = p - minp
            CusumPoint(key, r.d, r.x, s, if (s > r.h) 1L else 0L)
          }
          state.update(CusumState(p, minp))
          out.iterator
      }
  }

  final case class ChartRow(
      key: String, d: Long, x: Long, mu: Long, varnum: Long, n0: Long)
  final case class ChartPoint(
      key: String, d: Long, x: Long, z: Double, alarm: Long)
  /** lastD makes the ordered-ingestion contract SELF-ENFORCING
    * (ADVICE r13): a late or redelivered row (d ≤ lastD) is dropped.
    * UPGRADE NOTE: adding lastD WIDENED the value-state schema vs the
    * r13 2-field shape — a deployment restarting these processors
    * from a pre-r14 checkpoint fails the state store's schema check
    * rather than resuming; restart from a fresh checkpoint (replaying
    * the seed window), or bump the stateful operator's name to
    * version the state explicitly. In-repo replays always start
    * fresh, so only external deployments care.
    * instead of folding as-if-newest and silently corrupting z/g.
    */
  final case class ChartState(z: Double, g: Double, lastD: Long)

  /** Streaming twin of batch q207: Roberts' EWMA control chart as
    * keyed sequential state on the state-v2 transformWithState
    * surface (the q199 precedent applied to the chart, on the newer
    * API its three-doubles-per-key state was made for). State is
    * (z, g): the smoother z_t = 0.2·x + 0.8·z_{t−1} seeded at the
    * key's first row with its reference mean, and the iteratively-
    * carried limit factor g ← 0.64·g (no pow() — the q207/q114
    * discipline, so the stream is bit-identical to the batch scan AND
    * the recursive-CTE oracle). The caller supplies each row's
    * reference (mu, varnum, n0) — in production a trained window
    * broadcast onto the daily feed. Rows inside a micro-batch fold in
    * day order; across batches the contract is ordered ingestion per
    * key. The alarm compare reproduces q207's float expression
    * verbatim: dev²·1.8·n0² > 9·0.2·varnum·(1−g).
    */
  class EwmaChartProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, ChartRow, ChartPoint] {
    @transient private var st:
        org.apache.spark.sql.streaming.ValueState[ChartState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[ChartState]("chart",
        org.apache.spark.sql.Encoders.product[ChartState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[ChartRow],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[ChartPoint] = {
      val prev = if (st.exists()) Some(st.get()) else None
      // self-enforcing ordering contract: fold only rows STRICTLY past
      // the last folded day — a redelivered/late row is dropped (state
      // and output untouched), never folded as if newest (ADVICE r13)
      var lastD = prev.map(_.lastD).getOrElse(Long.MinValue)
      var z = prev.map(_.z).getOrElse(0.0)
      var g = prev.map(_.g).getOrElse(1.0)
      var seeded = prev.isDefined
      val out = Vector.newBuilder[ChartPoint]
      var accepted = false
      rows.toSeq.sortBy(_.d).foreach { r =>
        if (r.d > lastD) {
          if (!seeded) { z = r.mu.toDouble; seeded = true }
          lastD = r.d
          val mu = r.mu; val varnum = r.varnum; val n0 = r.n0
          z = 0.2 * r.x + 0.8 * z
          g = g * 0.64
          val dev = z - mu
          val alarm =
            if (dev * dev * 1.8 * n0 * n0 >
              9.0 * 0.2 * varnum * (1.0 - g)) 1L else 0L
          out += ChartPoint(key, r.d, r.x, z, alarm)
          accepted = true
        }
      }
      if (accepted) st.update(ChartState(z, g, lastD))
      out.result().iterator
    }
  }

  def ewmaChartPerKey(rows: Dataset[ChartRow]): Dataset[ChartPoint] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.key)
      .transformWithState(new EwmaChartProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  final case class HwRow(key: String, d: Long, x: Long)
  final case class HwPoint(key: String, d: Long, x: Long, fc: Double)
  /** (rows seen, last folded day, partial seed week, level, trend,
    * 7-slot seasonal) — nine doubles + at most eight longs per key
    * once seeded. lastD makes the ordered-ingestion contract
    * self-enforcing (ADVICE r13): a late or redelivered row
    * (d ≤ lastD) is dropped, never folded as if newest.
    */
  final case class HwState(
      n: Long, lastD: Long, seed: Seq[Long], l: Double, b: Double,
      sv: Seq[Double])

  /** Streaming twin of batch q213: the Holt-Winters additive smoother
    * as keyed sequential state. The one genuinely stateful wrinkle vs
    * q212's chart is the SEED — the smoother needs a full period
    * before its first forecast, so the state carries the partial seed
    * week until row 7 arrives (possibly several micro-batches later),
    * then flips to (l, b, s[7]). Recurrence, seeding and coefficients
    * are q213's verbatim (α = 1/8, β = 1/16, γ = 1/4, slot cycles by
    * per-key row count), so a day-ordered replay is bit-identical to
    * the batch scan and carries q213's exact oracle.
    */
  class HoltWintersProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, HwRow, HwPoint] {
    @transient private var st:
        org.apache.spark.sql.streaming.ValueState[HwState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[HwState]("hw",
        org.apache.spark.sql.Encoders.product[HwState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[HwRow],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[HwPoint] = {
      val rs = rows.toSeq.sortBy(_.d)
      if (rs.isEmpty) Iterator.empty
      else {
        val s0 = if (st.exists()) st.get()
                 else HwState(0L, Long.MinValue, Vector.empty, 0.0, 0.0,
                   Vector.empty)
        var n = s0.n
        var lastD = s0.lastD
        var seed = s0.seed.toVector
        var l = s0.l
        var b = s0.b
        val sv = new Array[Double](7)
        if (n >= 7) s0.sv.copyToArray(sv)
        val out = Vector.newBuilder[HwPoint]
        // drop rows at or before the last folded day (ADVICE r13):
        // the recurrence is order-defined, so a redelivery must be a
        // no-op, not a corrupting fold
        rs.foreach { r => if (r.d > lastD) {
          lastD = r.d
          n += 1
          if (n <= 7) {
            seed :+= r.x
            if (n == 7) {
              l = seed.sum.toDouble / 7.0
              b = 0.0
              for (i <- 0 until 7) sv(i) = seed(i).toDouble - l
            }
          } else {
            val slot = ((n - 1) % 7).toInt
            val sold = sv(slot)
            val fc = (l + b) + sold
            val lPrev = l
            val bPrev = b
            l = 0.125 * (r.x - sold) + 0.875 * (lPrev + bPrev)
            b = 0.0625 * (l - lPrev) + 0.9375 * bPrev
            sv(slot) = 0.25 * (r.x - (lPrev + bPrev)) + 0.75 * sold
            out += HwPoint(key, r.d, r.x, fc)
          }
        }}
        st.update(HwState(n, lastD, seed, l, b,
          if (n >= 7) sv.toVector else Vector.empty))
        out.result().iterator
      }
    }
  }

  def holtWintersPerKey(rows: Dataset[HwRow]): Dataset[HwPoint] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.key)
      .transformWithState(new HoltWintersProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  final case class ZRow(user_id: Long, us: Long, event_id: Long, c: Long)
  final case class ZPoint(
      event_id: Long, user_id: Long, z_sign: Long, z2_permille: Long,
      is_anomaly: Long)
  /** (rows seen, last folded (us, event_id), up-to-10-deep ring of the
    * most recent c values oldest-first) — the state batch q149's
    * ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING frame needs, and
    * nothing more
    */
  final case class ZRingState(
      n: Long, lastUs: Long, lastId: Long, buf: Seq[Long])

  /** Streaming twin of batch q149: the rolling z-score anomaly
    * detector as keyed sequential state — the 10-deep RING BUFFER per
    * key that q149's scaleNote promised (a bounded-frame window IS a
    * ring buffer once it streams). Each arriving event scores against
    * the ring's exact integer (sum, sum-of-squares) — the identical
    * cross-multiplied z²·900/varnum arithmetic as the batch window,
    * so a (ts, event_id)-ordered replay is row-identical to q149 and
    * carries its DuckDB oracle verbatim. The first 10 events per key
    * only FILL the ring (batch's rn ≥ 11 gate); zero-variance rings
    * emit nothing (varnum > 0). Ordering is self-enforcing from
    * birth (the ADVICE r13 stance): state carries the last folded
    * (us, event_id) and drops anything at or before it, so a
    * redelivered event is a no-op instead of a double-fold.
    */
  class RollingZscoreProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, ZRow, ZPoint] {
    @transient private var st:
        org.apache.spark.sql.streaming.ValueState[ZRingState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[ZRingState]("ring",
        org.apache.spark.sql.Encoders.product[ZRingState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(
        uid: Long, rows: Iterator[ZRow],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[ZPoint] = {
      val s0 = if (st.exists()) st.get()
               else ZRingState(0L, Long.MinValue, Long.MinValue, Vector.empty)
      var n = s0.n
      var lastUs = s0.lastUs
      var lastId = s0.lastId
      var buf = s0.buf.toVector
      val out = Vector.newBuilder[ZPoint]
      var accepted = false
      rows.toSeq.sortBy(r => (r.us, r.event_id)).foreach { r =>
        if (r.us > lastUs || (r.us == lastUs && r.event_id > lastId)) {
          lastUs = r.us; lastId = r.event_id
          n += 1
          if (n >= 11) {
            var sc = 0L; var qc = 0L
            buf.foreach { v => sc += v; qc += v * v }
            val dev = r.c * 10L - sc
            val varnum = qc * 10L - sc * sc
            if (varnum > 0)
              out += ZPoint(r.event_id, uid,
                java.lang.Long.signum(dev).toLong,
                900L * dev * dev / varnum,
                if (dev * dev > varnum * 10L) 1L else 0L)
          }
          buf = (buf :+ r.c).takeRight(10)
          accepted = true
        }
      }
      if (accepted) st.update(ZRingState(n, lastUs, lastId, buf))
      out.result().iterator
    }
  }

  def rollingZscorePerUser(rows: Dataset[ZRow]): Dataset[ZPoint] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id)
      .transformWithState(new RollingZscoreProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  final case class NeRow(
      user_id: Long, us: Long, event_id: Long, event_type: String)
  final case class NeExample(
      user_id: Long, sid: Long, pos: Long, context: String, label: String,
      split: String)
  /** (last folded (us, id), session counter, position within session,
    * up to 3 most recent event types of the OPEN session oldest-first)
    * — the only state q176's sessionize-then-lag construction needs
    */
  final case class NeState(
      lastUs: Long, lastId: Long, sid: Long, pos: Long,
      recent: Seq[String])

  /** Streaming twin of batch q176: sessionized next-event training
    * examples as keyed sequential state. The batch query sessionizes
    * with gaps-and-islands windows and builds contexts by lag; the
    * stream needs neither — per user the state carries the session
    * counter, the in-session position and a 3-deep type ring, so each
    * arriving event either OPENS a session (gap strictly > 30 min, the
    * batch rule verbatim) or extends one and, from the second event
    * on, emits exactly the example row batch q176 emits — contexts
    * concat the ring oldest-first, precisely lag3 > lag2 > lag1 with
    * concat_ws's null-skipping reproduced by the ring's natural
    * length. The by-USER split is a pure key function. Ordering is
    * self-enforcing from birth (the ADVICE r13 stance): last folded
    * (us, id) in state, redelivered/late rows drop.
    */
  class NextEventProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, NeRow, NeExample] {
    @transient private var st:
        org.apache.spark.sql.streaming.ValueState[NeState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[NeState]("ne",
        org.apache.spark.sql.Encoders.product[NeState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(
        uid: Long, rows: Iterator[NeRow],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[NeExample] = {
      val s0 = if (st.exists()) Some(st.get()) else None
      var lastUs = s0.map(_.lastUs).getOrElse(Long.MinValue)
      var lastId = s0.map(_.lastId).getOrElse(Long.MinValue)
      var sid = s0.map(_.sid).getOrElse(0L)
      var pos = s0.map(_.pos).getOrElse(0L)
      var recent = s0.map(_.recent.toVector).getOrElse(Vector.empty[String])
      val split = if (uid % 10 < 8) "train" else "eval"
      val out = Vector.newBuilder[NeExample]
      var accepted = false
      rows.toSeq.sortBy(r => (r.us, r.event_id)).foreach { r =>
        if (r.us > lastUs || (r.us == lastUs && r.event_id > lastId)) {
          // strictly-greater-than-30-min gap opens a session (batch
          // q176's exact microsecond rule; the very first event has
          // lastUs = MinValue and trivially opens session 1)
          if (sid == 0L || r.us - lastUs > 1800L * 1000000L) {
            sid += 1; pos = 1L; recent = Vector.empty
          } else pos += 1
          if (pos >= 2L)
            out += NeExample(uid, sid, pos, recent.mkString(" > "),
              r.event_type, split)
          recent = (recent :+ r.event_type).takeRight(3)
          lastUs = r.us; lastId = r.event_id
          accepted = true
        }
      }
      if (accepted) st.update(NeState(lastUs, lastId, sid, pos, recent))
      out.result().iterator
    }
  }

  def nextEventExamplesPerUser(rows: Dataset[NeRow]): Dataset[NeExample] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.user_id)
      .transformWithState(new NextEventProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** The state-v2 twin of [[ewmaPerUser]] on Spark 4's
    * transformWithState / StatefulProcessor API — identical semantics,
    * but state lives behind a typed [[org.apache.spark.sql.streaming.ValueState]]
    * handle in the RocksDB state store (the provider state-v2
    * requires), where the old API serializes one opaque GroupState
    * blob. The new surface matters at 100 TB: multiple independently-
    * evolving state variables per key, TTL per variable, and timers —
    * none of which GroupState can express without packing everything
    * into one struct. StreamingSpec asserts a ts-ordered replay is
    * row-identical to [[ewmaPerUser]]'s output and to batch q114.
    */
  class EwmaProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, EwmaPoint] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[EwmaPoint] = _
    override def init(outputMode: OutputMode, timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[EwmaPoint]("ewma",
        org.apache.spark.sql.Encoders.product[EwmaPoint],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(
        uid: Long, rows: Iterator[Event],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[EwmaPoint] = {
      var rn = if (st.exists()) st.get().rn else 0L
      var s = if (st.exists()) st.get().ewma else 0.0
      val out = rows.toSeq
        .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
        .map { e =>
          s = if (rn == 0L) e.value else 0.3 * e.value + 0.7 * s
          rn += 1
          EwmaPoint(uid, rn, s)
        }
      if (out.nonEmpty) st.update(out.last)
      out.iterator
    }
  }

  def ewmaPerUserV2(events: Dataset[Event]): Dataset[EwmaPoint] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new EwmaProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  final case class OpenSession(
      user_id: Long, startUs: Long, lastUs: Long, n: Long, sum_value: Double)
  final case class SessionOut(
      user_id: Long, s_start: Long, s_end: Long, n: Long, sum_value: Double)

  /** Hand-rolled 5-min-gap sessionization on the state-v2 TIMER
    * surface — the piece neither `session_window` (no custom emit
    * logic) nor GroupState (no first-class timers) exposes: sessions
    * that close because a LATER event reveals the gap emit inline,
    * and the dangling open session per key emits from
    * `handleExpiredTimer` when the event-time watermark passes
    * last + gap. Each input re-arms the key's single timer
    * (deleteTimer + registerTimer). A ts-ordered replay must
    * reproduce q39's batch gaps-and-islands exactly (StreamingSpec);
    * in-gap late arrivals fold in via min/max (see handleInputRows),
    * while a late event that would BRIDGE two already-separated
    * sessions merges only in `session_window` (which buffers windows
    * until the watermark — the cost this hand-rolled emit-early
    * variant deliberately avoids; documented trade, not a bug).
    */
  class SessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, SessionOut] {
    @transient private var open: org.apache.spark.sql.streaming.ValueState[OpenSession] = _

    private def close(o: OpenSession): SessionOut =
      SessionOut(o.user_id, o.startUs, o.lastUs + gapMs * 1000L, o.n, o.sum_value)

    override def init(outputMode: OutputMode, timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("open",
        org.apache.spark.sql.Encoders.product[OpenSession],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    /** timer expiry in ms, CEILING of the microsecond session end:
      * floor would let the watermark fire the timer up to 999 µs
      * before the true end, splitting a session a just-in-time late
      * event would have extended */
    private def expiryMs(lastUs: Long): Long = (lastUs + 999) / 1000L + gapMs + 1

    override def handleInputRows(
        uid: Long, rows: Iterator[Event],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionOut] = {
      val gapUs = gapMs * 1000L
      val out = collection.mutable.ArrayBuffer.empty[SessionOut]
      var cur = if (open.exists()) Some(open.get()) else None
      cur.foreach(o => getHandle.deleteTimer(expiryMs(o.lastUs)))
      // second open run for far-late events: consecutive in-batch
      // far-late siblings within one gap merge here exactly as batch
      // session_window merges them (only the CROSS-batch sibling case
      // remains the documented emit-early trade)
      var late: Option[OpenSession] = None
      def flushLate(): Unit = late.foreach { l =>
        cur match {
          case Some(o) if l.lastUs + gapUs >= o.startUs =>
            // the late run grew to within one gap of the open session:
            // batch session_window would chain them — merge, not emit
            cur = Some(o.copy(
              startUs = math.min(o.startUs, l.startUs),
              lastUs = math.max(o.lastUs, l.lastUs),
              n = o.n + l.n,
              sum_value = o.sum_value + l.sum_value))
          case _ => out += close(l)
        }
        late = None
      }
      rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id)).foreach { e =>
        val us = e.ts.getTime * 1000L + e.ts.getNanos / 1000 % 1000
        cur match {
          // overlap test on BOTH ends, min/max never assignment: a
          // cross-batch late event the watermark still admits may land
          // inside the open session (rewinding lastUs would close it a
          // gap too early) or within one gap BEFORE its start (batch
          // session_window chains it in)
          // boundary comparisons are INCLUSIVE on the touch: batch
          // session_window merges an event landing at exactly
          // lastEvent + gap (proven by the q153 boundary spec), so the
          // replay-equivalence contract demands <= / >= here and the
          // strict > only on the close
          case Some(o) if us + gapUs >= o.startUs && us <= o.lastUs + gapUs =>
            cur = Some(o.copy(
              startUs = math.min(o.startUs, us),
              lastUs = math.max(o.lastUs, us),
              n = o.n + 1,
              sum_value = o.sum_value + e.value))
            flushLate() // a late run ending within a gap of us chains in
          case Some(o) if us > o.lastUs + gapUs =>
            flushLate() // may extend cur's start before it closes
            out += close(cur.get) // gap proven by this event
            cur = Some(OpenSession(uid, us, us, 1L, e.value))
          case Some(_) =>
            // far-late: a whole gap BEFORE the open session — grow the
            // late run, merging ascending siblings within one gap
            late match {
              case Some(l) if us <= l.lastUs + gapUs =>
                late = Some(l.copy(lastUs = us, n = l.n + 1,
                  sum_value = l.sum_value + e.value))
              case Some(l) =>
                out += close(l)
                late = Some(OpenSession(uid, us, us, 1L, e.value))
              case None =>
                late = Some(OpenSession(uid, us, us, 1L, e.value))
            }
          case None =>
            cur = Some(OpenSession(uid, us, us, 1L, e.value))
        }
      }
      flushLate()
      cur.foreach { o =>
        open.update(o)
        getHandle.registerTimer(expiryMs(o.lastUs))
      }
      out.iterator
    }

    override def handleExpiredTimer(
        uid: Long,
        tv: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] =
      if (open.exists() &&
          expiryMs(open.get().lastUs) == info.getExpiryTimeInMs) {
        val o = open.get(); open.clear()
        Iterator.single(close(o))
      } else Iterator.empty
  }

  /** q39's sessions rebuilt on transformWithState timers; input must
    * carry a watermark (timer expiry is watermark-driven) */
  def sessionsViaTimers(events: Dataset[Event], gapMin: Int = 5): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMin * 60000L),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  /** custom keyed state via flatMapGroupsWithState: running per-user
    * totals emitted on every update — the E17 `mapGroupsWithState`
    * surface. State is one tiny struct per user; at 100 TB the state
    * store shards with the user_id partitioning.
    */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotal, UserTotal](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { e => n += 1; tot += e.value }
          val next = UserTotal(uid, n, tot)
          state.update(next)
          Iterator.single(next)
      }
  }

  final case class SamplePick(
      user_id: Long, event_id: Long, samp_rank: Long, rn: Long, ver: Long)
  final case class ReservoirState(ver: Long, picks: Seq[(Long, Long)])

  /** q164's salt-keyed rank: the first 12 hex digits of
    * md5("rs:" + event_id) as a 48-bit integer — byte-for-byte the
    * value Spark's `conv(substring(md5(…), 1, 12), 16, 10)` and the
    * oracle's hex48 compute, so the streaming state ranks by the SAME
    * total order the batch twin sorts by.
    */
  private[graft] def sampleRank(eventId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rs:$eventId".getBytes("UTF-8"))
    (0 until 6).foldLeft(0L)((acc, i) => (acc << 8) | (md(i) & 0xffL))
  }

  /** Streaming per-key uniform k-sample — the deterministic
    * reservoir: keep the k events with the SMALLEST salt-keyed hash
    * ranks per user. Min-k of a fixed hash order is mergeable (the
    * KMV law q156 rides), so — unlike classic Algorithm R, whose
    * sample depends on arrival order and RNG state — the state is k
    * rows per key, any batch split yields the same final sample, and
    * that sample equals the one-shot batch q164 (the DuckDB-oracled
    * twin). At-least-once redelivery folds in by event_id dedup: a
    * replayed event re-inserts the identical (rank, id) pair. Each
    * update emits the key's full current sample stamped with a
    * monotone per-key version, so a consumer (and the spec) selects
    * the latest sample as `ver = max(ver) per key`.
    */
  def reservoirPerUser(events: Dataset[Event], k: Int = 4): Dataset[SamplePick] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[ReservoirState, SamplePick](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[ReservoirState]) =>
          val prev = state.getOption.getOrElse(ReservoirState(0L, Seq.empty))
          val merged = (prev.picks ++
            rows.map(e => (sampleRank(e.event_id), e.event_id)))
            .distinct
            .sorted
            .take(k)
          val ver = prev.ver + 1
          state.update(ReservoirState(ver, merged))
          merged.iterator.zipWithIndex.map { case ((rk, id), i) =>
            SamplePick(uid, id, rk, i + 1L, ver)
          }
      }
  }

  final case class AtRow(
      user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      event_type: String, value: Double)

  /** THE timestamp→microseconds conversion for the attribution
    * family — one definition (r16 review fix: five copies had grown
    * across the processors, the fixtures, the seam-chunk schedule,
    * and the specs; the precedence-sensitive getNanos/1000%1000 term
    * must never fork)
    */
  def usOf(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + ts.getNanos / 1000 % 1000
  /** one open session per user: last folded (us, id) for the ordering
    * guard, session start, first click (us, id) with MaxValue = none
    * yet, purchase count and running purchase-value sum — everything
    * q153's one session_window aggregate keeps per live session
    */
  final case class AttrState(
      lastUs: Long, lastId: Long, startUs: Long,
      clickUs: Long, clickId: Long, nPurch: Long, sumValue: Double)
  final case class AttrOut(
      user_id: Long, s_start: Long, first_click_id: Long,
      n_purchases: Long, attributed_value: Double)

  /** Streaming twin of batch q153: session-scoped FIRST-TOUCH
    * attribution as keyed state behind an event-time watermark — the
    * promise at q153's scaleNote, registered as q242 (VERDICT r14
    * item 4). Per user the state is ONE open session (start, first
    * click, purchase fold); a later event either extends it
    * (inclusive gap-touch merge — batch session_window's exact rule,
    * q153's boundary spec) or proves the gap, at which point the
    * closed session emits its attribution row IFF it saw a click and
    * a purchase (otherwise it silently retires — q153's filter). The
    * dangling open session per key emits from the event-time TIMER
    * when the watermark passes last + gap ([[SessionProcessor]]'s
    * expiry discipline, ceiling + 1 ms). Ordering is self-enforcing
    * from birth (the q223/q229 stance): state carries the last folded
    * (us, id) and anything at or before it drops, so a redelivered
    * purchase never double-counts and a redelivered click never
    * re-attributes.
    *
    * ORDERING CONTRACT (ADVICE r15, narrowed): the drop guard cannot
    * tell redelivery from genuine disorder — an event 1 s out of
    * order but well inside the watermark drops here where batch
    * q153's session_window folds it. Batch equivalence therefore
    * holds for IN-ORDER-PER-KEY delivery (a key-partitioned log);
    * the watermark serves TIMER ADVANCE, not disorder tolerance.
    * Feeds that cannot promise per-key order take
    * [[BufferedAttributionProcessor]] (q256) — same oracle,
    * watermark-frontier buffering, O(events-in-watermark) state.
    */
  class AttributionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, AtRow, AttrOut] {
    @transient private var open:
        org.apache.spark.sql.streaming.ValueState[AttrState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      open = getHandle.getValueState[AttrState]("attr",
        org.apache.spark.sql.Encoders.product[AttrState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    /** ceiling-of-microseconds + gap + 1 ms — [[SessionProcessor]]'s
      * rule: floor could fire up to 999 µs before the true session
      * end */
    private def expiryMs(lastUs: Long): Long =
      (lastUs + 999) / 1000L + gapMs + 1

    /** the q153 filter: only click-led sessions with ≥1 purchase
      * report */
    private def emit(uid: Long, o: AttrState): Iterator[AttrOut] =
      if (o.clickUs != Long.MaxValue && o.nPurch > 0)
        Iterator.single(AttrOut(uid, o.startUs, o.clickId, o.nPurch,
          o.sumValue))
      else Iterator.empty

    override def handleInputRows(
        uid: Long, rows: Iterator[AtRow],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[AttrOut] = {
      val gapUs = gapMs * 1000L
      var cur = if (open.exists()) Some(open.get()) else None
      cur.foreach(o => getHandle.deleteTimer(expiryMs(o.lastUs)))
      val out = collection.mutable.ArrayBuffer.empty[AttrOut]
      def fresh(us: Long, r: AtRow): AttrState = {
        val isClick = r.event_type == "click"
        AttrState(us, r.event_id, us,
          if (isClick) us else Long.MaxValue,
          if (isClick) r.event_id else Long.MaxValue,
          if (r.event_type == "purchase") 1L else 0L,
          if (r.event_type == "purchase") r.value else 0.0)
      }
      def fold(o: AttrState, us: Long, r: AtRow): AttrState = {
        val firstClick = r.event_type == "click" &&
          (us < o.clickUs || (us == o.clickUs && r.event_id < o.clickId))
        o.copy(lastUs = us, lastId = r.event_id,
          clickUs = if (firstClick) us else o.clickUs,
          clickId = if (firstClick) r.event_id else o.clickId,
          nPurch = o.nPurch +
            (if (r.event_type == "purchase") 1L else 0L),
          sumValue = o.sumValue +
            (if (r.event_type == "purchase") r.value else 0.0))
      }
      rows.toSeq.sortBy(r => (r.ts.getTime, r.ts.getNanos, r.event_id))
        .foreach { r =>
          val us = usOf(r.ts)
          cur match {
            case Some(o) if us > o.lastUs ||
                (us == o.lastUs && r.event_id > o.lastId) =>
              if (us - o.lastUs > gapUs) { // strict >: inclusive touch merges
                out ++= emit(uid, o)
                cur = Some(fresh(us, r))
              } else cur = Some(fold(o, us, r))
            case Some(_) => () // late/redelivered: drop, never double-fold
            case None => cur = Some(fresh(us, r))
          }
        }
      cur.foreach { o =>
        open.update(o)
        getHandle.registerTimer(expiryMs(o.lastUs))
      }
      out.iterator
    }

    override def handleExpiredTimer(
        uid: Long,
        tv: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[AttrOut] =
      if (open.exists() &&
          expiryMs(open.get().lastUs) == info.getExpiryTimeInMs) {
        val o = open.get(); open.clear()
        emit(uid, o)
      } else Iterator.empty
  }

  /** q153's attribution on transformWithState timers; input must carry
    * a watermark (the dangling-session flush is watermark-driven) */
  def sessionAttributionPerUser(
      rows: Dataset[AtRow], gapMin: Int = 5): Dataset[AttrOut] = {
    import rows.sparkSession.implicits._
    rows.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new AttributionProcessor(gapMin * 60000L),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** q242's ordering contract, bought back (ADVICE r15): the in-line
    * [[AttributionProcessor]] drops ANY per-key event at or before
    * the last folded (us, id) — the right guard for at-least-once
    * REDELIVERY, but it also discards a genuinely out-of-order event
    * still inside the watermark, where batch q153's session_window
    * would fold it. This sibling tolerates full intra-watermark
    * disorder the textbook way: events BUFFER per key until the
    * watermark proves their prefix complete — an event folds only
    * once no earlier-timestamped arrival is still admissible — then
    * fold in (ts, event_id) order through the same session logic.
    * Redelivery dedupes on EXACT (us, event_id) equality only (the
    * advisor's distinction: identity, not order, marks a duplicate);
    * an arrival older than the watermark is late beyond tolerance
    * and drops, which is every watermark operator's contract. State
    * is the watermark-bounded buffer + one open session — O(events
    * within one watermark per key), the price of disorder tolerance,
    * where the in-order processor's O(1) struct is the price of
    * assuming order. Registered as q256 over a deliberately
    * bucket-shuffled feed, under q153's oracle VERBATIM.
    */
  class BufferedAttributionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, AtRow, AttrOut] {
    @transient private var open:
        org.apache.spark.sql.streaming.ValueState[AttrState] = _
    @transient private var buf:
        org.apache.spark.sql.streaming.ListState[AtRow] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      open = getHandle.getValueState[AttrState]("attr",
        org.apache.spark.sql.Encoders.product[AttrState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      buf = getHandle.getListState[AtRow]("buf",
        org.apache.spark.sql.Encoders.product[AtRow],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    private def usOf(r: AtRow): Long = EventStreams.usOf(r.ts)
    private def ceilMs(us: Long): Long = (us + 999) / 1000L
    private def expiryMs(lastUs: Long): Long = ceilMs(lastUs) + gapMs + 1

    private def emit(uid: Long, o: AttrState): Iterator[AttrOut] =
      if (o.clickUs != Long.MaxValue && o.nPurch > 0)
        Iterator.single(AttrOut(uid, o.startUs, o.clickId, o.nPurch,
          o.sumValue))
      else Iterator.empty

    /** One idempotent pass, shared by rows and timers: admit fresh
      * arrivals, fold the watermark-frozen prefix in order, flush
      * the open session once the watermark proves its gap.
      *
      * The frozen-prefix rule and the late guard interlock: an
      * arrival is kept iff floor-ms(us) >= wm, an event folds iff
      * ceil-ms(us) < wm — so every future arrival is strictly after
      * every folded event and fold order is FINAL (no admissible
      * arrival can precede a folded one; the proof is the ms
      * rounding: kept us >= wm·1000 > (ceil-1)·1000 >= any folded
      * us). The same arithmetic makes the flush safe: once
      * expiry(last) <= wm, every still-pending event is provably
      * beyond the gap, so it would start a fresh session anyway.
      */
    private def process(uid: Long, incoming: Seq[AtRow],
        wmMs: Long): Iterator[AttrOut] = {
      val gapUs = gapMs * 1000L
      val existing = if (buf.exists()) buf.get().toVector else Vector.empty
      val seen = existing.map(r => (usOf(r), r.event_id)).toSet
      val admitted = incoming
        // late-beyond-tolerance guard. The bound is THIS batch's
        // eviction watermark — one batch STRICTER than Spark's own
        // late-event admission, which filters against the previous
        // batch's watermark (r17 ADVICE): a row Spark still delivers
        // in the one-batch gap between the two drops here. That is
        // deliberate, not an oversight — the frozen-prefix proof
        // below compares admitted arrivals against events folded
        // under the SAME wmMs, and admitting at the (older) late-
        // events watermark would let an arrival slot BEFORE an
        // already-folded event. So the effective disorder tolerance
        // is watermark-minus-one-batch, not the full watermark
        // delay; a fixture (or a production feed) must keep its
        // disorder span strictly inside that — q256's 8-minute swap
        // span under a 10-minute watermark leaves the margin.
        .filter(r => usOf(r) / 1000 >= wmMs)
        .filterNot(r => seen((usOf(r), r.event_id))) // exact redelivery
        .distinctBy(r => (usOf(r), r.event_id))      // in-batch dupes
      val all = existing ++ admitted
      val (ready, pending) = all.partition(r => ceilMs(usOf(r)) < wmMs)
      val out = collection.mutable.ArrayBuffer.empty[AttrOut]
      var cur = if (open.exists()) Some(open.get()) else None
      ready.sortBy(r => (usOf(r), r.event_id)).foreach { r =>
        val us = usOf(r)
        val isClick = r.event_type == "click"
        val isPurch = r.event_type == "purchase"
        cur = cur match {
          case Some(o) if us - o.lastUs <= gapUs =>
            Some(o.copy(lastUs = us, lastId = r.event_id,
              clickUs = if (isClick && us < o.clickUs) us else o.clickUs,
              clickId = if (isClick && us < o.clickUs) r.event_id
                        else o.clickId,
              nPurch = o.nPurch + (if (isPurch) 1L else 0L),
              sumValue = o.sumValue + (if (isPurch) r.value else 0.0)))
          case other =>
            other.foreach(o => out ++= emit(uid, o)) // gap proven
            Some(AttrState(us, r.event_id, us,
              if (isClick) us else Long.MaxValue,
              if (isClick) r.event_id else Long.MaxValue,
              if (isPurch) 1L else 0L,
              if (isPurch) r.value else 0.0))
        }
      }
      cur match {
        case Some(o) if expiryMs(o.lastUs) <= wmMs =>
          out ++= emit(uid, o); cur = None
        case _ => ()
      }
      // one pending timer per key, ever: every pass supersedes the
      // previous wake-up, so delete stale registrations first — a
      // long-lived key would otherwise accumulate one timer per
      // micro-batch, each later firing a full (idempotent but paid)
      // buffer pass (r16 review fix; AttributionProcessor's
      // deleteTimer discipline, generalized)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      if (cur.isEmpty && pending.isEmpty) { open.clear(); buf.clear() }
      else {
        cur.fold(open.clear())(open.update)
        buf.clear()
        if (pending.nonEmpty) buf.put(pending.toArray)
        // wake on the next watermark advance; when only the open
        // session remains, jump straight to its proven expiry
        getHandle.registerTimer(
          if (pending.isEmpty) math.max(wmMs + 1,
            expiryMs(cur.get.lastUs))
          else wmMs + 1)
      }
      out.iterator
    }

    override def handleInputRows(
        uid: Long, rows: Iterator[AtRow],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[AttrOut] =
      process(uid, rows.toSeq, tv.getCurrentWatermarkInMs())

    override def handleExpiredTimer(
        uid: Long,
        tv: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[AttrOut] =
      process(uid, Nil, tv.getCurrentWatermarkInMs())
  }

  /** q256: disorder-tolerant attribution; input must carry a
    * watermark (both the fold frontier and the flush are
    * watermark-driven)
    */
  def sessionAttributionUnordered(
      rows: Dataset[AtRow], gapMin: Int = 5): Dataset[AttrOut] = {
    import rows.sparkSession.implicits._
    rows.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new BufferedAttributionProcessor(gapMin * 60000L),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }
}
