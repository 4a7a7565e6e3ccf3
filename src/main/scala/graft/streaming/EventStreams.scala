package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A row of the `events` table as a stream element. */
case class Event(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** A closed user session emitted by [[EventStreams.sessionize]]. */
case class UserSession(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    total_value: Double)

/** Session accumulator: `start`/`last` are event-time MICROSECONDS (so
  * emitted timestamps keep full parquet precision — `Timestamp.getTime`
  * alone would truncate to millis); gap/timeout decisions derive millis
  * from them, matching [[EventStreams.sessionizeBatch]]'s `unix_millis`
  * semantics exactly.
  */
private case class SessionState(
    start: Long, last: Long, n: Long, total: Double)

/** Structured Streaming operators over the events stream.
  *
  * The reference has no streaming surface (SURVEY.md §2.6) — this module
  * is part of the beyond-reference pipeline scope. Designs are the
  * standard scale shapes: watermark + windowed aggregation (state store
  * bounded by the watermark horizon) and `flatMapGroupsWithState`
  * sessionization (state keyed by user, evicted on event-time timeout).
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type with a watermark for
    * bounded state and late-data tolerance.
    */
  def hourlyAggregates(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("hour"),
        col("event_type"), col("n"), col("total_value"))

  /** Event-time sessionization: a session closes after `gapMinutes` of
    * user inactivity (enforced via event-time timeout so it works in
    * replay/backfill, not just wall-clock).
    */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Int = 30,
      watermark: String = "2 hours"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def micros(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    def ms(us: Long): Long = Math.floorDiv(us, 1000L)

    def flush(userId: Long, st: SessionState): UserSession =
      UserSession(userId, toTs(st.start), toTs(st.last), st.n, st.total)

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(flush(userId, _))
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(e => micros(e.ts))
            var closed = List.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(st) if ms(t) - ms(st.last) <= gapMs =>
                  cur = Some(SessionState(st.start, math.max(st.last, t), st.n + 1, st.total + e.value))
                case Some(st) =>
                  closed ::= flush(userId, st)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(ms(st.last) + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Funnel pairs via an event-time interval join: every (first, then)
    * event pair for the same user where `then` follows `first` by at
    * most `withinMinutes` — e.g. click → purchase attribution.
    *
    * The join condition (equi-key AND bounded time range) is exactly
    * the shape Structured Streaming requires for a STREAM-STREAM join
    * with bounded state: with watermarked inputs, each side's buffer
    * is evicted once the watermark passes its possible-match window.
    * The same function works on batch frames (where it plans as a
    * range-predicated equi-join) — the batch form is the gate oracle
    * (`st_funnel`), the streaming form is exercised in StreamingSpec.
    */
  def funnelPairs(
      events: DataFrame, firstType: String, thenType: String,
      withinMinutes: Int, watermark: String = "2 hours"): DataFrame = {
    val a = events.filter(col("event_type") === firstType)
      .select(col("user_id"), col("event_id").as("first_id"), col("ts").as("first_ts"))
      .withWatermark("first_ts", watermark)
    val b = events.filter(col("event_type") === thenType)
      .select(col("user_id").as("b_user_id"), col("event_id").as("then_id"),
        col("ts").as("then_ts"))
      .withWatermark("then_ts", watermark)
    a.join(b,
        col("user_id") === col("b_user_id") &&
          col("then_ts") >= col("first_ts") &&
          col("then_ts") <= col("first_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("user_id"), col("first_id"), col("then_id"),
        col("first_ts"), col("then_ts"))
  }

  /** Streaming exact content dedup: the first-seen row per `md5(text)`
    * survives; later duplicates are dropped. The streaming form of
    * [[graft.operators.Dedup.exactDedup]] for continuous ingestion.
    *
    * `dropDuplicatesWithinWatermark` bounds the dedup state by the
    * distinct keys seen within the watermark horizon — not by stream
    * length — which is the only state contract that survives an
    * unbounded firehose. The trade: a duplicate arriving later than
    * the horizon after its original is re-admitted (downstream batch
    * [[graft.operators.Dedup.exactGroups]] over the sink remains the
    * exact backstop).
    */
  def streamingContentDedup(
      docs: DataFrame, tsCol: String = "ts", textCol: String = "text",
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Batch-mode sessionization with identical semantics — the windowed
    * lag/cumsum formulation, usable for backfill and for validating the
    * streaming path on finite data.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapMs = gapMinutes * 60L * 1000L
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("ts_ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > gapMs).cast("int"))
      .withColumn("session_no", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .drop("session_no")
  }

  /** Stream-static enrichment: join the event stream against a static
    * (batch) dimension on `streamKey` = `dimKey` — the canonical
    * "attach the user/customer attributes at ingest" shape. The dim
    * side is explicitly `broadcast()`: a stream-static join replans
    * the static side per micro-batch, and a hash-shuffle there would
    * shuffle EVERY micro-batch; broadcast keeps the stream side's
    * partitioning untouched (at 100 TB/day of events the dim is the
    * small side by construction, and a too-big dim belongs in a
    * keyed-state lookup instead). Stateless: no watermark needed for
    * the join itself — downstream aggregations own their state.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String): DataFrame = {
    // side-qualified refs: bare col(...) is ambiguous (or resolves to
    // one side, degenerating to a cross join) whenever both frames
    // name the key identically — the natural call shape
    val d = broadcast(dim)
    events.join(d, events.col(streamKey) === d.col(dimKey))
  }
}
