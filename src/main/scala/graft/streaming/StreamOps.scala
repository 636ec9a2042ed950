package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators: windowed aggregation and stateful
  * sessionization (mirrors the reference's run-lifecycle event stream —
  * the IngestionState transitions of
  * services/api/models.py — as a streaming workload).
  *
  * The batch twins (windowedCountsBatch / sessionizeBatch) produce the
  * identical result relationally, which is what the DuckDB oracle
  * checks; the streaming paths run the same logical ops through
  * readStream/memory-sink and flatMapGroupsWithState and are
  * spec-tested with processAllAvailable().
  *
  * State-store sizing at cluster scale: every stateful op here (st02's
  * flatMapGroupsWithState sessions, st03's dropDuplicates keys, st04's
  * join buffers) keeps per-key state whose bound comes from the
  * WATERMARK; the store itself should be RocksDB in production
  * (`spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider`) so state lives off-heap with
  * disk spill and changelog checkpointing instead of in the executor
  * heap — the default HDFS-backed store holds the working map in
  * memory and becomes the OOM point at 10^8+ live keys. The operators
  * are provider-agnostic (spec-pinned: the st02 scenario re-runs on
  * RocksDB with identical output and rocksdb state metrics present).
  */
object StreamOps {

  /** Streaming source over the events table with ts normalized to
    * session-local TIMESTAMP, mirroring [[graft.Tables.events]]'s
    * two-generator branch (nanos-as-long rounds ≤6, micros NTZ
    * round 7+). File-stream sources need an explicit schema, so the
    * ACTUAL footer schema is taken from a one-off batch read — a
    * metadata-only operation — rather than hard-coding a ts type the
    * generator may have moved away from. */
  def eventsStreamSource(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.option("pathGlobFilter", "events.parquet")
      .parquet(dir).schema
    // file-stream sources want a directory; filter to the events table
    val src = spark.readStream.schema(raw)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    raw("ts").dataType match {
      case LongType => src.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        src.withColumn("ts", col("ts").cast("timestamp"))
      case _ => src
    }
  }

  /** st01 streaming path: file-source stream -> 5-minute tumbling
    * window counts -> memory sink, drained synchronously. Returns the
    * final (static) result table. At scale the same plan runs
    * continuously with a watermark + append sink; complete+memory here
    * makes the batch-vs-stream equivalence assertable.
    */
  def windowedCountsStream(spark: SparkSession, dir: String): DataFrame = {
    val src = eventsStreamSource(spark, dir)
    val agg = src
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("graft_st01").start()
    try { q.processAllAvailable() } finally { q.stop() }
    spark.table("graft_st01")
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** st01 batch twin — identical 5-minute tumbling windows. */
  def windowedCountsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
      .orderBy(col("window_start"), col("event_type"))

  val windowedCountsOracle: String =
    """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
       event_type, count(*) AS n
       FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""

  /** st02 batch twin: gap-based sessionization (30-min idle gap) via
    * lag + running sum — one shuffle on user_id, then two window
    * passes over sorted partitions. This is the scalable batch shape
    * (no per-key state object, pure windows).
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
             unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
           count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("session_id"))
  }

  def sessionizeOracle(gapMinutes: Int = 30): String = {
    val gapUs = gapMinutes * 60L * 1000000L
    s"""WITH g AS (SELECT user_id, event_id, ts,
           lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         FROM events),
       s AS (SELECT user_id, event_id, ts,
           CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > $gapUs
                THEN 1 ELSE 0 END AS new_s
         FROM g),
       c AS (SELECT user_id, ts,
           CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
         FROM s)
       SELECT user_id, session_id, min(ts) AS session_start,
         max(ts) AS session_end, count(*) AS n_events
       FROM c GROUP BY user_id, session_id ORDER BY user_id, session_id"""
  }

  /** Production shape of st01: watermarked append-mode windowed agg.
    * Windows emit once the event-time watermark passes their end —
    * the form that runs unbounded at scale with bounded state (late
    * data beyond the watermark is dropped, state is purged).
    * Spec-driven with a MemoryStream across micro-batches.
    */
  def windowedCountsWatermarked(events: Dataset[Ev],
                                watermark: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, window}
    events.toDF()
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("user_id"), col("n"))
  }

  // ---- st03: streaming dedup ------------------------------------------

  /** st03 batch twin: first event per (user_id, event_type) — the
    * relational form of streaming dedup-by-key. Full tie-break on
    * (ts, event_id): the corpus has same-microsecond events.
    */
  def dedupBatch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
              col("event_id").as("first_event_id"), col("ts").as("first_ts"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val dedupOracle: String =
    """SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
       FROM (SELECT user_id, event_type, event_id, ts,
               row_number() OVER (PARTITION BY user_id, event_type
                 ORDER BY ts, event_id) AS rn
             FROM events) t
       WHERE rn = 1 ORDER BY user_id, event_type"""

  /** st03 streaming path: keep the first-seen event per key.
    * dropDuplicates + watermark is Spark's bounded-state streaming
    * dedup: state for a key is purged once the watermark passes its
    * event time, so the state store stays finite on an unbounded
    * stream — the exact shape a 100 TB/day ingest dedup runs with.
    */
  def dedupStream(events: Dataset[Ev], watermark: String = "10 minutes"): DataFrame =
    events.toDF()
      .withWatermark("ts", watermark)
      .dropDuplicates("user_id")

  // ---- st04: stream-stream interval join ------------------------------

  /** st04 batch twin: each click joined to the same user's views in
    * the preceding `minutes` — equi-join on user_id with the time
    * bound as a post-join filter (the q14 as-of shape: a hash join,
    * never a nested loop).
    */
  def intervalJoinBatch(events: DataFrame, minutes: Int = 30): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
              col("ts").as("view_ts"))
    clicks
      .join(views, col("user_id") === col("v_user") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $minutes MINUTES") &&
        col("view_ts") <= col("click_ts"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
              col("view_id"), col("view_ts"))
      .orderBy(col("click_id"), col("view_id"))
  }

  def intervalJoinOracle(minutes: Int = 30): String =
    s"""SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
         v.event_id AS view_id, v.ts AS view_ts
       FROM (SELECT * FROM events WHERE event_type = 'click') c
       JOIN (SELECT * FROM events WHERE event_type = 'view') v
         ON c.user_id = v.user_id
         AND v.ts BETWEEN c.ts - INTERVAL $minutes MINUTE AND c.ts
       ORDER BY click_id, view_id"""

  /** st04 streaming path: watermarked stream-stream inner join. The
    * watermark + the time-range predicate are what make unbounded
    * stream-stream join feasible: Spark derives how long each side's
    * state must be retained (view state can be dropped once the
    * watermark passes view_ts + interval) and purges beyond it, so
    * state stays bounded on an unbounded stream.
    */
  def intervalJoinStream(clicks: Dataset[Ev], views: Dataset[Ev],
                         minutes: Int = 30,
                         watermark: String = "10 minutes"): DataFrame = {
    val l = clicks.toDF().withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val r = views.toDF().withWatermark("ts", watermark)
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
              col("ts").as("view_ts"))
    l.join(r, col("user_id") === col("v_user") &&
      col("view_ts") >= col("click_ts") - expr(s"INTERVAL $minutes MINUTES") &&
      col("view_ts") <= col("click_ts"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
              col("view_id"), col("view_ts"))
  }

  /** st07 batch twin: [[intervalJoinBatch]] with LEFT-OUTER semantics —
    * every click appears exactly as often as it has matching views,
    * or ONCE with null view columns if it has none. The outer side is
    * what turns a correlation query into an audit query ("which
    * clicks had NO preceding view?" — the negative space the inner
    * join silently drops).
    */
  def intervalLeftJoinBatch(events: DataFrame, minutes: Int = 30): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
              col("ts").as("view_ts"))
    clicks
      .join(views, col("user_id") === col("v_user") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $minutes MINUTES") &&
        col("view_ts") <= col("click_ts"), "left")
      .select(col("click_id"), col("user_id"), col("click_ts"),
              col("view_id"), col("view_ts"))
      .orderBy(col("click_id"), col("view_id"))
  }

  def intervalLeftJoinOracle(minutes: Int = 30): String =
    s"""SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
         v.event_id AS view_id, v.ts AS view_ts
       FROM (SELECT * FROM events WHERE event_type = 'click') c
       LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
         ON c.user_id = v.user_id
         AND v.ts BETWEEN c.ts - INTERVAL $minutes MINUTE AND c.ts
       ORDER BY click_id, view_id"""

  /** st07 streaming path: watermarked stream-stream LEFT OUTER join.
    * The semantics the watermark BUYS here are stronger than st04's:
    * an outer (null-extended) row can only be emitted once the
    * watermark proves no matching view can still arrive, so unmatched
    * clicks surface exactly once, LATE — after their join-state
    * expiry — rather than eagerly and wrong. (Same state bound as the
    * inner join: view state drops once the watermark passes
    * view_ts + interval.) The spec drives this visible delay: the
    * unmatched click is ABSENT from early micro-batches and appears
    * with null view columns only after the watermark advances.
    */
  def intervalLeftJoinStream(clicks: Dataset[Ev], views: Dataset[Ev],
                             minutes: Int = 30,
                             watermark: String = "10 minutes"): DataFrame = {
    val l = clicks.toDF().withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val r = views.toDF().withWatermark("ts", watermark)
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
              col("ts").as("view_ts"))
    l.join(r, col("user_id") === col("v_user") &&
      col("view_ts") >= col("click_ts") - expr(s"INTERVAL $minutes MINUTES") &&
      col("view_ts") <= col("click_ts"), "leftOuter")
      .select(col("click_id"), col("user_id"), col("click_ts"),
              col("view_id"), col("view_ts"))
  }

  // ---- st05: stream-static enrichment join ----------------------------

  /** st05 batch twin: the event stream enriched against a STATIC dim
    * (customer segment) and rolled up per segment — the canonical
    * "enrich the firehose against reference data" stage
    * (reference: runs joined to their stock rows in every list view).
    */
  def streamStaticJoinBatch(events: DataFrame, customer: DataFrame): DataFrame =
    events
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
            col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
           graft.operators.Rounding.roundN(sum(col("value")), 2).as("total_value"))
      .select(col("c_mktsegment").as("segment"), col("n_events"), col("total_value"))
      .orderBy(col("segment"))

  val streamStaticJoinOracle: String =
    """SELECT c_mktsegment AS segment, count(*) AS n_events,
       round(sum("value"), 2) AS total_value
       FROM events JOIN customer ON user_id = c_custkey
       GROUP BY c_mktsegment ORDER BY segment"""

  /** st05 streaming path: a streaming source joined to a static
    * (batch) DataFrame needs NO watermark and keeps NO join state —
    * the static side is broadcast to every micro-batch, which is why
    * stream-static is the preferred enrichment shape at scale (the
    * dim refreshes per batch; only the aggregation holds state).
    */
  def streamStaticJoinStream(events: Dataset[EvV], customer: DataFrame): DataFrame =
    events.toDF()
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
            col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
           graft.operators.Rounding.roundN(sum(col("value")), 2).as("total_value"))
      .select(col("c_mktsegment").as("segment"), col("n_events"), col("total_value"))

  /** st08 batch twin: lifetime per-type totals — the running KPI card
    * (count + value mass per event class) a dashboard serves. */
  def typeTotalsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           graft.operators.Rounding.roundN(sum(col("value")), 2).as("total"))
      .orderBy(col("event_type"))

  val typeTotalsOracle: String =
    """SELECT event_type, count(*) AS n, round(sum("value"), 2) AS total
       FROM events GROUP BY event_type ORDER BY event_type"""

  /** st08 streaming path: the same aggregation in UPDATE output mode —
    * the third output-mode contract (st01 covers append-with-
    * watermark; complete mode is a memory-bounded dead end at scale):
    * each micro-batch re-emits ONLY the groups the batch changed,
    * with their revised totals. That delta-of-groups stream is what
    * feeds an upsert sink (the foreachBatch → [[graft.sources
    * .MaterializedAgg]] loop): downstream state converges to the
    * batch answer without ever replaying unchanged groups — and
    * because emission is change-driven, no watermark is needed and
    * the state store holds exactly one row per live group. The spec
    * pins both halves of the contract: a changed group re-emits with
    * its new total, an unchanged group does NOT re-emit.
    */
  def typeTotalsStream(events: Dataset[EvT]): DataFrame =
    events.toDF()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           graft.operators.Rounding.roundN(sum(col("value")), 2).as("total"))

  case class EvT(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                 event_type: String, value: Double)

  case class EvV(event_id: Long, ts: java.sql.Timestamp, user_id: Long, value: Double)

  // ---- st02 streaming path (flatMapGroupsWithState) -------------------

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long)

  /** Stateful sessionizer: closes a session (emits it) when an event
    * arrives more than gap after the last one, AND — via event-time
    * timeout against the watermark — when a key goes idle: once the
    * watermark passes last_event + gap the open session is emitted and
    * its state purged. This is what makes the streaming output
    * converge to sessionizeBatch (which emits every session including
    * the final open one) and keeps state bounded on idle keys at
    * scale. Events later than `watermark` behind the max seen event
    * time are dropped by the watermark, as in any append-mode op.
    */
  def sessionizeStream(events: Dataset[Ev], gapMinutes: Int = 30,
                       watermark: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) => {
          def close(st: SessionState) =
            Session(user, new java.sql.Timestamp(st.start / 1000L),
              new java.sql.Timestamp(st.last / 1000L), st.n)
          if (state.hasTimedOut) {
            // idle key: watermark passed last+gap — emit the open session
            val st = state.get
            state.remove()
            Iterator.single(close(st))
          } else {
            // per-batch group materialization: a micro-batch holds at
            // most one trigger's worth of events per key, not the stream
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.orNull
            val out = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val us = e.ts.getTime * 1000L
              if (st == null) st = SessionState(us, us, 1L)
              else if (us - st.last > gapUs) {
                out += close(st)
                st = SessionState(us, us, 1L)
              } else st = SessionState(st.start, us, st.n + 1L)
            }
            if (st != null) {
              state.update(st)
              // fire once the watermark passes session end + gap (must
              // be strictly ahead of the current watermark to be legal)
              state.setTimeoutTimestamp(math.max(
                st.last / 1000L + gapMinutes * 60000L,
                state.getCurrentWatermarkMs + 1))
            }
            out.result().iterator
          }
        })
  }

  // ---- st06: NATIVE session windows -----------------------------------

  /** st06 batch twin: gap sessionization through Spark's built-in
    * `session_window` — the declarative sibling of st02's hand-rolled
    * state machine. The engine merges events closer than the gap into
    * one session window per group; we key the aggregates by that
    * window and emit our own min/max/count/distinct so the output is
    * engine-neutral (the native window's `end` is last-event + gap, a
    * Spark-specific convention the oracle shouldn't have to encode).
    * Merge rule, pinned by spec: adjacent windows merge too — an event
    * exactly gap after the last one still joins the session, so the
    * batch-equivalent island break is strictly-greater-than-gap,
    * exactly st02's convention. A DIFFERENT gap (20 min) and an added
    * distinct-types measure keep this row's result distinct from
    * st02's.
    *
    * Why it earns a row next to st02: the native operator is what a
    * 100 TB job should reach for FIRST — no state-machine code to get
    * wrong, hash-partitioned by group with the merge done inside the
    * aggregation operator, and the same declarative form runs
    * streaming under a watermark ([[sessionWindowStream]]) with state
    * purge for free. st02 exists for semantics session_window cannot
    * express (mid-session emission, custom timeout policy).
    */
  def sessionWindowBatch(events: DataFrame, gapMinutes: Int = 20): DataFrame =
    events
      .groupBy(col("user_id"),
               session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
           count(lit(1)).as("n_events"),
           count_distinct(col("event_type")).as("n_types"))
      .select(col("user_id"), col("session_start"), col("session_end"),
              col("n_events"), col("n_types"))
      .orderBy(col("user_id"), col("session_start"))

  def sessionWindowOracle(gapMinutes: Int = 20): String = {
    val gapUs = gapMinutes * 60L * 1000000L
    s"""WITH g AS (SELECT user_id, event_id, event_type, ts,
           lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         FROM events),
       s AS (SELECT user_id, event_type, ts,
           -- session_window merges ADJACENT windows too (an event
           -- exactly gap after the last still merges — spec-pinned),
           -- so the island break is strictly-greater, st02's convention
           CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > $gapUs
                THEN 1 ELSE 0 END AS new_s, event_id
         FROM g),
       c AS (SELECT user_id, event_type, ts,
           CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sid
         FROM s)
       SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
         count(*) AS n_events,
         CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
       FROM c GROUP BY user_id, sid ORDER BY user_id, session_start"""
  }

  /** st06 streaming path: the same `session_window` aggregation under
    * a watermark — append-mode, sessions emit once the watermark
    * passes their end (+gap), state purged by the engine. The entire
    * st02 state machine replaced by one declarative groupBy. */
  def sessionWindowStream(events: Dataset[Ev], gapMinutes: Int = 20,
                          watermark: String = "10 minutes"): DataFrame =
    events.toDF()
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
               session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
           count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"),
              col("n_events"))

  /** Shared per-corpus fixture-cache gate (the st15 discipline,
    * extended to every streaming row): seed tables/indexes and arrival
    * commits are SETUP, not the operator — a bench min-of-N run should
    * pay the drain (+ ingest + probe) each pass, never re-land the
    * same corpus slices. Build once per corpus content stamp, serve
    * cached thereafter; frames without a stable identity get an
    * ephemeral build the caller tears down after materializing.
    * `byPlan` switches to [[graft.operators.Caching.planStamp]] for
    * DETERMINISTIC derived frames (Tables.events' ts-type
    * normalization is a projection, not a leaf scan — the e2e01
    * precedent). */
  private def fixtureFor(
      cache: graft.operators.Caching.BoundedCache[
        (org.apache.spark.sql.SparkSession, String), String],
      df: DataFrame, byPlan: Boolean = false)
      (build: => String): (String, Boolean) = {
    import graft.operators.Caching
    val stamp =
      if (byPlan) Caching.planStamp(df)
      else if (Caching.bareScan(df)) Caching.stamp(df)
      else ""
    if (stamp.isEmpty) (build, true)
    else (cache.getOrElseUpdate((df.sparkSession, stamp))(build), false)
  }

  private def newFixtureCache(n: Int = 4) =
    new graft.operators.Caching.BoundedCache[
        (org.apache.spark.sql.SparkSession, String), String](n,
      onEvict = dir =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)))

  // ---- st09: the versioned table AS a stream (format("graft")) --------

  /** st09: a LIVE run of the commit-log streaming source — unlike the
    * other st rows (batch twins; streams spec-tested), this row runs
    * the real `readStream.format("graft")` end-to-end inside the
    * oracle gate, because the graft source makes it deterministic: a
    * micro-batch is "the dirs commits (startV, endV] added", so
    * draining the stream delivers the three landed generations
    * exactly once regardless of trigger timing. The aggregate over
    * the sink then hash-matches plain SQL over `orders` ONLY if no
    * row was dropped, duplicated, or phantom-read — delivery
    * correctness checked by an external engine. At 100 TB this is the
    * ingest fan-out shape: landed table → many streaming consumers,
    * each planning O(new commits) per trigger, reading only appended
    * bytes. */
  /** st09's landed three-commit table is READ-ONLY during the drain
    * (the stream only lists and reads its committed dirs), so the
    * fixture caches per corpus with no per-run copy. */
  private val st09FixtureCache = newFixtureCache()

  def lakeStreamDrain(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    val (fixture, ephemeral) = fixtureFor(st09FixtureCache, orders) {
      val dir = java.nio.file.Files.createTempDirectory("graft-lake-st09").toString
      val root = s"$dir/t"
      val base = orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"))
      val v0 = graft.sources.VersionedTable.commit(spark, root,
        base.filter(pmod(col("o_orderkey"), lit(3)) === 0), -1L)
      val v1 = graft.sources.VersionedTable.append(spark, root,
        base.filter(pmod(col("o_orderkey"), lit(3)) === 1), v0)
      graft.sources.VersionedTable.append(spark, root,
        base.filter(pmod(col("o_orderkey"), lit(3)) === 2), v1)
      dir
    }
    val root = s"$fixture/t"
    val sink = "st09_lake_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.format("graft").load(root)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    if (ephemeral) { // memory sink holds the rows; the dir can go
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fixture))
    }
    // EXACT-CENTS sum (the e2e01 discipline): at the 30× corpus this
    // group's double sum reaches ~4e11 over millions of rows, where
    // cross-engine accumulation-order noise EXCEEDS the 2-dp rounding
    // grain — a rounded float sum stops being a valid oracle at scale
    // (found live by the 30× artifact). One 0-dp round per row, then
    // pure BIGINT addition, is order-free at any scale.
    spark.table(sink)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
           (sum(round(col("o_totalprice") * 100).cast("long")) / 100.0)
             .as("total"))
      .orderBy(col("o_orderstatus"))
  }

  val lakeStreamOracle: String =
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 1e2 AS total
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  // ---- st10: CDC mode under the oracle gate ---------------------------

  /** st10: the readChangeFeed STREAM cross-checked by an external
    * engine — land even-keyed orders, run one MERGE (keys ending in 1
    * insert, keys ending in 2 update with a shifted price), drain the
    * CDC stream from the pre-merge version, and aggregate the change
    * rows by (change_type, status). DuckDB replays the change-set
    * relationally: any change row the stream drops, duplicates,
    * mislabels (insert vs update) or delivers with a stale image
    * breaks the hash. Deterministic because a CDC batch is a
    * version-range snapshot diff — trigger timing cannot change its
    * content. */
  /** st10's table is fully built (v0 landing + the merge) BEFORE the
    * CDC drain starts and is read-only thereafter, so the fixture —
    * including the merge commit — caches per corpus; the drain always
    * reads the feed from startingVersion=0 (a fresh table's first
    * commit version, pinned by construction). */
  private val st10FixtureCache = newFixtureCache()

  def lakeCdcDrain(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    val (fixture, ephemeral) = fixtureFor(st10FixtureCache, orders) {
      val dir = java.nio.file.Files.createTempDirectory("graft-lake-st10").toString
      val root = s"$dir/t"
      val base = orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"))
      val v0 = graft.sources.VersionedTable.commit(spark, root,
        base.filter(pmod(col("o_orderkey"), lit(2)) === 0), -1L)
      require(v0 == 0L, s"fresh st10 table landed at v$v0, expected v0")
      val mergeSrc = base
        .filter(pmod(col("o_orderkey"), lit(10)).isin(1, 2))
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      graft.sources.VersionedTable.merge(spark, root, mergeSrc, Seq("o_orderkey"))
      dir
    }
    val root = s"$fixture/t"
    val sink = "st10_cdc_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("keys", "o_orderkey")
      .option("startingVersion", "0").load(root)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    if (ephemeral) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fixture))
    }
    spark.table(sink)
      .groupBy(col("change_type"), col("_new.o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
           graft.operators.Rounding.roundN(sum(col("_new.o_totalprice")), 2)
             .as("total"))
      .orderBy(col("change_type"), col("status"))
  }

  /** st11: the CURATION LOOP as a live stream under the oracle gate —
    * the t23 stack driven by real micro-batches: a seed corpus
    * (doc_id%3==0, indexed raw) gates two arrival batches (%3==1 then
    * %3==2, landed as two commits of a graft table and drained with
    * maxVersionsPerTrigger=1 so BATCH BOUNDARY == COMMIT BOUNDARY —
    * deterministic, trigger timing cannot re-cut it). Each micro-batch
    * runs battery filter (t20's keep) → BandIndex.ingest admission
    * (band-candidate + Jaccard ≥ 0.3 vs the index AT BATCH START) →
    * lands admitted docs tagged with their arrival batch. Output: the
    * landed corpus census per (arrival_batch, lang). DuckDB replays
    * the whole loop relationally (battery CTEs + the d02 banding
    * CTEs + sequential admission) — a dropped/duplicated batch, a
    * battery reject slipping through, or an admission judged against
    * the wrong index state breaks the hash. The cross-batch property
    * st-rows exist to pin: batch 1's admissions REJECT batch 2's
    * duplicates through the O(batch) index append. */
  /** st11's seed BandIndex + two-commit arrivals table cache per
    * corpus (the st15 discipline); each drain COPIES the seed index
    * (ingest mutates its manifest) and reads the arrivals in place. */
  private val st11FixtureCache = newFixtureCache()

  def streamCurationDrain(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import graft.operators.{BandIndex, TextOps}
    import graft.sources.VersionedTable
    val docs = documents.select(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars"))
    val (fixture, ephemeral) = fixtureFor(st11FixtureCache, documents) {
      val dir = java.nio.file.Files.createTempDirectory("graft-st11-fix").toString
      BandIndex.build(spark, s"$dir/bandindex",
        docs.filter(pmod(col("doc_id"), lit(3)) === 0).select("doc_id", "text"))
      val v0 = VersionedTable.commit(spark, s"$dir/arrivals",
        docs.filter(pmod(col("doc_id"), lit(3)) === 1), -1L)
      VersionedTable.append(spark, s"$dir/arrivals",
        docs.filter(pmod(col("doc_id"), lit(3)) === 2), v0)
      dir
    }
    val work =
      java.nio.file.Files.createTempDirectory("graft-st11").toString
    val idx = s"$work/bandindex"
    val corpus = s"$work/corpus"
    val arrivals = s"$fixture/arrivals"
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$fixture/bandindex"), new java.io.File(idx))
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(arrivals)
      .writeStream
      .option("checkpointLocation", s"$work/ck")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // checkpointed: kept feeds the ingest probe AND the landed
        // join below — un-checkpointed, the battery subtree re-ran
        // once per consumer (3x per micro-batch)
        val kept = batch.join(TextOps.batteryKeep(batch), "doc_id")
          .localCheckpoint()
        val (admitted, _) = BandIndex.ingest(spark, idx,
          kept.select("doc_id", "text"))
        val landed = kept
          .join(admitted.select("doc_id"), "doc_id")
          .select(col("doc_id"), col("lang"), col("n_chars"),
                  lit(batchId).as("arrival_batch"))
        if (!landed.isEmpty)
          VersionedTable.currentVersion(spark, corpus) match {
            case Some(v) => VersionedTable.append(spark, corpus, landed, v)
            case None    => VersionedTable.commit(spark, corpus, landed, -1L)
          }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // an all-duplicates arrival window is legitimate (at high dup
    // ratios admission can reject EVERY arrival — first seen at the
    // 10x-replicated sweep): the census is then EMPTY, not an error
    val landedAll = VersionedTable.currentVersion(spark, corpus) match {
      case Some(_) => VersionedTable.read(spark, corpus)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new StructType().add("doc_id", "long").add("lang", "string")
          .add("n_chars", "long").add("arrival_batch", "long"))
    }
    val out = landedAll
      .groupBy(col("arrival_batch"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("arrival_batch"), col("lang"))
      .localCheckpoint() // materialize BEFORE the work dir is reclaimed
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    if (ephemeral)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fixture))
    out
  }

  /** st12: streaming ANN INGEST under the oracle gate — st11's
    * discipline for vectors: a VecIndex seeded from vec_id%3==0 (raw)
    * gates two arrival batches (%3==1 then %3==2; graft-table commits
    * drained with maxVersionsPerTrigger=1 → batch boundary == commit
    * boundary). Each micro-batch runs [[graft.operators.VecIndex.ingestDedup]]:
    * a vector is ADMITTED iff no indexed vector inside its probed
    * cells reaches the admission cosine — judged against the index AT
    * BATCH START, so a batch-1 admission can turn away its batch-2
    * near-neighbor through the O(batch) cell append. Output: landed
    * census per (arrival_batch, label). DuckDB replays
    * assignment/probing/cosine/sequential-admission relationally
    * (Similarity.streamAnnIngestOracle). */
  /** st12's seed VecIndex + two-commit arrivals table cache per
    * corpus (the st15 discipline); each drain COPIES the seed index
    * (ingestDedup mutates it) and reads the arrivals in place. */
  private val st12FixtureCache = newFixtureCache()

  def streamAnnIngestDrain(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import graft.operators.{Similarity, VecIndex}
    import graft.sources.VersionedTable
    val emb = embeddings.select(col("vec_id"), col("embedding"), col("label"))
    val (fixture, ephemeral) = fixtureFor(st12FixtureCache, embeddings) {
      val dir = java.nio.file.Files.createTempDirectory("graft-st12-fix").toString
      VecIndex.build(spark, s"$dir/vecindex",
        emb.filter(pmod(col("vec_id"), lit(3)) === 0).select("vec_id", "embedding"),
        centIds = Similarity.streamIngestCentroids)
      val v0 = VersionedTable.commit(spark, s"$dir/arrivals",
        emb.filter(pmod(col("vec_id"), lit(3)) === 1), -1L)
      VersionedTable.append(spark, s"$dir/arrivals",
        emb.filter(pmod(col("vec_id"), lit(3)) === 2), v0)
      dir
    }
    val work =
      java.nio.file.Files.createTempDirectory("graft-st12").toString
    val idx = s"$work/vecindex"
    val landedT = s"$work/landed"
    val arrivals = s"$fixture/arrivals"
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$fixture/vecindex"), new java.io.File(idx))
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(arrivals)
      .writeStream
      .option("checkpointLocation", s"$work/ck")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val (admitted, _) = VecIndex.ingestDedup(spark, idx,
          batch.select(col("vec_id"), col("embedding")),
          maxCos = Similarity.StreamIngestMaxCos, nProbe = 2)
        val landed = batch
          .join(admitted.select(col("vec_id")), "vec_id")
          .select(col("vec_id"), col("label"),
                  lit(batchId).as("arrival_batch"))
        if (!landed.isEmpty)
          VersionedTable.currentVersion(spark, landedT) match {
            case Some(v) => VersionedTable.append(spark, landedT, landed, v)
            case None    => VersionedTable.commit(spark, landedT, landed, -1L)
          }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // same contract as st11: a window where dedup admits nothing
    // yields an empty census, never a missing-table error
    val landedAll = VersionedTable.currentVersion(spark, landedT) match {
      case Some(_) => VersionedTable.read(spark, landedT)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new StructType().add("vec_id", "long").add("label", "integer")
          .add("arrival_batch", "long"))
    }
    val out = landedAll
      .groupBy(col("arrival_batch"), col("label"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("arrival_batch"), col("label"))
      .localCheckpoint() // materialize BEFORE the work dir is reclaimed
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    if (ephemeral)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fixture))
    out
  }

  /** st15: streaming LEXICAL-INDEX INGEST under the oracle gate —
    * st12's discipline for the inverted index: a [[graft.operators.LexIndex]]
    * seeded from doc_id%3==0 receives two arrival batches (%3==1 then
    * %3==2; graft-table commits drained with maxVersionsPerTrigger=1
    * → batch boundary == commit boundary), each micro-batch an
    * O(batch) [[graft.operators.LexIndex.ingest]] (postings add-files
    * + vocab-bounded stats merge). The drained index is then PROBED
    * with the standard query docs; because BM25's global weights
    * (df, avgdl, n_docs) resolve at probe time and the three batches
    * partition the corpus, the result must equal the from-scratch
    * BM25 arm on the WHOLE corpus bit-exactly — incremental ingest
    * across commit-gated micro-batches converges to the batch answer
    * (st01's equivalence discipline applied to index maintenance).
    * DuckDB replays the full-corpus arm relationally
    * (Similarity.streamLexIngestOracle). */
  /** Pristine per-corpus st15 fixtures: a dir holding the SEED index
    * (built on doc_id%3==0) and the two-commit arrivals table. The
    * seed build + arrival commits are setup, not the operator — a
    * bench min-of-N run should pay ingest+drain+probe each pass, not
    * re-tokenize the seed corpus (the s24 build-once discipline).
    * Each drain COPIES the seed index (its manifest mutates during
    * the drain) and reads the arrivals table in place (commits are
    * immutable). Evicted or ephemeral fixtures are reclaimed. */
  private val st15FixtureCache = new graft.operators.Caching.BoundedCache[
      (org.apache.spark.sql.SparkSession, String), String](4,
    onEvict = dir =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)))

  private def st15Fixture(spark: org.apache.spark.sql.SparkSession,
                          documents: DataFrame): (String, Boolean) = {
    import graft.operators.{Caching, LexIndex}
    import graft.sources.VersionedTable
    def build(): String = {
      val docs = documents.select(col("doc_id"), col("text"))
      val dir = java.nio.file.Files.createTempDirectory("graft-st15-fix").toString
      LexIndex.build(spark, s"$dir/lexindex",
        docs.filter(pmod(col("doc_id"), lit(3)) === 0))
      val v0 = VersionedTable.commit(spark, s"$dir/arrivals",
        docs.filter(pmod(col("doc_id"), lit(3)) === 1), -1L)
      VersionedTable.append(spark, s"$dir/arrivals",
        docs.filter(pmod(col("doc_id"), lit(3)) === 2), v0)
      dir
    }
    if (!Caching.bareScan(documents)) (build(), true)
    else {
      val stamp = Caching.stamp(documents)
      if (stamp.isEmpty) (build(), true)
      else (st15FixtureCache.getOrElseUpdate((spark, stamp))(build()), false)
    }
  }

  def streamLexIngestDrain(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import graft.operators.LexIndex
    val (fixture, ephemeral) = st15Fixture(spark, documents)
    val work = java.nio.file.Files.createTempDirectory("graft-st15").toString
    val idx = s"$work/lexindex"
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$fixture/lexindex"), new java.io.File(idx))
    val arrivals = s"$fixture/arrivals"
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(arrivals)
      .writeStream
      .option("checkpointLocation", s"$work/ck")
      // txn marker rides the index MANIFEST: a retried/restarted
      // micro-batch skips instead of double-appending postings and
      // double-counting df/n_docs (the appendRebaseTxn discipline
      // st12's ingestDedup and the events sink already follow)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        LexIndex.ingest(spark, idx, batch,
          txn = Some(("st15_lex_ingest", batchId)))
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val out = LexIndex.probe(spark, idx, documents.filter(col("doc_id") < 8))
      .select(col("q_id"), col("doc_id"), col("lex_rank"))
      .orderBy(col("q_id"), col("lex_rank"))
      .localCheckpoint() // materialize BEFORE the fixture dir is reclaimed
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    if (ephemeral)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fixture))
    out
  }

  // ---- st16/st17: streaming graph-/gram-index ingest -------------------

  /** Pristine per-corpus st16 fixtures (the st15 discipline): seed
    * GraphIndex built on vec_id%3==0 + the two-commit arrivals table.
    * Each drain COPIES the seed index (ingest mutates it) and reads
    * the arrivals in place. */
  private val st16FixtureCache = new graft.operators.Caching.BoundedCache[
      (org.apache.spark.sql.SparkSession, String), String](4,
    onEvict = dir =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)))

  private def st16Fixture(spark: org.apache.spark.sql.SparkSession,
                          embeddings: DataFrame): (String, Boolean) = {
    import graft.operators.{Caching, GraphIndex, Similarity}
    import graft.sources.VersionedTable
    def build(): String = {
      // keep the full frame: knnJoin's cell assignment carries `label`
      val emb = embeddings.select(col("vec_id"), col("embedding"), col("label"))
      val dir = java.nio.file.Files.createTempDirectory("graft-st16-fix").toString
      GraphIndex.build(spark, s"$dir/graphindex",
        emb.filter(pmod(col("vec_id"), lit(3)) === 0),
        centIds = Similarity.streamIngestCentroids)
      val v0 = VersionedTable.commit(spark, s"$dir/arrivals",
        emb.filter(pmod(col("vec_id"), lit(3)) === 1), -1L)
      VersionedTable.append(spark, s"$dir/arrivals",
        emb.filter(pmod(col("vec_id"), lit(3)) === 2), v0)
      dir
    }
    if (!graft.operators.Caching.bareScan(embeddings)) (build(), true)
    else {
      val stamp = graft.operators.Caching.stamp(embeddings)
      if (stamp.isEmpty) (build(), true)
      else (st16FixtureCache.getOrElseUpdate((spark, stamp))(build()), false)
    }
  }

  /** st16: streaming GRAPH-INDEX INGEST under the oracle gate —
    * st12's discipline for the kNN graph: a [[graft.operators.GraphIndex]]
    * seeded from vec_id%3==0 receives two arrival batches (%3==1 then
    * %3==2; graft-table commits drained with maxVersionsPerTrigger=1 →
    * batch boundary == commit boundary), each micro-batch ONE
    * [[graft.operators.GraphIndex.ingest]] against the corpus AS GROWN
    * AT ITS COMMIT (deterministic because batch == commit), txn-marked
    * so a re-executed batch appends nothing twice. The drained index
    * is then probed with the standard walk. Cross-batch reachability
    * is the live property the spec pins: a batch-2 walk reaches a
    * batch-1 arrival through the REVERSED edges its ingest appended a
    * commit earlier. DuckDB replays the grown adjacency as three
    * prefixed kNN chains + the shared beam-walk tail
    * (Similarity.streamGraphIngestOracle). */
  def streamGraphIngestDrain(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import graft.operators.{GraphIndex, Similarity}
    val (fixture, ephemeral) = st16Fixture(spark, embeddings)
    val work = java.nio.file.Files.createTempDirectory("graft-st16").toString
    val idx = s"$work/graphindex"
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$fixture/graphindex"), new java.io.File(idx))
    val emb = embeddings.select(col("vec_id"), col("embedding"), col("label"))
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(s"$fixture/arrivals")
      .writeStream
      .option("checkpointLocation", s"$work/ck")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // the grown corpus at this commit: seed ∪ arrival commits
        // <= batchId (newVecs ⊆ corpus, the ingest contract)
        val corpus = if (batchId == 0L)
          emb.filter(pmod(col("vec_id"), lit(3)) =!= 2) else emb
        GraphIndex.ingest(spark, idx, corpus,
          batch.select(col("vec_id"), col("embedding")),
          centIds = Similarity.streamIngestCentroids,
          txn = Some(("st16_graph_ingest", batchId)))
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val out = GraphIndex.probe(spark, idx, embeddings).localCheckpoint()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    if (ephemeral)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fixture))
    out
  }

  /** Pristine per-corpus st17 fixtures: seed GramIndex built on
    * doc_id%3==0 + the two-commit arrivals table (the st16 shape for
    * the positional-gram posting index). */
  private val st17FixtureCache = new graft.operators.Caching.BoundedCache[
      (org.apache.spark.sql.SparkSession, String), String](4,
    onEvict = dir =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)))

  private def st17Fixture(spark: org.apache.spark.sql.SparkSession,
                          documents: DataFrame): (String, Boolean) = {
    import graft.operators.GramIndex
    import graft.sources.VersionedTable
    def build(): String = {
      val docs = documents.select(col("doc_id"), col("text"))
      val dir = java.nio.file.Files.createTempDirectory("graft-st17-fix").toString
      GramIndex.build(spark, s"$dir/gramindex",
        docs.filter(pmod(col("doc_id"), lit(3)) === 0))
      val v0 = VersionedTable.commit(spark, s"$dir/arrivals",
        docs.filter(pmod(col("doc_id"), lit(3)) === 1), -1L)
      VersionedTable.append(spark, s"$dir/arrivals",
        docs.filter(pmod(col("doc_id"), lit(3)) === 2), v0)
      dir
    }
    if (!graft.operators.Caching.bareScan(documents)) (build(), true)
    else {
      val stamp = graft.operators.Caching.stamp(documents)
      if (stamp.isEmpty) (build(), true)
      else (st17FixtureCache.getOrElseUpdate((spark, stamp))(build()), false)
    }
  }

  /** st17: streaming GRAM-INDEX INGEST under the oracle gate — st16's
    * twin for the positional-gram span index (d15's probe as the
    * scoring kernel): a [[graft.operators.GramIndex]] seeded from
    * doc_id%3==0 receives two arrival batches (%3==1 then %3==2;
    * batch == commit), each micro-batch PROBES the index at its batch
    * start (cross spans against everything already indexed) and then
    * APPENDS its own postings txn-marked — so batch 2's spans include
    * matches against batch 1's documents through the O(batch) posting
    * append one commit earlier (the cross-batch property), and a
    * re-executed batch neither double-appends nor double-lands.
    * Output: landed spans per arrival batch. DuckDB replays both
    * probes relationally — batch 0 against the hot-capped seed
    * postings, batch 1 against seed ∪ batch-0 postings appended
    * WITHOUT a cap re-check, the literal append contract
    * (Dedup.streamGramIngestOracle). */
  def streamGramIngestDrain(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import graft.operators.GramIndex
    import graft.sources.VersionedTable
    val (fixture, ephemeral) = st17Fixture(spark, documents)
    val work = java.nio.file.Files.createTempDirectory("graft-st17").toString
    val idx = s"$work/gramindex"
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$fixture/gramindex"), new java.io.File(idx))
    val landedT = s"$work/landed"
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(s"$fixture/arrivals")
      .writeStream
      .option("checkpointLocation", s"$work/ck")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // probe BEFORE append: a batch's spans are judged against the
        // index at its commit boundary, never against itself. The
        // landing runs BEFORE the index append and both writes carry
        // txn markers, so every crash point replays to exactly-once:
        // until the index append lands, a replayed probe sees the
        // SAME index (same spans), and each table's marker skips its
        // own re-execution — no double-landing, no self-span garbage
        // from probing an index that already contains the batch. The
        // landing is unconditional (empty batches land a 0-row
        // marker commit) so the marker exists at every crash point.
        val landedDone = VersionedTable.lastTxnBatch(spark, landedT,
          "st17_gram_land").exists(_ >= batchId)
        if (!landedDone) {
          val spans = GramIndex.probe(spark, idx, batch)
            .withColumn("arrival_batch", lit(batchId))
            .select(col("arrival_batch"), col("batch_doc"), col("corpus_doc"),
                    col("b_start"), col("c_start"), col("span_toks"))
            .localCheckpoint()
          VersionedTable.append(spark, landedT, spans,
            VersionedTable.currentVersion(spark, landedT).getOrElse(-1L),
            txn = Some(("st17_gram_land", batchId)))
        }
        GramIndex.append(spark, idx, batch,
          txn = Some(("st17_gram_ingest", batchId)))
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val landedAll = VersionedTable.currentVersion(spark, landedT) match {
      case Some(_) => VersionedTable.read(spark, landedT)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new StructType().add("arrival_batch", "long").add("batch_doc", "long")
          .add("corpus_doc", "long").add("b_start", "long")
          .add("c_start", "long").add("span_toks", "long"))
    }
    val out = landedAll
      .orderBy(col("arrival_batch"), col("batch_doc"), col("corpus_doc"),
               col("b_start"), col("c_start"))
      .localCheckpoint()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    if (ephemeral)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fixture))
    out
  }

  val lakeCdcOracle: String =
    """WITH ch AS (
         SELECT o_orderkey, o_orderstatus,
                o_totalprice + 1000.0 AS price,
                CASE WHEN o_orderkey % 2 = 1 THEN 'inserted'
                     ELSE 'updated' END AS change_type
         FROM orders WHERE o_orderkey % 10 IN (1, 2))
       SELECT change_type, o_orderstatus AS status,
         CAST(count(*) AS BIGINT) AS n, round(sum(price), 2) AS total
       FROM ch GROUP BY change_type, o_orderstatus
       ORDER BY change_type, status"""

  // ---- st13: streaming KMV distinct sketch ----------------------------

  case class EvK(event_id: Long, user_id: Long, event_type: String)
  case class KmvState(hashes: Array[Long])

  /** st13: q49's KMV sketch maintained as LIVE STREAMING STATE — the
    * whole argument for sketches in streams made executable: exact
    * per-group distinct counting needs state proportional to the
    * distinct count (unbounded on an infinite stream), while the KMV
    * state is ≤ k longs per group FOREVER, and because a KMV is just
    * the min-k of a deterministic hash — order-insensitive,
    * merge-associative — the streamed sketch lands BIT-IDENTICAL to
    * the batch sketch no matter how the stream is micro-batched. That
    * determinism is what puts a stateful streaming sketch under the
    * DuckDB oracle gate (st01's equivalence discipline, extended to
    * `mapGroupsWithState`).
    *
    * Each micro-batch folds its events into the group's sorted min-k
    * (evicting the max on overflow) and emits the revised sketch in
    * UPDATE mode; a group untouched by a batch does not re-emit
    * (change-driven, the st08 contract). At 100 TB/day the state
    * store holds k longs per live group — the sketch IS the memory
    * bound. */
  def kmvStream(events: Dataset[EvK], k: Int = 64): DataFrame = {
    import events.sparkSession.implicits._
    val P = 2147483647L
    events.groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (t: String, evs: Iterator[EvK], state: GroupState[KmvState]) => {
          val cur = scala.collection.mutable.SortedSet.empty[Long]
          state.getOption.foreach(s => cur ++= s.hashes)
          evs.foreach { e =>
            cur += (e.user_id * 1103515245L + 12345L) % P
            if (cur.size > k) cur -= cur.last
          }
          state.update(KmvState(cur.toArray))
          val n = cur.size.toLong
          val kth = if (cur.isEmpty) 0L else cur.last
          val est = if (n < k) n else (k - 1).toLong * P / kth
          (t, n, kth, est)
        })
      .toDF("event_type", "n_sketch", "kth_hash", "est")
  }

  /** st13 drain: two graft-table commits stream through the sketch
    * (maxVersionsPerTrigger=1 → the state MUST carry across the batch
    * boundary), final state per group picked from the update stream
    * by the monotone pair (n_sketch only grows, kth_hash only
    * shrinks). */
  /** st13's two-commit arrivals table is read-only during the drain
    * (only the checkpoint dir mutates, and that lives in the per-run
    * work dir), so the fixture caches per corpus with no copy. The
    * events frame is a deterministic ts-normalizing projection —
    * planStamp, the e2e01 precedent. */
  private val st13FixtureCache = newFixtureCache()

  def streamKmvDrain(events: DataFrame, k: Int = 64): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import graft.sources.VersionedTable
    val ev = events.select(col("event_id"), col("user_id"), col("event_type"))
    val (fixture, ephemeral) = fixtureFor(st13FixtureCache, events, byPlan = true) {
      val dir = java.nio.file.Files.createTempDirectory("graft-st13-fix").toString
      val v0 = VersionedTable.commit(spark, s"$dir/arrivals",
        ev.filter(pmod(col("event_id"), lit(2)) === 0), -1L)
      VersionedTable.append(spark, s"$dir/arrivals",
        ev.filter(pmod(col("event_id"), lit(2)) === 1), v0)
      dir
    }
    val work =
      java.nio.file.Files.createTempDirectory("graft-st13").toString
    val arrivals = s"$fixture/arrivals"
    val src = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(arrivals).as[EvK]
    val q = kmvStream(src, k).writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("graft_st13")
      .option("checkpointLocation", s"$work/ck").start()
    try q.processAllAvailable() finally q.stop()
    // the memory sink holds the update stream; neither dir is
    // referenced by the output frame
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    if (ephemeral)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fixture))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("n_sketch").desc, col("kth_hash"))
    spark.table("graft_st13")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_type"), col("n_sketch"), col("kth_hash"), col("est"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of the drained [[kmvStream]]: q49's sketch arm alone
    * (the stream cannot carry the exact column — that unbounded state
    * is precisely what the sketch exists to avoid). */
  def kmvStreamOracle(k: Int = 64): String = {
    val P = 2147483647L
    s"""WITH h AS (SELECT DISTINCT event_type,
           (user_id * 1103515245 + 12345) % $P AS h FROM events),
       r AS (SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
         FROM h),
       sk AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_sketch,
           CAST(max(h) AS BIGINT) AS kth_hash FROM r WHERE rk <= $k
         GROUP BY 1)
       SELECT event_type, n_sketch, kth_hash,
         CAST(CASE WHEN n_sketch < $k THEN n_sketch
              ELSE (CAST(${k - 1} AS BIGINT) * $P) // kth_hash
              END AS BIGINT) AS est
       FROM sk ORDER BY event_type"""
  }

  // ---- st14: the ALERT SINK — cusum transitions → versioned alerts ----

  /** One micro-batch of the alert pipeline — the engine-side analogue
    * of the reference's outbound notification hook
    * (workers/tasks/send_discord_notification.py:55 fires one Discord
    * message per run state TRANSITION): the batch's events land in
    * `eventsRoot` under a `#txn appId batchId` marker (a replayed
    * batch — foreachBatch retry, checkpoint restart — is detected via
    * [[graft.sources.VersionedTable.lastTxnBatch]] and skipped whole),
    * then the SEQUENTIAL cusum monitor
    * ([[graft.operators.Relational.cusumMonitor]]) runs over
    * everything delivered so far and its off→on transitions MERGE
    * into the versioned `alertsRoot` keyed on (event_type, day).
    *
    * Exactly-once per transition comes from two independent layers:
    * the txn gate makes the events append idempotent, and the keyed
    * merge + prefix-stable statistic make the alert rows idempotent
    * BY CONTENT — a transition evaluates to the same (key, values)
    * row in every batch that sees it, so replays and re-evaluations
    * converge instead of duplicating. An external notifier would
    * consume `alertsRoot`'s change feed (readChangeFeed) — each
    * transition appears there once, in commit order. */
  def alertBatch(spark: SparkSession, eventsRoot: String, alertsRoot: String,
                 appId: String, batchId: Long, batch: DataFrame,
                 trainDays: Int = 10): Unit = {
    import graft.sources.VersionedTable
    if (VersionedTable.lastTxnBatch(spark, eventsRoot, appId).exists(_ >= batchId))
      return
    VersionedTable.appendRebaseTxn(spark, eventsRoot, batch, appId, batchId)
    val monitor = graft.operators.Relational.cusumMonitor(
      VersionedTable.read(spark, eventsRoot), trainDays)
    // checkpointed: the emptiness gate AND the merge both consume this
    // frame — un-checkpointed, the whole monitor subtree ran twice per
    // micro-batch
    val alerts = monitor.filter(col("alert"))
      .select(col("event_type"), col("day"), col("n"), col("cusum"))
      .localCheckpoint()
    if (!alerts.isEmpty) {
      VersionedTable.merge(spark, alertsRoot, alerts,
        keys = Seq("event_type", "day"))
      ()
    }
  }

  /** st14 drain: the alert pipeline as a LIVE STREAM. The events
    * table lands as three chronological, day-aligned commits
    * (training days; first monitored stretch; the rest) and streams
    * through [[alertBatch]] with `maxVersionsPerTrigger=1` — so the
    * monitor genuinely runs incrementally, re-evaluating as each
    * day-range arrives. The returned frame is the final monitor
    * surface with `alert` read back FROM THE ALERTS TABLE (not
    * recomputed): the DuckDB oracle computes the transition flag
    * independently, so the hash gate proves the sink materialized
    * exactly the transition set — the prefix-stability contract made
    * checkable. */
  /** st14's three chronological arrival commits are read-only during
    * the drain (delivered/alerts state lives in the per-run work dir),
    * so the fixture caches per corpus with no copy. The split depends
    * on trainDays, so the cache key carries it. */
  private val st14FixtureCache = newFixtureCache()

  def alertStreamDrain(events: DataFrame, trainDays: Int = 10): DataFrame = {
    val spark = events.sparkSession
    import graft.sources.VersionedTable
    val ev = events.select(col("event_id"), col("ts"), col("event_type"))
    def buildFixture(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft-st14-fix").toString
      val arrivals = s"$dir/arrivals"
      val day = to_date(col("ts"))
      val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day0"))
      val dayRank = events.select(col("event_type"), day.as("day0")).distinct()
        .withColumn("rk", row_number().over(wOrd))
      val split1 = trainDays
      val split2 = trainDays + 10
      val evRanked = ev.withColumn("day0", day)
        .join(dayRank, Seq("event_type", "day0"))
      val v0 = VersionedTable.commit(spark, arrivals,
        evRanked.filter(col("rk") <= split1).drop("day0", "rk"), -1L)
      val v1 = VersionedTable.append(spark, arrivals,
        evRanked.filter(col("rk") > split1 && col("rk") <= split2)
          .drop("day0", "rk"), v0)
      VersionedTable.append(spark, arrivals,
        evRanked.filter(col("rk") > split2).drop("day0", "rk"), v1)
      dir
    }
    val stamp = graft.operators.Caching.planStamp(events)
    val (fixture, ephemeral) =
      if (stamp.isEmpty) (buildFixture(), true)
      else (st14FixtureCache.getOrElseUpdate(
              (spark, stamp + s"#train$trainDays"))(buildFixture()), false)
    val work = java.nio.file.Files.createTempDirectory("graft-st14").toString
    val arrivals = s"$fixture/arrivals"
    val eventsRoot = s"$work/delivered"
    val alertsRoot = s"$work/alerts"
    val src = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(arrivals)
    val q = src.writeStream
      .foreachBatch((b: DataFrame, id: Long) =>
        alertBatch(spark, eventsRoot, alertsRoot, "st14", id, b, trainDays))
      .option("checkpointLocation", s"$work/ck").start()
    try q.processAllAvailable() finally q.stop()
    val monitor = graft.operators.Relational.cusumMonitor(
      VersionedTable.read(spark, eventsRoot), trainDays).drop("alert")
    val alerted = VersionedTable.currentVersion(spark, alertsRoot) match {
      case Some(_) => VersionedTable.read(spark, alertsRoot)
        .select(col("event_type"), col("day"), lit(true).as("alert"))
      case None => monitor.select(col("event_type"), col("day"))
        .limit(0).withColumn("alert", lit(true))
    }
    val out = monitor.join(alerted, Seq("event_type", "day"), "left")
      .withColumn("alert", coalesce(col("alert"), lit(false)))
      .select(col("event_type"), col("day"), col("n"), col("cusum"),
        col("alarm"), col("alert"))
      .orderBy(col("event_type"), col("day"))
      .localCheckpoint() // materialize BEFORE the work dir is reclaimed
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    if (ephemeral)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(fixture))
    out
  }
}
