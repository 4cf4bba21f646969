package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Structured Streaming operators (SURVEY.md §2.I — mandated extension;
  * the reference has no streaming surface [SURVEY.md §1.1]).
  *
  * Each transform takes a streaming DataFrame with the `events` schema
  * (event_id long, ts timestamp, user_id long, event_type string,
  * value double, props string) and returns the streaming result; batch
  * equivalents with identical window semantics live in
  * graft.operators.EventWindows and are what the DuckDB oracle checks.
  * StreamingSpec drives these with MemoryStream and asserts equivalence
  * plus watermark late-drop behavior.
  *
  * Scale notes: all stateful ops are keyed (user_id / window) so state
  * partitions across executors; watermarks bound state size; sinks
  * checkpoint for exactly-once into the lake.
  */
/** StatefulProcessor for transformWithState: one Double of state per
  * user (the running total), batch rows applied in event_id order for
  * determinism.
  */
class RunningTotalProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, Double), (Long, Long, Double)] {
  import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var total: ValueState[Double] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    total = getHandle.getValueState[Double]("total",
      Encoders.scalaDouble, TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    var t = if (total.exists()) total.get() else 0.0
    val out = rows.toSeq.sortBy(_._2).map { case (_, eid, v) =>
      t += v
      (key, eid, t)
    }
    total.update(t)
    out.iterator
  }
}

/** `stream_state_ttl` — the same running purchase total, but the
  * ValueState carries a TTL: a key whose state was last written more
  * than `ttlMs` ago reads as absent (`exists()` → false; the store
  * evicts the value independently), so a late-returning user restarts
  * from zero instead of resuming a stale total. This is the bounded
  * state story at 100 TB: per-key state cannot outlive its usefulness
  * even for keys that never receive another row (unlike
  * watermark-based eviction, which needs new data to advance).
  * TTL requires TimeMode.ProcessingTime — see `runningTotalsWithTtl`.
  */
class TtlRunningTotalProcessor(ttlMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, Double), (Long, Long, Double)] {
  import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var total: ValueState[Double] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    total = getHandle.getValueState[Double]("total",
      Encoders.scalaDouble, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    var t = if (total.exists()) total.get() else 0.0
    val out = rows.toSeq.sortBy(_._2).map { case (_, eid, v) =>
      t += v
      (key, eid, t)
    }
    total.update(t)
    out.iterator
  }
}

object Streams {

  /** `stream_tumbling` — 1h tumbling count/sum per event_type with a
    * 10-minute watermark.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** `stream_sliding` — 1h window sliding every 15 min. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n_events"))

  /** `stream_session` — 30-minute-gap session windows per user (native
    * session_window; batch gap-and-island equivalent:
    * EventWindows.sessionize).
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("session_value"))

  /** `stream_watermark_late` / `stream_dedup` — stateful dedup on
    * event_id bounded by the watermark: late duplicates (and late rows
    * beyond the watermark) are dropped; state is evicted as the
    * watermark advances, so it cannot grow unboundedly.
    */
  def dedupWithWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** `stream_join` — watermarked stream-stream interval join: purchases
    * matched to the same user's clicks in the preceding 30 minutes
    * (batch equivalent: EventWindows.streamJoinBatch; equivalence tested
    * in StreamingSpec). The watermark + time-range condition lets the
    * engine evict both sides' join state once click_ts falls behind
    * purchase-side watermark − 30 min — bounded state at scale.
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("click_ts", "1 hour")
    val p = purchases.withWatermark("purchase_ts", "1 hour")
    p.join(c,
      expr("""p_user_id = c_user_id AND
             |click_ts <= purchase_ts AND
             |purchase_ts <= click_ts + INTERVAL 30 MINUTES""".stripMargin))
      .select(col("p_user_id").as("user_id"), col("purchase_id"),
        col("click_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("gap_sec"))
  }

  /** `stream_join_outer` — watermarked stream-stream LEFT OUTER join
    * (the attribution-with-timeout shape): every purchase emits, matched
    * to same-user clicks in the preceding 30 minutes; a purchase with no
    * such click emits ONCE, NULL-padded, only after the watermark passes
    * the end of its match window — i.e. once the engine can prove no
    * future click can join it. Same state-eviction bound as the inner
    * form (`clickPurchaseJoin`): both sides' state is dropped as the
    * combined watermark advances, so state stays proportional to the
    * interval width at any input rate. Batch equivalent:
    * EventWindows.streamJoinOuterBatch (a plain LEFT JOIN — NULL rows
    * need no watermark reasoning in batch); NULL-emission timing and
    * batch equivalence are StreamingSpec-asserted.
    */
  def clickPurchaseJoinOuter(clicks: DataFrame,
      purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("click_ts", "1 hour")
    val p = purchases.withWatermark("purchase_ts", "1 hour")
    p.join(c,
      expr("""p_user_id = c_user_id AND
             |click_ts <= purchase_ts AND
             |purchase_ts <= click_ts + INTERVAL 30 MINUTES""".stripMargin),
      "leftOuter")
      .select(col("p_user_id").as("user_id"), col("purchase_id"),
        col("click_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("gap_sec"))
  }

  /** `stream_join_full` — watermarked stream-stream FULL OUTER join:
    * completes the outer matrix. Unmatched PURCHASES null-pad the click
    * side (as in the left-outer form) and unmatched CLICKS null-pad the
    * purchase side — a click's state is provably unmatched once the
    * watermark passes click_ts + 30 min (the latest purchase that could
    * still join it). Both emissions are watermark-driven; both sides'
    * state stays bounded by the interval width.
    */
  def clickPurchaseJoinFull(clicks: DataFrame,
      purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("click_ts", "1 hour")
    val p = purchases.withWatermark("purchase_ts", "1 hour")
    p.join(c,
      expr("""p_user_id = c_user_id AND
             |click_ts <= purchase_ts AND
             |purchase_ts <= click_ts + INTERVAL 30 MINUTES""".stripMargin),
      "fullOuter")
      .select(coalesce(col("p_user_id"), col("c_user_id")).as("user_id"),
        col("purchase_id"), col("click_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("gap_sec"))
  }

  /** `stream_join_semi` — watermarked stream-stream LEFT SEMI join:
    * purchases that HAD a qualifying click, emitted once (no click
    * columns, no row multiplication — the existence-check shape).
    * Emission is immediate on first match; state for the probe side is
    * dropped once matched or expired, so semi state is strictly smaller
    * than the inner join's.
    */
  def clickPurchaseJoinSemi(clicks: DataFrame,
      purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("click_ts", "1 hour")
    val p = purchases.withWatermark("purchase_ts", "1 hour")
    p.join(c,
      expr("""p_user_id = c_user_id AND
             |click_ts <= purchase_ts AND
             |purchase_ts <= click_ts + INTERVAL 30 MINUTES""".stripMargin),
      "leftSemi")
      .select(col("p_user_id").as("user_id"), col("purchase_id"))
  }

  /** `stream_static_join` — stream-static dim enrichment: the streaming
    * side joins a STATIC DataFrame per micro-batch. Stateless (no join
    * state, no watermark — the static side is simply re-planned each
    * batch, picking up broadcast like any batch join), which is why this
    * is the first-choice shape for stream enrichment at scale.
    * Equivalence with the batch form is StreamingSpec-asserted.
    */
  def enrichWithCustomer(events: DataFrame, customer: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"))
      .join(customer.select(col("c_custkey").as("user_id"),
        col("c_mktsegment")), "user_id")
      .select(col("event_id"), col("user_id"), col("c_mktsegment"),
        col("value"))

  /** Streaming form of `dedup_incremental`: incoming documents
    * stream-static LEFT ANTI join the existing corpus's content-hash
    * set — the other stateless stream-static join class (anti, vs the
    * inner enrichment above): still no join state or watermark, the
    * static hash set re-plans per micro-batch, so newly compacted
    * corpus hashes are picked up batch-over-batch. Equivalence with
    * the batch operator is StreamingSpec-asserted.
    */
  def incrementalDedupStream(newDocs: DataFrame,
      existingHashes: DataFrame): DataFrame = {
    import graft.operators.TextOps.normText
    newDocs
      .withColumn("h", sha2(normText(col("text")), 256))
      .join(existingHashes, Seq("h"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Documents as a micro-batch file stream (streaming reads need an
    * explicit schema; the glob pins the one fixture file).
    */
  def documentsFileStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
  }

  /** `stream_stateful` — custom keyed state: running purchase total per
    * user, emitted on every purchase. flatMapGroupsWithState keeps one
    * double per user; with event-time timeout the state is GC'd for
    * idle users (bounded state at scale).
    */
  def runningPurchaseTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.streaming.GroupState
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as[Long], col("event_id").as[Long],
        col("value").as[Double])
      .as[(Long, Long, Double)]
    purchases
      .groupByKey(_._1)
      .flatMapGroupsWithState[Double, (Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Double)],
         state: GroupState[Double]) =>
          var total = state.getOption.getOrElse(0.0)
          // order within the batch by event_id for determinism
          val out = rows.toSeq.sortBy(_._2).map { case (_, eid, v) =>
            total += v
            (user, eid, total)
          }
          state.update(total)
          out.iterator
      }
      .toDF("user_id", "event_id", "running_purchases")
  }

  /** `stream_stateful` on the Spark 4 arbitrary-state API
    * (transformWithState + ValueState, RocksDB-backed): same semantics as
    * `runningPurchaseTotals`, with typed per-key state the store can
    * checkpoint/evict independently of the micro-batch. Requires
    * `spark.sql.streaming.stateStore.providerClass =
    * ...RocksDBStateStoreProvider` (jar verified present).
    */
  def runningPurchaseTotalsTws(spark: SparkSession,
      events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as[Long], col("event_id").as[Long],
        col("value").as[Double])
      .as[(Long, Long, Double)]
    purchases
      .groupByKey(_._1)
      .transformWithState(new RunningTotalProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "event_id", "running_purchases")
  }

  /** `stream_state_ttl` — running purchase totals whose keyed state
    * expires `ttlMs` after its last write (TtlRunningTotalProcessor).
    * TimeMode.ProcessingTime is mandatory for TTL'd state in Spark 4.
    * The declared batch query (EventWindows.stateTtlBatch) is the
    * event-time shape of the same idea — "state still live at corpus
    * end" — which IS DuckDB-expressible; the wall-clock eviction
    * behavior itself is pinned by StreamingSpec with real sleeps.
    */
  def runningTotalsWithTtl(spark: SparkSession, events: DataFrame,
      ttlMs: Long): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as[Long], col("event_id").as[Long],
        col("value").as[Double])
      .as[(Long, Long, Double)]
    purchases
      .groupByKey(_._1)
      .transformWithState(new TtlRunningTotalProcessor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
      .toDF("user_id", "event_id", "running_purchases")
  }

  /** `stream_sink` — checkpointed parquet sink (exactly-once into the
    * lake); foreachBatch variant for lake-maintenance writes (dynamic
    * partition overwrite per micro-batch).
    */
  def startParquetSink(df: DataFrame, path: String,
      checkpoint: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()

  /** File-replay source: read the events table as a stream (one file per
    * trigger) — the batch fixture replayed as a stream for tests.
    */
  def eventsFileStream(spark: SparkSession, sfDir: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) — shared legacy-conf + ns→µs
    // handling with the batch reader (graft.sources.Tables)
    graft.sources.Tables.enableNanosAsLong(spark)
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // the file source requires a directory path; select just the events
    // file out of the fixture dir with a glob filter
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet")
      .option("recursiveFileLookup", "false")
      .parquet(sfDir)
    graft.sources.Tables.normalizeEventTs(raw)
  }
}
