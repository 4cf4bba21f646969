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

/** `stream_session_timer` — sessionization on the arbitrary-state API
  * with EVENT-TIME TIMERS (the feature class session_window hides):
  * per-user state accumulates (start, last_ts, n, sum). Sessions close
  * two ways: an in-batch row whose EVENT-TIME gap from last_ts exceeds
  * the gap finalizes the open session inline, and the re-armed timer at
  * last_ts + gap emits from handleExpiredTimer when the WATERMARK
  * passes it (the stream-went-quiet case no later row ever closes) —
  * together the same close-on-gap semantics as session_window, but
  * with the state machine explicit, which is what a custom policy
  * (e.g. per-key gap, session caps, mid-session emission) would extend. State is one
  * tuple + one timer per in-flight session per user: bounded by active
  * users, evicted exactly at session close.
  *
  * SINGLE-OPEN-SESSION LIMITATION (ADVICE r7, documented by design):
  * state holds ONE open interval per key — the newest. A closed-but-
  * not-watermark-expired earlier island is emitted in the batch that
  * closes it, so a late row arriving in a LATER micro-batch (still
  * above the watermark, within the gap of that already-emitted island)
  * starts a fresh island instead of extending the emitted one: the
  * output can contain a split that re-sorting the full input would
  * merge. Within one micro-batch the fold IS exactly batch-equivalent
  * (the replay spec asserts this); across micro-batches the guarantee
  * is only as strong as the watermark — the same trade
  * `session_window` makes in update mode before watermark expiry.
  * An extension needing exact cross-batch late-chain merging would
  * hold closed islands in ListState keyed by island_end and emit them
  * from handleExpiredTimer only once the watermark passes
  * island_end + gap (cost: state grows with unexpired islands, not
  * just open sessions).
  *
  * Input: (user_id, ts_ms, value); output: (user_id, start_ms, n, sum).
  */
class SessionTimerProcessor(gapUs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, Double), (Long, Long, Long, Double)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimerValues,
    TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  // (start_us, last_us, n, sum in 1e-4 units) — values accumulate as
  // scaled longs, the exact arithmetic of the batch form's
  // DECIMAL(18,4) sum (double addition would drift on long sessions
  // and break the batch-equivalence the spec asserts)
  @transient private var sess: ValueState[(Long, Long, Long, Long)] = _

  private def scaled(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP).unscaledValue().longValue()

  private def emit(key: Long,
      s: (Long, Long, Long, Long)): (Long, Long, Long, Double) =
    (key, s._1, s._3, java.math.BigDecimal.valueOf(s._4, 4).doubleValue())

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    sess = getHandle.getValueState[(Long, Long, Long, Long)]("sess",
      Encoders.product[(Long, Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Double)] = {
    // sessions close on EVENT-TIME gap: a row arriving after
    // last + gap finalizes the open session right here (the timer only
    // covers the stream-went-quiet case, where no later row ever comes).
    // The fold is a batch gap-and-island over (open-session interval ∪
    // batch rows), all sorted by start: a row more than the gap OLDER
    // than the open session's start forms its own earlier island
    // instead of being absorbed (ADVICE r7 — min(start, ts) absorption
    // diverged from the batch form), and a chain of late rows that
    // reaches within the gap of the open session bridges into it,
    // exactly as re-sorting THIS micro-batch (plus the open interval)
    // would — equivalence across micro-batches is weaker; see the
    // single-open-session limitation in the class scaladoc. The open
    // interval's internal points are within-gap by construction, so
    // interval-level merging equals point-level island formation.
    val atoms = rows.map { case (_, ts, v) => (ts, ts, 1L, scaled(v)) }
      .toIndexedSeq ++ (if (sess.exists()) Seq(sess.get()) else Nil)
    var st: Option[(Long, Long, Long, Long)] = None
    val closed = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Double)]
    atoms.sortBy(a => (a._1, a._2)).foreach { case a @ (s0, l0, n0, v0) =>
      st match {
        case Some(cur @ (_, last, _, _)) if s0 > last + gapUs =>
          closed += emit(key, cur)
          st = Some(a)
        case Some((start, last, n, sum)) =>
          st = Some((start, math.max(last, l0), n + n0, sum + v0))
        case None =>
          st = Some(a)
      }
    }
    st.foreach { case s @ (_, last, _, _) =>
      // one armed timer per key: re-arm at the open session's deadline
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer((last + gapUs) / 1000L)
      sess.update(s)
    }
    closed.iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, Double)] = {
    if (!sess.exists()) Iterator.empty
    else {
      val s = sess.get()
      sess.clear()
      Iterator.single(emit(key, s))
    }
  }
}

/** `stream_anomaly` — prequential per-series z-scoring on the
  * arbitrary-state API: per event type, hourly value-sum buckets
  * accumulate in MapState; EVENT-TIME TIMERS close every bucket once
  * the watermark passes its end, in time order, scoring each against
  * the running moments of the buckets closed before it (history only —
  * the score the monitor emitted live is the score a backfill
  * reproduces). State per key = open buckets (bounded by the watermark
  * lag / bucket width) + one 3-long moment tuple; closed buckets leave
  * the map immediately. Rows whose bucket already closed (older than
  * the watermark) are DROPPED — the same late policy as the
  * append-mode windowed aggregate.
  *
  * Exactness (the batch twin's decimal discipline, as scaled longs —
  * the SessionTimerProcessor technique): bucket sums accumulate in
  * 1e-4 units of HALF_UP-snapped values (= the DECIMAL(18,4) sum);
  * moment sums accumulate 1e-4-unit snaps of x and x·x (= the
  * DECIMAL(28,4)/(38,4) window sums); μ/σ/z evaluate the same IEEE
  * tree and the flag compares the 6dp-rounded z.
  * [[graft.operators.EventWindows.streamAnomalyBatch]] is the declared
  * oracled twin; StreamingSpec asserts file-replay equality.
  *
  * Input: (event_type, ts_us, value); output: (event_type,
  * bucket_start_us, bucket_value, z, anomaly).
  */
class AnomalyProcessor(bucketUs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, (String, Long, Double), (String, Long, Double, Double, Int)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState,
    TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var open: MapState[Long, Long] = _
  // (n_closed, sx in 1e-4 units, sxx in 1e-4 units)
  @transient private var moments: ValueState[(Long, Long, Long)] = _

  private def snap4(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP).unscaledValue().longValue()

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    open = getHandle.getMapState[Long, Long]("open",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    moments = getHandle.getValueState[(Long, Long, Long)]("moments",
      Encoders.product[(Long, Long, Long)], TTLConfig.NONE)
  }

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Double)],
      timerValues: TimerValues): Iterator[(String, Long, Double, Double, Int)] = {
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    rows.foreach { case (_, tsUs, v) =>
      val b = tsUs - java.lang.Math.floorMod(tsUs, bucketUs)
      // late policy of the append-mode windowed agg: a bucket the
      // watermark already closed cannot reopen
      if (b + bucketUs > wmUs) {
        val fresh = !open.containsKey(b)
        val cur = if (fresh) 0L else open.getValue(b)
        open.updateValue(b, cur + snap4(v))
        // one timer per bucket, armed when the bucket first opens
        if (fresh) getHandle.registerTimer((b + bucketUs) / 1000L)
      }
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo)
      : Iterator[(String, Long, Double, Double, Int)] = {
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    val closable = open.iterator().map(p => (p._1, p._2)).toSeq
      .filter { case (b, _) => b + bucketUs <= wmUs }
      .sortBy(_._1) // score in TIME order: earlier buckets fold first
    var (n, sxU, sxxU) =
      if (moments.exists()) moments.get() else (0L, 0L, 0L)
    val out = closable.map { case (b, sumU) =>
      val x = java.math.BigDecimal.valueOf(sumU, 4).doubleValue()
      val nD = n.toDouble
      val sx = java.math.BigDecimal.valueOf(sxU, 4).doubleValue()
      val sxx = java.math.BigDecimal.valueOf(sxxU, 4).doubleValue()
      val varp = sxx / nD - (sx / nD) * (sx / nD)
      val z =
        if (nD < 2.0 || varp <= 0.0) 0.0
        else BigDecimal((x - sx / nD) / math.sqrt(varp))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      n += 1L
      sxU += snap4(x)
      sxxU += snap4(x * x)
      open.removeKey(b)
      (key, b, x, z, if (math.abs(z) > 2.0) 1 else 0)
    }
    moments.update((n, sxU, sxxU))
    out.iterator
  }
}

/** `stream_dedup_minhash_ok`'s processor — the SEEN-STORE near-dup
  * rule as live per-bucket state: keyed by LSH band bucket
  * (band, bhash), ListState holds every (doc_id, shingle-hash set)
  * ever seen in the bucket (the persisted signature store of
  * [[graft.operators.MinHashDedup.dedupMinhashIncremental]], keyed
  * out by bucket); each arriving doc compares against ALL state
  * entries plus same-batch rows with smaller doc_id (rows sort by
  * doc_id — batch order is the stream's arrival order, doc_id the
  * within-batch order, exactly the batch operator's "earlier" rule),
  * emits a (n_id, o_id) match for every exact-Jaccard hit, and
  * appends itself to the bucket regardless of matching (seen-store:
  * dropped docs still drop later dups). Exact verify in-processor:
  * round₄(|A∩B| / (|A|+|B|−|A∩B|)) ≥ threshold over the distinct
  * shingle-hash sets — the batch jaccard() column op for op.
  * State per bucket = its occupancy; buckets are the unit of scale-out.
  */
class BandDedupProcessor(threshold: Double)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      (Int, Long), (Int, Long, Long, Seq[Long]), (Long, Long)] {
  import org.apache.spark.sql.streaming.{ListState, TimerValues,
    TTLConfig}
  import org.apache.spark.sql.Encoders

  @transient private var seen: ListState[(Long, Array[Long])] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    seen = getHandle.getListState[(Long, Array[Long])]("seen",
      org.apache.spark.sql.Encoders.product[(Long, Array[Long])],
      TTLConfig.NONE)

  private def roundedJaccard(a: Array[Long], b: Array[Long]): Double = {
    val sa = a.toSet
    var inter = 0
    b.foreach(h => if (sa.contains(h)) inter += 1)
    val j = inter.toDouble /
      (a.length.toDouble + b.length.toDouble - inter.toDouble)
    java.math.BigDecimal.valueOf(j)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  override def handleInputRows(key: (Int, Long),
      rows: Iterator[(Int, Long, Long, Seq[Long])],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val prior = seen.get().toArray
    val batch = rows.toSeq.sortBy(_._3)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val appended = scala.collection.mutable.ArrayBuffer[(Long, Array[Long])]()
    batch.foreach { case (_, _, nId, shSeq) =>
      val sh = shSeq.toArray
      (prior.iterator ++ appended.iterator).foreach { case (oId, osh) =>
        if (roundedJaccard(sh, osh) >= threshold) out += ((nId, oId))
      }
      appended += ((nId, sh))
    }
    appended.foreach(e => seen.appendValue(e))
    out.iterator
  }
}

/** `stream_dedup_phash_ok`'s processor — the PERCEPTUAL seen-store
  * rule as live per-bucket state, completing the streaming-twin
  * symmetry across all FOUR dedup tiers (exact → minhash → semantic →
  * perceptual): keyed by the phash band bucket (band, bval) — the
  * lossless 4×16-bit blocking of
  * [[graft.operators.Multimodal.phashIncremental]] — ListState holds
  * every (asset_id, phash) ever seen in the bucket (8 B/asset, the
  * persisted fingerprint store keyed out by bucket); each arriving
  * asset compares against ALL state entries plus same-batch rows with
  * smaller asset_id (the batch operator's `o_store || o_id < n_id`
  * rule once the store replays as micro-batch 1), emits an
  * (n_id, o_id) match per Hamming ≤ maxHamming hit, and appends
  * itself regardless (seen-store). Verify is ONE xor+popcount on
  * BIGINT — pure integer, trivially engine-exact, and the banding is
  * LOSSLESS at Hamming ≤ 3 by pigeonhole, so the twin gates on the
  * exact all-pairs oracle with no recall caveat (unlike the MinHash
  * tier, whose banding is probabilistic).
  */
class PhashDedupProcessor(maxHamming: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      (Int, Long), (Int, Long, Long, Long), (Long, Long)] {
  import org.apache.spark.sql.streaming.{ListState, TimerValues,
    TTLConfig}

  @transient private var seen: ListState[(Long, Long)] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    seen = getHandle.getListState[(Long, Long)]("seen",
      org.apache.spark.sql.Encoders.product[(Long, Long)],
      TTLConfig.NONE)

  override def handleInputRows(key: (Int, Long),
      rows: Iterator[(Int, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val prior = seen.get().toArray
    val batch = rows.toSeq.sortBy(_._3)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val appended = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    batch.foreach { case (_, _, nId, nPh) =>
      (prior.iterator ++ appended.iterator).foreach { case (oId, oPh) =>
        if (java.lang.Long.bitCount(nPh ^ oPh) <= maxHamming)
          out += ((nId, oId))
      }
      appended += ((nId, nPh))
    }
    appended.foreach(e => seen.appendValue(e))
    out.iterator
  }
}

/** `stream_dedup_semantic_ok`'s processor — SemDeDup's seen-store rule
  * as live per-cell state, completing the streaming-twin symmetry
  * across the incremental family (exact `stream_dedup` → near-dup
  * [[BandDedupProcessor]] → semantic): keyed by cent_id under the
  * PINNED store codebook (assignment is a row-local argmax upstream —
  * re-learning the quantizer is a reindex event, never a micro-batch
  * event), ListState holds every (vec_id, embedding, ‖·‖) ever seen in
  * the cell; each arriving vector compares against ALL state entries
  * plus same-batch rows with smaller vec_id (rows sort by vec_id —
  * batch order is arrival order, vec_id the within-batch order,
  * exactly the batch operator's `o_store || o_id < n_id` rule once the
  * store replays as micro-batch 1), emits an (n_id, o_id) match per
  * cosine hit, and appends itself regardless of matching (seen-store:
  * dropped vectors still drop later dups).
  *
  * Exactness: the in-processor cosine is the batch column arithmetic
  * verbatim — left-to-right float→double dot
  * ([[graft.functions.FloatVecDot]]'s loop), norms computed ONCE by
  * the same [[graft.functions.FloatVecNorm]] expression upstream and
  * carried into state, one IEEE division, HALF_UP 4dp snap — so the
  * declared query hash-gates against `dedup_semantic_incremental`'s
  * DuckDB oracle verbatim. State per cell = its occupancy; cells are
  * the unit of scale-out (C ≈ √N balances assignment vs pair work —
  * the [[graft.operators.SimSearch.semDedup]] knob analysis).
  */
class SemanticDedupProcessor(threshold: Double)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, Seq[Float], Double), (Long, Long)] {
  import org.apache.spark.sql.streaming.{ListState, TimerValues, TTLConfig}

  @transient private var seen: ListState[(Long, Array[Float], Double)] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    seen = getHandle.getListState[(Long, Array[Float], Double)]("seen",
      org.apache.spark.sql.Encoders.product[(Long, Array[Float], Double)],
      TTLConfig.NONE)

  private def cos4(a: Array[Float], aNrm: Double,
      b: Array[Float], bNrm: Double): Double = {
    if (a.length != b.length) return -2.0 // dim mismatch: batch dot is null
    var s = 0.0
    var i = 0
    while (i < a.length) {
      s += a(i).toDouble * b(i).toDouble
      i += 1
    }
    java.math.BigDecimal.valueOf(s / (aNrm * bNrm))
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Seq[Float], Double)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val prior = seen.get().toArray
    val batch = rows.toSeq.sortBy(_._2)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val appended =
      scala.collection.mutable.ArrayBuffer[(Long, Array[Float], Double)]()
    batch.foreach { case (_, nId, embSeq, nNrm) =>
      val emb = embSeq.toArray
      (prior.iterator ++ appended.iterator).foreach {
        case (oId, oEmb, oNrm) =>
          if (cos4(emb, nNrm, oEmb, oNrm) >= threshold) out += ((nId, oId))
      }
      appended += ((nId, emb, nNrm))
    }
    appended.foreach(e => seen.appendValue(e))
    out.iterator
  }
}

/** `ts_drift` streaming form — day-over-day binned-histogram KS as a
  * live drift monitor: per event type, unit-width value bins accumulate
  * per OPEN day in MapState; EVENT-TIME TIMERS close days in time order
  * once the watermark passes their end, each closed day scoring against
  * the LAST closed day's histogram iff the two are calendar-adjacent
  * (the batch twin's n_prev > 0 rule falls out of the adjacency check:
  * an empty day breaks the chain in both forms). Comparison state per
  * key = ONE value-domain-sized histogram + the open days within the
  * watermark lag — bounded at any corpus size, exactly the state a
  * production monitor holds. Late rows whose day already closed drop
  * (the append-mode windowed-agg policy).
  *
  * Exactness: the dq_drift/ts_drift integer discipline — bins are
  * `floor(value)` longs, counts exact, the KS numerator
  * max |cumC·totP − cumP·totC| folds in pure Long over the sorted bin
  * union, and the emitted ks double is the same single IEEE division
  * the batch twin performs. [[graft.operators.EventWindows.tsDrift]]
  * is the declared oracled twin; StreamingSpec asserts file-replay
  * equality.
  *
  * Input: (event_type, ts_us, value); output: (event_type, day_us,
  * ks_num, n_cur, n_prev, ks).
  */
class DriftProcessor(dayUs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, (String, Long, Double),
      (String, Long, Long, Long, Long, Double)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState,
    TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  // (dayStartUs, bin) -> count, every OPEN day's histogram
  @transient private var open: MapState[(Long, Long), Long] = _
  // open-day registry (dayStartUs -> 1), so timers arm once per day
  @transient private var days: MapState[Long, Long] = _
  // LAST closed day's histogram + its start: the comparison state
  @transient private var prevHist: MapState[Long, Long] = _
  @transient private var prevDay: ValueState[Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    open = getHandle.getMapState[(Long, Long), Long]("open",
      Encoders.product[(Long, Long)], Encoders.scalaLong, TTLConfig.NONE)
    days = getHandle.getMapState[Long, Long]("days",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    prevHist = getHandle.getMapState[Long, Long]("prevHist",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    prevDay = getHandle.getValueState[Long]("prevDay",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Double)], timerValues: TimerValues)
      : Iterator[(String, Long, Long, Long, Long, Double)] = {
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    // batch-local pre-aggregation (map-side combine for the STATE
    // STORE): counts are order-free integer adds, so the batch's
    // increments fold in a local map first — ONE RocksDB
    // read-modify-write per TOUCHED (day, bin) instead of three state
    // ops per event (measured: the per-row form dominated the replay
    // rows' task time at 100k events/batch)
    val acc = scala.collection.mutable.LinkedHashMap[(Long, Long), Long]()
    rows.foreach { case (_, tsUs, v) =>
      val d = tsUs - java.lang.Math.floorMod(tsUs, dayUs)
      if (d + dayUs > wmUs) { // a closed day cannot reopen
        val k = (d, math.floor(v).toLong)
        acc.update(k, acc.getOrElse(k, 0L) + 1L)
      }
    }
    acc.foreach { case (k, c) =>
      open.updateValue(k,
        (if (open.containsKey(k)) open.getValue(k) else 0L) + c)
      val d = k._1
      if (!days.containsKey(d)) {
        days.updateValue(d, 1L)
        getHandle.registerTimer((d + dayUs) / 1000L)
      }
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo)
      : Iterator[(String, Long, Long, Long, Long, Double)] = {
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    val closable = days.keys().toSeq
      .filter(d => d + dayUs <= wmUs).sorted // close in TIME order
    val out = Seq.newBuilder[(String, Long, Long, Long, Long, Double)]
    closable.foreach { d =>
      val hist = open.iterator().filter(_._1._1 == d)
        .map { case ((_, b), c) => (b, c) }.toMap
      val pd = if (prevDay.exists()) prevDay.get() else Long.MinValue
      if (pd == d - dayUs) { // calendar-adjacent previous day exists
        val ph = prevHist.iterator().toMap
        val bins = (hist.keySet ++ ph.keySet).toSeq.sorted
        val tc = hist.valuesIterator.sum
        val tp = ph.valuesIterator.sum
        var cumc = 0L; var cump = 0L; var num = 0L
        bins.foreach { b =>
          cumc += hist.getOrElse(b, 0L)
          cump += ph.getOrElse(b, 0L)
          val dd = math.abs(cumc * tp - cump * tc)
          if (dd > num) num = dd
        }
        out += ((key, d, num, tc, tp,
          num.toDouble / (tc.toDouble * tp.toDouble)))
      }
      // rotate: this day becomes the comparison histogram
      prevHist.clear()
      hist.foreach { case (b, c) => prevHist.updateValue(b, c) }
      prevDay.update(d)
      hist.keysIterator.foreach(b => open.removeKey((d, b)))
      days.removeKey(d)
    }
    out.result().iterator
  }
}

/** Streaming Page-CUSUM — the ONLINE form of `ts_changepoint`: per
  * event type, daily value sums accumulate in MapState (snap-to-4dp
  * per event, the batch twin's exact decimal discipline) and
  * EVENT-TIME TIMERS close days in time order. The FIRST `refDays`
  * closed days buffer as the reference window; when it fills, μ, MAD,
  * the slack k = MAD/2 and threshold 5·MAD derive in the same
  * truncating integer arithmetic as the batch form, the buffered days
  * replay through the two-sided integer CUSUM in order, and every
  * later closed day scores incrementally — state per key is ONE open
  * window of days plus five longs. Replay-equal to
  * [[graft.operators.EventWindows.tsChangepointEvents]] with
  * `refDays = Some(d)` (StreamingSpec) for series with ≥ refDays
  * days; a series still inside its learning window emits nothing yet
  * — the honest online semantics (the batch form shrinks the window
  * for short series instead, which an online monitor cannot know to
  * do).
  */
class ChangepointProcessor(dayUs: Long, refDays: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, (String, Long, Double),
      (String, Long, Long, Long, Long, Int)] {
  import org.apache.spark.sql.streaming.{MapState, TimerValues,
    TTLConfig, ValueState, ExpiredTimerInfo}
  import org.apache.spark.sql.Encoders

  @transient private var open: MapState[Long, Long] = _
  // reference-window buffer: dayStart -> day sum, until refDays close
  @transient private var ref: MapState[Long, Long] = _
  // (n_closed, mu, mad, sp, sn) — all 1e-4 fixed-point longs
  @transient private var st: ValueState[(Long, Long, Long, Long, Long)] = _

  private def snap4(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP).unscaledValue().longValue()

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    open = getHandle.getMapState[Long, Long]("open",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    ref = getHandle.getMapState[Long, Long]("ref",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    st = getHandle.getValueState[(Long, Long, Long, Long, Long)]("st",
      Encoders.product[(Long, Long, Long, Long, Long)], TTLConfig.NONE)
  }

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Double)], timerValues: TimerValues)
      : Iterator[(String, Long, Long, Long, Long, Int)] = {
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    // batch-local pre-aggregation (the DriftProcessor treatment):
    // snap4 applies PER EVENT and the snapped longs add order-free,
    // so the batch folds locally first — ONE RocksDB
    // read-modify-write per touched day instead of three per event
    val acc = scala.collection.mutable.LinkedHashMap[Long, Long]()
    rows.foreach { case (_, tsUs, v) =>
      val b = tsUs - java.lang.Math.floorMod(tsUs, dayUs)
      if (b + dayUs > wmUs) // closed days cannot reopen (late drop)
        acc.update(b, acc.getOrElse(b, 0L) + snap4(v))
    }
    acc.foreach { case (b, s) =>
      val fresh = !open.containsKey(b)
      open.updateValue(b, (if (fresh) 0L else open.getValue(b)) + s)
      if (fresh) getHandle.registerTimer((b + dayUs) / 1000L)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo)
      : Iterator[(String, Long, Long, Long, Long, Int)] = {
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    val closable = open.iterator().map(p => (p._1, p._2)).toSeq
      .filter { case (b, _) => b + dayUs <= wmUs }
      .sortBy(_._1) // the CUSUM folds in day order
    var (n, mu, mad, sp, sn) =
      if (st.exists()) st.get() else (0L, 0L, 0L, 0L, 0L)
    val out =
      scala.collection.mutable.ArrayBuffer[(String, Long, Long, Long, Long, Int)]()
    def score(b: Long, x: Long): Unit = {
      val k = mad / 2 // Long '/': toward zero, = the batch div
      sp = math.max(0L, sp + (x - mu) - k)
      sn = math.max(0L, sn - (x - mu) - k)
      out += ((key, b, x, sp, sn,
        if (sp > mad * 5 || sn > mad * 5) 1 else 0))
    }
    closable.foreach { case (b, x) =>
      open.removeKey(b)
      if (n < refDays) {
        ref.updateValue(b, x)
        n += 1
        if (n == refDays) { // window filled: learn, then replay it
          val refs = ref.iterator().map(p => (p._1, p._2)).toSeq
            .sortBy(_._1)
          mu = refs.map(_._2).sum / refDays
          mad = refs.map(r => math.abs(r._2 - mu)).sum / refDays
          refs.foreach { case (rb, rx) => score(rb, rx) }
          refs.foreach { case (rb, _) => ref.removeKey(rb) }
        }
      } else score(b, x)
    }
    st.update((n, mu, mad, sp, sn))
    out.iterator
  }
}

/** Streaming Holt-Winters additive — the ONLINE form of
  * `ts_forecast_seasonal`: per event type, daily value sums accumulate
  * in MapState (snap-to-4dp per event, the batch twin's exact decimal
  * discipline) and EVENT-TIME TIMERS close days in time order. The
  * first 7 closed days buffer as the SEED window (emitting nothing —
  * the batch twin's contract); when it fills, l₀ = Σ div 7, b₀ = 0,
  * s = seed − l₀ derive in the same truncating integer arithmetic,
  * and every later closed day emits its PRIOR-state forecast
  * l + b + s[idx] before updating (l, b, s[idx]) with the α=β=γ=½
  * div-2 recursion. State per key: one open-day map, the 7-slot
  * seasonal map, and three longs. Replay-equal to
  * [[graft.operators.EventWindows.tsForecastSeasonalEvents]]
  * (StreamingSpec); the declared `stream_forecast_ok` row is gated on
  * `ts_forecast_seasonal`'s recursive-CTE oracle VERBATIM.
  */
class HoltWintersProcessor(dayUs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, (String, Long, Double), (String, Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState,
    TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var open: MapState[Long, Long] = _
  @transient private var seed: MapState[Long, Long] = _
  // seasonal slots: idx (0..6) -> s value (1e-4 fixed point)
  @transient private var seas: MapState[Long, Long] = _
  // (n_closed, l, b)
  @transient private var st: ValueState[(Long, Long, Long)] = _

  private def snap4(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValue()

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    open = getHandle.getMapState[Long, Long]("open",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    seed = getHandle.getMapState[Long, Long]("seed",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    seas = getHandle.getMapState[Long, Long]("seas",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    st = getHandle.getValueState[(Long, Long, Long)]("st",
      Encoders.product[(Long, Long, Long)], TTLConfig.NONE)
  }

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Double)], timerValues: TimerValues)
      : Iterator[(String, Long, Long, Long)] = {
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    val acc = scala.collection.mutable.LinkedHashMap[Long, Long]()
    rows.foreach { case (_, tsUs, v) =>
      val b = tsUs - java.lang.Math.floorMod(tsUs, dayUs)
      if (b + dayUs > wmUs) // closed days cannot reopen (late drop)
        acc.update(b, acc.getOrElse(b, 0L) + snap4(v))
    }
    acc.foreach { case (b, s) =>
      val fresh = !open.containsKey(b)
      open.updateValue(b, (if (fresh) 0L else open.getValue(b)) + s)
      if (fresh) getHandle.registerTimer((b + dayUs) / 1000L)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo)
      : Iterator[(String, Long, Long, Long)] = {
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    val closable = open.iterator().map(p => (p._1, p._2)).toSeq
      .filter { case (b, _) => b + dayUs <= wmUs }
      .sortBy(_._1) // the recursion folds in day order
    var (n, l, b) = if (st.exists()) st.get() else (0L, 0L, 0L)
    val out =
      scala.collection.mutable.ArrayBuffer[(String, Long, Long, Long)]()
    closable.foreach { case (day, x) =>
      open.removeKey(day)
      if (n < 7) {
        seed.updateValue(day, x)
        n += 1
        if (n == 7) { // seed filled: learn level + seasonal vector
          val sd = seed.iterator().map(p => (p._1, p._2)).toSeq
            .sortBy(_._1)
          l = sd.map(_._2).sum / 7 // Long '/': toward zero, = div
          b = 0L
          sd.zipWithIndex.foreach { case ((_, x0), i) =>
            seas.updateValue(i.toLong, x0 - l)
          }
          sd.foreach { case (d0, _) => seed.removeKey(d0) }
        }
      } else {
        val idx = n % 7
        val si = seas.getValue(idx)
        val f = l + b + si
        out += ((key, day, x, f))
        val l2 = (x - si + l + b) / 2
        b = ((l2 - l) + b) / 2
        seas.updateValue(idx, ((x - l2) + si) / 2)
        l = l2
        n += 1
      }
    }
    st.update((n, l, b))
    out.iterator
  }
}

/** Streaming TEMPORAL (as-of) join — the online form of `join_asof`
  * and Flink's temporal-table join: per user, dimension updates
  * (`signup` events: the user's value-at-time) buffer in MapState,
  * fact rows (`purchase` events) buffer until the WATERMARK passes
  * their timestamp (no earlier-or-equal dimension row can still
  * arrive), then each purchase enriches with the LATEST signup at or
  * before its event time — ties resolved exactly like the batch
  * window formulation (same-ts signup matches; among same-ts signups
  * the highest event_id wins). Purchases with no prior signup emit
  * unmatched (left-asof semantics). State per key: the signup history
  * (production bounds it with a TTL/retention horizon) + the pending
  * purchase buffer, which drains at each watermark advance.
  */
class AsofProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, Long, String, Double),
      (Long, Long, Long, Double, Boolean)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState,
    TimerValues, TTLConfig}
  import org.apache.spark.sql.Encoders

  // (ts_us, event_id) -> value: the dimension (signup) history
  @transient private var dim: MapState[(Long, Long), Double] = _
  // (ts_us, event_id) -> 1: purchases awaiting watermark closure
  @transient private var pend: MapState[(Long, Long), Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    dim = getHandle.getMapState[(Long, Long), Double]("dim",
      Encoders.product[(Long, Long)], Encoders.scalaDouble, TTLConfig.NONE)
    pend = getHandle.getMapState[(Long, Long), Long]("pend",
      Encoders.product[(Long, Long)], Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Long, String, Double)],
      timerValues: TimerValues)
      : Iterator[(Long, Long, Long, Double, Boolean)] = {
    rows.foreach { case (_, eid, tsUs, kind, v) =>
      // type dispatch lives HERE, not as a stream filter (see
      // asofScores: a pushed-down filter starves the watermark node)
      if (kind == "signup") dim.updateValue((tsUs, eid), v)
      else if (kind == "purchase") {
        pend.updateValue((tsUs, eid), 1L)
        getHandle.registerTimer(tsUs / 1000L + 1L)
      }
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo)
      : Iterator[(Long, Long, Long, Double, Boolean)] = {
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    val due = pend.keys().toSeq.filter(_._1 <= wmUs)
      .sortBy(identity) // deterministic emission walk
    val dims = dim.iterator().map(p => (p._1._1, p._1._2, p._2)).toSeq
    val out = due.map { case (pts, pid) =>
      pend.removeKey((pts, pid))
      // latest (ts, eid) at or before the purchase — the batch window
      // tie rule (same-ts signup matches; higher eid wins same-ts ties)
      val m = dims.filter(_._1 <= pts)
        .sortBy(d => (d._1, d._2)).lastOption
      m match {
        case Some((_, seid, sval)) => (pid, key, seid, sval, true)
        case None => (pid, key, -1L, 0.0, false)
      }
    }
    out.iterator
  }
}

object Streams {

  private def deleteRec(f: java.io.File): Unit = {
    val fs = f.listFiles()
    if (fs != null) fs.foreach(deleteRec)
    f.delete(); ()
  }

  /** ONE static JVM shutdown hook draining a concurrent queue of
    * scratch dirs (ADVICE r17: the per-invocation
    * `Runtime.addShutdownHook` calls accumulated a Thread per replay
    * in a long-lived driver that re-runs these queries — bench loops,
    * repeated hash+timing passes — unbounded until JVM exit). Callers
    * whose RESULT frame lazily reads the scratch dir enqueue here
    * instead of registering their own hook; the hook is installed
    * once, lazily, on first use.
    */
  private val scratchReclaimQueue =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private lazy val scratchReclaimHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var d = scratchReclaimQueue.poll()
      while (d != null) {
        try deleteRec(new java.io.File(d))
        catch { case _: Exception => () }
        d = scratchReclaimQueue.poll()
      }
    }))
  }

  private[graft] def reclaimAtExit(dir: String): Unit = {
    scratchReclaimHook
    scratchReclaimQueue.add(dir)
    ()
  }

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

  /** Streaming form of `ts_resample`: 6-hour OHLC bars as a watermarked
    * windowed aggregate — min_by/max_by carry one (value, ord) pair of
    * state per (window, type) group exactly like the batch plan, so the
    * incremental state is bar-sized, never event-sized. Same unique
    * packed (ms, event_id) ordering as the batch operator; equality
    * with [[graft.operators.EventWindows.tsResampleEvents]] is
    * spec-asserted by file replay (StreamingSpec).
    */
  def ohlcBars(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .withColumn("ord", unix_millis(col("ts")) * 1000000L + col("event_id"))
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(min_by(col("value"), col("ord")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ord")).as("close"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_events"))

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
    graft.sources.Tables.preferLtzTimestamps(spark)
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

  /** `stream_session_timer` — timer-closed sessions over the events
    * stream (SessionTimerProcessor). Requires a watermark: event-time
    * timers fire when the watermark passes their expiry, which is what
    * makes "no event for `gap`" provable on an unordered stream.
    */
  def sessionsWithTimers(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val rows = events
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as[Long],
        unix_micros(col("ts")).as[Long], col("value").as[Double])
      .as[(Long, Long, Double)]
    rows.groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor(gapMinutes * 60000000L),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "start_us", "n_events", "session_value")
      // second-truncated start — the batch gap-and-island form's shape
      .select(col("user_id"),
        date_trunc("second", timestamp_micros(col("start_us")))
          .as("session_start"),
        col("n_events"), col("session_value"))
  }

  /** Streaming form of `stream_anomaly` (see [[AnomalyProcessor]]):
    * watermarked events → per-type hourly buckets closed by event-time
    * timers → prequential z against the running prior-bucket moments.
    */
  def anomalyScores(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.TimeMode
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .select(col("event_type").as[String],
        unix_micros(col("ts")).as[Long], col("value").as[Double])
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new AnomalyProcessor(3600L * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("event_type", "bucket_us", "bucket_value", "z", "anomaly")
      .select(col("event_type"),
        timestamp_micros(col("bucket_us")).as("bucket"),
        col("bucket_value"), col("z"), col("anomaly"))
  }

  /** Streaming form of `ts_drift` (see [[DriftProcessor]]):
    * watermarked events → per-type daily histograms closed by
    * event-time timers → day-over-day KS against the last closed
    * adjacent day.
    */
  def driftScores(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.TimeMode
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .select(col("event_type").as[String],
        unix_micros(col("ts")).as[Long], col("value").as[Double])
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new DriftProcessor(86400L * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("event_type", "day_us", "ks_num", "n_cur", "n_prev", "ks")
      .select(col("event_type"),
        timestamp_micros(col("day_us")).as("day"),
        col("ks_num"), col("n_cur"), col("n_prev"), col("ks"))
  }

  /** Streaming form of `ts_changepoint` (see [[ChangepointProcessor]]):
    * watermarked events → per-type daily sums closed by event-time
    * timers → reference-window Page CUSUM, emitted in the batch twin's
    * display schema.
    */
  def changepointScores(events: DataFrame, refDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.streaming.TimeMode
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .select(col("event_type").as[String],
        unix_micros(col("ts")).as[Long], col("value").as[Double])
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(
        new ChangepointProcessor(86400L * 1000000L, refDays),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("event_type", "day_us", "x_fp", "sp", "sn", "changepoint")
      .select(col("event_type"),
        timestamp_micros(col("day_us")).as("day"),
        round(col("x_fp").cast("double") / 10000.0, 4).as("day_value"),
        round(col("sp").cast("double") / 10000.0, 4).as("cusum_pos"),
        round(col("sn").cast("double") / 10000.0, 4).as("cusum_neg"),
        col("changepoint"))
  }

  /** Streaming form of `ts_forecast_seasonal` (see
    * [[HoltWintersProcessor]]): watermarked events → per-type daily
    * sums closed by event-time timers → 7-day-seeded Holt-Winters
    * one-step forecasts in the batch twin's display schema.
    */
  def forecastScores(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.TimeMode
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .select(col("event_type").as[String],
        unix_micros(col("ts")).as[Long], col("value").as[Double])
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new HoltWintersProcessor(86400L * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("event_type", "day_us", "x_fp", "f_fp")
      .select(col("event_type"),
        timestamp_micros(col("day_us")).as("day"),
        round(col("x_fp").cast("double") / 10000.0, 4).as("actual"),
        round(col("f_fp").cast("double") / 10000.0, 4).as("forecast"),
        round((col("x_fp") - col("f_fp")).cast("double") / 10000.0, 4)
          .as("err"))
  }

  /** Streaming form of the temporal join (see [[AsofProcessor]]):
    * watermarked signup/purchase events → per-user as-of enrichment,
    * purchases emitted once the watermark closes their timestamp.
    */
  def asofScores(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.TimeMode
    val spark = events.sparkSession
    import spark.implicits._
    // NO stream-side type filter: Catalyst pushes a predicate that
    // does not reference the event-time column BELOW the
    // EventTimeWatermark node, so the replay sentinel would never
    // reach the watermark operator and the query-global (min-policy)
    // watermark would stall one day short — caught by the
    // shared-oracle gates the moment this branch joined the mux. The
    // PROCESSOR ignores non-signup/purchase kinds instead.
    events
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as[Long], col("event_id").as[Long],
        unix_micros(col("ts")).as[Long], col("event_type").as[String],
        col("value").as[Double])
      .as[(Long, Long, Long, String, Double)]
      .groupByKey(_._1)
      .transformWithState(new AsofProcessor(),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("purchase_id", "user_id", "signup_id", "signup_value",
        "matched")
  }

  /** `stream_forecast_ok` — the STREAMING Holt-Winters monitor as a
    * hash-gated declared query (the stream_changepoint_ok technique,
    * completing the monitor-twin symmetry: anomaly / drift /
    * changepoint / forecast all have online forms): the events table
    * file-replays through [[forecastScores]]'s REAL transformWithState
    * pipeline (shared memoized feed — the marginal harness cost is the
    * stream run only), and the oracle is `ts_forecast_seasonal`'s
    * recursive CTE VERBATIM — an engine whose timers close days out of
    * order, whose seed window drifts, or whose integer recursion
    * differs hash-mismatches against DuckDB's independent recursion.
    */
  def streamForecastOk(spark: SparkSession, sfDir: String): DataFrame =
    muxedMonitors(spark, sfDir).filter(col("monitor") === "fc")
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("d1").as("actual"), col("d2").as("forecast"),
        col("d3").as("err"))
      .orderBy(col("event_type").asc, col("day").asc)

  /** `stream_join_asof_ok` — the STREAMING TEMPORAL JOIN as a
    * hash-gated declared query (completing the streaming join family:
    * stream-stream equi/outer/semi joins and the stream-static join
    * are declared; the as-of/temporal join — Flink's temporal table
    * join, the enrichment every fact stream wants against a
    * slowly-changing dimension — was the missing member): purchases
    * enrich with the user's latest prior signup value via
    * [[AsofProcessor]] on the SHARED multiplexed replay (zero marginal
    * replay cost), and the oracle is the batch as-of window
    * formulation computed independently by DuckDB — an engine whose
    * watermark closes purchases early, whose buffer loses dimension
    * rows across micro-batches, or whose tie rules drift
    * hash-mismatches.
    */
  def streamJoinAsofOk(spark: SparkSession, sfDir: String): DataFrame =
    muxedMonitors(spark, sfDir).filter(col("monitor") === "asof")
      .select(col("l1").as("purchase_id"), col("l2").as("user_id"),
        when(col("i1") === 1, col("l3")).as("signup_id"),
        when(col("i1") === 1, col("d1")).as("signup_value"))
      .orderBy(col("purchase_id").asc)

  /** `stream_session_ok` — the timer-closed sessionizer as a
    * hash-gated declared query (VERDICT r15 #7: `sessionsWithTimers`
    * was spec-verified but had no file-replay twin like the
    * watermark/sink/dedup/monitor rows; this closes the last §2.I
    * evidential asymmetry). Fifth consumer of the ONE multiplexed
    * monitor replay: batch 0 delivers every event before the query
    * starts (so each user's rows fold in one micro-batch — the regime
    * where the processor's gap-and-island fold is EXACTLY
    * batch-equivalent), and the far-future sentinel fires every
    * still-armed session timer, flushing open sessions. The emitted
    * rows must therefore equal the batch gap-and-island oracle
    * (`stream_session`'s islands projected without the session_id
    * rank) — a processor that splits an island, mis-sums the scaled
    * value, or leaks an unflushed session hash-mismatches.
    */
  def streamSessionOk(spark: SparkSession, sfDir: String): DataFrame =
    muxedMonitors(spark, sfDir).filter(col("monitor") === "sess")
      .select(col("l1").as("user_id"), col("day").as("session_start"),
        col("l2").as("n_events"), col("d1").as("session_value"))
      .orderBy(col("user_id").asc, col("session_start").asc)

  /** `stream_drift_ok` — the STREAMING drift monitor as a hash-gated
    * declared query (the `stream_watermark_late_ok` technique): the
    * events table file-replays through [[driftScores]]'s REAL
    * transformWithState pipeline (RocksDB state store — MapState needs
    * the multi-column-family store), a 72-hour far-future sentinel
    * pushes the watermark past every day end so all day pairs close,
    * and the emitted rows convert to `ts_drift`'s exact schema — so
    * the oracle is the ts_drift SQL VERBATIM (the join_asof_split
    * shared-oracle precedent): an engine whose timers close days out
    * of order, whose adjacency rotation drifts, or whose late policy
    * changes hash-mismatches against the batch formulation computed
    * independently by DuckDB.
    */
  def streamDriftOk(spark: SparkSession, sfDir: String): DataFrame =
    muxedMonitors(spark, sfDir).filter(col("monitor") === "drift")
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("l1").as("ks_num"), col("l2").as("n_cur"),
        col("l3").as("n_prev"), col("d1").as("ks"))
      .orderBy(col("event_type").asc, col("day").asc)

  /** `stream_changepoint_ok` — the STREAMING Page-CUSUM monitor as a
    * hash-gated declared query (the stream_drift_ok technique): the
    * events table file-replays through [[changepointScores]]'s REAL
    * transformWithState pipeline with refDays = 7, and the oracle is
    * `ts_changepoint`'s recursive CTE with the reference window
    * PINNED to 7 days — an engine whose timers close days out of
    * order, whose reference window drifts, or whose learned μ/MAD/k
    * arithmetic differs hash-mismatches against DuckDB's independent
    * recursion. (Every fixture series has ≥ 7 days; a shorter series
    * would stay in the learning window online while the batch form
    * shrinks the window — documented in [[ChangepointProcessor]].)
    */
  def streamChangepointOk(spark: SparkSession, sfDir: String): DataFrame =
    muxedMonitors(spark, sfDir).filter(col("monitor") === "cp")
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("d1").as("day_value"), col("d2").as("cusum_pos"),
        col("d3").as("cusum_neg"), col("i1").as("changepoint"))
      .orderBy(col("event_type").asc, col("day").asc)

  /** `stream_dedup_minhash_ok` — the STREAMING twin of
    * `dedup_minhash_incremental` as a hash-gated declared query (the
    * stream_drift_ok technique): the documents table file-replays in
    * TWO micro-batches — yesterday's corpus, then today's crawl — into
    * a RocksDB-backed [[BandDedupProcessor]] keyed by LSH band bucket;
    * the emitted match stream is post-filtered to delta docs and
    * anti-joined batch-side (the _ok harness pattern: the STREAM is
    * the system under test, the survivor projection is presentation).
    * The oracle is `dedup_minhash_incremental`'s SQL VERBATIM (the
    * shared-oracle precedent) — an engine whose bucket state loses
    * entries across micro-batches, whose within-batch order drifts
    * from doc_id, or whose in-processor Jaccard differs from the
    * batch column hash-mismatches against DuckDB's independent
    * all-pairs computation.
    *
    * Signature derivation here is the ROW-LOCAL form
    * ([[graft.operators.MinHashDedup.minhashFromHashes]] + band-slice
    * hashes): same xxhash64 arithmetic as the batch explode+agg shape,
    * no pre-shuffle aggregation — the only stateful operator is the
    * processor itself, and bucket state is the unit of scale-out.
    */
  def streamDedupMinhashOk(spark: SparkSession, sfDir: String,
      nPerm: Int = 32, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val store = docs.filter(col("doc_id") % 10 < 8)
    val delta = docs.filter(col("doc_id") % 10 >= 8)
    val rowsPerBand = nPerm / bands
    val matches = fileReplay(spark, "stream_dedup_minhash_ok",
      Seq(store, delta), Seq(8, 1), { stream =>
        val s2 = stream.sparkSession
        import s2.implicits._
        stream
          .withColumn("sh", graft.functions.ShingleKernel
            .shingleHashes(col("text"), 3))
          .filter(size(col("sh")) > 0)
          .withColumn("sig", graft.operators.MinHashDedup
            .minhashFromHashes(col("sh"), nPerm))
          .select(col("doc_id"), col("sh"), posexplode(array(
            (0 until bands).map { b =>
              struct(lit(b).as("band"),
                xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
                  .map(i => element_at(col("sig"), i + 1)): _*)
                  .as("bhash"))
            }: _*)).as(Seq("pos", "bk")))
          .select(col("bk.band").as[Int], col("bk.bhash").as[Long],
            col("doc_id").as[Long], col("sh").as[Seq[Long]])
          .as[(Int, Long, Long, Seq[Long])]
          .groupByKey(r => (r._1, r._2))
          .transformWithState(new BandDedupProcessor(threshold),
            org.apache.spark.sql.streaming.TimeMode.None(),
            OutputMode.Append())
          .toDF("n_id", "o_id")
      })
    // batch-side presentation: survivors = delta minus matched delta ids
    delta.join(matches.select(col("n_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id").asc)
  }

  /** `stream_dedup_phash_ok` — the STREAMING twin of
    * `multimodal_phash_incremental` (the fourth and last dedup tier to
    * get one): synthetic assets file-replay in TWO micro-batches —
    * yesterday's asset store, then today's ingest — with the dHash
    * fingerprint and the lossless 4×16-bit banding computed ON the
    * stream (the ingest-time shape: blobs decode row-locally in the
    * stateless prefix; only 8-byte hashes + ids reach the stateful
    * operator), into a RocksDB-backed [[PhashDedupProcessor]] keyed by
    * band bucket. Survivor projection anti-joins batch-side (the _ok
    * harness pattern), and the oracle is
    * `multimodal_phash_incremental`'s exact all-pairs SQL VERBATIM —
    * an engine whose bucket state loses entries across micro-batches,
    * whose within-batch order drifts from asset_id, or whose banding
    * misses a Hamming ≤ 3 pair hash-mismatches.
    */
  def streamDedupPhashOk(spark: SparkSession, sfDir: String,
      maxHamming: Int = 3): DataFrame = {
    val assets = graft.operators.Multimodal.syntheticAssets(spark, sfDir)
      .select(col("asset_id"), col("mime"), col("blob"))
    streamDedupPhashCore(spark, "stream_dedup_phash_ok",
      assets.filter(col("asset_id") % 10 < 8),
      assets.filter(col("asset_id") % 10 >= 8), maxHamming)
  }

  /** Core of [[streamDedupPhashOk]] over explicit store/delta
    * (asset_id, mime, blob) frames — the planted-asset harness for
    * StreamingSpec's twin-equivalence test.
    */
  private[graft] def streamDedupPhashCore(spark: SparkSession,
      name: String, store: DataFrame, delta: DataFrame,
      maxHamming: Int): DataFrame = {
    import graft.operators.Multimodal
    val matches = fileReplay(spark, name,
      Seq(store, delta), Seq(8, 1), { stream =>
        val s2 = stream.sparkSession
        import s2.implicits._
        stream
          .select(col("asset_id"), decode(col("blob"), "UTF-8").as("s"))
          .select(col("asset_id"),
            when(length(col("s")) >= Multimodal.PhashMinChars,
              Multimodal.phashExpr(col("s"))).as("phash"))
          .filter(col("phash").isNotNull)
          .select(col("asset_id"), col("phash"),
            posexplode(array((0 until 4).map(b =>
              shiftright(col("phash"), b * 16)
                .bitwiseAND(lit(0xFFFFL))): _*))
              .as(Seq("band", "bval")))
          .select(col("band").as[Int], col("bval").as[Long],
            col("asset_id").as[Long], col("phash").as[Long])
          .as[(Int, Long, Long, Long)]
          .groupByKey(r => (r._1, r._2))
          .transformWithState(new PhashDedupProcessor(maxHamming),
            org.apache.spark.sql.streaming.TimeMode.None(),
            OutputMode.Append())
          .toDF("n_id", "o_id")
      })
    // batch-side presentation: delta survivors (store n_ids in the
    // match stream never hit a delta asset_id); null-phash delta
    // assets never entered the stream and survive by construction —
    // the batch operator's contract
    delta.join(matches.select(col("n_id").as("asset_id")).distinct(),
        Seq("asset_id"), "left_anti")
      .select(col("asset_id"), col("mime"))
      .orderBy(col("asset_id").asc)
  }

  /** `stream_dedup_semantic_ok` — the STREAMING twin of
    * `dedup_semantic_incremental`, completing the streaming-twin
    * symmetry across all three dedup tiers (exact / minhash /
    * semantic): the embeddings table file-replays in TWO micro-batches
    * — yesterday's corpus, then today's crawl — into a RocksDB-backed
    * [[SemanticDedupProcessor]] keyed by cent_id; cell assignment is
    * the row-local [[graft.functions.NearestCentroid]] argmax against
    * the PINNED store codebook (computed batch-side and embedded in
    * the expression — the quantizer is state a stream must not
    * re-learn, see [[graft.operators.SimSearch.semDedupIncrementalWithCodebook]]).
    * The emitted match stream anti-joins batch-side against the delta
    * (the _ok harness pattern: the STREAM is the system under test,
    * the survivor projection is presentation), and the oracle is
    * `dedup_semantic_incremental`'s SQL VERBATIM (the shared-oracle
    * precedent) — an engine whose cell state loses entries across
    * micro-batches, whose within-batch order drifts from vec_id, or
    * whose in-processor cosine differs from the batch column
    * hash-mismatches against DuckDB's independent all-pairs
    * computation.
    */
  def streamDedupSemanticOk(spark: SparkSession, sfDir: String,
      centroidStride: Long = 127, threshold: Double = 0.40): DataFrame = {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    streamDedupSemanticCore(spark, "stream_dedup_semantic_ok",
      emb.filter(col("vec_id") % 10 < 8),
      emb.filter(col("vec_id") % 10 >= 8), centroidStride, threshold)
  }

  /** Core of [[streamDedupSemanticOk]] over explicit store/delta
    * (vec_id, embedding) frames — the planted-corpus harness for
    * StreamingSpec's twin-equivalence tests. The codebook is the
    * STORE's stride sample (yesterday's persisted quantizer).
    */
  private[graft] def streamDedupSemanticCore(spark: SparkSession,
      name: String, store: DataFrame, delta: DataFrame,
      centroidStride: Long, threshold: Double): DataFrame = {
    val cb = graft.operators.SimSearch.ivfCodebook(store, centroidStride)
    val matches = fileReplay(spark, name,
      Seq(store, delta), Seq(8, 1), { stream =>
        val s2 = stream.sparkSession
        import s2.implicits._
        graft.operators.SimSearch.ivfAssignCorpus(stream, cb)
          .select(col("cent_id").as[Long], col("c_id").as[Long],
            col("c_emb").as[Seq[Float]], col("c_nrm").as[Double])
          .as[(Long, Long, Seq[Float], Double)]
          .groupByKey(_._1)
          .transformWithState(new SemanticDedupProcessor(threshold),
            org.apache.spark.sql.streaming.TimeMode.None(),
            OutputMode.Append())
          .toDF("n_id", "o_id")
      })
    // batch-side presentation: delta survivors with their cell (store
    // n_ids in the match stream never hit a delta c_id — the anti-join
    // key is the post-filter)
    val deltaCells = graft.operators.SimSearch.ivfAssignCorpus(delta, cb)
    deltaCells.join(matches.select(col("n_id")).distinct(),
        deltaCells("c_id") === col("n_id"), "left_anti")
      .select(col("c_id").as("vec_id"), col("cent_id"))
      .orderBy(col("vec_id").asc)
  }

  /** `stream_cdf_apply_ok` — the write-time CDF consumed AS A STREAM
    * (VERDICT r16 #3: `capturedChanges`/`replayChanges` gave batch
    * commit-granular replay; the natural production consumer is a
    * streaming replica-maintenance job — Delta's CDF-source +
    * foreachBatch-merge shape): the `lake_write_cdf` planted churn
    * lands as three captured commits, a replica materializes at v0,
    * and the captured feed file-replays commit-by-commit (commit 1 =
    * the initial listing's micro-batch, commit 2 delivered after)
    * through `foreachBatch`, each batch folding into the replica via
    * [[graft.sources.LakeIO.replayChanges]] (commit-ordered WITHIN a
    * batch too, so a trigger that picks up two commit files in one
    * batch still applies them in version order — the update→delete
    * hazard LakeSpec pins) and swapping the rewrite in by rename. The
    * final replica must BE the v2 snapshot — the oracle recomputes
    * the two-churn composition directly from orders; a consumer that
    * applies batches out of order, skips one, or single-pass-merges a
    * multi-commit batch hash-mismatches.
    *
    * Scale shape: each micro-batch costs one keyed anti-join + union
    * against the replica (churn-sized right side); the replica
    * rewrite is the parquet-native price a transactional target
    * (Delta MERGE) removes — the CONSUMER shape (CDF source →
    * keyed fold → idempotent swap) is the production one.
    */
  def streamCdfApplyOk(spark: SparkSession, sfDir: String): DataFrame = {
    // SHARED FIXTURE (VERDICT r18 #7: cap the streaming replay tail by
    // composition): the consumer replays the table the streaming
    // PRODUCER twin built — the produce→consume CDF pair rides ONE
    // process-memoized fixture instead of planting twice, and the pair
    // becomes the true round trip: stream-committed captures feeding a
    // stream-maintained replica
    val dir = java.nio.file.Files
      .createTempDirectory(scratchBase, "graft_stream_cdf_apply_ok")
      .toString
    streamCdfApplyFromTable(spark, dir,
      producedCdfTable(spark, sfDir), Seq("o_orderkey"))
      .orderBy(col("o_orderkey").asc)
  }

  /** The planted churn both streaming-CDF twins share: lake_write_cdf's
    * three commits over orders (base slice; drop %19 + reprice %7;
    * drop %23 + reprice %11 on top).
    */
  private def cdfChurnSnapshots(spark: SparkSession,
      sfDir: String): Seq[DataFrame] = {
    val base = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"))
    val v0 = base.filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
    val v1 = base.filter(pmod(col("o_orderkey"), lit(19)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(7)) === 0,
          col("o_totalprice") + 1000.0)
          .otherwise(col("o_totalprice")))
    val v2 = v1.filter(pmod(col("o_orderkey"), lit(23)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(11)) === 0,
          col("o_totalprice") + 2000.0)
          .otherwise(col("o_totalprice")))
    Seq(v0, v1, v2)
  }

  /** The ONE stream-produced CDF table both twins read, memoized per
    * fixture dir (VERDICT r18 #7): built once per process by the
    * producer harness ([[streamWriteCdfTable]] — foreachBatch →
    * version-fenced saveVersionCdf commits), then `stream_write_cdf_ok`
    * declares its captured feed and `stream_cdf_apply_ok` replays that
    * same feed into its streaming replica. Whichever twin runs first
    * pays the build; the scratch dir reclaims at JVM exit like every
    * streaming fixture.
    */
  private val producedCdfMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def producedCdfTable(spark: SparkSession,
      sfDir: String): String =
    producedCdfMemo.computeIfAbsent(sfDir, _ =>
      streamWriteCdfTable(spark, "stream_cdf_pair",
        cdfChurnSnapshots(spark, sfDir), Seq("o_orderkey")))

  /** Release the produce→consume shared-fixture memo (Lake.clearCaches
    * hygiene — the dirs themselves reclaim at JVM exit). Returns the
    * number of entries dropped.
    */
  private[graft] def clearProducedCdfMemo(): Int = {
    val n = producedCdfMemo.size(); producedCdfMemo.clear(); n
  }

  /** Core of [[streamCdfApplyOk]] over explicit commit snapshots —
    * the planted-churn harness for StreamingSpec's commit-ordering
    * tests. Builds the captured table, streams commits (i, i+1] as
    * micro-batch i into a foreachBatch replica fold, and returns the
    * final replica bound to the CALLER's session.
    */
  private[graft] def streamCdfApplyCore(spark: SparkSession,
      name: String, snapshots: Seq[DataFrame],
      keys: Seq[String]): DataFrame = {
    require(snapshots.size >= 2, "need at least two commits to stream")
    val dir = java.nio.file.Files
      .createTempDirectory(scratchBase, s"graft_$name").toString
    val tbl = s"$dir/table"
    snapshots.foreach { s =>
      graft.sources.LakeIO.saveVersionCdf(s.repartition(4), tbl, keys)
      ()
    }
    streamCdfApplyFromTable(spark, dir, tbl, keys)
  }

  /** The consumer harness over an EXISTING captured table: replica at
    * v0, one feed file per captured commit, foreachBatch replay fold,
    * rename swap. `dir` hosts replica/feed/checkpoint (fresh per call
    * — a streaming checkpoint never spans invocations); `tbl` may be
    * shared (the [[producedCdfTable]] pair fixture — VERDICT r18 #7).
    */
  private[graft] def streamCdfApplyFromTable(spark: SparkSession,
      dir: String, tbl: String, keys: Seq[String]): DataFrame = {
    val nCommitsT =
      graft.sources.LakeIO.listVersions(spark, tbl).size - 1
    val replica = s"$dir/replica"
    // replica seed + feed batches are ALREADY parquet artifacts of
    // this table (v=0 snapshot; the write-time `_cdf/v=<n>` captures —
    // capturedChanges(i, i+1) is a guarded read of exactly that dir),
    // so seed by HARDLINK (the monitorFeedCache recipe; same tmpfs)
    // instead of paying a read+rewrite job per commit. Falls back to
    // the Spark write when the version is manifest-backed (clone) or
    // a post-start commit's capture is multi-file (the single-file
    // delivery rule below).
    def parquetFiles(d: java.io.File): Array[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    def linkInto(files: Array[java.io.File], dst: java.io.File): Unit = {
      dst.mkdirs()
      files.foreach { f =>
        val tgt = new java.io.File(dst, f.getName).toPath
        try java.nio.file.Files.createLink(tgt, f.toPath)
        catch { case _: Exception =>
          java.nio.file.Files.copy(f.toPath, tgt): Unit }
      }
    }
    val v0dir = new java.io.File(s"$tbl/v=0")
    // emptiness guard (ADVICE r19, low): a missing/reaped v=0 dir must
    // fail loudly at SEED time through loadVersion's clear error, not
    // as a schema-inference error inside foreachBatch over an empty
    // hardlinked replica
    val v0files = parquetFiles(v0dir)
    if (new java.io.File(v0dir, "_manifest").exists() || v0files.isEmpty)
      graft.sources.LakeIO.loadVersion(spark, tbl, Some(0))
        .write.parquet(replica)
    else linkInto(v0files, new java.io.File(replica))
    // one feed file per commit (the fileReplay single-file rule: a
    // running query can trigger between two moves, and a split batch
    // must still carry whole commits — replayChanges handles a MERGED
    // batch, but a commit split ACROSS batches would apply half a
    // commit's churn; one file per commit makes that impossible).
    // Batch 0 delivers pre-start (the initial listing is one
    // micro-batch regardless of file count), so it may link multi-file
    // captures too.
    val feed = new java.io.File(s"$dir/feed"); feed.mkdirs()
    val nCommits = nCommitsT
    (0 until nCommits).foreach { i =>
      val cdir = new java.io.File(s"$tbl/_cdf/v=${i + 1}")
      val fls = parquetFiles(cdir)
      if (fls.nonEmpty && (i == 0 || fls.length == 1))
        linkInto(fls, new java.io.File(s"$dir/b$i"))
      else
        graft.sources.LakeIO.capturedChanges(spark, tbl, i, i + 1)
          .coalesce(1).write.parquet(s"$dir/b$i")
    }
    def deliver(i: Int): Unit =
      new java.io.File(s"$dir/b$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, j) =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(feed, s"b$i-$j.parquet").toPath)
          ()
        }
    deliver(0) // pre-start: the initial listing is one micro-batch
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    val schema = spark.read.parquet(feed.toString).schema
    val q = s2.readStream.schema(schema).parquet(feed.toString)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          val s = batch.sparkSession
          // commit-ordered fold, then an atomic-as-possible rename
          // swap (the LakeIO.swapInto window) — the replica is never
          // read and overwritten in the same lazy plan
          val next = graft.sources.LakeIO.replayChanges(
            s.read.parquet(replica), batch.toDF(), keys)
          val tmp = s"$dir/replica_next"
          next.write.mode("overwrite").parquet(tmp)
          val rp = new org.apache.hadoop.fs.Path(replica)
          val fs = rp.getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(rp, true)
          if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), rp))
            throw new java.io.IOException(s"replica swap failed at $tmp")
          ()
      }
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      (1 until nCommits).foreach { i =>
        deliver(i); q.processAllAvailable()
      }
    } finally q.stop()
    // the RESULT is the replica dir — reclaim at JVM exit, not here
    reclaimAtExit(dir)
    spark.read.parquet(replica)
  }

  /** `stream_write_cdf_ok` — the write-time CDF PRODUCED by a stream
    * (VERDICT r17 #5: `stream_cdf_apply_ok` landed the consumer; this
    * is the symmetric production shape — a stream COMMITTING into a
    * versioned table with write-time capture, foreachBatch →
    * [[graft.sources.LakeIO.saveVersionCdf]], commit-per-micro-batch):
    * the `lake_write_cdf` planted churn arrives as two micro-batches
    * of change rows (one file per commit — the fileReplay atomicity
    * rule), each batch folds its commits IN VERSION ORDER into the
    * table head via applyChanges and publishes through saveVersionCdf,
    * so every streamed commit lands CAPTURED. Idempotence under
    * foreachBatch's at-least-once contract is a VERSION FENCE
    * ([[applyCommitsIdempotent]]): a commit whose stamp is ≤ the
    * table's head version was already applied by a previous attempt
    * and is SKIPPED — the monotonic-version fencing every
    * transactional sink uses (StreamingSpec replays a batch twice and
    * pins the no-double-apply). The declared output is the produced
    * table's OWN captured feed over (0, 2], gated on `lake_write_cdf`'s
    * oracle VERBATIM (the shared-oracle precedent): a producer that
    * drops a commit, double-applies a replay, commits out of order, or
    * whose write-time capture mis-diffs the fold hash-mismatches.
    *
    * Scale: per micro-batch, one keyed anti-join + union fold
    * (churn-sized right side) and one keyed full-outer capture diff —
    * the saveVersionCdf cost, paid per commit exactly as in batch; the
    * feed is churn-sized, never table-sized.
    */
  def streamWriteCdfOk(spark: SparkSession, sfDir: String): DataFrame =
    // the declared feed reads the SHARED produced table (VERDICT r18
    // #7): whichever twin runs first pays the streaming build once
    graft.sources.LakeIO.capturedChanges(spark,
      producedCdfTable(spark, sfDir), 0, 2)
      .orderBy(col("o_orderkey").asc, col("_commit_version").asc,
        col("_change_type").asc)

  /** Core of [[streamWriteCdfOk]] over explicit commit snapshots — the
    * planted-churn harness for StreamingSpec's idempotence and
    * produce→consume round-trip tests. Seeds the table at v0 (captured)
    * and streams each later snapshot's churn as a micro-batch into the
    * version-fenced commit fold; returns the produced table's captured
    * (0, last] feed bound to the CALLER's session, and the table path
    * for round-trip consumers.
    */
  private[graft] def streamWriteCdfCore(spark: SparkSession,
      name: String, snapshots: Seq[DataFrame],
      keys: Seq[String]): DataFrame =
    graft.sources.LakeIO.capturedChanges(spark,
      streamWriteCdfTable(spark, name, snapshots, keys),
      0, snapshots.size - 1)

  private[graft] def streamWriteCdfTable(spark: SparkSession,
      name: String, snapshots: Seq[DataFrame],
      keys: Seq[String]): String = {
    require(snapshots.size >= 2, "need at least two commits to stream")
    val dir = java.nio.file.Files
      .createTempDirectory(scratchBase, s"graft_$name").toString
    val tbl = s"$dir/table"
    graft.sources.LakeIO.saveVersionCdf(
      snapshots.head.repartition(4), tbl, keys)
    // the feed: one churn file per commit, stamped with the version it
    // must produce (the single-file rule — a trigger landing between
    // two moves must still carry whole commits)
    val nCommits = snapshots.size - 1
    (0 until nCommits).foreach { i =>
      graft.sources.LakeIO.snapshotDiff(snapshots(i), snapshots(i + 1),
          keys, i + 1)
        .coalesce(1).write.parquet(s"$dir/b$i")
    }
    val feed = new java.io.File(s"$dir/feed"); feed.mkdirs()
    def deliver(i: Int): Unit =
      new java.io.File(s"$dir/b$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, j) =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(feed, s"b$i-$j.parquet").toPath)
          ()
        }
    deliver(0)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    val schema = spark.read.parquet(feed.toString).schema
    val q = s2.readStream.schema(schema).parquet(feed.toString)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          applyCommitsIdempotent(batch.toDF(), tbl, keys)
      }
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      (1 until nCommits).foreach { i =>
        deliver(i); q.processAllAvailable()
      }
    } finally q.stop()
    // the RESULT reads the produced table — reclaim at JVM exit
    reclaimAtExit(dir)
    tbl
  }

  /** The producer's commit fold, VERSION-FENCED for at-least-once
    * foreachBatch delivery: each distinct `_commit_version` in the
    * batch applies in ascending order; a stamp at or below the table's
    * current head was already committed by a previous attempt of this
    * (or an earlier) batch and is skipped — replaying a batch is a
    * no-op, the transactional-sink idempotence rule. A stamp MORE than
    * one ahead of the head means the feed skipped a commit: fail loud
    * (applying it would silently corrupt every later snapshot).
    * Driver-side listings are commit-count-bounded; the fold is the
    * keyed applyChanges + captured saveVersionCdf pair per commit.
    */
  private[graft] def applyCommitsIdempotent(batch: DataFrame,
      tbl: String, keys: Seq[String]): Unit = {
    val s = batch.sparkSession
    val commits = batch.select(col("_commit_version")).distinct()
      .orderBy(col("_commit_version").asc)
      .collect().map(_.getInt(0)).toSeq // bounded: one row per commit
    commits.foreach { v =>
      val head = graft.sources.LakeIO.listVersions(s, tbl).last
      if (v > head) {
        require(v == head + 1,
          s"commit $v arrived at head $head — the feed skipped " +
            s"commit${if (v - head > 2) "s" else ""} " +
            s"${(head + 1) until v mkString ", "}")
        val churn = batch.filter(col("_commit_version") === v)
        val next = graft.sources.LakeIO.applyChanges(
          graft.sources.LakeIO.loadVersion(s, tbl), churn, keys)
        // the batch slice IS the commit's exact change set (snapshotDiff
        // output, version-fenced) — record it as the write-time capture
        // instead of re-diffing the snapshots (O(churn) vs O(table);
        // see saveVersionCdfKnownDiff)
        graft.sources.LakeIO.saveVersionCdfKnownDiff(next, tbl, keys,
          churn)
        ()
      } else {
        // Already committed (at-least-once replay) — but do not skip
        // UNCONDITIONALLY (ADVICE r18, low): the fence assumed the
        // commit's write-time capture landed with it. saveVersionCdf
        // now seals snapshot + capture atomically, so a sealed commit
        // without `_cdf/v=<v>` can only mean someone mixed a plain
        // saveVersion into this table's history — still a hole the
        // produced table's captured feed would permanently refuse on.
        // REPAIR it here (the replay is the natural repair point):
        // re-diff v−1 vs v from the retained snapshots, exactly the
        // capture saveVersionCdf would have written.
        val cdfDir = new org.apache.hadoop.fs.Path(s"$tbl/_cdf/v=$v")
        val fs = cdfDir.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (!fs.exists(cdfDir)) {
          val retained = graft.sources.LakeIO.listVersions(s, tbl).toSet
          require(retained.contains(v) && (v == 0 || retained.contains(v - 1)),
            s"commit $v at $tbl has no write-time capture and its " +
              "snapshots were vacuumed — the hole is no longer " +
              "reconstructible; the captured feed over ranges spanning " +
              "it will refuse (honestly)")
          val capture =
            if (v == 0) graft.sources.LakeIO.loadVersion(s, tbl, Some(0))
              .withColumn("_change_type", lit("insert"))
              .withColumn("_commit_version", lit(0))
            else graft.sources.LakeIO.changes(s, tbl, v - 1, v, keys)
          capture.write.mode("errorifexists").parquet(cdfDir.toString)
        }
      }
    }
  }

  /** `stream_index_append_ok` — STREAMING ingest into the persisted
    * vector index (the production shape behind every "vectors arrive
    * continuously" store: encode at ingest under the PINNED store
    * quantizers, pure APPEND into the cent_id-partitioned artifact;
    * re-learning codebooks is a reindex event —
    * `simsearch_index_rebuild` — never an ingest batch): the store's
    * IVFPQ codes persist batch-side, today's delta embeddings
    * file-replay in TWO micro-batches through foreachBatch — each
    * batch paying ONLY its own row-local encode
    * ([[graft.operators.SimSearch.encodeIvfPq]], deterministic, so
    * stream-encode ≡ batch-encode per row) before appending — and the
    * serve path reads the merged artifact. Gated on
    * `simsearch_index_incremental`'s oracle VERBATIM (the
    * shared-oracle precedent): an ingest that encodes under drifted
    * codebooks, drops a micro-batch, double-appends on retry, or
    * breaks the cent_id layout hash-mismatches.
    *
    * IDEMPOTENT under at-least-once delivery (ADVICE r17: a blind
    * SaveMode.Append would double-append a checkpoint-recovery replay
    * of a partially-completed batch, double-counting scores in the
    * serve top-k): the artifact is partitioned by (ingest, cent_id)
    * where `ingest` is the micro-batch id (−1 = the store build), and
    * each batch writes with DYNAMIC partition overwrite — a replay
    * REPLACES its own `ingest=<batchId>` partitions instead of
    * appending beside them (the batchId-keyed-subdir recipe every
    * parquet-native exactly-once sink uses; StreamingSpec replays a
    * batch and pins the no-double-count). Serving ignores the ingest
    * column; cent_id stays a partition key so DPP pruning is
    * unchanged.
    *
    * Scale: per-micro-batch cost is |batch| encode + an append of
    * |batch| × (id + m codes) bytes; the store is never rewritten and
    * serve cost is unchanged (DPP prunes to the probed cells across
    * store and streamed files alike).
    */
  def streamIndexAppendOk(spark: SparkSession, sfDir: String,
      k: Int = 5, nQueries: Int = 10, m: Int = 4,
      nProbe: Int = 2): DataFrame = {
    import graft.operators.SimSearch
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val store = emb.filter(col("vec_id") % 10 < 8)
    val delta = emb.filter(col("vec_id") % 10 >= 8)
      .select(col("vec_id"), col("embedding"))
    val (coarse, pqCb) = SimSearch.storeCodebooks(store)
    val dir = java.nio.file.Files
      .createTempDirectory(scratchBase, "graft_stream_index_append")
      .toString
    val index = s"$dir/index"
    // day 0: the store's artifact (batch build), ingest=-1
    SimSearch.encodeIvfPq(store, coarse, pqCb, m)
      .withColumn("ingest", lit(-1L))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("ingest", "cent_id").parquet(index)
    // the delta replays in two single-file micro-batches
    val feed = new java.io.File(s"$dir/feed"); feed.mkdirs()
    delta.filter(col("vec_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$dir/b0")
    delta.filter(col("vec_id") % 2 =!= 0).coalesce(1)
      .write.parquet(s"$dir/b1")
    def deliver(i: Int): Unit =
      new java.io.File(s"$dir/b$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, j) =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(feed, s"b$i-$j.parquet").toPath)
          ()
        }
    deliver(0)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    val schema = spark.read.parquet(feed.toString).schema
    val q = s2.readStream.schema(schema).parquet(feed.toString)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) =>
          ingestIndexBatch(batch.toDF(), index, coarse, pqCb, m, batchId)
      }
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      deliver(1); q.processAllAvailable()
    } finally q.stop()
    reclaimAtExit(dir)
    SimSearch.serveIvfPqArtifact(spark, index, emb, coarse, pqCb, k,
      nQueries, m, nProbe)
  }

  /** One ingest micro-batch into the (ingest, cent_id)-partitioned
    * index artifact: row-local encode under the pinned quantizers,
    * then a DYNAMIC partition overwrite scoped to this batch's own
    * `ingest=<batchId>` partitions — a foreachBatch replay of the same
    * batch id REPLACES rather than double-appends (the at-least-once
    * idempotence contract). Sets dynamic partition-overwrite on the
    * batch's session for the write and restores it after. Exposed for
    * StreamingSpec's replay test.
    */
  private[graft] def ingestIndexBatch(batch: DataFrame, index: String,
      coarse: Array[(Long, Array[Float], Double)],
      pqCb: Array[(Long, Array[Float], Double)], m: Int,
      batchId: Long): Unit = {
    val conf = batch.sparkSession.conf
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = conf.getOption(key)
    conf.set(key, "dynamic")
    try graft.operators.SimSearch.encodeIvfPq(batch, coarse, pqCb, m)
      .withColumn("ingest", lit(batchId))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("ingest", "cent_id").parquet(index)
    finally prev match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }

  /** Shared file-replay harness for every declared `stream_*_ok` row:
    * the batch frames replay as SEQUENTIAL micro-batches into a
    * RocksDB-backed pipeline (MapState needs the multi-column-family
    * store) on a CLONED session — the conf overrides were previously
    * set-then-restored on the SHARED session and leaked to anything
    * planned concurrently (an advisor finding); newSession() shares
    * the SparkContext and catalog but owns its SQLConf. Returns the
    * memory-sink rows RE-BOUND to the caller's session.
    *
    * Micro-batch ATOMICITY contract (review finding r13): the first
    * batch moves into the feed BEFORE the query starts — the file
    * source's initial listing takes every pre-existing file as ONE
    * micro-batch regardless of file count (so it may write with
    * several tasks) — and every LATER batch must be a SINGLE parquet
    * file (writeTasks enforced 1), because the running query can
    * trigger between two Files.move calls and split a multi-file
    * batch, which breaks order-sensitive state (a split events batch
    * can advance the watermark mid-batch and drop the remainder as
    * late; a split delta batch flips the dedup keep-first rule).
    */
  private def fileReplay(spark: SparkSession, name: String,
      batches: Seq[DataFrame], writeTasks: Seq[Int],
      build: DataFrame => DataFrame,
      batch0Dir: Option[String] = None): DataFrame = {
    require(batches.nonEmpty && batches.size == writeTasks.size,
      "one writeTasks entry per batch")
    require(writeTasks.drop(1).forall(_ == 1),
      "later batches must be single-file — a running query can split " +
        "a multi-file move across micro-batches")
    // ALL harness scratch (feed files, checkpoint, RocksDB working
    // dirs) goes to fast scratch when available: the replay rows
    // measure the PROCESSOR, and per-micro-batch checkpoint commits on
    // spinning /tmp dominated their wall with high variance (a
    // production state store sits on local SSD or memory). Everything
    // under ONE dir, reclaimed in the finally.
    val dir = java.nio.file.Files
      .createTempDirectory(scratchBase, s"graft_$name").toString
    val feed = new java.io.File(s"$dir/feed"); feed.mkdirs()
    batches.zip(writeTasks).zipWithIndex.foreach { case ((df, t), i) =>
      // batch 0 may come pre-written from the shared feed cache — the
      // harness then only LINKS its files (b0 is materialized by
      // deliver(0) below, not a Spark write)
      if (i != 0 || batch0Dir.isEmpty)
        df.coalesce(t).write.parquet(s"$dir/b$i")
    }
    batch0Dir.foreach { src =>
      val b0 = new java.io.File(s"$dir/b0"); b0.mkdirs()
      new java.io.File(src).listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          val tgt = new java.io.File(b0, f.getName).toPath
          try java.nio.file.Files.createLink(tgt, f.toPath)
          catch { case _: Exception =>
            java.nio.file.Files.copy(f.toPath, tgt): Unit }
        }
    }
    def deliver(i: Int): Unit =
      new java.io.File(s"$dir/b$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, j) =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(feed, s"b$i-$j.parquet").toPath)
        }
    deliver(0) // pre-start: the initial listing is one micro-batch
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution." +
        "streaming.state.RocksDBStateStoreProvider")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    // changelog checkpointing: per-micro-batch commits upload the delta
    // changelog instead of snapshotting SST files — the production
    // setting for many small batches, and measured ~30-40% off the
    // multi-batch replay rows' wall (the snapshot upload dominated at
    // fixture state sizes)
    s2.conf.set("spark.sql.streaming.stateStore.rocksdb." +
      "changelogCheckpointing.enabled", "true")
    s2.conf.set("spark.sql.streaming.stateStore.rocksdb.localRootDir",
      s"$dir/rocksdb")
    val stream = s2.readStream.schema(batches.head.schema)
      .parquet(feed.toString)
    val q = build(stream).writeStream
      .format("memory").queryName(name)
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      (1 until batches.size).foreach { i =>
        deliver(i); q.processAllAvailable()
      }
    } finally { q.stop(); deleteRec(new java.io.File(dir)) }
    // the memory sink registers its table in the session that started
    // the query; re-bind the rows to the CALLER's session so the
    // returned frame composes with its other frames
    spark.createDataFrame(s2.table(name).collectAsList(),
      s2.table(name).schema)
  }

  /** Events-table replay for the declared streaming-monitor rows: the
    * whole events table as micro-batch 1 (4 write tasks — pre-start
    * delivery keeps it one batch), then a 72-hour far-future sentinel
    * pushes the watermark past every day end so all days close; the
    * sentinel series is filtered from the returned rows and the caller
    * projects its monitor's schema. (The sentinel is a 1-partition
    * range — range(1)'s default 32 tasks for one row cost 1.2 s of
    * pure setup, measured.)
    */
  private def replayMonitor(spark: SparkSession, sfDir: String,
      name: String, build: DataFrame => DataFrame): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    val (feedDir, maxTs, _) = cachedEventsFeed(spark, sfDir, ev)
    val sentinelTs =
      new java.sql.Timestamp(maxTs.getTime + 72L * 3600 * 1000)
    val sentinel = spark.range(0L, 1L, 1L, 1)
      .select(lit(-1L).as("event_id"), lit(sentinelTs).as("ts"),
        lit(-1L).as("user_id"), lit("__sentinel").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
    fileReplay(spark, name, Seq(ev, sentinel), Seq(8, 1), build,
      batch0Dir = Some(feedDir))
      .filter(col("event_type") =!= "__sentinel")
  }

  /** MULTIPLEXED monitor replay (round 15): the three timer-closed
    * monitors — drift (KS), changepoint (CUSUM), forecast
    * (Holt-Winters) — consume the SAME events feed through THREE
    * transformWithState branches UNIONED into ONE streaming query
    * (each branch owns its state stores; the union is supported
    * multi-stateful-operator composition, probed before adoption).
    * This is how a production monitoring job actually ships — one
    * source read, one checkpoint, N monitors — and it collapses three
    * replay runs into one: each declared `stream_*_ok` row filters its
    * tag from the memoized result, so the replay cost is paid ONCE per
    * fixture (the BpeTrain memo discipline; keyed on the events
    * fingerprint, released by Lake.clearCaches). Branch outputs
    * normalize into a uniform TYPED schema (longs/doubles/int columns
    * — no serialization on the hash path), and every declared row's
    * oracle contract is unchanged: the same processors, the same
    * per-branch state, the same rows.
    */
  private val monitorMuxCache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, String), DataFrame]()

  private[graft] def clearMonitorMuxCache(): Int = {
    val n = monitorMuxCache.size()
    monitorMuxCache.clear()
    n
  }

  /** Bench-warmup hook (the warmBpe discipline): run the one
    * multiplexed replay so the three monitor rows measure their
    * read-side filters (cost emitted as warm_ms.monitors, never
    * hidden).
    */
  private[graft] def warmMonitors(spark: SparkSession,
      sfDir: String): Unit = {
    muxedMonitors(spark, sfDir)
    ()
  }

  private def muxedMonitors(spark: SparkSession,
      sfDir: String): DataFrame = {
    val fp = graft.operators.MinHashDedup
      .corpusFingerprint(spark, sfDir, Seq("events"))
    val it = monitorMuxCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val key = e.getKey
      if (key._1.sparkContext.isStopped ||
          (key._1 == spark && key._2 == sfDir && key._3 != fp)) it.remove()
    }
    monitorMuxCache.computeIfAbsent((spark, sfDir, fp), _ => {
      val nl = lit(null)
      def uni(tag: String, df: DataFrame,
          l1: org.apache.spark.sql.Column, l2: org.apache.spark.sql.Column,
          l3: org.apache.spark.sql.Column, d1: org.apache.spark.sql.Column,
          d2: org.apache.spark.sql.Column, d3: org.apache.spark.sql.Column,
          i1: org.apache.spark.sql.Column) =
        df.select(lit(tag).as("monitor"), col("event_type"),
          col("day"), l1.cast("long").as("l1"),
          l2.cast("long").as("l2"), l3.cast("long").as("l3"),
          d1.cast("double").as("d1"), d2.cast("double").as("d2"),
          d3.cast("double").as("d3"), i1.cast("int").as("i1"))
      replayMonitor(spark, sfDir, "stream_monitor_mux", { stream =>
        uni("drift", driftScores(stream), col("ks_num"), col("n_cur"),
          col("n_prev"), col("ks"), nl, nl, nl)
          .unionByName(uni("cp", changepointScores(stream, refDays = 7),
            nl, nl, nl, col("day_value"), col("cusum_pos"),
            col("cusum_neg"), col("changepoint")))
          .unionByName(uni("fc", forecastScores(stream), nl, nl, nl,
            col("actual"), col("forecast"), col("err"), nl))
          // the temporal-join twin rides the same replay: its rows
          // normalize as (l1=purchase, l2=user, l3=signup, d1=value,
          // i1=matched); event_type/day are presentation fillers
          .unionByName(uni("asof", asofScores(stream)
              .select(lit("purchase").as("event_type"),
                timestamp_micros(lit(0L)).as("day"),
                col("purchase_id"), col("user_id"), col("signup_id"),
                col("signup_value"), col("matched")),
            col("purchase_id"), col("user_id"), col("signup_id"),
            col("signup_value"), nl, nl,
            col("matched").cast("int")))
          // the timer-closed sessionizer rides the replay too (VERDICT
          // r15 #7 — the last §2.I streaming form without a hash-gated
          // twin): (l1=user, l2=n_events, d1=value, day=session_start).
          // The sentinel row opens a key −1 session whose timer sits
          // past the final watermark, so it can never emit — the
          // output-side guard makes that independence explicit rather
          // than relied on (the filter is POST-processor: an
          // input-side filter below the watermark node is the
          // documented pushdown stall)
          .unionByName(uni("sess", sessionsWithTimers(spark, stream)
              .filter(col("user_id") =!= -1L)
              .select(lit("session").as("event_type"),
                col("session_start").as("day"), col("user_id"),
                col("n_events"), col("session_value")),
            col("user_id"), col("n_events"), nl,
            col("session_value"), nl, nl, nl))
      })
    })
  }

  /** Scratch filesystem for the replay harnesses: /dev/shm only when it
    * has real headroom (ADVICE r14: containers commonly cap it at
    * 64 MB — canWrite alone would pick a tmpfs too small for the feed
    * parquet + RocksDB working set and fail with ENOSPC where
    * java.io.tmpdir worked). 1 GiB covers the largest replay (full
    * events table + state + changelog) with slack.
    */
  private def scratchBase: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val shmUsable =
      try {
        new java.io.File("/dev/shm").canWrite &&
          java.nio.file.Files.getFileStore(shm)
            .getUsableSpace >= (1L << 30)
      } catch { case _: java.io.IOException => false }
    if (shmUsable) shm
    else java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
  }

  /** Per-fixture MEMOIZED events feed for the monitor replays (VERDICT
    * r14 #1: the session/feed cost was re-paid per `stream_*_ok` row —
    * drift and changepoint each scanned events for max(ts) and wrote
    * the identical 8-file feed). First caller writes the feed + scans
    * max(ts) once; later callers HARDLINK the files into their own
    * feed dir (same tmpfs, so links are free; fileReplay's deliver
    * MOVES them, hence per-invocation links rather than a shared feed
    * dir). Keyed by the events fixture's file listing fingerprint (the
    * corpusFingerprint discipline — a regenerated fixture gets a fresh
    * feed); the cache dir is reclaimed by a JVM shutdown hook, not
    * per-invocation (it is the cache's lifetime).
    */
  private val monitorFeedCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      (String, java.sql.Timestamp, Long)]()

  private[graft] def cachedEventsFeed(spark: SparkSession, sfDir: String,
      ev: DataFrame): (String, java.sql.Timestamp, Long) = {
    val key = graft.operators.MinHashDedup
      .corpusFingerprint(spark, sfDir, Seq("events"))
    monitorFeedCache.computeIfAbsent(key, _ => {
      val head = ev.agg(max(col("ts")), count(lit(1))).head()
      val dir = java.nio.file.Files
        .createTempDirectory(scratchBase, "graft_evfeed").toString
      ev.coalesce(8).write
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dir)
      reclaimAtExit(dir)
      (dir, head.getTimestamp(0), head.getLong(1))
    })
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

  /** `stream_watermark_late_ok` — the watermark late-drop CONTRACT as a
    * batch-checkable declared query (VERDICT r10 #8, the `_ok` shadow
    * technique that retires the spec-only `stream_watermark_late` row):
    * the events table is replayed through a REAL three-micro-batch
    * append-mode streaming aggregation —
    *  1. every ON-TIME row in one batch, delivered BEFORE the query
    *     starts (the initial listing is one micro-batch regardless of
    *     file count, so it writes and reads in parallel; a post-start
    *     multi-file batch could split and let the mid-run watermark
    *     drop rows the contract calls on-time), parking the watermark
    *     at max(ts) − 10 min;
    *  2. the designated LATE set (rows older than max(ts) − 2 h with
    *     event_id % 7 = 0): every window they belong to ended ≥ 50 min
    *     below the watermark, so the streaming agg must drop ALL of
    *     them;
    *  3. one far-future sentinel row that pushes the watermark past
    *     every real window, so append mode finalizes and emits them.
    * Batches are delivered as files moved into the source directory
    * between processAllAvailable() calls — the data path stays fully
    * distributed (the driver only renames files). The emitted result
    * must equal the batch tumbling aggregate over the non-late rows —
    * exactly what the DuckDB oracle computes — and `late_dropped`
    * (rows fed minus rows aggregated) must equal the planted late-set
    * size, which the oracle recomputes in SQL: an engine that stopped
    * dropping late rows mismatches on both the window counts and the
    * cardinality column.
    */
  def watermarkLateOk(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    // max(ts) comes from the shared monitor-feed memo (one scan per
    // fixture per JVM, not one per harness row)
    val (_, maxTs, evCount) = cachedEventsFeed(spark, sfDir, ev)
    val lateCut = new java.sql.Timestamp(maxTs.getTime - 2L * 3600 * 1000)
    val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 3L * 3600 * 1000)
    val isLate = col("ts") < lit(lateCut) && pmod(col("event_id"), lit(7)) === 0
    val dir = java.nio.file.Files
      .createTempDirectory(scratchBase, "graft_wmk").toString
    val feed = new java.io.File(s"$dir/feed"); feed.mkdirs()
    // b1 is delivered BEFORE the query starts (the fileReplay batch-0
    // rule: the initial listing takes every pre-existing file as ONE
    // micro-batch), so it may write and read with several tasks — the
    // old post-start coalesce(1) paid a single-threaded parquet encode
    // of the whole on-time table
    ev.filter(!isLate).coalesce(4).write.parquet(s"$dir/b1")
    ev.filter(isLate).coalesce(1).write.parquet(s"$dir/b2")
    // 1-partition range: range(1)'s default 32 tasks for one row are
    // pure task-launch overhead (the replayMonitor sentinel finding)
    spark.range(0L, 1L, 1L, 1)
      .select(lit(-1L).as("event_id"), lit(sentinelTs).as("ts"),
        lit(-1L).as("user_id"), lit("__sentinel").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .write.parquet(s"$dir/b3")
    def deliver(batch: String): Unit =
      new java.io.File(s"$dir/$batch").listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, i) =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(feed, s"$batch-$i.parquet").toPath)
        }
    def deliverPre(batch: String): Unit =
      new java.io.File(s"$dir/$batch").listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, i) =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(feed, s"$batch-$i.parquet").toPath)
        }
    deliverPre("b1") // pre-start: one micro-batch regardless of files
    val stream = spark.readStream.schema(ev.schema).parquet(feed.toString)
    // the streaming agg state is window×type-sized (~3.6k groups at
    // sf0.1): at the session's 32 shuffle partitions the HDFS state
    // store pays 32 partitions × 3 batches of checkpoint I/O for a
    // hand-rolled query; pin the stream (its partitioning is fixed at
    // start) to 4 — the fileReplay harness setting; state-store tasks
    // carry a ~250 ms open/commit latency each regardless of rows, so
    // fewer partitions is strictly less blocked task time — and
    // restore the session conf for the batch result
    val shufKey = "spark.sql.shuffle.partitions"
    val oldShuf = spark.conf.get(shufKey)
    val q =
      try {
        spark.conf.set(shufKey, "4")
        tumblingCounts(stream).writeStream
          .format("memory").queryName("wmk_late_ok")
          // on fast scratch with the rest of the harness (r19 opt:
          // without it Spark puts the checkpoint + HDFS-backed state
          // store on java.io.tmpdir — the slow root disk; 8 state
          // partitions × 3 batches of delta/commit files there were
          // ~6 s of blocked task time on ~1.7 s of cpu)
          .option("checkpointLocation", s"$dir/ckpt")
          .outputMode(OutputMode.Append).start()
      } finally spark.conf.set(shufKey, oldShuf)
    try {
      q.processAllAvailable() // b1: the pre-start initial listing
      Seq("b2", "b3").foreach { b =>
        deliver(b); q.processAllAvailable()
      }
    } finally {
      q.stop()
      // the memory sink owns the result now; the staged table copy must
      // not accumulate across walks/verify/bench runs
      deleteRec(new java.io.File(dir))
    }
    val result = spark.table("wmk_late_ok")
      .filter(col("event_type") =!= "__sentinel")
    val summary = result.agg((lit(evCount) - sum(col("n_events")))
      .cast("long").as("late_dropped"))
    result.crossJoin(broadcast(summary))
      .orderBy(col("win_start").asc, col("event_type").asc)
  }

  /** `stream_sink_ok` — the checkpointed-sink EXACTLY-ONCE contract as a
    * hash-gated declared query (retiring the last spec-only streaming
    * row the same way `stream_watermark_late_ok` retired the watermark
    * one): the events table file-replays through the AvailableNow
    * parquet sink TWICE over the SAME checkpoint — the restart sees no
    * new input, so an engine honoring the checkpoint adds nothing,
    * while a broken sink re-emits and doubles every count. The sink
    * directory's contents then aggregate per event type, which is
    * exactly the batch aggregate the DuckDB oracle computes from the
    * original table. (StreamingSpec pins the same invariant as a
    * row-count spec; this makes it a value-level oracle row.)
    */
  def streamSinkOk(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_ok").toString
    val src = eventsFileStream(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    Seq(1, 2).foreach { _ =>
      startParquetSink(src, s"$dir/out", s"$dir/ckpt").awaitTermination()
    }
    // the returned frame lazily reads $dir/out, so only the checkpoint
    // is reclaimable here
    deleteRec(new java.io.File(s"$dir/ckpt"))
    spark.read.parquet(s"$dir/out")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_id")).as("n_distinct_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("sum_value"))
      .orderBy(col("event_type").asc)
  }

  /** File-replay source: read the events table as a stream (one file per
    * trigger) — the batch fixture replayed as a stream for tests.
    */
  def eventsFileStream(spark: SparkSession, sfDir: String): DataFrame = {
    // events.ts timestamp handling is shared with the batch reader
    // (graft.sources.Tables): legacy ns-as-long conf for the retired ns
    // fixtures, LTZ inference for the current tz-less µs fixtures
    graft.sources.Tables.enableNanosAsLong(spark)
    graft.sources.Tables.preferLtzTimestamps(spark)
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
