package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming extensions (SURVEY §2.12 — absent in the
  * reference, which is batch-only; added here because every operator in
  * this engine takes `DataFrame -> DataFrame`, so the same transforms
  * run on a stream unchanged).
  *
  * Batch/stream symmetry is the design contract: `ingestStream` +
  * `Trigger.AvailableNow` is the incremental version of the batch ingest
  * step — new files landing in a directory are processed exactly once,
  * which at 100 TB turns the re-scan-everything batch pattern into an
  * incremental tail read with checkpointed progress.
  */
object Streaming {

  /** Incremental parquet-directory ingest: the streaming twin of the
    * batch per-step read. `maxFilesPerTrigger` bounds micro-batch size. */
  def parquetStream(spark: SparkSession, dir: String, schema: StructType,
                    maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Watermarked tumbling-window event counts: the streaming version of
    * the ev01 hourly rollup. Late events beyond the watermark are
    * dropped; state is bounded. */
  def windowedEventCounts(events: DataFrame, tsCol: String = "ts",
                          window_ : String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  case class SessionEvent(user_id: Long, ts_us: Long)
  case class SessionState(count: Long, lastTsUs: Long)
  case class SessionCount(user_id: Long, n_sessions: Long)

  /** Stateful sessionization with `mapGroupsWithState` — the custom-state
    * path (KeyValueGroupedDataset) for semantics windows can't express:
    * a session break is a >gap pause per user, state is one (count,
    * lastTs) pair per key, timeout-free for AvailableNow batch parity. */
  def sessionize(events: Dataset[SessionEvent], gapUs: Long = 1800L * 1000000): Dataset[SessionCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionCount](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.ts_us)
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          sorted.foreach { e =>
            if (st.lastTsUs == Long.MinValue || e.ts_us - st.lastTsUs > gapUs)
              st = SessionState(st.count + 1, e.ts_us)
            else st = st.copy(lastTsUs = e.ts_us)
          }
          state.update(st)
          SessionCount(user, st.count)
      }
  }

  /** Streaming exact dedup: drop duplicate doc ids across micro-batches
    * with watermark-bounded state — the incremental twin of the batch
    * exact-dedup step (state for ids older than the watermark is
    * reclaimed, so memory stays bounded on an unbounded stream). */
  def dedupStream(df: DataFrame, idCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq(idCol))

  /** Watermarked stream-stream interval join: each left event joins
    * right events for the same key within `[left.ts - lookback, left.ts]`.
    * Both sides carry watermarks so the join state is bounded — the
    * streaming form of the as-of/enrichment join (e.g. purchases
    * enriched with the clicks that preceded them). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   lookback: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === r(key)
        && r(rightTs) <= l(leftTs)
        && r(rightTs) >= l(leftTs) - expr(s"INTERVAL $lookback"))
      .drop(r(key))
  }

  /** LEFT OUTER stream-stream interval join: the same bounded-state
    * interval join, but an unmatched left row EMITS with nulls once the
    * watermark passes its join window — the semantics that separate
    * outer streaming joins from batch (a null result is an EVICTION
    * decision, provable only when no matching right row can still
    * arrive). State stays watermark-bounded on both sides. */
  def intervalJoinOuter(left: DataFrame, right: DataFrame, key: String,
                        leftTs: String, rightTs: String,
                        lookback: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    // rename-then-join, NOT drop(r(key)): when both sides derive from
    // the same source the two key attributes can resolve ambiguously,
    // and dropping the wrong copy surfaces the RIGHT key — which is
    // NULL on exactly the unmatched rows this join exists to emit.
    val r = right.withColumnRenamed(key, "__r_key")
      .withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === col("__r_key")
        && col(rightTs) <= l(leftTs)
        && col(rightTs) >= l(leftTs) - expr(s"INTERVAL $lookback"),
      "left_outer")
      .drop("__r_key")
  }

  /** One arriving (band, doc) row of the online dedup index. */
  case class BandArrival(band_id: Int, band_hash: Long, id: Long, batch: Int,
                         ts: Option[java.sql.Timestamp])

  /** `__new_id` shares an LSH band bucket with the earlier-arrived
    * `__idx_id` — column names match
    * [[graft.operators.Dedup.verifyCandidatesExact]]'s contract. */
  case class CollisionEvidence(__new_id: Long, __idx_id: Long)

  /** Stream-vs-ITSELF online near-dedup index: cross-batch keyed state
    * via `flatMapGroupsWithState`. Input is a streaming DataFrame of
    * `(id: long, batch: int, text: string)`; each LSH band bucket keeps
    * the ids that have arrived in it (in arrival order), and every new
    * arrival emits one [[CollisionEvidence]] row per already-present
    * member — so a document collides against everything BEFORE it
    * (including earlier rows of its own micro-batch, which the group
    * iterator visits in (batch, id) order) and never against later
    * arrivals. First-arrival-wins, the online-index semantics; the
    * caller exact-verifies evidence downstream (st05's tail) because
    * per-row shingle verification inside the stream would hold full
    * texts in state.
    *
    * Scale shape: state is per-bucket and capped at `maxState` members
    * (hot degenerate buckets — boilerplate, empty docs — stop indexing
    * at the cap but keep emitting evidence against the stored members:
    * bounded state, documented recall trade, same contract as the batch
    * path's `maxBucket`). The shuffle key is the band bucket, exactly
    * the batch LSH join's key.
    *
    * State lifetime: by default a bucket's member list lives forever
    * (bounded per bucket by `maxState` but unbounded in bucket COUNT).
    * Pass `retention = Some("7 days")` (plus an event-time `tsCol` on
    * `docs`) for `withWatermark`-style eviction: a bucket whose latest
    * arrival falls `retention` behind the watermark drops its whole
    * member list — an aged-out near-dup is then treated as first-seen,
    * the documented retention trade. Defaults keep every existing gate
    * bit-identical. */
  def onlineCollisionEvidence(docs: DataFrame,
                              cfg: graft.operators.Dedup.MinHashConfig =
                                graft.operators.Dedup.MinHashConfig(),
                              maxState: Int = 128,
                              retention: Option[String] = None,
                              tsCol: String = "ts"): Dataset[CollisionEvidence] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val src = retention.fold(docs)(r => docs.withWatermark(tsCol, r))
    val sigs = src.select((Seq(col("id"), col("batch")) ++
      retention.map(_ => col(tsCol)) :+
      graft.functions.HashFunctions.minhash(
        graft.functions.TextFunctions.normalizeForDedup(col("text")),
        cfg.k, cfg.ngram, cfg.seed).as("signature")): _*)
    val carry = Seq("batch") ++ retention.map(_ => tsCol)
    val bandDs = graft.operators.Dedup.bandRows(sigs, cfg, carryCols = carry)
      .select(col("band_id").cast("int").as("band_id"), col("band_hash"),
        col("id").cast("long").as("id"), col("batch").cast("int").as("batch"),
        (if (retention.isDefined) col(tsCol)
         else lit(null).cast("timestamp")).as("ts"))
      .as[BandArrival]
    val timeoutConf =
      if (retention.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    // state carries (members, maxTsSeen): GroupState DROPS a pending
    // timeout on every invocation unless it is re-set, so the timeout
    // base must be recoverable from state — otherwise a batch whose
    // arrivals all have null ts would clear the key's eviction and
    // make its state immortal. maxTsSeen is monotone, so a late
    // (smaller-ts) arrival can never SHRINK the promised lifetime
    // ("retention behind the latest arrival") either.
    bandDs.groupByKey(r => (r.band_id, r.band_hash))
      .flatMapGroupsWithState[(Seq[Long], Long), CollisionEvidence](
        OutputMode.Append(), timeoutConf) {
        case (_, rows, state: GroupState[(Seq[Long], Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (members0, maxTs0) = state.getOption.getOrElse((Seq.empty[Long], Long.MinValue))
            var members = members0.toVector
            val out = Vector.newBuilder[CollisionEvidence]
            val arr = rows.toVector.sortBy(r => (r.batch, r.id))
            arr.foreach { a =>
              members.foreach(m => out += CollisionEvidence(a.id, m))
              if (members.size < maxState) members = members :+ a.id
            }
            val maxTs = (maxTs0 +: arr.flatMap(_.ts.map(_.getTime))).max
            state.update((members, maxTs))
            retention.foreach { r =>
              // clamp to the watermark: a stale key revived by a
              // late/null-ts arrival can have maxTs + retention behind
              // the current watermark, and setTimeoutTimestamp throws
              // on a timestamp the watermark already passed — the
              // refresh then counts from the watermark instead (the
              // arrival legitimately extends the key's life)
              if (maxTs != Long.MinValue)
                state.setTimeoutTimestamp(
                  math.max(maxTs, state.getCurrentWatermarkMs()), r)
            }
            out.result().iterator
          }
      }
  }

  case class WindowArrival(fp: Array[Byte], id: Long, batch: Int, pos: Int,
                           ts: Option[java.sql.Timestamp])
  case class SpanDup(id: Long, pos: Int)

  /** Online duplicate-SPAN evidence — the streaming twin of
    * [[graft.operators.Dedup.spanTrim]]'s candidate side with
    * first-ARRIVAL-wins semantics: docs arrive in micro-batches, every
    * stride-1 `window`-token fingerprint (the batch op's
    * `spanWindowRows` convention, shared code) checks a cross-batch
    * keyed state of fingerprints already seen, and occurrences whose
    * fingerprint was seen EARLIER — in a previous batch, an earlier doc
    * of the same batch, or an earlier position of the same doc — emit
    * (id, pos) excision evidence. The caller runs the batch
    * `spanExcise` rollup over the evidence (st07's convention: the
    * per-doc merge is a bounded batch step, `foreachBatch` in
    * production).
    *
    * Scale shape: the shuffle key is the fingerprint — exactly the
    * batch op's aggregation key; state per fingerprint is ONE boolean
    * (16-byte key + tag), the online-index trade every streaming dedup
    * in this file documents (the batch/incremental path persists the
    * index instead). Within a trigger a fingerprint group folds its
    * arrivals in (batch, id, pos) order, so arrival order is
    * deterministic end-to-end.
    *
    * State lifetime: by default (`retention = None`) a fingerprint's
    * boolean lives FOREVER — at stride 1 that is ~1 state entry per
    * corpus token, which grows without bound on a long-running stream.
    * Pass `retention = Some("7 days")` (and an event-time column
    * `tsCol` on `docs`) to bound it: the input gets
    * `withWatermark(tsCol, retention)` and each fingerprint's state is
    * dropped once the watermark passes `retention` beyond its latest
    * arrival (`EventTimeTimeout`, the `withWatermark` semantics). The
    * trade is explicit: a span whose previous occurrence aged out is
    * treated as first-seen again — the same retention trade the
    * incremental index documents for its persisted bands. Defaults
    * keep every existing gate bit-identical. */
  def onlineSpanDupEvidence(docs: DataFrame, window: Int = 8,
                            retention: Option[String] = None,
                            tsCol: String = "ts"): Dataset[SpanDup] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val src = retention.fold(docs)(r => docs.withWatermark(tsCol, r))
    val carry = Seq("batch") ++ retention.map(_ => tsCol)
    val wins = graft.operators.Dedup.spanWindowRows(
        src, "id", "text", window, carryCols = carry)
      .select(col("__fp").as("fp"), col("id").cast("long"),
        col("batch").cast("int"), col("__pos").cast("int").as("pos"),
        (if (retention.isDefined) col(tsCol)
         else lit(null).cast("timestamp")).as("ts"))
      .as[WindowArrival]
    val timeoutConf =
      if (retention.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    // the 16-byte binary fingerprint maps injectively onto (Long, Long)
    // — a value-comparable shuffle key (raw Array[Byte] equality is
    // referential, never group on it directly)
    wins.groupByKey { r =>
      val bb = java.nio.ByteBuffer.wrap(r.fp); (bb.getLong, bb.getLong)
    }
      .flatMapGroupsWithState[(Boolean, Long), SpanDup](
        OutputMode.Append(), timeoutConf) {
        case (_, rows, state: GroupState[(Boolean, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // state = (seen, maxTsSeen): GroupState drops a pending
            // timeout on every invocation unless re-set, so the
            // timeout base must live IN the state — a batch of
            // null-ts arrivals would otherwise clear the key's
            // eviction and make it immortal; monotone maxTsSeen also
            // keeps a late smaller-ts arrival from shrinking the
            // promised "retention behind the latest arrival"
            val (seen0, maxTs0) = state.getOption.getOrElse((false, Long.MinValue))
            var seen = seen0
            val out = Vector.newBuilder[SpanDup]
            val arr = rows.toVector.sortBy(r => (r.batch, r.id, r.pos))
            arr.foreach { a =>
              if (seen) out += SpanDup(a.id, a.pos) else seen = true
            }
            val maxTs = (maxTs0 +: arr.flatMap(_.ts.map(_.getTime))).max
            state.update((true, maxTs))
            retention.foreach { r =>
              // clamp to the watermark: a stale key revived by a
              // late/null-ts arrival can have maxTs + retention behind
              // the current watermark, and setTimeoutTimestamp throws
              // on a timestamp the watermark already passed — the
              // refresh then counts from the watermark instead (the
              // arrival legitimately extends the key's life)
              if (maxTs != Long.MinValue)
                state.setTimeoutTimestamp(
                  math.max(maxTs, state.getCurrentWatermarkMs()), r)
            }
            out.result().iterator
          }
      }
  }

  case class UpsertEvent(id: Long, batch: Int, op: String, text: Option[String])
  case class SnapshotEmit(id: Long, batch: Int, action: String,
                          text: Option[String], alive: Boolean)

  /** Streaming MERGE compaction — the continuous version of
    * [[graft.operators.MergeUpsert.applyChanges]]: a keyed change log
    * (`op` = "U" upsert / "D" delete) folds into per-key state across
    * micro-batches; each arrival emits the key's post-event state, so
    * the LAST emission per key (max batch) IS the compacted snapshot
    * row. Batch 0 is the base load by convention — its arrivals emit
    * `action = "keep"`, later batches emit "update"/"insert" depending
    * on whether live state existed, matching the batch MERGE's action
    * column exactly. A null upsert payload keeps the prior text
    * (partial update), also matching the batch operator.
    *
    * Scale shape: state per key is one (text, alive) record — bounded
    * by the live key set like any keyed store; the shuffle key is the
    * document id, identical to the batch MERGE's join key. Within a
    * trigger a key's events fold in (batch, op) order — deterministic
    * because the harness feeds deterministic micro-batches. */
  def upsertCompaction(changes: Dataset[UpsertEvent]): Dataset[SnapshotEmit] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes.groupByKey(_.id)
      .flatMapGroupsWithState[(Option[String], Boolean), SnapshotEmit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (id, rows, state: GroupState[(Option[String], Boolean)]) =>
          var (cur, alive) = state.getOption.getOrElse((Option.empty[String], false))
          val out = Vector.newBuilder[SnapshotEmit]
          rows.toVector.sortBy(r => (r.batch, r.op)).foreach { e =>
            e.op match {
              case "D" =>
                cur = None; alive = false
                out += SnapshotEmit(id, e.batch, "delete", None, alive = false)
              case "U" =>
                val action =
                  if (alive) "update"
                  else if (e.batch == 0) "keep"
                  else "insert"
                cur = e.text.orElse(cur); alive = true
                out += SnapshotEmit(id, e.batch, action, cur, alive = true)
              case other =>
                throw new IllegalArgumentException(
                  s"upsertCompaction: unknown op $other for key $id")
            }
          }
          state.update((cur, alive))
          out.result().iterator
      }
  }

  /** One user's funnel progress: first view, first click inside the
    * window after it, first purchase inside the window after that.
    * Every field is SET-ONCE — under event-time-ordered feeds the
    * greedy first-match update equals the batch min-based definition
    * (the first qualifying event IS the minimum). */
  case class FunnelState(fv: Option[Long], fc: Option[Long], fp: Option[Long])
  case class FunnelEvent(user_id: Long, event_type: String, t: Long, batch: Int)
  case class FunnelRow(user_id: Long, fv: Option[Long], fc: Option[Long],
                       fp: Option[Long])

  /** The set-once greedy funnel fold: over events in EVENT-TIME order it
    * computes exactly the batch definition (first view; first click
    * strictly after it within the window; first purchase likewise after
    * the click). Shared by the ordered and out-of-order variants. */
  private def foldFunnel(s0: FunnelState, evs: Iterable[(String, Long)],
                         windowUs: Long): FunnelState = {
    var s = s0
    evs.foreach { case (et, t) =>
      et match {
        case "view" if s.fv.isEmpty => s = s.copy(fv = Some(t))
        case "click" if s.fc.isEmpty &&
          s.fv.exists(v => t > v && t - v <= windowUs) =>
          s = s.copy(fc = Some(t))
        case "purchase" if s.fp.isEmpty &&
          s.fc.exists(c => t > c && t - c <= windowUs) =>
          s = s.copy(fp = Some(t))
        case _ =>
      }
    }
    s
  }

  /** Stateful streaming funnel (the ev09 semantics on a stream): one
    * keyed state record per user — three optional longs, bounded
    * regardless of stream length — updated across micro-batches.
    * Requires per-user event-time-ordered arrival (the deterministic
    * harness feeds global ts-ordered batches; production would insert
    * a watermark + sort-within-batch stage). Emits the user's current
    * state each batch; fields are monotone None→Some, so the final
    * value per user is a max over emissions. */
  def streamingFunnel(events: DataFrame, windowUs: Long): Dataset[FunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("event_type"), col("t").cast("long").as("t"),
        col("batch").cast("int").as("batch"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[FunnelState]) =>
          val evs = rows.toVector.sortBy(r => (r.batch, r.t))
            .map(e => (e.event_type, e.t))
          val s = foldFunnel(
            state.getOption.getOrElse(FunnelState(None, None, None)),
            evs, windowUs)
          state.update(s)
          Iterator(FunnelRow(uid, s.fv, s.fc, s.fp))
      }
  }

  /** One user's out-of-order funnel state: the funnel finalized up to
    * the event-time frontier, the still-revisable event buffer past it,
    * and the max event time seen (the per-user watermark clock). */
  case class OooFunnelState(fin: FunnelState, buf: Vector[(String, Long)],
                            maxTs: Long)
  case class OooFunnelRow(user_id: Long, batch: Int, fv: Option[Long],
                          fc: Option[Long], fp: Option[Long])

  /** Out-of-order-tolerant streaming funnel — lifts [[streamingFunnel]]'s
    * documented ordered-arrival assumption. The greedy set-once fold is
    * order-SENSITIVE (a click arriving before its view in processing
    * order but after it in event time must still qualify), so state
    * buffers events until they are `latenessUs` older than the user's
    * max seen event time, then folds the ripe prefix into the finalized
    * funnel in EVENT-TIME order — the manual spelling of a watermark +
    * sort-within-watermark stage, with the frontier advanced per key.
    * Each batch emits the user's current best estimate: the finalized
    * funnel re-folded over the sorted provisional buffer (revisable
    * until the frontier passes — an earlier-timestamped view arriving
    * late can still retract a provisionally-qualified click). With
    * lateness >= the feed's maximum event-time displacement, the LAST
    * emission per user equals the batch funnel truth for ANY arrival
    * order; events arriving beyond the lateness bound are dropped, the
    * standard watermark trade. State per user is bounded by one
    * lateness window of events — watermark-bounded, never
    * stream-length-bounded. */
  def streamingFunnelUnordered(events: DataFrame, windowUs: Long,
                               latenessUs: Long): Dataset[OooFunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("event_type"), col("t").cast("long").as("t"),
        col("batch").cast("int").as("batch"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OooFunnelState, OooFunnelRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[OooFunnelState]) =>
          val incoming = rows.toVector
          val st = state.getOption.getOrElse(
            OooFunnelState(FunnelState(None, None, None), Vector.empty, Long.MinValue))
          val maxTs = (st.maxTs +: incoming.map(_.t)).max
          val frontier =
            if (maxTs == Long.MinValue) Long.MinValue else maxTs - latenessUs
          // true late data (older than the already-finalized frontier of
          // a PREVIOUS batch) cannot be replayed — drop, like any
          // watermarked operator
          val prevFrontier =
            if (st.maxTs == Long.MinValue) Long.MinValue else st.maxTs - latenessUs
          val all = st.buf ++ incoming.filter(_.t > prevFrontier)
            .map(e => (e.event_type, e.t))
          val sorted = all.sortBy { case (et, t) => (t, et) }
          val (ripe, keep) = sorted.partition(_._2 <= frontier)
          val fin = foldFunnel(st.fin, ripe, windowUs)
          val cur = foldFunnel(fin, keep, windowUs)
          state.update(OooFunnelState(fin, keep, maxTs))
          val b = if (incoming.isEmpty) -1 else incoming.map(_.batch).max
          Iterator(OooFunnelRow(uid, b, cur.fv, cur.fc, cur.fp))
      }
  }

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `n`, restoring the previous value after. Streaming queries
    * snapshot the setting at `start()`, and stateful operators open one
    * state-store instance PER shuffle partition PER micro-batch — on a
    * fixture-sized stream that fixed cost dwarfs the data, so the
    * drains below run at a lower width than the batch default. Sizing,
    * not semantics: state keys hash to fewer partitions but every
    * grouped/joined row still meets its state; at production stream
    * volumes pick the width the key cardinality needs. */
  def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  /** Stream-drain shuffle/state width for the fixture-sized gate
    * harnesses (env `SPARK_GRAFT_STREAM_PARTS`). Stateful operators
    * open + commit one state-store instance PER shuffle partition PER
    * micro-batch, a fixed cost that dwarfs the data on gate-sized
    * streams — st27 measured 7.4 s -> 4.7 s going 8 -> 4 in r10.
    * Sizing, not semantics: every gate is partition-invariant by
    * construction (keyed state meets all its rows at any width); at
    * production stream volumes the width follows key cardinality /
    * throughput, which is why this is a knob and not a constant. */
  val DrainParts: Int =
    sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4").toInt

  /** Deterministic multi-micro-batch drive of a streaming transform
    * with NOTHING materialized on the driver — the de-drivered twin of
    * the MemoryStream fixture harness (which collects the whole corpus
    * into `addData` and accumulates output in a driver-memory sink; at
    * 50k docs that OOMs an 8 GiB driver even though the operator under
    * test is fully distributed).
    *
    * Geometry: `rows` (must carry an int `batch` column in
    * 0..nBatches-1) is written batch-by-batch as ONE parquet file each
    * (single-task write per batch — harness-sized by construction; the
    * batches exist to pin micro-batch composition, not to move bulk
    * data), each file's mtime forced to a distinct ascending value.
    * FileStreamSource with `maxFilesPerTrigger=1` + `latestFirst=false`
    * then consumes them as exactly nBatches micro-batches in mtime
    * order — same deterministic arrival order as the addData loop —
    * and the transform's output drains to a parquet SINK, read back as
    * a batch DataFrame. Within a micro-batch rows arrive unordered
    * (as in production); cross-batch order is the contract.
    *
    * Returns the sink contents (empty DataFrame with the transform's
    * schema when the stream emitted nothing). */
  /** Last file-fed drive's (streamSec, stateRowsTotal) by harness name:
    * the bench surfaces these as state-rows/s in bench_detail.json so a
    * step-up ratio move on a streaming row is attributable to keyed
    * state vs feed/sink overhead (r11 verdict #7). */
  val feedStats: scala.collection.concurrent.TrieMap[String, (Double, Long)] =
    scala.collection.concurrent.TrieMap.empty

  def runFileFedBatches(spark: SparkSession, rows: DataFrame, nBatches: Int,
                        name: String)(pipe: DataFrame => DataFrame): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(s"filefeed_$name")
    val feedDir = root.resolve("feed"); val stageDir = root.resolve("stage")
    val outDir = root.resolve("out"); val chkDir = root.resolve("chk")
    java.nio.file.Files.createDirectories(feedDir)
    val baseMs = (System.currentTimeMillis() / 1000L) * 1000L
    // ONE partitioned write builds every batch file (r11: the per-batch
    // where+coalesce(1) loop scanned the source nBatches times and paid
    // nBatches job launches — half of st07's harness overhead). The
    // partition column is a COPY (partitionBy drops its column from the
    // data files; the stream schema needs `batch` inside them), and
    // repartition-by-batch puts each batch in exactly one task, so each
    // batch=dir holds exactly one part file.
    rows.withColumn("__pb", col("batch"))
      .repartition(nBatches, col("batch"))
      .write.mode("overwrite").partitionBy("__pb").parquet(stageDir.toString)
    // a batch id with zero rows gets no __pb= directory from partitionBy
    // (unlike the old per-batch where+coalesce(1) write, which produced
    // an empty part file) — materialize ONE empty schema-carrying file
    // lazily and reuse it, so sparse batch ids keep the contract that
    // every id in 0..nBatches-1 is a (possibly empty) micro-batch
    lazy val emptyPart: java.nio.file.Path = {
      val dir = root.resolve("empty")
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], rows.schema)
        .coalesce(1).write.parquet(dir.toString)
      Option(dir.toFile.listFiles()).getOrElse(Array.empty)
        .find(_.getName.startsWith("part-"))
        .getOrElse(sys.error("empty-batch parquet write produced no part file"))
        .toPath
    }
    (0 until nBatches).foreach { b =>
      val part = Option(stageDir.resolve(s"__pb=$b").toFile.listFiles())
        .getOrElse(Array.empty).find(_.getName.startsWith("part-"))
      val dst = feedDir.resolve(f"batch_$b%04d.parquet")
      part match {
        case Some(p) => java.nio.file.Files.move(p.toPath, dst)
        case None => java.nio.file.Files.copy(emptyPart, dst)
      }
      // distinct ascending mtimes: FileStreamSource orders new files
      // by modification time, and equal stamps would make micro-batch
      // composition non-deterministic
      dst.toFile.setLastModified(baseMs + b * 60000L)
    }
    val stream = spark.readStream.schema(rows.schema)
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(feedDir.toString)
    val shaped = pipe(stream)
    val outSchema = shaped.schema
    val tStream = System.nanoTime()
    val q = shaped.writeStream.format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", chkDir.toString)
      .outputMode("append").start()
    try { q.processAllAvailable() } finally {
      // harness-vs-operator attribution (r10 verdict #3): state size and
      // throughput of the streaming section alone, so a cost move in
      // the bench row can be traced to feed/sink overhead vs the
      // operator's keyed state
      val sec = (System.nanoTime() - tStream) / 1e9
      val stateRows = stateRowsTotal(q)
      feedStats(name) = (sec, stateRows)
      System.err.println(
        f"[graft] $name stream: $sec%.2f s, state rows $stateRows, " +
          f"${stateRows / math.max(sec, 1e-9)}%.0f state-rows/s")
      q.stop()
    }
    try spark.read.parquet(outDir.toString)
    catch { case _: org.apache.spark.sql.AnalysisException =>
      // zero emitted rows: the sink wrote no files
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    }
  }

  /** State-size observability: total rows currently held across a
    * running query's state operators (0 before the first progress
    * report). THE number the retention/TTL knob controls — an
    * unbounded-state deployment shows it growing with every batch, a
    * TTL'd one shows it plateau at the retention window's working set.
    * st-gate harnesses log it per batch; StreamingSpec pins the
    * plateau-vs-growth separation. */
  def stateRowsTotal(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    Option(q.lastProgress)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)

  /** Run `body` with the given state-store provider (snapshot at query
    * start, like the partition width). RocksDB keeps keyed state off
    * the executor heap — the production choice once per-partition state
    * stops fitting in memory (the HDFS-backed default holds the whole
    * map on-heap). */
  def withStateProvider[T](s: SparkSession, provider: String)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key, provider)
    try body finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Drain a stream to an in-memory table with AvailableNow (process
    * everything currently present, then stop). Returns the table name. */
  def runToMemory(df: DataFrame, name: String, outputMode: OutputMode = OutputMode.Update()): String =
    withShufflePartitions(df.sparkSession, DrainParts) {
      // default (HDFS-backed, on-heap) provider: measured FASTER than
      // RocksDB on fixture-sized state (native-lib + snapshot overhead
      // dominates when per-partition state is a few MB); flip to
      // withStateProvider(RocksDbProvider) when state outgrows heap
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      name
    }

  /** Drain a stream through foreachBatch with AvailableNow — the
    * arbitrary-sink API for stores the built-in sinks don't speak.
    * The checkpoint only promises at-least-once delivery of each
    * micro-batch; exactly-once is the HANDLER's job — it must be
    * idempotent per batch id (overwrite its own batch's output,
    * never blind-append). */
  def runForeachBatch(df: DataFrame, handler: (DataFrame, Long) => Unit): Unit =
    withShufflePartitions(df.sparkSession, DrainParts) {
      val q = df.writeStream
        .foreachBatch(handler)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

  /** Stream → parquet sink with checkpointing (exactly-once file sink). */
  def runToParquet(df: DataFrame, dir: String, checkpoint: String): Unit = {
    val q = df.writeStream
      .format("parquet")
      .option("path", dir)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
