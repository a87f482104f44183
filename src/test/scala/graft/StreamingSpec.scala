package graft

import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed event counts with watermark match batch aggregation") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val base = Timestamp.valueOf("2024-01-01 00:10:00")
    val rows = (0 until 200).map { i =>
      (new Timestamp(base.getTime + i * 60000L), if (i % 2 == 0) "click" else "view", i.toDouble)
    }
    mem.addData(rows: _*)
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val agg = Streaming.windowedEventCounts(events, window_ = "1 hour", watermark = "2 hours")
    Streaming.runToMemory(agg, "win_counts")
    val got = spark.table("win_counts")
      .groupBy("window_start", "event_type").agg(max("n").as("n"))
      .orderBy("window_start", "event_type").collect()
    val want = rows.toDF("ts", "event_type", "value")
      .groupBy(window($"ts", "1 hour"), $"event_type").count()
      .select($"window.start".as("ws"), $"event_type", $"count")
      .orderBy("ws", "event_type").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getTimestamp(0) == w.getTimestamp(0))
      assert(g.getString(1) == w.getString(1))
      assert(g.getLong(2) == w.getLong(2))
    }
  }

  test("stateful sessionize counts gap-separated sessions per user") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Streaming.SessionEvent]
    val h = 3600L * 1000000
    mem.addData(
      Streaming.SessionEvent(1, 0), Streaming.SessionEvent(1, 1000),      // session 1
      Streaming.SessionEvent(1, h), Streaming.SessionEvent(1, h + 5),     // session 2 (1h gap)
      Streaming.SessionEvent(2, 0))                                       // user 2: 1 session
    val out = Streaming.sessionize(mem.toDS(), gapUs = 1800L * 1000000)
    Streaming.runToMemory(out.toDF(), "sessions")
    val got = spark.table("sessions").groupBy("user_id").agg(max("n_sessions").as("n"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L), (2L, 1L)))
  }

  test("out-of-order funnel matches batch truth under shuffled micro-batches") {
    implicit val sq = spark.sqlContext
    val w = 100L // window
    // user 1: view@10, click@15, purchase@20 (full funnel)
    // user 2: click@5 BEFORE any view, view@10, click@12 (view+click)
    // user 3: view@50 only
    // events are fed deliberately scrambled ACROSS batches: user 1's
    // click arrives a batch before its view; user 2's early click
    // arrives last. An ordered-greedy fold would miss u1's click
    // (view unseen when it processes) — the buffered fold must not.
    val batches = Seq(
      Seq((1L, "click", 15L, 0), (2L, "click", 12L, 0), (3L, "view", 50L, 0)),
      Seq((1L, "view", 10L, 1), (1L, "purchase", 20L, 1)),
      Seq((2L, "view", 10L, 2), (2L, "click", 5L, 2)))
    val mem = MemoryStream[(Long, String, Long, Int)]
    val out = Streaming.streamingFunnelUnordered(
      mem.toDF().toDF("user_id", "event_type", "t", "batch"),
      windowUs = w, latenessUs = 1000L)
    Streaming.withShufflePartitions(spark, 4) {
      val q = out.toDF().writeStream.format("memory")
        .queryName("ooo_funnel").outputMode("append").start()
      try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      finally q.stop()
    }
    import org.apache.spark.sql.expressions.Window
    val last = spark.table("ooo_funnel")
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(desc("batch"))))
      .where(col("rn") === 1)
      .select("user_id", "fv", "fc", "fp")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toSet
    // batch truth: u1 full funnel; u2 fv=10 fc=12 (click@5 precedes the
    // view — never qualifies); u3 view only
    assert(last == Set(
      (1L, Some(10L), Some(15L), Some(20L)),
      (2L, Some(10L), Some(12L), None),
      (3L, Some(50L), None, None)))
  }

  test("out-of-order funnel retracts a provisional click when an earlier view arrives") {
    implicit val sq = spark.sqlContext
    // view@10 + click@12 arrive first (provisional fc=12, window 5);
    // then view@3 arrives within lateness — the true first view. Click
    // @12 is 9 > window after view@3, so the final funnel has NO click.
    val mem = MemoryStream[(Long, String, Long, Int)]
    val out = Streaming.streamingFunnelUnordered(
      mem.toDF().toDF("user_id", "event_type", "t", "batch"),
      windowUs = 5L, latenessUs = 1000L)
    Streaming.withShufflePartitions(spark, 4) {
      val q = out.toDF().writeStream.format("memory")
        .queryName("ooo_retract").outputMode("append").start()
      try {
        mem.addData(Seq((7L, "view", 10L, 0), (7L, "click", 12L, 0)))
        q.processAllAvailable()
        mem.addData(Seq((7L, "view", 3L, 1)))
        q.processAllAvailable()
      } finally q.stop()
    }
    val rows = spark.table("ooo_retract").orderBy("batch")
      .select("batch", "fv", "fc").collect()
      .map(r => (r.getInt(0), Option(r.get(1)), Option(r.get(2))))
    assert(rows.toSeq == Seq(
      (0, Some(10L), Some(12L)),  // provisional
      (1, Some(3L), None)))       // revised once the earlier view lands
  }

  test("streaming dedup drops duplicate ids within the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    mem.addData(
      (t0, 1L, "a"), (t0, 1L, "a-dup"), (t0, 2L, "b"),
      (new java.sql.Timestamp(t0.getTime + 500), 1L, "a-later-ts"),
      (new java.sql.Timestamp(t0.getTime + 1000), 3L, "c"))
    val out = Streaming.dedupStream(
      mem.toDF().toDF("ts", "doc_id", "text"), "doc_id", "ts")
    Streaming.runToMemory(out, "dedup_stream", org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("dedup_stream").select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("stream-stream interval join matches right rows in the lookback window") {
    implicit val sq = spark.sqlContext
    val purchases = MemoryStream[(java.sql.Timestamp, Long, String)]
    val clicks = MemoryStream[(java.sql.Timestamp, Long, String)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(offsetMin: Int) = new java.sql.Timestamp(t0.getTime + offsetMin * 60000L)
    purchases.addData((ts(0), 1L, "p1"), (ts(90), 2L, "p2"))
    clicks.addData(
      (ts(-30), 1L, "c1"),  // 30 min before p1: in window
      (ts(-90), 1L, "c0"),  // 90 min before p1: outside 1h lookback
      (ts(85), 2L, "c2"),   // 5 min before p2: in window
      (ts(95), 2L, "c3"))   // after p2: excluded
    val joined = Streaming.intervalJoin(
      purchases.toDF().toDF("pts", "user_id", "purchase"),
      clicks.toDF().toDF("cts", "user_id", "click"),
      "user_id", "pts", "cts")
    Streaming.runToMemory(joined, "sjoin", org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("sjoin").select("purchase", "click").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("p1", "c1"), ("p2", "c2")))
  }

  test("outer interval join emits unmatched left rows with the LEFT key after watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val src = mem.toDF().toDF("user_id", "event_type", "us")
      .withColumn("tstamp", timestamp_micros(col("us")))
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tstamp").as("p_ts"))
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id"), col("tstamp").as("c_ts"))
    val joined = Streaming.intervalJoinOuter(purchases, clicks, "user_id",
      "p_ts", "c_ts", lookback = "30 minutes", watermark = "1 hour")
    spark.catalog.dropTempView("souter")
    val q = joined.writeStream.format("memory").queryName("souter")
      .outputMode("append").start()
    try {
      val base = 1700000000000000L
      // user 1 matches; user 2 has no click -> must emit null-padded
      mem.addData((1L, "click", base), (1L, "purchase", base + 600000000L),
        (2L, "purchase", base + 600000000L))
      q.processAllAvailable()
      mem.addData((-1L, "purchase", base + 40L * 86400000000L),
        (-1L, "click", base + 40L * 86400000000L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("souter").where(col("user_id") >= 0)
      .select(col("user_id"), col("c_ts").isNull.as("unmatched"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    // the unmatched row carries the LEFT key (the drop(r(key)) self-join
    // ambiguity this helper's rename-then-join exists to prevent)
    assert(rows == Set((1L, false), (2L, true)))
  }

  test("online near-dedup evidence is cross-batch and first-arrival-ordered") {
    implicit val sq = spark.sqlContext
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val other = (1 to 60).map(i => s"alt$i").mkString(" ")
    val mem = MemoryStream[(Long, Int, String)]
    val evidence = Streaming.onlineCollisionEvidence(
      mem.toDF().toDF("id", "batch", "text"))
    spark.catalog.dropTempView("online_ev")
    val q = evidence.toDF().writeStream.format("memory")
      .queryName("online_ev").outputMode("append").start()
    try {
      // batch 0: 1 and its in-batch near-dup 2; 3 distinct
      mem.addData((1L, 0, base), (2L, 0, base + " tail"), (3L, 0, other))
      q.processAllAvailable()
      // batch 1: 4 is a cross-batch near-dup of 1/2; 5 distinct
      mem.addData((4L, 1, base + " suffix"), (5L, 1, "wholly unrelated words"))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("online_ev").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // evidence always points later -> earlier in arrival order
    assert(pairs.contains((2L, 1L)) && pairs.contains((4L, 1L)) && pairs.contains((4L, 2L)))
    assert(!pairs.exists { case (n, e) => n <= e }) // no forward/self edges
    assert(!pairs.exists { case (n, e) => n == 3L || e == 3L || n == 5L || e == 5L })
  }

  test("online span filter excises by first ARRIVAL, not by doc id") {
    implicit val sq = spark.sqlContext
    // doc 10 arrives in batch 1 but OWNS the lower id; doc 20 arrives
    // first (batch 0) and therefore keeps the shared run "a b c":
    // arrival order beats id order — the exact point where the
    // streaming semantics diverge from batch spanTrim's min-(doc,pos)
    val mem = MemoryStream[(Long, Int, String)]
    val evidence = Streaming.onlineSpanDupEvidence(
      mem.toDF().toDF("id", "batch", "text"), window = 3)
    spark.catalog.dropTempView("online_span")
    val q = evidence.toDF().writeStream.format("memory")
      .queryName("online_span").outputMode("append").start()
    try {
      mem.addData((20L, 0, "x1 a b c x2 x3"))
      q.processAllAvailable()
      mem.addData((10L, 1, "y1 y2 a b c y3"), (30L, 1, "p q r s p q r s"))
      q.processAllAvailable()
    } finally q.stop()
    val docsDf = Seq((10L, "y1 y2 a b c y3"), (20L, "x1 a b c x2 x3"),
      (30L, "p q r s p q r s")).toDF("doc_id", "text")
    val r = graft.operators.Dedup.spanExcise(docsDf, "doc_id", "text", window = 3,
        spark.table("online_span")
          .select(col("id").as("doc_id"), col("pos").as("__pos")))
      .orderBy("doc_id").collect()
    assert(r(0).getString(3) == "y1 y2 y3" && r(0).getLong(2) == 3L) // late arrival trimmed
    assert(r(1).getString(3) == "x1 a b c x2 x3")                    // first arrival kept
    // within-doc repeat trimmed online too (window 3 over 8 tokens:
    // positions 4 and 5 repeat windows seen at 0 and 1 -> cut [4,7])
    assert(r(2).getString(3) == "p q r s" && r(2).getLong(2) == 4L)
    // batch spanTrim on the same corpus keeps doc 10 instead (min id)
    val batch = graft.operators.Dedup.spanTrim(docsDf, "doc_id", "text", window = 3)
      .orderBy("doc_id").collect()
    assert(batch(0).getString(3) == "y1 y2 a b c y3")
    assert(batch(1).getString(3) == "x1 x2 x3")
  }

  test("span-filter retention evicts aged fingerprint state (event-time TTL)") {
    implicit val sq = spark.sqlContext
    def ts(s: Long) = new Timestamp(s * 1000L)
    val mem = MemoryStream[(Long, Int, String, Timestamp)]
    val evidence = Streaming.onlineSpanDupEvidence(
      mem.toDF().toDF("id", "batch", "text", "ts"),
      window = 3, retention = Some("5 seconds"))
    spark.catalog.dropTempView("span_ttl")
    val q = evidence.toDF().writeStream.format("memory")
      .queryName("span_ttl").outputMode("append").start()
    try {
      // doc 1 seeds "a b c d" (2 fingerprints) at t=10s
      mem.addData((1L, 0, "a b c d", ts(10)))
      q.processAllAvailable()
      // doc 2 repeats it INSIDE retention -> both windows flagged
      mem.addData((2L, 1, "a b c d", ts(12)))
      q.processAllAvailable()
      // doc 3 (6 distinct fingerprints) pushes the watermark to 995s,
      // far past doc 1/2's timeout (12s + 5s retention)
      mem.addData((3L, 2, (1 to 8).map(i => s"flood$i").mkString(" "), ts(1000)))
      q.processAllAvailable()
      // state assertion: only doc 3's 6 fingerprints survive eviction —
      // without the TTL the operator would hold 8 (6 + the 2 seeded ones)
      val aliveAfterFlood =
        q.lastProgress.stateOperators.head.numRowsTotal
      assert(aliveAfterFlood == 6L,
        s"expected doc-3-only state after eviction, got $aliveAfterFlood rows")
      // doc 4 repeats the seeded run AFTER eviction -> treated as
      // first-seen again (the documented retention trade): no evidence
      mem.addData((4L, 3, "a b c d", ts(1010)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("span_ttl").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows == Set((2L, 0), (2L, 1)), s"unexpected evidence: $rows")
  }

  test("state observability: TTL'd state plateaus while NoTimeout state grows") {
    // the verdict-#7 separation, measured through the same
    // stateRowsTotal seam the st-gate harnesses log: feed 6 batches of
    // FRESH fingerprints 100 s apart; with retention=30s every batch's
    // cleanup evicts the previous batch's keys (plateau at one batch's
    // working set), with no retention the state grows by every batch.
    implicit val sq = spark.sqlContext
    def ts(s: Long) = new Timestamp(s * 1000L)
    def run(retention: Option[String], name: String): Seq[Long] = {
      val mem = MemoryStream[(Long, Int, String, Timestamp)]
      val evidence = Streaming.onlineSpanDupEvidence(
        mem.toDF().toDF("id", "batch", "text", "ts"),
        window = 3, retention = retention)
      spark.catalog.dropTempView(name)
      val q = evidence.toDF().writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        (0 until 6).map { b =>
          // 4 fresh tokens -> 2 fresh fingerprints per batch
          mem.addData((b.toLong, b, s"w${b}a w${b}b w${b}c w${b}d",
            ts(10 + b * 100L)))
          q.processAllAvailable()
          Streaming.stateRowsTotal(q)
        }
      } finally q.stop()
    }
    val ttl = run(Some("30 seconds"), "plateau_ttl")
    val open = run(None, "plateau_open")
    // growth: every batch adds its 2 fingerprints, none ever leave
    assert(open === Seq(2L, 4L, 6L, 8L, 10L, 12L), s"open-state series: $open")
    // plateau: at most the current batch's working set survives each
    // cleanup; the series must NOT trend up
    assert(ttl.last === 2L, s"ttl series did not plateau: $ttl")
    assert(ttl.max <= 4L, s"ttl series exceeded one batch gap's working set: $ttl")
  }

  test("span-filter retention survives a null-ts batch (timeout re-set from state)") {
    // GroupState drops a pending timeout on every invocation unless it
    // is re-set; a batch whose arrivals all carry null event time used
    // to clear the key's eviction and make its state immortal. The
    // timeout base now lives in the state (monotone maxTsSeen), so the
    // seeded fingerprint must still age out.
    implicit val sq = spark.sqlContext
    def ts(s: Long) = new Timestamp(s * 1000L)
    val mem = MemoryStream[(Long, Int, String, Timestamp)]
    val evidence = Streaming.onlineSpanDupEvidence(
      mem.toDF().toDF("id", "batch", "text", "ts"),
      window = 3, retention = Some("5 seconds"))
    spark.catalog.dropTempView("span_ttl_null")
    val q = evidence.toDF().writeStream.format("memory")
      .queryName("span_ttl_null").outputMode("append").start()
    try {
      mem.addData((1L, 0, "a b c", ts(10)))  // seed: 1 fingerprint
      q.processAllAvailable()
      mem.addData((2L, 1, "a b c", null))    // null-ts dup arrival
      q.processAllAvailable()
      mem.addData((3L, 2, (1 to 8).map(i => s"flood$i").mkString(" "), ts(1000)))
      q.processAllAvailable()
      // the seeded fingerprint must be EVICTED despite the null-ts
      // batch: only the flood's 6 fingerprints survive
      val alive = q.lastProgress.stateOperators.head.numRowsTotal
      assert(alive == 6L, s"expected seed evicted after flood, got $alive state rows")
      mem.addData((4L, 3, "a b c", ts(1010))) // first-seen again: no evidence
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("span_ttl_null").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows == Set((2L, 0)), s"unexpected evidence: $rows")
  }

  test("collision-evidence retention evicts aged band buckets (event-time TTL)") {
    implicit val sq = spark.sqlContext
    def ts(s: Long) = new Timestamp(s * 1000L)
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val flood = (1 to 60).map(i => s"alt$i").mkString(" ")
    val mem = MemoryStream[(Long, Int, String, Timestamp)]
    val evidence = Streaming.onlineCollisionEvidence(
      mem.toDF().toDF("id", "batch", "text", "ts"),
      retention = Some("5 seconds"))
    spark.catalog.dropTempView("coll_ttl")
    val q = evidence.toDF().writeStream.format("memory")
      .queryName("coll_ttl").outputMode("append").start()
    try {
      mem.addData((1L, 0, base, ts(10)))
      q.processAllAvailable()
      // inside retention: collides against the indexed doc 1
      mem.addData((2L, 1, base + " tail", ts(12)))
      q.processAllAvailable()
      // unrelated flood pushes the watermark past doc 1/2's buckets
      mem.addData((3L, 2, flood, ts(1000)))
      q.processAllAvailable()
      // after eviction the same content is first-seen again: no evidence
      mem.addData((4L, 3, base + " suffix", ts(1010)))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("coll_ttl").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 1L)), s"unexpected evidence: $pairs")
  }

  test("online dedup state cap bounds bucket membership but keeps emitting") {
    implicit val sq = spark.sqlContext
    val txt = (1 to 60).map(i => s"same$i").mkString(" ")
    val mem = MemoryStream[(Long, Int, String)]
    val evidence = Streaming.onlineCollisionEvidence(
      mem.toDF().toDF("id", "batch", "text"), maxState = 2)
    spark.catalog.dropTempView("online_cap")
    val q = evidence.toDF().writeStream.format("memory")
      .queryName("online_cap").outputMode("append").start()
    try {
      mem.addData((1L, 0, txt), (2L, 0, txt), (3L, 0, txt))
      q.processAllAvailable()
      mem.addData((4L, 1, txt)) // bucket full: 4 still collides vs stored 1,2
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("online_cap").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 1L), (3L, 1L), (3L, 2L), (4L, 1L), (4L, 2L)))
  }

  test("incremental parquet stream processes a directory exactly once") {
    val dir = Files.createTempDirectory("stream_in").toString
    val out = Files.createTempDirectory("stream_out").toString
    val ckpt = Files.createTempDirectory("stream_ckpt").toString
    val df1 = Seq((1L, "alpha doc text"), (2L, "beta doc text")).toDF("doc_id", "text")
    df1.write.mode("append").parquet(dir)
    val stream = Streaming.parquetStream(spark, dir, df1.schema)
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
    Streaming.runToParquet(stream, out, ckpt)
    assert(spark.read.parquet(out).count() == 2)
    // second batch of files: only the new ones are processed
    Seq((3L, "gamma doc text three")).toDF("doc_id", "text").write.mode("append").parquet(dir)
    Streaming.runToParquet(
      Streaming.parquetStream(spark, dir, df1.schema)
        .withColumn("n_tokens", size(split(trim(col("text")), "\\s+"))), out, ckpt)
    val all = spark.read.parquet(out)
    assert(all.count() == 3)
    assert(all.filter(col("doc_id") === 3).head().getInt(2) == 4)
    // pure restart with the same checkpoint and NO new data is a no-op:
    // the commit log makes the file sink exactly-once across restarts
    Streaming.runToParquet(
      Streaming.parquetStream(spark, dir, df1.schema)
        .withColumn("n_tokens", size(split(trim(col("text")), "\\s+"))), out, ckpt)
    assert(spark.read.parquet(out).count() == 3)
  }

  test("upsertCompaction folds a keyed change log into the batch-MERGE snapshot") {
    import Streaming.{SnapshotEmit, UpsertEvent}
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[UpsertEvent]
    spark.catalog.dropTempView("upsert_tbl")
    val q = Streaming.upsertCompaction(mem.toDS()).toDF().writeStream
      .format("memory").queryName("upsert_tbl").outputMode("append").start()
    try {
      // batch 0: base load
      mem.addData(
        UpsertEvent(1L, 0, "U", Some("a")),
        UpsertEvent(2L, 0, "U", Some("b")),
        UpsertEvent(3L, 0, "U", Some("c")))
      q.processAllAvailable()
      // batch 1: update 1, delete 2, insert 9, partial-update 3 (null text)
      mem.addData(
        UpsertEvent(1L, 1, "U", Some("a2")),
        UpsertEvent(2L, 1, "D", None),
        UpsertEvent(9L, 1, "U", Some("i")),
        UpsertEvent(3L, 1, "U", None))
      q.processAllAvailable()
      // batch 2: re-insert the deleted key — state must treat it as insert
      mem.addData(UpsertEvent(2L, 2, "U", Some("b2")))
      q.processAllAvailable()
    } finally q.stop()
    import spark.implicits._
    val last = spark.table("upsert_tbl").as[SnapshotEmit].collect()
      .groupBy(_.id).map { case (_, es) => es.maxBy(_.batch) }.toSeq
      .filter(_.alive).sortBy(_.id)
      .map(e => (e.id, e.action, e.text.orNull))
    assert(last === Seq(
      (1L, "update", "a2"),
      (2L, "insert", "b2"),  // delete then re-insert
      (3L, "update", "c"),   // partial update keeps base text
      (9L, "insert", "i")))
  }

  test("runFileFedBatches tolerates sparse batch ids (empty micro-batches)") {
    // batches 1 and 3 carry zero rows: the one-job partitionBy feed
    // write creates no directory for them (unlike the r10 per-batch
    // where+coalesce(1) write, which produced an empty part file) — the
    // harness must substitute an empty schema-carrying file, not fail
    val rows = Seq((1L, 0, "alpha"), (2L, 0, "beta"), (3L, 2, "gamma"))
      .toDF("id", "batch", "text")
    val out = Streaming.runFileFedBatches(spark, rows, nBatches = 4,
      name = "sparse_test")(st => st.select($"id", $"batch"))
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }
}
