package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.IngestStream

class StreamingWindowsSpec extends SparkSpec {

  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("W2/R3 streaming tumbling windows emit closed buckets after " +
    "the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val counts = IngestStream.windowedCounts(
      mem.toDF().toDF("event_time", "event_type", "value"),
      "event_time", "5 minutes", "1 minute")
    val q = counts.writeStream.format("memory").queryName("tumble_out")
      .outputMode("append").start()
    mem.addData(
      (t("2024-01-01 00:01:00"), "click", 1.0),
      (t("2024-01-01 00:02:00"), "click", 2.0),
      (t("2024-01-01 00:04:00"), "view", 5.0))
    q.processAllAvailable()
    // advance the watermark far past the first window
    mem.addData((t("2024-01-01 01:00:00"), "click", 9.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("tumble_out")
      .select(col("window.start").cast("string"), col("event_type"),
        col("n"), col("total_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(rows.contains(("2024-01-01 00:00:00", "click", 2L, 3.0)))
    assert(rows.contains(("2024-01-01 00:00:00", "view", 1L, 5.0)))
  }

  test("R6 streaming session windows close after the gap + watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val sessions = IngestStream.sessionWindowCounts(
      mem.toDF().toDF("event_time", "k"),
      "event_time", "k", gap = "5 minutes", watermark = Some("1 minute"))
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    // one session of 3 events (gaps < 5 min), then a far event to close it
    mem.addData(
      (t("2024-01-01 00:00:00"), "a"),
      (t("2024-01-01 00:03:00"), "a"),
      (t("2024-01-01 00:06:00"), "a"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 02:00:00"), "a"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_out")
      .select(col("k"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n"))
      .as[(String, String, String, Long)].collect().toSet
    // merged session: start at first event, end = last event + gap
    assert(rows.contains(
      ("a", "2024-01-01 00:00:00", "2024-01-01 00:11:00", 3L)))
  }

  test("R6 session windows evict late events behind the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val sessions = IngestStream.sessionWindowCounts(
      mem.toDF().toDF("event_time", "k"),
      "event_time", "k", gap = "5 minutes", watermark = Some("1 minute"))
    val q = sessions.writeStream.format("memory").queryName("sess_late_out")
      .outputMode("append").start()
    mem.addData((t("2024-01-01 00:00:00"), "a"))
    q.processAllAvailable()
    // advance the watermark far past a's gap — closes and emits a's session
    mem.addData((t("2024-01-01 02:00:00"), "b"))
    q.processAllAvailable()
    // late arrival behind the watermark: would have extended a's session
    // to 00:07 if admitted — watermark eviction must drop it instead
    mem.addData((t("2024-01-01 00:02:00"), "a"))
    q.processAllAvailable()
    // close b's session too, so every retained session is emitted
    mem.addData((t("2024-01-01 04:00:00"), "c"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_late_out")
      .select(col("k"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n"))
      .as[(String, String, String, Long)].collect().toSeq
    // a's session: exactly one, n=1, end = first event + gap — the late
    // event neither extended it nor spawned a second a-session
    assert(rows.filter(_._1 == "a") ==
      Seq(("a", "2024-01-01 00:00:00", "2024-01-01 00:05:00", 1L)))
    assert(rows.filter(_._1 == "b") ==
      Seq(("b", "2024-01-01 02:00:00", "2024-01-01 02:05:00", 1L)))
  }

  test("R6 sliding windows place one event in overlapping buckets") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val counts = IngestStream.slidingWindowCounts(
      mem.toDF().toDF("event_time", "event_type", "value"),
      "event_time", windowLen = "10 minutes", slide = "5 minutes",
      watermark = "1 minute")
    val q = counts.writeStream.format("memory").queryName("slide_out")
      .outputMode("append").start()
    mem.addData((t("2024-01-01 00:07:00"), "click", 1.0))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 01:00:00"), "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val wins = spark.table("slide_out")
      .filter(col("n") === 1 && col("window.start") < t("2024-01-01 00:30:00"))
      .select(col("window.start").cast("string")).as[String]
      .collect().toSet
    // event at 00:07 belongs to [00:00,00:10) and [00:05,00:15)
    assert(wins == Set("2024-01-01 00:00:00", "2024-01-01 00:05:00"))
  }

  test("stream-stream join pairs events within the time bound only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(String, java.sql.Timestamp)]
    val buys = MemoryStream[(String, java.sql.Timestamp)]
    val joined = IngestStream.joinStreams(
      clicks.toDF().toDF("user", "click_ts"),
      buys.toDF().toDF("user", "buy_ts"),
      "user", "click_ts", "buy_ts",
      watermark = "1 minute", within = "10 minutes")
    val q = joined
      .select(col("l.user").as("user"), col("click_ts"), col("buy_ts"))
      .writeStream.format("memory").queryName("ss_join_out")
      .outputMode("append").start()
    clicks.addData(("u1", t("2024-01-01 00:00:00")),
      ("u2", t("2024-01-01 00:00:00")))
    buys.addData(
      ("u1", t("2024-01-01 00:05:00")),  // within 10 min → joins
      ("u2", t("2024-01-01 00:30:00")))  // outside bound → dropped
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ss_join_out").select("user")
      .as[String].collect().toSeq
    assert(rows == Seq("u1"))
  }

  test("mapGroupsWithState running counts persist across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val counts = IngestStream.runningCounts(mem.toDF().toDF("k"), "k")
    val q = counts.writeStream.format("memory").queryName("state_out")
      .outputMode("update").start()
    mem.addData("a", "a", "b")
    q.processAllAvailable()
    mem.addData("a")          // second batch: state must carry a=2 over
    q.processAllAvailable()
    q.stop()
    val latest = spark.table("state_out")
      .groupBy("k").agg(max("total").as("total"))
      .as[(String, Long)].collect().toMap
    assert(latest == Map("a" -> 3L, "b" -> 1L))
  }

  test("inactivityAlerts fires on event-time silence, not activity") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val alerts = IngestStream.inactivityAlerts(
      mem.toDF().toDF("k", "ts"), "k", "ts",
      watermark = "1 minute", gapMs = 10 * 60 * 1000L)
    val q = alerts.writeStream.format("memory").queryName("alert_out")
      .outputMode("append").start()
    mem.addData(("u1", t("2024-01-01 00:00:00")))
    q.processAllAvailable()
    // u2 an hour later pushes the watermark far past u1's gap → u1
    // fires; u2 itself is still live (watermark < u2 + gap)
    mem.addData(("u2", t("2024-01-01 01:00:00")))
    q.processAllAvailable()
    // one more advance so the timeout batch actually runs
    mem.addData(("u3", t("2024-01-01 01:00:30")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("alert_out")
      .select(col("k"), col("last_seen").cast("string"))
      .as[(String, String)].collect().toSet
    assert(rows == Set(("u1", "2024-01-01 00:00:00")))
  }

  test("unsupported format and non-literal extension args fail loudly") {
    import graft.sources.Lake
    intercept[IllegalArgumentException] {
      Lake.read(spark, "/tmp/nope", "avroish")
    }
    val err = intercept[Exception] {
      Seq(("x", 3)).toDF("t", "n").createOrReplaceTempView("bad_args")
      spark.sql("SELECT minhash_signature(t, n) FROM bad_args").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      err.getMessage.contains("shingleN"))
  }

  test("transformWithState running totals persist across micro-batches " +
    "(RocksDB state store)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(String, Long)]
      val totals = IngestStream.runningTotalsTws(
        mem.toDF().toDF("k", "v"), "k", "v")
      val q = totals.writeStream.format("memory").queryName("tws_out")
        .outputMode("update").start()
      mem.addData(("a", 2L), ("a", 3L), ("b", 10L))
      q.processAllAvailable()
      mem.addData(("a", 5L))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("tws_out").as[(String, Long)].collect()
      // batch 1 emits a→5, b→10; batch 2 emits a→10 (state carried)
      assert(rows.toSet == Set(("a", 5L), ("b", 10L), ("a", 10L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
