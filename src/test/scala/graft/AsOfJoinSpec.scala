package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("leftAsOf picks the latest right row at-or-before each left ts") {
    val quotes = Seq(
      ("A", t("2024-01-01 09:00:00"), 10.0),
      ("A", t("2024-01-01 10:00:00"), 11.0),
      ("A", t("2024-01-01 12:00:00"), 12.0),
      ("B", t("2024-01-01 09:30:00"), 99.0))
      .toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", t("2024-01-01 08:00:00")), // before any quote → null
      ("A", t("2024-01-01 10:00:00")), // equal ts → inclusive match 11.0
      ("A", t("2024-01-01 11:59:59")), // between → 11.0
      ("A", t("2024-01-01 13:00:00")), // after last → 12.0
      ("B", t("2024-01-01 10:00:00")), // other key → 99.0
      ("C", t("2024-01-01 10:00:00"))) // unseen key → null
      .toDF("sym", "tts")
    val got = AsOfJoin.leftAsOf(trades, quotes, "sym", "tts", "qts")
      .orderBy("sym", "tts")
      .select(col("sym"), col("tts").cast("string"), col("px"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq
    assert(got == Seq(
      ("A", "2024-01-01 08:00:00", None),
      ("A", "2024-01-01 10:00:00", Some(11.0)),
      ("A", "2024-01-01 11:59:59", Some(11.0)),
      ("A", "2024-01-01 13:00:00", Some(12.0)),
      ("B", "2024-01-01 10:00:00", Some(99.0)),
      ("C", "2024-01-01 10:00:00", None)))
  }

  test("window is per-key (no single-partition exchange)") {
    val quotes = Seq(("A", t("2024-01-01 09:00:00"), 1.0))
      .toDF("sym", "qts", "px")
    val trades = Seq(("A", t("2024-01-01 10:00:00"))).toDF("sym", "tts")
    val plan = AsOfJoin.leftAsOf(trades, quotes, "sym", "tts", "qts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1500))
  }

  test("forward as-of picks the nearest following row; tolerance " +
    "nullifies distant matches") {
    val left = Seq((1L, 100L), (1L, 205L), (2L, 50L)).toDF("k", "lts")
    val right = Seq((1L, 110L, "a"), (1L, 300L, "b"), (2L, 40L, "c"))
      .toDF("k", "rts", "payload")
    val fwd = graft.operators.AsOfJoin
      .leftAsOf(left, right, "k", "lts", "rts", forward = true)
      .orderBy("k", "lts").collect()
    // (1,100) → rts 110; (1,205) → rts 300; (2,50) → no following row
    assert(fwd(0).getAs[String]("payload") == "a")
    assert(fwd(1).getAs[String]("payload") == "b")
    assert(fwd(2).isNullAt(fwd(2).fieldIndex("payload")))
    val tol = graft.operators.AsOfJoin
      .leftAsOf(left, right, "k", "lts", "rts", forward = true,
        toleranceSec = Some(50L))
      .orderBy("k", "lts").collect()
    assert(tol(0).getAs[String]("payload") == "a")   // gap 10 ≤ 50
    assert(tol(1).isNullAt(tol(1).fieldIndex("payload"))) // gap 95 > 50
  }
}
