package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("clean: dedups, drops short/repetitive/unknown-lang docs") {
    val good = "the quick brown fox jumps over a lazy dog of the north " +
      "while many other animals watch from the quiet hills nearby today"
    val docs = Seq(
      (1L, good),                               // keep
      (2L, good),                               // exact dup → dropped
      (3L, "too short"),                        // < 5 tokens → dropped
      (4L, Seq.fill(50)("word").mkString(" ")), // repetitive → dropped
      (5L, "xyzzy plugh abcde fghij klmno pqrst uvwxy zabcd efghi " +
        "jklmn opqrs tuvwx")                    // no lang markers → und
      ).toDF("doc_id", "text")
    val cleaned = Curation.clean(docs, "doc_id", "text")
    assert(cleaned.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    val row = cleaned.head()
    assert(row.getAs[String]("lang_id") == "en")
    assert(Seq("ok", "high").contains(row.getAs[String]("quality")))
  }

  test("gate config is honored") {
    val docs = Seq((1L, "the a of " + Seq.tabulate(30)("w" + _)
      .mkString(" "))).toDF("doc_id", "text")
    val strict = Curation.clean(docs, "doc_id", "text",
      Curation.Config(minTokens = 100))
    assert(strict.count() == 0)
    val loose = Curation.clean(docs, "doc_id", "text",
      Curation.Config(minTokens = 5))
    assert(loose.count() == 1)
  }
}
