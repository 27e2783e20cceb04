package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** End-to-end training-corpus curation (SURVEY.md §2.11, composed):
  * exact dedup → text annotation (token stats, language-ID, quality
  * bucket) → gate filters. The canonical cleaning pass an LLM data
  * pipeline runs before tokenization.
  *
  * Every stage is a pure relational transform: one digest shuffle for
  * the dedup, then map-only annotation + filters that all ride the same
  * scan — at 100 TB the pipeline is one shuffle plus one pass, and the
  * filters push into the scan where the source format allows.
  */
object Curation {

  /** Gate thresholds; defaults follow the quality heuristics in
    * `Text.qualityBucket`. */
  final case class Config(
      minTokens: Long = 5,
      maxTokens: Long = 100000,
      keepQuality: Seq[String] = Seq("ok", "high"),
      dropUnknownLang: Boolean = true)

  /** Map-only annotation: token counts, uniq ratio, language, quality. */
  def annotate(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", Text.tokenCount(t))
      .withColumn("uniq_ratio",
        Text.distinctTokenCount(t).cast("double") /
          Text.tokenCount(t).cast("double"))
      .withColumn("lang_id", Text.langId(t))
      .withColumn("quality",
        Text.qualityBucket(col("n_tokens"), col("uniq_ratio")))
  }

  /** The gate predicate alone (useful for auditing what was dropped). */
  def gate(cfg: Config): Column = {
    val base = col("n_tokens").between(cfg.minTokens, cfg.maxTokens) &&
      col("quality").isin(cfg.keepQuality: _*)
    if (cfg.dropUnknownLang) base && col("lang_id") =!= "und" else base
  }

  /** Full pass: dedup exactly, annotate, keep gated rows. */
  def clean(df: DataFrame, idCol: String, textCol: String,
            cfg: Config = Config()): DataFrame =
    annotate(Dedup.dropExactDups(df, idCol, textCol), textCol)
      .filter(gate(cfg))
}
