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

  /** Benchmark-contamination check: training docs sharing at least one
    * word n-gram with an eval/benchmark set — the train/test overlap
    * scan every LLM data pipeline must run before training. Returns
    * (train id, #shared n-grams, #eval docs hit).
    *
    * Scale: both sides reduce to (n-gram, id) streams; the join key is
    * the n-gram — uniform, skew-free (stop-phrase n-grams at n ≥ 8 are
    * rare), and candidate work is proportional to actual overlap, never
    * all-pairs. Docs shorter than n tokens cannot be contaminated at
    * this n and drop out via the null shingle set. */
  def contamination(train: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 8): DataFrame = {
    def grams(df: DataFrame, as: String) =
      graft.scaleOut(df)
        .select(col(idCol).as(as),
          explode_outer(graft.functions.Native.shingleSet(col(textCol), n))
            .as("g"))
        .filter(col("g").isNotNull)
    grams(train, "train_id")
      .join(grams(bench, "bench_id"), Seq("g"))
      .groupBy("train_id")
      .agg(countDistinct(col("g")).as("shared_ngrams"),
        countDistinct(col("bench_id")).as("bench_docs_hit"))
  }

  /** Greedy contiguous sequence packing: within each `partCol` group
    * (e.g. language), docs in deterministic `orderCol` order are packed
    * into consecutive training contexts of `budget` units (tokens,
    * chars); a doc belongs to the context its starting offset falls in
    * (docs may straddle context boundaries — the standard contiguous-
    * concatenation packing, not exact bin packing). Emits the packing
    * assignment (part, bin, docs, units).
    *
    * Scale: one partitioned window cumsum — state per task is a single
    * running sum, and the partition key keeps contexts independent
    * across groups. */
  def packContiguous(df: DataFrame, partCol: String, orderCol: String,
                     unitsCol: String, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("_start", coalesce(sum(col(unitsCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("_start") / budget))
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("docs"), sum(col(unitsCol)).as("units"))
  }
}
