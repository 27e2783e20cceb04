package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for reproducible corpus
  * construction (SURVEY.md §2.11 pipeline scope).
  *
  * Unlike `rand()`/`df.sample`, the keep/drop decision here is a pure
  * function of (id, salt): task retries, full re-runs, and other
  * engines make the SAME per-row decision — the property a 100 TB
  * corpus build needs to be resumable and auditable (and what makes
  * these queries DuckDB-oracle-checkable at all). The hash is the
  * first 8 hex chars of md5("id|salt"), uniform in [0, 2^32); md5 is
  * slower than xxhash64 but exists with identical output in every
  * engine, which is the point — sampling decisions outlive any one
  * execution engine.
  *
  * Scale: the filter is map-only and codegen'd (md5/conv are native
  * expressions); `balanceStrata` adds one tiny counts aggregate that
  * broadcasts — no shuffle of the data itself.
  */
object Sampling {

  /** Portable per-row hash in [0, 2^32): numeric value of the first 8
    * hex chars of md5("&lt;id&gt;|&lt;salt&gt;"). Oracle mirror:
    * `CAST(('0x' || substr(md5(id || '|salt'), 1, 8)) AS UBIGINT)`.
    * Computed by the NATIVE one-pass expression (functions.Md5Prefix32,
    * codegen'd, thread-local digest) — identical values to the
    * md5→substring→conv chain without its three per-row string
    * allocations; GraftProperties asserts the equivalence. */
  def portableHash(id: Column, salt: String): Column =
    graft.functions.Native.md5Prefix32(
      concat(id.cast("string"), lit("|" + salt)))

  /** Keep ~`frac` of rows, decided per row by the portable hash. */
  def deterministicSample(df: DataFrame, idCol: String, frac: Double,
                          salt: String): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    df.filter(portableHash(col(idCol), salt) <
      lit((frac * 4294967296.0).toLong))
  }

  /** Deterministic k-per-stratum sample — the reproducible "inspect a
    * few docs from every domain" query. Rank within each stratum by
    * (portable hash, id) and keep the first k; the same (salt, k)
    * always returns the same rows. One partitioned window — no global
    * sort, no collect. */
  def sampleKPerStratum(df: DataFrame, stratumCol: String, idCol: String,
                        k: Int, salt: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(portableHash(col(idCol), salt).asc, col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic global shuffle for training-data export: every row
    * gets a portable pseudorandom `shuffle_key` (pure function of (id,
    * salt)) and a `bucket` = key mod `buckets` for output-file
    * assignment. Ordering by (shuffle_key, id) is the reproducible
    * permutation a 100 TB corpus export needs — task retries, re-runs,
    * and other engines produce the identical order, unlike
    * `orderBy(rand())`.
    *
    * Scale: the key is map-only; a downstream `orderBy` executes as a
    * range-partitioned sort (sampled boundaries — no single-partition
    * funnel), and hash-mod buckets are uniform by construction, so
    * `write.partitionBy("bucket")` yields evenly sized shards. */
  def deterministicShuffle(df: DataFrame, idCol: String, salt: String,
                           buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    df.withColumn("shuffle_key", portableHash(col(idCol), salt))
      .withColumn("bucket", col("shuffle_key") % buckets)
  }

  /** Balanced domain mixture: deterministically downsample every
    * stratum (e.g. source/domain) to approximately the smallest
    * stratum's size — the "uniform mixture" corpus build. Keep-rate per
    * stratum = min_n / n, applied via the portable hash so the result
    * is exactly reproducible. Costs one extra scan for the stratum
    * counts; both count frames broadcast (|strata| rows). */
  def balanceStrata(df: DataFrame, stratumCol: String, idCol: String,
                    salt: String): DataFrame = {
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("_n"))
    val minN = counts.agg(min(col("_n")).as("_min_n"))
    df.join(broadcast(counts), Seq(stratumCol))
      .crossJoin(broadcast(minN))
      .filter(portableHash(col(idCol), salt).cast("double") /
        lit(4294967296.0) <
        col("_min_n").cast("double") / col("_n").cast("double"))
      .drop("_n", "_min_n")
  }

  /** Weight-denominated balanced mixture — [[balanceStrata]] with the
    * stratum size measured in an arbitrary per-row UNIT (BPE tokens,
    * chars, bytes) instead of row count: keep-rate per stratum =
    * min_w / w_s over the summed units, so every stratum's EXPECTED
    * surviving units equal the smallest stratum's total. This is the
    * denominator real corpus builds mix in — token budgets, not doc
    * counts (a stratum of long documents is otherwise over-weighted
    * exactly in proportion to its verbosity). Same portable-hash
    * per-row decision: reproducible, resumable, engine-replayable;
    * same cost shape (one unit-sum scan, both stat frames broadcast). */
  def balanceStrataBy(df: DataFrame, stratumCol: String, idCol: String,
                      unitsCol: String, salt: String): DataFrame = {
    val sums = df.groupBy(stratumCol)
      .agg(sum(col(unitsCol)).as("_w"))
    val minW = sums.agg(min(col("_w")).as("_min_w"))
    df.join(broadcast(sums), Seq(stratumCol))
      .crossJoin(broadcast(minW))
      .filter(portableHash(col(idCol), salt).cast("double") /
        lit(4294967296.0) <
        col("_min_w").cast("double") / col("_w").cast("double"))
      .drop("_w", "_min_w")
  }

  /** TEMPERATURE-flattened domain mixture — the published data-mixing
    * rule for multi-domain/multilingual corpora (mT5 / GPT-3 / PaLM:
    * sampling probability ∝ share^α; α < 1 upsamples tail domains,
    * α = 1 is natural, α = 0 is [[balanceStrata]]'s uniform): keep-rate
    *
    *   r_s = min(1, targetFrac · C · (c_s^α / Σ_t c_t^α) / c_s)
    *
    * resamples the corpus to ≈ targetFrac·C rows whose domain shares
    * follow the α-temperature distribution, capped at 1 — no row is
    * ever duplicated (the single-epoch cap). The per-row decision is
    * the portable hash, so the mixture is reproducible, resumable, and
    * engine-replayable. r_s is rounded to 9 dp BEFORE the comparison:
    * Σ c^α is a floating sum whose association order an engine may
    * choose freely, and the rounding pins the keep/drop boundary to a
    * value both engines agree on. Costs one tiny counts aggregate
    * (|strata| rows, broadcast); the filter itself is map-only. */
  /** X7: the MIXTURE PLAN itself — the (stratum, share, rate) table
    * [[temperatureMixture]] applies, surfaced as a first-class result
    * so a data-mixing run can be REVIEWED before it samples (the mT5
    * paper publishes exactly this table). Identical arithmetic to the
    * sampler, including the 9-dp rate rounding that pins the floating
    * Σ c^α across engines; `expected_docs` = rate·n (3 dp) is the
    * audit column — Σ expected ≈ targetFrac·corpus unless the cap at
    * 1 binds on small strata, which this table makes visible. One
    * |strata|-row aggregate; no corpus pass beyond the counts. */
  def mixtureRates(df: DataFrame, stratumCol: String, alpha: Double,
                   targetFrac: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha in [0,1], got $alpha")
    require(targetFrac > 0.0 && targetFrac <= 1.0,
      s"targetFrac in (0,1], got $targetFrac")
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("n_docs"))
    val z = counts.agg(sum(pow(col("n_docs"), alpha)).as("_z"),
      sum(col("n_docs")).as("_c"))
    counts.crossJoin(broadcast(z))
      .withColumn("share", round(col("n_docs") / col("_c"), 9))
      .withColumn("rate", round(least(lit(1.0),
        lit(targetFrac) * col("_c") * pow(col("n_docs"), alpha) /
          col("_z") / col("n_docs")), 9))
      .select(col(stratumCol), col("n_docs"), col("share"), col("rate"),
        round(col("rate") * col("n_docs"), 3).as("expected_docs"))
      .orderBy(col(stratumCol).asc)
  }

  def temperatureMixture(df: DataFrame, stratumCol: String, idCol: String,
                         alpha: Double, targetFrac: Double,
                         salt: String): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha in [0,1], got $alpha")
    require(targetFrac > 0.0 && targetFrac <= 1.0,
      s"targetFrac in (0,1], got $targetFrac")
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("_n"))
    val z = counts.agg(sum(pow(col("_n"), alpha)).as("_z"),
      sum(col("_n")).as("_c"))
    df.join(broadcast(counts), Seq(stratumCol))
      .crossJoin(broadcast(z))
      .withColumn("_r", round(least(lit(1.0),
        lit(targetFrac) * col("_c") * pow(col("_n"), alpha) /
          col("_z") / col("_n")), 9))
      .filter(portableHash(col(idCol), salt).cast("double") /
        lit(4294967296.0) < col("_r"))
      .drop("_n", "_z", "_c", "_r")
  }

  /** X7: deterministic DISJOINT split (train/val/test …) by cumulative
    * hash bands: a row's portable hash in [0, 2^32) falls into exactly
    * one band, whose width is its fraction. Properties a training
    * pipeline needs and rank-based splits lack: map-only (no count, no
    * sort), exactly one label per row, reproducible across engines and
    * retries, and STABLE UNDER GROWTH — adding documents never moves an
    * existing document between splits, so eval sets stay uncontaminated
    * across corpus refreshes. Fractions must sum to 1 (±1e-9); the last
    * band absorbs the rounding tail so every hash value is labeled.
    * Returns the input plus a `split` column. */
  def splitFractions(df: DataFrame, idCol: String, salt: String,
                     fracs: Seq[(String, Double)]): DataFrame = {
    require(fracs.nonEmpty && fracs.forall(_._2 > 0.0),
      "fractions must be positive")
    require(fracs.map(_._1).distinct.size == fracs.size,
      "split names must be unique")
    require(math.abs(fracs.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fracs.map(_._2).sum}")
    val h = portableHash(col(idCol), salt)
    // integer thresholds: cum_i * 2^32 — the same literal an oracle
    // computes, so band membership is engine-exact
    val cuts = fracs.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.min((c * 4294967296.0).toLong, 4294967296L))
    val label = fracs.zip(cuts).reverse.foldLeft(lit(fracs.last._1)) {
      case (acc, ((name, _), cut)) => when(h < cut, name).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** X7: WEIGHTED REPETITION for corpus mixing — "repeat high-quality
    * sources 2.3× per epoch" (the Pile/Dolma epoch-weighting rule) made
    * deterministic: each row is emitted floor(w) times plus one more
    * iff the portable hash says so with probability frac(w), so the
    * expected copy count is exactly the weight and the realized corpus
    * is bit-reproducible. Output rows carry `copy_idx` (0-based) —
    * salt the downstream shuffle with it so copies spread instead of
    * clumping. Map-side sequence explode, expansion = the weight
    * itself; weights are clamped to [0, maxRepeat] and a negative/NaN
    * weight fails loudly rather than silently dropping rows. */
  /** X7: TARGET-SHARE mixture — the full data-mixing rule real
    * recipes specify (DoReMi / Pile / Dolma publish per-domain target
    * SHARES, not just "level to the minimum"): redistribute the
    * corpus's own unit mass T = Σ w_s so stratum s's expected output
    * mass is exactly `target_share_s · T`. The per-stratum weight
    *
    *   target_weight_s = T · t_s / w_s     (9-dp rounded, clamped to
    *                                        [0, maxRepeat])
    *
    * is > 1 on under-share strata (UPSAMPLE via deterministic
    * repetition — [[repeatWeighted]]'s floor+hash copies, q238's rule)
    * and < 1 on over-share strata (DOWNSAMPLE — the same rule's
    * Bernoulli branch, q226's keep-rate shape): one operator covers
    * both directions, so Σ over strata of E[output units] = T
    * whenever no clamp binds. `targets` is a (stratumCol,
    * target_share) frame; shares must be non-negative and sum to 1
    * (±1e-9). A stratum absent from `targets` gets share 0 and is
    * dropped — the recipe IS the contract; a target naming an absent
    * stratum contributes nothing (its mass has no rows to carry it)
    * and the plan table a caller prints from the same arithmetic
    * makes that visible. Output rows carry `target_weight` and
    * `copy_idx`. Engine-replayable end to end: exact integer unit
    * sums, one floating product rounded at 9 dp before the floor/frac
    * split, portable-hash realization.
    *
    * Scale shape: one unit-sum aggregate (|strata| rows), both stat
    * frames broadcast, then [[repeatWeighted]]'s map-side explode —
    * no new shuffle. */
  def mixToShares(df: DataFrame, stratumCol: String, idCol: String,
                  unitsCol: String, targets: DataFrame, salt: String,
                  maxRepeat: Int = 100): DataFrame = {
    val weights = shareWeights(df, stratumCol, unitsCol, targets,
      maxRepeat)
    repeatWeighted(
      df.join(broadcast(weights.drop("target_share")), Seq(stratumCol)),
      idCol, "target_weight", salt, maxRepeat)
  }

  /** The (stratum, target_share, target_weight) PLAN frame
    * [[mixToShares]] applies — exposed so callers can print/review it
    * and report strata whose docs all realize zero copies (the q238
    * total-contract lesson: roll up FROM the weight frame, never just
    * from realized rows). */
  def shareWeights(df: DataFrame, stratumCol: String, unitsCol: String,
                   targets: DataFrame,
                   maxRepeat: Int = 100): DataFrame = {
    require(targets.columns.contains(stratumCol) &&
      targets.columns.contains("target_share"),
      s"targets must carry ($stratumCol, target_share)")
    // tiny frame — |targets| rows by contract; one bounded aggregate
    val chk = targets.agg(
      sum(col("target_share")).as("s"),
      min(col("target_share")).as("mn"),
      count(lit(1)).as("n"),
      countDistinct(col(stratumCol)).as("d"),
      count(col(stratumCol)).as("nns"),
      count(col("target_share")).as("nnt")).head()
    // nullity/emptiness first: an empty frame would NPE the getDouble
    // reads below, and a NULL stratum would otherwise surface as the
    // misleading "duplicate" error (countDistinct skips nulls)
    require(chk.getLong(2) > 0, "targets frame is empty")
    require(chk.getLong(4) == chk.getLong(2),
      "target strata must be non-null")
    require(chk.getLong(5) == chk.getLong(2),
      "target shares must be non-null")
    require(chk.getLong(2) == chk.getLong(3), "duplicate target strata")
    require(chk.getDouble(1) >= 0.0, "target shares must be >= 0")
    require(math.abs(chk.getDouble(0) - 1.0) < 1e-9,
      s"target shares must sum to 1, got ${chk.getDouble(0)}")
    val w = df.groupBy(stratumCol).agg(sum(col(unitsCol)).as("_w"))
    val tot = w.agg(sum(col("_w")).as("_t"))
    w.join(broadcast(targets), Seq(stratumCol))
      .crossJoin(broadcast(tot))
      .select(col(stratumCol), col("target_share"),
        greatest(lit(0.0), least(
          round(col("_t") * col("target_share") / col("_w"), 9),
          lit(maxRepeat.toDouble))).as("target_weight"))
  }

  def repeatWeighted(df: DataFrame, idCol: String, weightCol: String,
                     salt: String, maxRepeat: Int = 100): DataFrame = {
    require(maxRepeat >= 1, s"maxRepeat must be >= 1, got $maxRepeat")
    val w = col(weightCol).cast("double")
    val guard = when(w.isNull || w =!= w || w < 0.0 || w > maxRepeat,
      raise_error(concat(lit(s"repeatWeighted: weight out of [0, " +
        s"$maxRepeat] for $idCol="), col(idCol).cast("string"))))
      .otherwise(w)
    val extra = (portableHash(col(idCol), salt).cast("double") /
      lit(4294967296.0) < (w - floor(w))).cast("long")
    df.withColumn("_copies", floor(guard).cast("long") + extra)
      .filter(col("_copies") > 0)
      .withColumn("copy_idx",
        explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_copies")
  }
}
