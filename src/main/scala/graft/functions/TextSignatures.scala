package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-signature hot path
  * (SURVEY.md §2.11 X2) — the preference-order (b) case: a custom
  * `Expression` with real `doGenCode`, not a UDF.
  *
  * Why native: the declarative formulation (explode shingles → 64 min
  * aggregates) pays one full shuffle of the exploded corpus plus
  * interpreted higher-order lambdas. These expressions compute the
  * whole signature in ONE pass over the string, inside whole-stage
  * codegen, with zero shuffle — per-row, embarrassingly parallel, the
  * shape that survives 100 TB.
  *
  * Hashing scheme: token bytes are hashed once with XXH64 (the same
  * avalanche family Spark's `xxhash64` uses); a shingle hash folds its
  * n token hashes; the k MinHash lanes re-hash the shingle hash with
  * lane-indexed seeds. Shingle dedup happens on the 64-bit shingle hash
  * (collision probability ~n²/2⁶⁴ — irrelevant for signatures).
  */
object TextSignatureKernels {

  /** `\s+` tokenization of a UTF8String — the registry-wide
    * convention, byte-scanned: ASCII whitespace bytes can never occur
    * inside a UTF-8 multibyte sequence, so the scan is correct on any
    * input, and each token is a zero-copy address VIEW into the source
    * buffer (consumers hash bytes or concat-copy; nothing escapes the
    * row). Semantics are exactly `java.util.regex` split with limit -1
    * AND DuckDB's `regexp_split_to_array(s, '\s+')`: an interior run
    * collapses to one boundary, a leading run yields one empty leading
    * token, a trailing run one empty trailing token, and the empty
    * string yields a single empty token — so the kernels stay
    * byte-identical to the declarative `split(lower(text), "\s+")`
    * mirrors on ANY text, not just single-spaced corpora. */
  def wsTokens(text: UTF8String): Array[UTF8String] = {
    val n = text.numBytes
    val base = text.getBaseObject
    val off = text.getBaseOffset
    def isWs(i: Int): Boolean = {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      b == 0x20 || (b >= 0x09 && b <= 0x0D)
    }
    val out = new java.util.ArrayList[UTF8String](8)
    var i = 0
    var start = 0
    while (i < n) {
      if (isWs(i)) {
        out.add(UTF8String.fromAddress(base, off + start, i - start))
        i += 1
        while (i < n && isWs(i)) i += 1 // swallow the run
        start = i
      } else i += 1
    }
    out.add(UTF8String.fromAddress(base, off + start, n - start))
    out.toArray(new Array[UTF8String](out.size))
  }

  /** One-pass MinHash signature over lowercased whitespace tokens.
    * Returns null when the text has fewer than `shingleN` tokens (such
    * docs cannot be near-dup candidates), mirroring the dropped-row
    * semantics of the aggregate formulation. */
  def minhash(text: UTF8String, shingleN: Int, numHashes: Int,
              seed: Long): ArrayData = {
    val toks = wsTokens(text.toLowerCase)
    val m = toks.length
    if (m < shingleN) return null
    // per-token base hashes, one bytes-pass each
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val t = toks(i)
      th(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
        t.numBytes, seed)
      i += 1
    }
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    i = 0
    while (i <= m - shingleN) {
      var h = seed
      var j = 0
      while (j < shingleN) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      if (seen.add(h)) {
        var k = 0
        while (k < numHashes) {
          val lane = XXH64.hashLong(h, k)
          if (lane < sig(k)) sig(k) = lane
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** MinHash band keys, fused: signature + LSH banding in one pass.
    * Returns `bands` hashes, each folding its `numHashes/bands` lane
    * minima. Fused because a separate bands-from-signature projection
    * gets collapsed by Catalyst into the banding lambda, re-running the
    * signature kernel once per band. Null when the text is too short. */
  def minhashBandKeys(text: UTF8String, shingleN: Int, numHashes: Int,
                      bands: Int, seed: Long): ArrayData = {
    val sig = minhash(text, shingleN, numHashes, seed)
    if (sig == null) return null
    val lanes = sig.asInstanceOf[GenericArrayData]
    val rowsPerBand = numHashes / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong
      var r = 0
      while (r < rowsPerBand) {
        h = XXH64.hashLong(lanes.getLong(b * rowsPerBand + r), h)
        r += 1
      }
      keys(b) = h
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** Distinct word shingles (lowercased, whitespace tokens), first
    * occurrence order — byte-identical to
    * `Text.shingleSetOfTokens(split(lower(text),"\s+"), n)` but one
    * codegen'd pass. Empty array (not null) below the shingle width. */
  def shingleSet(text: UTF8String, n: Int): ArrayData = {
    val toks = wsTokens(text.toLowerCase)
    val m = toks.length
    if (m < n) return new GenericArrayData(new Array[AnyRef](0))
    val sep = UTF8String.fromString(" ")
    val out = new java.util.LinkedHashSet[UTF8String](m * 2)
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks(i + j); j += 1 }
      out.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Cosine similarity over two double arrays — the same arithmetic
    * SEQUENCE as the HOF formulation in `Vectors` (left-to-right folds
    * for dot and both norms, then dot/(sqrt·sqrt)), so results are
    * bit-identical to the DuckDB oracle mirrors. Null on zero norms
    * (NaN would outrank everything in a desc sort) or length mismatch. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0) dot / denom else null
  }

  /** One-pass OR-amplified hyperplane LSH over an `array<double>`:
    * `nTables` bucket ids of `nPlanes` sign bits each. Weights are ±1
    * from XXH64 of the (seed → table → plane → dim) chain — planes are
    * derived, never materialized or broadcast. Replaces nTables ×
    * nPlanes interpreted higher-order-function projections with one
    * codegen'd pass. */
  def hyperplaneBuckets(v: ArrayData, nPlanes: Int, nTables: Int,
                        seed: Long): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      val tSeed = XXH64.hashLong(t, seed)
      var bucket = 0L
      var j = 0
      while (j < nPlanes) {
        val pSeed = XXH64.hashLong(j, tSeed)
        var acc = 0.0
        var i = 0
        while (i < n) {
          val x = v.getDouble(i)
          acc += (if ((XXH64.hashLong(i, pSeed) & 1L) == 0L) x else -x)
          i += 1
        }
        if (acc >= 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass 64-bit SimHash: each distinct-position token votes ±1 on
    * every bit of its hash; the tally signs become the fingerprint. */
  def simhash(text: UTF8String, seed: Long): Long = {
    val toks = TextSignatureKernels.wsTokens(text.toLowerCase)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
        t.numBytes, seed)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
}

/** Kernel for the engine-portable per-row hash (Sampling discipline):
  * unsigned big-endian value of the first 4 bytes of md5(utf8) —
  * numerically identical to
  * `CAST(('0x' || substr(md5(s), 1, 8)) AS UBIGINT)` in DuckDB and the
  * md5→substring→conv functions-API chain. One digest pass with a
  * thread-local MessageDigest; no hex-string / substring / radix-parse
  * allocations per row (three per row in the declarative chain). */
object PortableHashKernel {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def md5Prefix32(s: UTF8String): Long = {
    val md = md5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }
}

/** Kernel for the rolling token fingerprint (X4): byte-identical to the
  * declarative `Text.tokenFingerprint` fold — per token
  * `ascii(first char)·31 + length(chars)`, folded
  * `acc·1000003 + x (mod 1e9+7)` from acc = 0 — but one codegen'd pass
  * instead of an interpreted higher-order `aggregate` lambda. */
object FingerprintKernel {
  def tokenFingerprint(text: UTF8String): Long = {
    val toks = TextSignatureKernels.wsTokens(text.toLowerCase)
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val s = t.toString
      val first = if (s.isEmpty) 0L else s.codePointAt(0).toLong
      acc = (acc * 1000003L + (first * 31L + t.numChars())) % 1000000007L
      i += 1
    }
    acc
  }
}

/** `token_fingerprint(text)` → long rolling fingerprint. */
case class TokenFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "token_fingerprint"

  override def nullSafeEval(input: Any): Any =
    FingerprintKernel.tokenFingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FingerprintKernel.tokenFingerprint($c)")

  override protected def withNewChildInternal(
      newChild: Expression): TokenFingerprint = copy(child = newChild)
}

/** `portable_hash(text)` → long in [0, 2^32): the md5-prefix hash every
  * deterministic-sampling operator keys on. */
case class Md5Prefix32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "portable_hash"

  override def nullSafeEval(input: Any): Any =
    PortableHashKernel.md5Prefix32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableHashKernel.md5Prefix32($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Prefix32 = copy(child = newChild)
}

/** `minhash_signature(text)` → array<long> of k lane minima;
  * null for texts shorter than the shingle width. */
case class MinHashSignature(child: Expression, shingleN: Int,
                            numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    TextSignatureKernels.minhash(input.asInstanceOf[UTF8String],
      shingleN, numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.TextSignatureKernels.minhash(
         |  $c, $shingleN, $numHashes, ${seed}L);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

/** `minhash_bands(text)` → array<long> of LSH band keys; null below
  * the shingle width. */
case class MinHashBands(child: Expression, shingleN: Int, numHashes: Int,
                        bands: Int, seed: Long)
    extends UnaryExpression {
  // reachable from SQL (`minhash_bands(text, n, k, b)`): a non-dividing
  // or non-positive band count would silently drop trailing signature
  // lanes (or degenerate every band key), quietly killing LSH recall
  require(shingleN > 0 && numHashes > 0,
    s"shingleN and numHashes must be positive, got $shingleN/$numHashes")
  require(bands > 0 && numHashes % bands == 0,
    s"bands must be positive and divide numHashes, got bands=$bands " +
      s"numHashes=$numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any =
    TextSignatureKernels.minhashBandKeys(input.asInstanceOf[UTF8String],
      shingleN, numHashes, bands, seed)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.TextSignatureKernels.minhashBandKeys(
         |  $c, $shingleN, $numHashes, $bands, ${seed}L);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashBands = copy(child = newChild)
}

/** `shingle_set(text, n)` → array<string> of distinct word n-grams. */
case class ShingleSet(child: Expression, shingleN: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override def nullSafeEval(input: Any): Any =
    TextSignatureKernels.shingleSet(input.asInstanceOf[UTF8String], shingleN)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextSignatureKernels.shingleSet($c, $shingleN)")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleSet = copy(child = newChild)
}

/** `cosine_sim(a, b)` over `array<double>` columns — codegen'd, null
  * on zero norms or length mismatch. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextSignatureKernels.cosine(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cosTmp")
      s"""
         |java.lang.Double $tmp =
         |  graft.functions.TextSignatureKernels.cosine($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `simhash64(text)` → 64-bit SimHash fingerprint. */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    TextSignatureKernels.simhash(input.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextSignatureKernels.simhash($c, ${seed}L)")

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

/** `hyperplane_buckets(vec)` → `array<long>`: nTables OR-amplified LSH
  * bucket ids (nPlanes sign bits each) in one codegen'd pass (see
  * TextSignatureKernels.hyperplaneBuckets). */
case class HyperplaneBuckets(child: Expression, nPlanes: Int,
                             nTables: Int, seed: Long)
    extends UnaryExpression {
  require(nPlanes > 0 && nPlanes <= 62, "nPlanes must be in [1,62]")
  require(nTables > 0 && nTables <= 64, "nTables must be in [1,64]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override def nullSafeEval(input: Any): Any =
    TextSignatureKernels.hyperplaneBuckets(input.asInstanceOf[ArrayData],
      nPlanes, nTables, seed)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextSignatureKernels.hyperplaneBuckets(" +
        s"$c, $nPlanes, $nTables, ${seed}L)")

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBuckets = copy(child = newChild)
}

/** Column-API entry points for the native signature expressions. */
object Native {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def minhashSignature(text: Column, shingleN: Int = 3,
                       numHashes: Int = 64, seed: Long = 42L): Column =
    column(MinHashSignature(expression(text), shingleN, numHashes, seed))

  def minhashBands(text: Column, shingleN: Int = 3, numHashes: Int = 64,
                   bands: Int = 16, seed: Long = 42L): Column =
    column(MinHashBands(expression(text), shingleN, numHashes, bands, seed))

  def shingleSet(text: Column, shingleN: Int = 3): Column =
    column(ShingleSet(expression(text), shingleN))

  def simhash64(text: Column, seed: Long = 42L): Column =
    column(SimHash64(expression(text), seed))

  def md5Prefix32(text: Column): Column =
    column(Md5Prefix32(expression(text)))

  def tokenFingerprint(text: Column): Column =
    column(TokenFingerprint(expression(text)))

  def cosineSim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))

  def hyperplaneBuckets(vec: Column, nPlanes: Int, nTables: Int,
                        seed: Long = 42L): Column =
    column(HyperplaneBuckets(expression(vec), nPlanes, nTables, seed))

  /** Probe a materialized Bloom filter (built with the SQL
    * `bloom_filter_agg` this library registers). The filter binary is
    * inlined as a constant — the same shape Spark's runtime filters
    * use — and the probe key is XXH64-hashed exactly like the build
    * side. */
  def mightContain(bloom: Array[Byte], v: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    column(BloomFilterMightContain(
      Literal(bloom, org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(expression(v)))))
  }
}
