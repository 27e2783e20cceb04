package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.TextSignatureKernels

/** ScalaCheck properties over the native kernels (SURVEY.md §5).
  * Pure JVM — the kernels are plain functions over UTF8String/arrays,
  * so properties run without a Spark session. */
object GraftProperties extends Properties("graft.kernels") {

  private val token: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.stringOfN(n, Gen.alphaNumChar))
  private val text: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, token).map(_.mkString(" ")))
  private val vec: Gen[Array[Double]] =
    Gen.chooseNum(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0)).map(_.toArray))

  private def u(s: String) = UTF8String.fromString(s)
  private def arr(v: Array[Double]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(v)

  /** Reference shingle-set implementation: the spec the kernel must
    * match (lowercase, single-space split, distinct, first-occurrence
    * order). */
  private def refShingles(s: String, n: Int): Seq[String] = {
    val toks = s.toLowerCase.split(" ", -1).toSeq
    if (toks.length < n) Seq.empty
    else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
  }

  property("shingleSet matches the reference implementation") =
    forAll(text) { s =>
      val got = TextSignatureKernels.shingleSet(u(s), 3)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      got == refShingles(s, 3)
    }

  property("minhash is deterministic with k lanes, null below width") =
    forAll(text) { s =>
      val a = TextSignatureKernels.minhash(u(s), 3, 32, 42L)
      val b = TextSignatureKernels.minhash(u(s), 3, 32, 42L)
      val nTok = s.split(" ", -1).length
      if (nTok < 3) a == null && b == null
      else a.toLongArray().toSeq == b.toLongArray().toSeq &&
        a.numElements() == 32
    }

  property("appending text only lowers minhash lane minima") =
    forAll(text.suchThat(_.split(" ", -1).length >= 3), token) {
      (s, extra) =>
        val base = TextSignatureKernels.minhash(u(s), 3, 32, 42L)
          .toLongArray()
        val ext = TextSignatureKernels
          .minhash(u(s + " " + extra), 3, 32, 42L).toLongArray()
        base.zip(ext).forall { case (b, e) => e <= b }
    }

  property("simhash of identical text is identical; self-hamming 0") =
    forAll(text) { s =>
      TextSignatureKernels.simhash(u(s), 42L) ==
        TextSignatureKernels.simhash(u(s), 42L)
    }

  property("cosine is within [-1-eps, 1+eps]; self-cosine ≈ 1") =
    forAll(vec) { v =>
      val nonZero = v.exists(_ != 0.0)
      val self = TextSignatureKernels.cosine(arr(v), arr(v))
      if (!nonZero) self == null
      else math.abs(self - 1.0) < 1e-9
    }

  property("cosine is symmetric") =
    forAll(vec, vec) { (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val a = a0.take(n); val b = b0.take(n)
      val ab = TextSignatureKernels.cosine(arr(a), arr(b))
      val ba = TextSignatureKernels.cosine(arr(b), arr(a))
      (ab == null && ba == null) ||
        (ab != null && ba != null && math.abs(ab - ba) < 1e-12)
    }

  property("cosine rejects length mismatch as null") =
    forAll(vec, vec) { (a, b) =>
      a.length == b.length ||
        TextSignatureKernels.cosine(arr(a), arr(b)) == null
    }

  property("hyperplaneBuckets: deterministic, table count honored, " +
    "invariant under positive scaling") =
    // power-of-two scales only: x * 2^k is EXACT in binary floating
    // point (exponent shift), so every partial dot product scales
    // exactly and the sign test is bit-stable. An arbitrary scale can
    // flip the computed sign of a dot product that rounds near zero —
    // a true-but-flaky property (observed ~1/10^2 full runs).
    forAll(vec, Gen.oneOf(0.25, 0.5, 2.0, 4.0, 8.0)) { (v, scale) =>
      def bkts(x: Array[Double]) = TextSignatureKernels
        .hyperplaneBuckets(arr(x), 6, 8, 42L).toLongArray.toSeq
      val b = bkts(v)
      b.length == 8 && b == bkts(v) && b == bkts(v.map(_ * scale))
    }

  property("hyperplaneBuckets: different seeds give different tables " +
    "for non-trivial vectors") =
    forAll(vec.suchThat(v => v.length >= 4 && v.exists(_ != 0.0))) { v =>
      val a = TextSignatureKernels
        .hyperplaneBuckets(arr(v), 16, 4, 42L).toLongArray.toSeq
      val c = TextSignatureKernels
        .hyperplaneBuckets(arr(v), 16, 4, 7L).toLongArray.toSeq
      a != c // 64 independent sign bits colliding across seeds ≈ never
    }

  property("md5Prefix32 equals the hex-substring-radix reference and " +
    "stays in [0, 2^32)") =
    forAll(text) { s =>
      val got = graft.functions.PortableHashKernel.md5Prefix32(u(s))
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val ref = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      got == ref && got >= 0L && got < (1L << 32)
    }
}
