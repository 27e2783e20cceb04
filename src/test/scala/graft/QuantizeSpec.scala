package graft

import org.apache.spark.sql.functions._

import graft.functions.{Quantize, Vectors}

class QuantizeSpec extends SparkSpec {

  import spark.implicits._

  test("int8 quantization bounds, reconstruction error, cosine drift") {
    val emb = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.125f)),
      (2L, Array(100.0f, -50.0f, 25.0f, 12.5f)),
      (3L, Array(1e-8f, 0.0f, 0.0f, 0.0f))) // tiny values, scale floor
      .toDF("id", "embedding")
    val q = Quantize.quantized(emb, "embedding")
    val rows = q.select(col("id"), col("q_scale"), col("q_vec")).collect()
    rows.foreach { r =>
      val qs = r.getSeq[Int](r.fieldIndex("q_vec"))
      assert(qs.forall(x => x >= -127 && x <= 127), r.toString)
    }
    // reconstruction error bounded by scale/2 per element
    val errOk = q.select(
      zip_with(Vectors.toDouble(col("embedding")),
        Quantize.dequantizeWith(col("q_vec"), col("q_scale")),
        (x, y) => abs(x - y) <= col("q_scale") * 0.5 + lit(1e-12))
        .as("oks"))
      .select(forall(col("oks"), identity)).as[Boolean].collect()
    assert(errOk.forall(identity))
    // cosine on dequantized vectors stays close to exact for real vectors
    val drift = q.filter(col("id") =!= 3L)
      .select(Vectors.cosine(
        Vectors.toDouble(col("embedding")),
        Quantize.dequantizeWith(col("q_vec"), col("q_scale"))))
      .as[Double].collect()
    assert(drift.forall(c => c > 0.999), drift.mkString(","))
  }
}
