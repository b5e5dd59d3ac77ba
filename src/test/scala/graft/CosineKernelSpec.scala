package graft

import org.apache.spark.sql.functions._

/** Round-18 kernel rewires behind embedding_dedup must be BIT-IDENTICAL
  * to the fused cosine_sim they replace:
  *  - float inputs: widening each element inside the fold is exact
  *    (IEEE float→double), so cosine_sim(array<float>, array<float>)
  *    ≡ cosine_sim on the pre-cast double arrays;
  *  - prenorm split: graft_cosine_pre(a, b, vnorm2(a), vnorm2(b))
  *    ≡ cosine_sim(a, b) for equal-length vectors, because the fused
  *    loop's dot/na/nb accumulators never interact inside the loop and
  *    vnorm2 uses the same left-to-right double fold.
  * Asserted on the real embeddings fixture (every vector, both
  * operand orders via the tiled pair join) and on adversarial values
  * (denormals, huge/tiny magnitudes, negatives) where a reordered or
  * pre-rounded fold would drift.
  */
class CosineKernelSpec extends SparkSuite {

  private val sf01 = "/root/testdata/sf0.01"

  test("cosine_sim on float arrays ≡ on pre-cast double arrays (fixture)") {
    GraftExtensions.register(spark)
    val e = graft.sources.Tables.embeddings(spark, sf01)
      .select(col("vec_id"), col("embedding"),
        transform(col("embedding"), _.cast("double")).as("vd"))
    val diff = e.select(
      call_function("cosine_sim", col("embedding"), col("embedding")).as("f"),
      call_function("cosine_sim", col("vd"), col("vd")).as("d"))
      .filter(not(col("f") === col("d")))
    assert(diff.count() == 0)
  }

  test("graft_cosine_pre + graft_vnorm2 ≡ cosine_sim on all fixture pairs") {
    GraftExtensions.register(spark)
    val e = graft.sources.Tables.embeddings(spark, sf01)
      .select(col("vec_id"), col("embedding").as("v"),
        call_function("graft_vnorm2", col("embedding")).as("n2"))
    // full small-fixture cross join (both operand orders): the widest
    // possible probe of fold-order equivalence on real float data
    val pairs = e.alias("a").join(e.alias("b"),
      col("a.vec_id") % 7 === col("b.vec_id") % 7)
    val diff = pairs.select(
      call_function("cosine_sim", col("a.v"), col("b.v")).as("fused"),
      call_function("graft_cosine_pre", col("a.v"), col("b.v"),
        col("a.n2"), col("b.n2")).as("pre"))
      // bit-level compare: double === double is value equality; also
      // require both non-null so a null/null row can't hide a drift
      .filter(not(col("fused") === col("pre")) ||
        col("fused").isNull =!= col("pre").isNull)
    assert(diff.count() == 0)
  }

  test("prenorm split is exact on adversarial magnitudes") {
    GraftExtensions.register(spark)
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      Seq(1e-30f, -2.5f, 3.4e38f, 1.1754944e-38f),
      Seq(-1f, 1f, -1f, 1f),
      Seq(0f, 0f, 0f, 0f), // zero norm → NaN in both forms
      Seq(1.0000001f, 0.9999999f, -7.77f, 42.0f),
      Seq(5.9604645e-8f, -5.9604645e-8f, 1f, -1f)
    ).map(v => org.apache.spark.sql.Row(v))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false))))
    val df = spark.createDataFrame(rows.asJava, schema)
      .withColumn("n2", call_function("graft_vnorm2", col("v")))
    val vals = df.alias("a").crossJoin(df.alias("b"))
      .select(
        call_function("cosine_sim", col("a.v"), col("b.v")).as("fused"),
        call_function("graft_cosine_pre", col("a.v"), col("b.v"),
          col("a.n2"), col("b.n2")).as("pre"))
      .collect()
    vals.foreach { r =>
      val f = r.getDouble(0)
      val p = r.getDouble(1)
      assert(java.lang.Double.doubleToRawLongBits(f) ==
        java.lang.Double.doubleToRawLongBits(p),
        s"fused=$f pre=$p")
    }
  }
}
