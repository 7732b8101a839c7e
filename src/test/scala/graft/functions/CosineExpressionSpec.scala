package graft.functions

import graft.SparkFunSuite
import graft.functions.expressions.CosineSimilarity
import org.apache.spark.sql.functions._

class CosineExpressionSpec extends SparkFunSuite {
  import spark.implicits._

  private def df = Seq(
    (1L, Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
    (2L, Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
    (3L, Seq(0f, 0f, 0f), Seq(1f, 1f, 1f)),
    (4L, Seq(1f, 2f, 3f), Seq(3f, 2f, 1f)))
    .toDF("id", "a", "b")
    .withColumn("a", $"a".cast("array<float>"))
    .withColumn("b", $"b".cast("array<float>"))

  test("native expression matches the JVM reference implementation") {
    val out = df.select($"id",
      CosineSimilarity.cosine_native(spark, $"a", $"b").as("native"),
      Vectors.cosine_sim($"a", $"b").as("viaUdf"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"id=${r.getLong(0)} native=${r.getDouble(1)} udf=${r.getDouble(2)}")
    }
    val m = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(m(1L) - 1.0) < 1e-12)
    assert(m(2L) == 0.0)
    assert(m(3L) == 0.0) // zero-norm convention
  }

  test("null inputs produce null") {
    val withNull = Seq((1L, Some(Seq(1f, 2f)), None: Option[Seq[Float]]))
      .toDF("id", "a", "b")
      .withColumn("a", $"a".cast("array<float>"))
      .withColumn("b", $"b".cast("array<float>"))
    val r = withNull.select(
      CosineSimilarity.cosine_native(spark, $"a", $"b").as("c")).head()
    assert(r.isNullAt(0))
  }

  test("works over a real scan (codegen path) and via SQL") {
    CosineSimilarity.register(spark)
    graft.Tables.embeddings(spark, sfDir).limit(50)
      .createOrReplaceTempView("emb_cos_test")
    val n = spark.sql(
      """SELECT vec_id, cosine_sim_native(embedding, embedding) AS c
        |FROM emb_cos_test""".stripMargin)
      .filter(abs(col("c") - 1.0) < 1e-9).count()
    assert(n == 50)
  }
}
