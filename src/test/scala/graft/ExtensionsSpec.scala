package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.5f, -2.0f, 3.25f), Array(0.5f, 4.0f, -1.0f)),
    (1L, Array(0.1f, 0.2f, 0.3f), Array(0.4f, 0.5f, 0.6f))
  ).toDF("id", "a", "b")

  test("vector_dot SQL function is registered and exact") {
    val got = vecs.select(expr("vector_dot(a, b)").as("d")).as[Double].collect()
    val want0 = 1.5f.toDouble * 0.5f + (-2.0f).toDouble * 4.0f + 3.25f.toDouble * (-1.0f)
    assert(got(0) === want0)
  }

  test("RewriteDotProduct replaces the HOF dot with the native expression, bit-identically") {
    // plan assertion needs a non-local source: over a local Seq the whole
    // projection constant-folds into a LocalRelation before we can look
    val ranged = spark.range(4).select(col("id"),
      array((0 until 8).map(i => (col("id") + i).cast("float")): _*).as("a"),
      array((0 until 8).map(i => (col("id") * 2 + i).cast("float")): _*).as("b"))
    val hof = ranged.select(col("id"), Similarity.dot("a", "b").as("d"))
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vector_dot"), s"rule did not fire:\n$optimized")
    val native = ranged.select(col("id"), expr("vector_dot(a, b)").as("d"))
      .as[(Long, Double)].collect().toMap
    assert(hof.as[(Long, Double)].collect().toMap === native)
    // and on the local frame, values agree between HOF and native paths
    val localHof = vecs.select(col("id"), Similarity.dot("a", "b").as("d"))
      .as[(Long, Double)].collect().toMap
    val localNative = vecs.select(col("id"), expr("vector_dot(a, b)").as("d"))
      .as[(Long, Double)].collect().toMap
    assert(localHof === localNative)
  }

  test("kNN through the rewrite matches the hand path end-to-end") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(
      e.filter(col("vec_id") === 0), e, "vec_id", "embedding", k = 2)
    assert(out.queryExecution.optimizedPlan.toString.contains("vector_dot"))
    val top = out.orderBy("rank").as[(Long, Int, Long, Double)].collect()
    assert(top(0)._3 === 1L && top(0)._4 === 1.0)
  }
}
