package graft

import org.apache.spark.sql.functions._

import graft.functions.FloatVector
import graft.similarity.Similarity

/** FloatDot expression semantics: value correctness (interpreted AND
  * codegen paths), null handling, ragged arrays, and SQL registration. */
class FloatVectorSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (2L, Array(0.5f, -0.5f), Array(2f, 2f)),
      (3L, null.asInstanceOf[Array[Float]], Array(1f)),
      (4L, Array(1f, 1f, 1f), Array(1f))) // ragged: min-length semantics
      .toDF("id", "a", "b")
  }

  test("dot product matches hand computation; nulls → null; ragged → min length") {
    import spark.implicits._
    val got = df.select(col("id"), FloatVector.dotF(col("a"), col("b")).as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L) === Some(32.0))
    assert(got(2L) === Some(0.0))
    assert(got(3L) === None)
    assert(got(4L) === Some(1.0))
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    import graft.functions.FloatDot
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val e = FloatDot(Literal.create(Array(1f, 2f, 3f), ArrayType(FloatType)),
      Literal.create(Array(4f, 5f, 6f), ArrayType(FloatType)))
    assert(e.eval(null) === 32.0)
  }

  test("null ELEMENTS contribute 0 (DuckDB list_sum semantics); null arrays propagate") {
    FloatVector.registerSql(spark)
    val got = spark.sql(
      "SELECT float_dot(array(CAST(1 AS FLOAT), NULL, CAST(3 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(1 AS FLOAT), CAST(1 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(got === 4.0)
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    import spark.implicits._
    val v = Seq((Array(3f, 4f), Array(3f, 4f), Array(-4f, 3f)))
      .toDF("a", "same", "orth")
    val r = v.select(
      round(Similarity.cosine(col("a"), col("same")), 9).as("c1"),
      round(Similarity.cosine(col("a"), col("orth")), 9).as("c2"))
      .as[(Double, Double)].head()
    assert(r === ((1.0, 0.0)))
  }

  test("float_dot is callable from SQL after registration (EP2 parity)") {
    FloatVector.registerSql(spark)
    df.createOrReplaceTempView("fv_spec")
    val got = spark.sql(
      "SELECT id, float_dot(a, b) AS d FROM fv_spec WHERE id = 1")
      .head().getDouble(1)
    assert(got === 32.0)
  }

  test("type mismatch is rejected at analysis") {
    import spark.implicits._
    val bad = Seq((Array(1.0, 2.0), Array(1f))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(FloatVector.dotF(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>") ||
      e.getMessage.contains("FLOAT_DOT") || e.getMessage.contains("float_dot"))
  }
}
