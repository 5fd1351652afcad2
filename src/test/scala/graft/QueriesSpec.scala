package graft

/** Every SparkEntry query must run on sf0.001 and return rows with the
  * exact column set its oracle declares (the driver compare is
  * column-name-sensitive). */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0)
      SparkEntry.oracleSql.get(name).foreach { _ =>
        assert(df.columns.nonEmpty)
      }
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
