package graft.tools

/** Dev scratch: quick environment checks (ns timestamps, plans). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("4")
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    ev.printSchema()
    ev.show(3, false)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.selectExpr("min(l_shipdate)", "max(l_shipdate)").show(false)
    val or = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    or.selectExpr("min(o_orderdate)", "max(o_orderdate)").show(false)
    ev.selectExpr("min(ts)", "max(ts)").show(false)
    spark.stop()
  }
}
