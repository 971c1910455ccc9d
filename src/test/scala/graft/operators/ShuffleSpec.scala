package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ShuffleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle on either side") {
    val orders = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Shuffle.writeBucketed(spark, orders, "orders_b", "o_orderkey", 8)
    Shuffle.writeBucketed(spark, lineitem, "lineitem_b", "o_orderkey", 8)
    // disable broadcast so the join would otherwise shuffle both sides
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("orders_b").join(spark.table("lineitem_b"),
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // and it computes the same thing as the unbucketed join
      val expect = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() == expect)
    }
  }

  test("salted join returns exactly the unsalted join's rows") {
    val orders = Tables(spark, sf, "orders")
      .select("o_custkey", "o_orderkey")
    val customer = Tables(spark, sf, "customer")
      .select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    val salted = Shuffle.saltedJoin(orders, customer, "o_custkey", salts = 7)
    val plain = orders.join(customer, "o_custkey")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the salt actually spreads rows: >1 distinct salt per hot key
    val spread = orders.withColumn("_salt",
        pmod(xxhash64(struct(orders.columns.toIndexedSeq.map(col): _*)), lit(7)))
      .groupBy("o_custkey").agg(countDistinct("_salt").as("n"))
      .agg(max("n")).collect()(0).getLong(0)
    assert(spread > 1, "salt never spread any key")
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
