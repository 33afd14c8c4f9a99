package graft.operators

import graft.SparkSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Proves the bucketed-layout claim on the physical plan: a join of two
  * tables bucketed on their join keys runs with ZERO Exchange, while the
  * identical join over plain parquet shuffles both sides. */
class BucketingSpec extends SparkSuite {

  private def finalPlan(df: DataFrame): String = {
    df.collect() // force AQE to finalize before rendering
    df.queryExecution.executedPlan.toString
  }

  test("bucketed join has no Exchange; plain-parquet join does") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val cust = spark.read.parquet(s"$dir/customer.parquet").select($"c_custkey", $"c_mktsegment")
    val ord = spark.read.parquet(s"$dir/orders.parquet").select($"o_custkey", $"o_totalprice")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed_spec"
    Bucketing.writeBucketed(spark, cust, "spec_bkt_customer", s"$base/customer", 4, "c_custkey")
    Bucketing.writeBucketed(spark, ord, "spec_bkt_orders", s"$base/orders", 4, "o_custkey")

    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val colo = Bucketing.colocatedJoin(spark,
        "spec_bkt_customer", "spec_bkt_orders", "c_custkey", "o_custkey")
      val coloPlan = finalPlan(colo)
      assert(!coloPlan.contains("Exchange"), s"expected shuffle-free plan:\n$coloPlan")

      val plain = cust.join(ord, $"c_custkey" === $"o_custkey")
      val plainPlan = finalPlan(plain)
      assert(plainPlan.contains("Exchange"),
        s"baseline should shuffle (or the assert above is vacuous):\n$plainPlan")

      // same result either way — layout is an execution detail
      assert(colo.count() == plain.count() && colo.count() > 0)
      assert(colo.except(plain).isEmpty && plain.except(colo).isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("re-writing a bucketed table replaces catalog entry and data") {
    import spark.implicits._
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed_spec"
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Bucketing.writeBucketed(spark, df1, "spec_bkt_rewrite", s"$base/rewrite", 2, "k")
    val df2 = Seq((3L, "c")).toDF("k", "v")
    Bucketing.writeBucketed(spark, df2, "spec_bkt_rewrite", s"$base/rewrite", 2, "k")
    val got = spark.table("spec_bkt_rewrite").collect()
    assert(got.length == 1 && got.head.getLong(0) == 3L)
  }
}
