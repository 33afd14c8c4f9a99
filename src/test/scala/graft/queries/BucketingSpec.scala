package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: pre-bucketing both sides of a recurring join
  * on the join key removes the per-query exchange — THE standard trade for
  * fact-to-fact joins repeated at 100 TB (pay one write-side shuffle, then
  * every subsequent join is exchange-free). Asserted on the physical plan:
  * the bucketed join contains no shuffle. */
class BucketingSpec extends SparkSuite {

  test("bucketed join on the bucket key plans without a shuffle exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val orders = spark.read.parquet(s"${sf("sf0.001")}/orders.parquet")
      val lineitem = spark.read.parquet(s"${sf("sf0.001")}/lineitem.parquet")
      orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
      lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")

      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(round(sum($"l_quantity"), 2).as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // the join inputs are bucket-aligned: no exchange below the join
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"unexpected shuffle on the bucketed key:\n$joinPart")
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"),
        s"unexpected shuffle on the bucketed key:\n$joinPart")
      // and the result matches the unbucketed join
      val expect = orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority").agg(round(sum($"l_quantity"), 2).as("qty"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val got = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(got == expect)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
