package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The property that makes z-order worth a write: every partition's
  * bounding box is small in BOTH dimensions, so parquet min/max stats
  * prune scans filtered on either column. A single-column sort gives one
  * tight dimension and one spanning the full domain — asserted here as
  * the contrast case. */
class LayoutSpec extends SparkSuite {

  test("zorder bounds per-partition extents in BOTH dims; x-sort leaves y unbounded") {
    import spark.implicits._
    // 32×32 grid (1024 points), scrambled into 8 input partitions
    val grid = for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong)
    val df = new scala.util.Random(7).shuffle(grid).toDF("x", "y").repartition(8)

    val z = Layout.zorder(df, col("x"), col("y"), 16)
    val extents = z.withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("xe"), (max("y") - min("y")).as("ye"),
        count(lit(1)).as("n"))
      .collect()
    assert(extents.map(_.getAs[Long]("n")).sum == 1024L)
    for (r <- extents) {
      // a z-interval of ~64 consecutive codes stays within a 16×16 quad
      // even when the sampled range boundaries land off the block edges
      assert(r.getAs[Long]("xe") <= 23, s"x extent too wide: $r")
      assert(r.getAs[Long]("ye") <= 23, s"y extent too wide: $r")
    }

    // contrast: the same data range-partitioned by x alone — y spans the
    // full domain in every partition (no pruning on y possible)
    val xsorted = df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
    val yext = xsorted.withColumn("pid", spark_partition_id())
      .groupBy("pid").agg((max("y") - min("y")).as("ye")).collect()
    assert(yext.forall(_.getAs[Long]("ye") == 31L),
      "x-sorted layout unexpectedly bounded y — contrast case broken")

    // pure re-layout: the multiset of rows is untouched
    assert(z.orderBy("x", "y").collect().toSeq
      == df.orderBy("x", "y").collect().toSeq)
  }
}
