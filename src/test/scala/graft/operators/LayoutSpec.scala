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
    // The z-order bound is statistical (see Layout scaladoc): a partition
    // whose z-interval avoids the three 16×16-superblock boundaries stays
    // inside one superblock (extent ≤ 15); only the ≤3 boundary-crossing
    // partitions may span wider. Assert that shape, not a universal bound.
    val tight = extents.count(r =>
      r.getAs[Long]("xe") <= 15 && r.getAs[Long]("ye") <= 15)
    assert(tight >= 13, s"expected ≥13/16 partitions inside one 16×16 block, got $tight:\n" +
      extents.mkString("\n"))

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
