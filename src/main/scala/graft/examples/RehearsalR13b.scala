package graft.examples

import graft.lake.{HadoopStore, LakeMaintenance, LakeReader}
import graft.types.{ColType, TableSchema}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 measured evidence, part b: the two write-side features at a
  * size where the claims are visible.
  *
  *  1. Z-ORDER WRITE CLUSTERING: a 256×256 grid written as 64 objects
  *     under `clusterBy=zorder(x,y)` vs `clusterBy=x`. The lexicographic
  *     layout cannot prune a y-only filter (every object spans all of
  *     y); the Morton layout prunes BOTH single-column filters to ~1/8
  *     of the objects — the √N box property, read off the actual
  *     planned-object counts.
  *  2. DELETE_WHERE: one user's rows deleted from a 48-object lake where
  *     the user lives in 2 objects. The probe bounds the rewrite: 46
  *     objects are never opened, and the deleted bytes are ~2 objects'
  *     worth, not the lake's. */
object RehearsalR13b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("rehearse-r13b").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations ++ Seq(
        org.apache.spark.sql.graft.StreamLakePrune,
        org.apache.spark.sql.graft.ZOrderWriteLayout)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- 1. z-order vs lexicographic write clustering
    val zschema = TableSchema("zt", Seq(
      "x" -> ColType.CInteger, "y" -> ColType.CInteger))
    val grid = (for (x <- 0 until 256; y <- 0 until 256)
      yield (x.toLong, y.toLong)).toDF("x", "y").repartition(16)
      .withColumn("_event_hour", lit(java.sql.Timestamp.from(
        java.time.Instant.parse("2024-03-01T12:00:00Z"))))
    def build(cluster: String): String = {
      val root = s"file:///tmp/graft-rehearse-r13b-${cluster.hashCode.abs}"
      new HadoopStore(root).deletePrefix("")
      graft.lake.LakeWriter.write(
        Seq((1000000L, 1000000L)).toDF("x", "y"), zschema, root,
        java.time.Instant.parse("2024-03-01T00:00:00Z"), zoneMaps = true)
      grid.write.format("graft-lake").option("table", "zt")
        .option("flushTime", "2024-03-01T12:00:00Z")
        .option("zoneMaps", "true")
        .option("clusterBy", cluster).option("writePartitions", "64")
        .mode("append").save(root)
      root
    }
    def planned(root: String, cond: org.apache.spark.sql.Column): Int = {
      val df = spark.read.format("graft-lake").option("table", "zt")
        .load(root).where(cond)
      df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan
      }.get.asInstanceOf[graft.lake.LakeScan]
        .plannedKeys.count(_.startsWith("2024/03/01/12/"))
    }
    val zRoot = build("zorder(x,y)")
    val lexRoot = build("x")
    val yBand = col("y").between(100, 131) // 1/8 of the y range
    val xBand = col("x").between(100, 131)
    println(s"REHEARSE zorder: 64 objects; y-filter keeps " +
      s"lex=${planned(lexRoot, yBand)} vs z=${planned(zRoot, yBand)}; " +
      s"x-filter lex=${planned(lexRoot, xBand)} vs z=${planned(zRoot, xBand)}; " +
      s"box lex=${planned(lexRoot, xBand && yBand)} vs " +
      s"z=${planned(zRoot, xBand && yBand)}")
    require(planned(lexRoot, yBand) == 64 && planned(zRoot, yBand) <= 24,
      "the y-only filter is the claim: lex reads everything, z a band of boxes")

    // ---- 2. delete_where bounded by the probe
    val dschema = TableSchema("evd", Seq(
      "event_id" -> ColType.CInteger, "tenant" -> ColType.CString))
    val droot = "file:///tmp/graft-rehearse-r13b-delete"
    val dstore = new HadoopStore(droot)
    dstore.deletePrefix("")
    // 24 objects per hour, each holding TWO tenants (so the victim's
    // objects rewrite — the GDPR shape — instead of retiring whole)
    val TenantPairs = 24
    for (h <- 0 until 2; p <- 0 until TenantPairs) {
      graft.lake.LakeWriter.write(
        spark.range(40000L).select(
          (col("id") + h * 1000000L).as("event_id"),
          concat(lit("tenant-"),
            (lit(2 * p) + col("id") % 2).cast("string")).as("tenant"))
          .coalesce(1),
        dschema, droot,
        java.time.Instant.parse(f"2024-03-01T0$h%d:00:00Z"),
        zoneMaps = true, bloomColumns = Seq("tenant"))
    }
    val before = LakeReader.listTableKeys(dstore, "evd", None)
    val t0 = System.nanoTime()
    val rep = LakeMaintenance.deleteWhere(spark, dstore, "evd", "tenant",
      Seq("tenant-7"), zoneMaps = true, bloomColumns = Seq("tenant"))
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"REHEARSE delete_where: ${before.size} objects, " +
      f"candidates=${rep.candidates} rewritten=${rep.objectsRewritten} " +
      f"retired=${rep.objectsRetired} skipped=${rep.objectsSkipped} " +
      f"rows_deleted=${rep.rowsDeleted} in $secs%.2f s")
    require(rep.objectsSkipped == before.size - 2 && rep.rowsDeleted == 40000L
        && rep.objectsRewritten == 2 && rep.rowsKept == 40000L,
      s"the probe must bound the rewrite to tenant-7's 2 shared objects, " +
        s"each rewritten with its other tenant intact: $rep")
    val after = spark.read.format("graft-lake").option("table", "evd")
      .load(droot)
    require(after.filter(col("tenant") === "tenant-7").count() == 0)
    println(s"REHEARSE delete_where: scope clean, " +
      s"${before.size - 2} objects untouched")
    spark.stop()
  }
}
