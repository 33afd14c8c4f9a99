package graft.examples

import graft.lake.{HadoopStore, LakeReader, LakeScan, LakeWriter}
import graft.types.{ColType, TableSchema}

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Scratch probe: does Spark inject runtime (dynamic-pruning) filters
  * into the graft-lake DSv2 scan for a plain join? */
object DppProbe {

  def allScans(p: SparkPlan): Seq[BatchScanExec] = (p match {
    case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
    case q: QueryStageExec => allScans(q.plan)
    case other => other.children.flatMap(allScans)
  }) ++ (p match { case b: BatchScanExec => Seq(b); case _ => Nil })

  def report(tag: String, joined: DataFrame, total: Int): Unit = {
    val n = joined.queryExecution.executedPlan.executeCollect().length
    val scans = allScans(joined.queryExecution.executedPlan)
    println(s"== $tag: rows=$n scans=${scans.size}")
    scans.foreach { b =>
      val ls = b.scan.asInstanceOf[LakeScan]
      println(s"   runtimeFilters: ${ls.runtimeFilters.mkString("; ").take(200)}")
      println(s"   plannedKeys: ${ls.plannedKeys.size} of $total")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]").appName("dpp-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._

    val root = s"file://${Files.createTempDirectory("dpp-probe").toFile.getAbsolutePath}"
    val schema = TableSchema("ev", Seq(
      "event_id" -> ColType.CInteger, "user_id" -> ColType.CInteger))
    val ev = spark.range(100000L).select(
      col("id").as("event_id"), (col("id") % 1000L).as("user_id"))
    LakeWriter.write(ev.orderBy("user_id", "event_id").coalesce(1), schema, root,
      Instant.parse("2024-06-01T08:00:00Z"),
      maxRecordsPerObject = 6250L, zoneMaps = true, bloomColumns = Seq("user_id"))
    // second + third hour for the hour-DPP shape
    LakeWriter.write(ev.limit(1000).coalesce(1), schema, root,
      Instant.parse("2024-06-01T09:00:00Z"), zoneMaps = true,
      bloomColumns = Seq("user_id"))
    LakeWriter.write(ev.limit(1000).coalesce(1), schema, root,
      Instant.parse("2024-06-01T10:00:00Z"), zoneMaps = true,
      bloomColumns = Seq("user_id"))
    val store = new HadoopStore(root)
    val total = LakeReader.listTableKeys(store, "ev", None).size
    println(s"total objects: $total")

    val fact = spark.read.format("graft-lake").option("table", "ev").load(root)

    // dim with an INDEPENDENT data column (no constraint propagation):
    // grp clusters the keys into the fact's user-band layout
    val dim = spark.range(1000L)
      .select(col("id").as("c_id"), (col("id") / 63).cast("long").as("grp"))
      .where(col("grp") === 2)
    report("join on user_id (clustered independent dim)",
      fact.join(dim, col("user_id") === col("c_id")), total)

    // date-dim shape: join on _event_hour
    val hours = spark.range(4L)
      .select(timestamp_seconds(lit(Instant.parse("2024-06-01T08:00:00Z")
        .getEpochSecond) + col("id") * 3600L).as("hr"),
        (col("id") % 2).as("par"))
      .where(col("par") === 1) // keeps hours 09 and 11
    val _ = spark.implicits // silence unused import if any
    report("join on _event_hour (date dim)",
      fact.join(hours, col("_event_hour") === col("hr")), total)

    spark.stop()
  }
}
