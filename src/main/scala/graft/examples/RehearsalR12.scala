package graft.examples

import graft.Sessions
import graft.lake.{HadoopStore, LakeReader, LakeScan, LakeWriter}
import graft.types.{ColType, TableSchema}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Round-12 measured evidence: the DSv2 connector's RUNTIME pruning and
  * AGGREGATE pushdown at rehearsal scale (10M rows, ~30 objects).
  *
  * What a cluster pays for is decompress+parse of opened objects and
  * the bytes a scan ships; local[32] wall time under-reports the first
  * and hides the second, so each claim prints BOTH wall time and the
  * task metrics ([[graft.Meter]]), plus the prune report off the
  * executed plan. */
object RehearsalR12 {

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"REHEARSE $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  private def metered[A](spark: org.apache.spark.sql.SparkSession, label: String)
                        (f: => A): A = {
    val (r, m) = graft.Meter.measure(spark)(f)
    println(f"REHEARSE $label%-52s ${m.inputBytes / 1e6}%8.2f MB input, " +
      f"${m.shuffleBytes / 1e6}%8.2f MB shuffled, " +
      f"${m.taskMs / 1e3}%7.2f task-s")
    r
  }

  private def lakeScans(p: SparkPlan): Seq[LakeScan] = (p match {
    case a: AdaptiveSparkPlanExec => lakeScans(a.executedPlan)
    case q: QueryStageExec => lakeScans(q.plan)
    case o => o.children.flatMap(lakeScans)
  }) ++ (p match {
    case b: BatchScanExec => b.scan match {
      case ls: LakeScan => Seq(ls)
      case _ => Nil
    }
    case _ => Nil
  })

  def main(args: Array[String]): Unit = {
    val sfBig = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    import spark.implicits._

    val root = "file:///tmp/graft-rehearse-r12-lake"
    val store = new HadoopStore(root)
    store.deletePrefix("")
    val schema = TableSchema("events_r12", Seq(
      "event_id" -> ColType.CInteger, "user_id" -> ColType.CInteger))
    val ev = spark.read.parquet(s"$sfBig/events.parquet")
      .select(col("event_id"), col("user_id"))
      .crossJoin(spark.range(100).select(col("id").as("rep")))
      .select((col("event_id") * 100 + col("rep")).as("event_id"), col("user_id"))
    val n = ev.count()
    LakeWriter.write(ev.repartitionByRange(30, col("user_id"), col("event_id")),
      schema, root, zoneMaps = true, bloomColumns = Seq("user_id"))
    val total = LakeReader.listTableKeys(store, "events_r12", None).size
    println(s"lake: $n rows in $total user-ordered objects")

    def fact: DataFrame =
      spark.read.format("graft-lake").option("table", "events_r12").load(root)

    // ---- 1. runtime (dynamic-pruning) join through the connector -------
    // ~20 keys in a narrow band, via a NON-TRANSLATABLE dim predicate so
    // only the runtime IN-list can prune (the l18 shape)
    val dim = spark.range(200L)
      .select((col("id") * 2).as("uid"), (col("id") / 10).cast("long").as("grp"))
      .where(col("grp") === 3) // uids 60..78
    def dppJoin(): (Long, Int) = {
      val joined = fact.join(dim, col("user_id") === col("uid"))
      val rows = joined.queryExecution.executedPlan.executeCollect().length.toLong
      val scan = lakeScans(joined.queryExecution.executedPlan).head
      require(scan.runtimeFilters.nonEmpty, "runtime filter must fire")
      (rows, scan.plannedKeys.size)
    }
    def noDppJoin(): Long = {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      try fact.join(dim, col("user_id") === col("uid")).count()
      finally spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    }
    val (dppRows, planned) = dppJoin()
    val plainRows = noDppJoin()
    require(dppRows == plainRows, s"dpp=$dppRows plain=$plainRows must agree")
    println(s"runtime prune: $planned of $total objects planned, rows=$dppRows")
    for (i <- 1 to 3) {
      time(s"join WITH runtime object pruning #$i")(dppJoin())
      time(s"join WITHOUT dynamic pruning #$i")(noDppJoin())
    }
    metered(spark, "join WITH runtime object pruning")(dppJoin())
    metered(spark, "join WITHOUT dynamic pruning")(noDppJoin())

    // ---- 2. aggregate pushdown: sidecars vs full scan ------------------
    def viaSidecars(): Seq[Any] = {
      val agg = fact.agg(count(lit(1)).as("n"), min(col("event_id")),
        max(col("event_id")), min(col("user_id")), max(col("user_id")))
      require(agg.queryExecution.executedPlan.toString.contains("graft-lake-agg"),
        "aggregate must push")
      agg.collect().head.toSeq
    }
    def viaFullScan(): Seq[Any] =
      LakeReader.read(spark, root, "events_r12")
        .agg(count(lit(1)).as("n"), min(col("event_id")),
          max(col("event_id")), min(col("user_id")), max(col("user_id")))
        .collect().head.toSeq
    val mAgg = viaSidecars(); val mFull = viaFullScan()
    require(mAgg == mFull, s"sidecar=$mAgg full=$mFull must agree")
    println(s"metadata aggregate: $mAgg")
    for (i <- 1 to 3) {
      time(s"count/min/max via sidecar agg scan #$i")(viaSidecars())
      time(s"count/min/max via full row scan #$i")(viaFullScan())
    }
    metered(spark, "count/min/max via sidecar agg scan")(viaSidecars())
    metered(spark, "count/min/max via full row scan")(viaFullScan())

    // ---- 3. pushed LIMIT: prefix planning ------------------------------
    def limited(): (Long, Int) = {
      val q = fact.limit(1000)
      val rows = q.queryExecution.executedPlan.executeCollect().length.toLong
      val scan = lakeScans(q.queryExecution.executedPlan).head
      (rows, scan.plannedKeys.size)
    }
    val (lr, lk) = limited()
    println(s"pushed limit: $lk of $total objects planned for LIMIT 1000, rows=$lr")
    require(lr == 1000 && lk < total)
    time("SELECT * LIMIT 1000 (prefix-planned)")(limited())

    spark.stop()
  }
}
