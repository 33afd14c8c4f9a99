package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // developer loop: SPARK_GRAFT_QUERIES=l37_x,l30_y runs just those
    // (the driver never sets it — full runs stay the default)
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String) = only.forall(_.contains(name))
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    // Pre-clean stale .error files from RENAMED/REMOVED queries: the
    // per-query deleteIfExists below only covers a query that still exists
    // under the same name, so in a reused outDir a leftover q_old.error
    // would report a phantom failure forever.
    Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".error"))
      .filterNot(f => SparkEntry.queries.contains(f.getName.stripSuffix(".error")))
      .foreach(f => Files.deleteIfExists(f.toPath))
    SparkEntry.queries.filter(q => selected(q._1)).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // mode("overwrite") supports in-place re-runs — a .error left by a
        // previous failed run must not keep reporting a now-passing query.
        Files.deleteIfExists(Paths.get(s"$outDir/$name.error"))
      }
      catch { case e: Throwable =>
        // A swallowed failure must still reach the driver: round 6 proved a
        // query that throws otherwise just VANISHES from the correctness
        // file (88→86 entries, zero err rows) — the worst possible failure
        // mode for an audit artifact. The .error file gives the driver a
        // durable record to turn into an err row; stderr alone is lost.
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        try Files.writeString(Paths.get(s"$outDir/$name.error"),
          s"${e.getClass.getName}: ${e.getMessage}\n")
        catch { case e2: Throwable =>
          System.err.println(s"[verify] $name.error unwritable: $e2") }
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Json.str(k)}: ${Json.str(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
