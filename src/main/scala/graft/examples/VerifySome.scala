package graft.examples

import graft.{Json, Sessions, SparkEntry}
import java.nio.file.{Files, Paths}

/** Subset of [[graft.Verify]] for fast iteration on new queries: runs only
  * the named queries and writes a FILTERED oracle_sql.json, so
  * `scripts/check.py` compares exactly the subset without flagging every
  * other registered query as MISSING_OUTPUT.
  *
  * Usage: scripts/run.sh graft.examples.VerifySome /root/testdata/sf0.01 \
  *          /tmp/verify_some q55_funnel q56_retention
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    new java.io.File(outDir).mkdirs()
    // Same stale-.error pre-clean as Verify, but scoped to THIS run's
    // names: check.py surfaces every *.error as a FAIL row regardless of
    // the filtered oracle json, so a leftover error from a previous
    // subset run would fail every later iteration in a reused outDir.
    Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".error"))
      .filterNot(f => names.contains(f.getName.stripSuffix(".error")))
      .foreach(f => Files.deleteIfExists(f.toPath))
    names.foreach { name =>
      try {
        SparkEntry.queries(name)(spark, sfDir).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        Files.deleteIfExists(Paths.get(s"$outDir/$name.error"))
        println(s"[verify-some] $name written")
      } catch { case e: Throwable =>
        System.err.println(s"[verify-some] $name failed: ${e.getMessage}")
        Files.writeString(Paths.get(s"$outDir/$name.error"),
          s"${e.getClass.getName}: ${e.getMessage}\n")
      }
    }
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${Json.str(k)}: ${Json.str(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
