package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Does the final global orderBy double-execute the pre-sort segment
  * (RangePartitioner sampling), and does a materialize-cut before the
  * sort pay for itself? A/B on the queries whose pre-sort subtree is
  * expensive. */
object ProfileR17b {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Sessions.local()
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label%-44s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def drain(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select($"user_id", $"ts",
        floor($"value" * 100 + 0.5).cast("long").as("vc"))
    def gf = graft.operators.Timeseries.gapFillHourly(
        ev, $"user_id", $"ts", $"vc")
      .select($"key".as("user_id"), $"bucket_ts", $"value".as("v_cents"))

    // warm all plan shapes once
    drain(gf.orderBy("user_id", "bucket_ts"))
    drain(gf.localCheckpoint().orderBy("user_id", "bucket_ts"))
    println("GRID ROWS = " + gf.count())

    for (_ <- 1 to 2) {
      time("q49 plain orderBy")(drain(gf.orderBy("user_id", "bucket_ts")))
      time("q49 cut-then-orderBy")(
        drain(gf.localCheckpoint().orderBy("user_id", "bucket_ts")))
      time("q49 no orderBy")(drain(gf))
    }

    // t17-shaped: agg output sorted
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val d = docs.select(col("doc_id"), col("source"),
      substring(col("text"), 1, 24).as("head"))
    val a = d.select(col("doc_id").as("a_id"), col("source"),
      col("head").as("a_head"))
    val b = d.select(col("doc_id").as("b_id"), col("source"),
      col("head").as("b_head"))
    def half = a.join(b, "source").filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        levenshtein(col("a_head"), col("b_head")).cast("long").as("dist"))
    def t17of(h: DataFrame) = {
      val sym = h.unionAll(h.select(col("b_id").as("a_id"),
        col("a_id").as("b_id"), col("dist")))
      sym.groupBy(col("a_id"))
        .agg(min(struct(col("dist"), col("b_id"))).as("m"))
        .select(col("a_id").as("doc_id"), col("m.b_id").as("match_id"),
          col("m.dist").as("dist"))
    }
    drain(t17of(half.localCheckpoint()).orderBy("doc_id"))
    for (_ <- 1 to 2) {
      time("t17 cut(half) + orderBy")(
        drain(t17of(half.localCheckpoint()).orderBy("doc_id")))
      time("t17 cut(half) no orderBy")(drain(t17of(half.localCheckpoint())))
    }
    spark.stop()
  }
}
