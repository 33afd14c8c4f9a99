package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: the Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL. Queries with
  * no oracle get the driver's weaker rows-only check. */
final case class QueryDef(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The testdata's time columns, by name: the columns eligible for the
    * raw-nanos LongType repair in [[t]] (a long is only knowably
    * nanos-since-epoch when we know the column is a time column). */
  val timeColumns: Set[String] = Set("ts", "o_orderdate", "l_shipdate")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Normalize every time column to TimestampType (micro precision) so
    // downstream epoch arithmetic is uniform, whatever parquet flavor the
    // generator emitted. Two flavors have been observed across testdata
    // regenerations:
    //  - TIMESTAMP(NANOS), which Spark reads only as long nanos
    //    (spark.sql.legacy.parquet.nanosAsLong=true, set by graft.Sessions);
    //  - timestamp[us] without a timezone, which Spark reads as
    //    TIMESTAMP_NTZ — a type that forbids cast-to-BIGINT and broke
    //    q29/q41 in round 6. NTZ→TZ is an identity under the UTC session.
    df.schema.fields.foldLeft(df) {
      case (acc, f) if timeColumns(f.name) && f.dataType == org.apache.spark.sql.types.LongType =>
        acc.withColumn(f.name,
          org.apache.spark.sql.functions.expr(s"timestamp_micros(${f.name} DIV 1000)"))
      case (acc, f) if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        acc.withColumn(f.name, df.col(f.name).cast(org.apache.spark.sql.types.TimestampType))
      case (acc, _) => acc
    }
  }

  /** Register temp views so `spark.sql` queries can use bare table names. */
  def views(spark: SparkSession, dir: String, tables: String*): Unit =
    tables.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
