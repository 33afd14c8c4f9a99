package graft.lake

import graft.SparkSuite
import graft.types.{ColType, TableSchema}

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._

/** [[LakeCatalog]]: lake tables named in plain SQL resolve to the same
  * connector table — pushdowns included — and INSERT INTO appends
  * through the staged-publish protocol. DDL refuses loudly. */
class LakeCatalogSpec extends SparkSuite {

  private def freshCatalog(): (String, String) = {
    val root =
      s"file://${Files.createTempDirectory("graft-cat-spec").toFile.getAbsolutePath}"
    val name = s"lakecat${math.abs(root.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root)
  }

  private val schema = TableSchema("ev", Seq(
    "id" -> ColType.CInteger, "tag" -> ColType.CString))

  private def land(root: String, table: String, n: Int,
                   hour: String = "2024-07-01T08:00:00Z"): Unit = {
    import spark.implicits._
    val df = (0 until n).map(i => (i.toLong, s"t${i % 4}"))
      .toDF("id", "tag").orderBy("id").coalesce(1)
    LakeWriter.write(df, schema.copy(name = table), root,
      Instant.parse(hour), maxRecordsPerObject = 250L, zoneMaps = true,
      bloomColumns = Seq("tag"))
  }

  test("SQL names lake tables; pushdowns (filter prune, agg metadata) ride along") {
    val (cat, root) = freshCatalog()
    land(root, "ev", 1000)
    // plain SELECT
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.ev")
      .collect().head.getLong(0) == 1000)
    // the aggregate pushes to the sidecar scan through SQL resolution
    val agg = spark.sql(
      s"SELECT count(*) AS n, min(id) AS mn, max(id) AS mx FROM $cat.ev")
    assert(agg.queryExecution.executedPlan.toString.contains("graft-lake-agg"),
      s"SQL aggregate must push:\n${agg.queryExecution.executedPlan}")
    assert(agg.collect().head.toSeq == Seq(1000L, 0L, 999L))
    // filter pushdown prunes objects through SQL too
    val q = spark.sql(s"SELECT id, tag FROM $cat.ev WHERE id >= 600 AND id < 700")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.get.asInstanceOf[LakeScan]
    assert(scan.plannedKeys.size == 1, s"band prune through SQL: ${scan.plannedKeys}")
    assert(q.count() == 100)
    // a SQL join of two lake tables works end-to-end
    land(root, "dim", 40)
    val j = spark.sql(
      s"SELECT count(*) AS n FROM $cat.ev e JOIN $cat.dim d ON e.id = d.id")
    assert(j.collect().head.getLong(0) == 40)
  }

  test("SHOW TABLES lists the key layout's tables; missing tables fail loudly") {
    val (cat, root) = freshCatalog()
    land(root, "ev", 10)
    land(root, "other", 10)
    val tables = spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).toSet
    assert(tables == Set("ev", "other"), s"$tables")
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.nope").collect()
    }
    assert(e.getMessage.contains("nope"))
  }

  test("INSERT INTO appends through the staged publish; DDL refuses loudly") {
    val (cat, root) = freshCatalog()
    land(root, "ev", 500)
    // INSERT INTO resolves the same LakeTable → append write path
    // (_event_hour required by-name; its value is ignored)
    spark.sql(
      s"""INSERT INTO $cat.ev
         |SELECT id + 1000 AS id, concat('x', CAST(id % 3 AS STRING)) AS tag,
         |       TIMESTAMP '2024-07-01 00:00:00' AS _event_hour
         |FROM range(100)""".stripMargin)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.ev")
      .collect().head.getLong(0) == 600)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.ev WHERE id >= 1000")
      .collect().head.getLong(0) == 100)
    val store = new HadoopStore(root)
    assert(store.list("_staging").isEmpty, "no staging residue")
    // DDL is refused
    intercept[Exception] { spark.sql(s"DROP TABLE $cat.ev") }
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.fresh (id BIGINT) USING graft-lake")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ev ADD COLUMN extra STRING")
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev")
      .collect().head.getLong(0) == 600, "refused DDL must change nothing")
  }
}
