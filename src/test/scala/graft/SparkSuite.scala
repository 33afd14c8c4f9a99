package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Base for suites that need Spark: one shared local session (getOrCreate
  * dedupes across suites in the same JVM). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("4")
  def sf(name: String): String = s"/root/testdata/$name"
}
