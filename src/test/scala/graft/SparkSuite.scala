package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Base for suites that need Spark: one shared local session (getOrCreate
  * dedupes across suites in the same JVM). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("4")
  def sf(name: String): String = s"/root/testdata/$name"

  /** Replay-style lake tests compare object keys across separate land
    * calls, and each call stamps its own flushTime into the key's
    * YYYY/MM/DD/HH path — two calls straddling a UTC hour boundary get
    * disjoint key spaces and the replay assertions fail spuriously. When
    * the boundary is seconds away, wait it out. */
  protected def avoidHourBoundary(marginSec: Long = 10): Unit = {
    val secIntoHour = java.time.Instant.now().getEpochSecond % 3600
    if (secIntoHour >= 3600 - marginSec)
      Thread.sleep((3601 - secIntoHour) * 1000)
  }
}
