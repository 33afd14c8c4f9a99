package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions path must yield the same SQL surface as the imperative
  * exprs.register: build a session WITH the extensions installed and
  * evaluate each function. `spark.sql.extensions` is a STATIC conf — read
  * from the SparkContext at its creation — so a suite run with a
  * pre-existing context must install through `builder.withExtensions`
  * (the same code path getOrCreate feeds config-loaded classes into).
  * The prior default session is cleared first and restored after; the
  * underlying SparkContext is shared. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions installs the SQL functions via SparkSessionExtensions") {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT rolling_hash('ab') AS h,
          |  shingles(array('a','b','c'), 2) AS sh,
          |  minhash(array('a','b'), 4)[0] AS m,
          |  simhash64(array('a','b')) AS f,
          |  srp_sig(array(1.0d, -2.0d), 8, 0) AS p,
          |  cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c,
          |  jaccard_milli(array('a','b','c'), array('b','c','d')) AS j,
          |  stopword_scores('the cat and more', array('the','and'), array('cat','of')) AS sw,
          |  lang_id('the cat and the dog of it') AS lid,
          |  line_stats('a\nb\na') AS ls,
          |  top_bigram_cover(array('x','y','x','y')) AS bg,
          |  char_entropy_milli('ab') AS ce,
          |  z_interleave(3L, 1L) AS z,
          |  wordpiece_stats(array('thing'), array('th','ing')) AS wps,
          |  wordpiece_segment(array('thingx'), array('th','ing')) AS wpg,
          |  length(unicode_normalize('é', 'NFD')) AS nfd,
          |  length(unicode_normalize(unicode_normalize('é', 'NFD'), 'NFC')) AS nfc
          |FROM range(1)""".stripMargin).collect()(0)
      assert(r.getAs[Long]("h") ==
        (((7L * 31 + 'a') % 2147483647L) * 31 + 'b') % 2147483647L)
      assert(r.getSeq[String](1) == Seq("a b", "b c"))
      assert(r.getAs[Double]("c") == 1.0)
      assert(r.getAs[Long]("j") == 500L) // |∩|=2, |∪|=4
      assert(r.getSeq[Long](r.fieldIndex("sw")) == Seq(2L, 1L))
      assert(r.getAs[String]("lid") == "en")
      // 3 lines, 2 distinct, 3 chars total, 1 duplicated char
      assert(r.getSeq[Long](r.fieldIndex("ls")) == Seq(3L, 2L, 3L, 1L))
      assert(r.getAs[Long]("bg") == 6L) // "x y" twice × 3 chars
      assert(r.getAs[Long]("ce") == 693L) // ln 2 in milli-nats
      assert(r.getAs[Long]("z") == 7L) // a→bits 0,2; b→bit 1
      assert(r.getSeq[Long](r.fieldIndex("wps")) == Seq(2L, 0L))
      assert(r.getSeq[String](r.fieldIndex("wpg")) == Seq("th", "ing", "x"))
      assert(r.getAs[Int]("nfd") == 2) // é decomposes to e + U+0301
      assert(r.getAs[Int]("nfc") == 1) // ...and NFC recomposes it
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prior.foreach { s => SparkSession.setDefaultSession(s); SparkSession.setActiveSession(s) }
    }
  }
}
