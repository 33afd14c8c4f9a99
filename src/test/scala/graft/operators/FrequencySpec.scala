package graft.operators

import graft.SparkSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class FrequencySpec extends SparkSuite {

  /** Zipf-ish planted corpus with a FAT TAIL: value "h<i>" appears
    * heavily, "tail-<j>" appear once each — the regime where the naive
    * full-distribution shuffle loses and Misra–Gries wins. */
  private def corpus(tailSize: Int): DataFrame = {
    import spark.implicits._
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(250)("beta") ++
      Seq.fill(120)("gamma") ++ Seq.fill(30)("delta")
    val tail = (0 until tailSize).map(i => s"tail-$i")
    (heavy ++ tail).toDF("v")
  }

  private def naive(df: DataFrame, column: String,
                    phiNum: Long, phiDen: Long): Set[(String, Long)] = {
    val vals = df.select(col(column)).where(col(column).isNotNull)
    val n = vals.count()
    vals.groupBy(column).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * phiDen >= lit(n) * phiNum)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
  }

  test("exact heavy hitters equal the naive recompute at every partitioning") {
    val df = corpus(tailSize = 1200) // N = 2000: alpha/beta/gamma pass 5%
    val expected = naive(df, "v", 5, 100)
    assert(expected == Set(("alpha", 400L), ("beta", 250L), ("gamma", 120L)))
    for (p <- Seq(1, 3, 16, 64)) {
      val got = Frequency.heavyHitters(df.repartition(p), "v", 5, 100)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected, s"partitions=$p: $got")
    }
  }

  test("threshold is a closed integer bound (cnt·den ≥ N·num), no float boundary") {
    import spark.implicits._
    // N = 100, φ = 3/100: a value with EXACTLY 3 occurrences is a heavy
    // hitter (≥), one with 2 is not — the boundary is exact integer
    // arithmetic, immune to 0.03·100 = 3.0000000000000004-style drift
    val df = (Seq.fill(3)("at") ++ Seq.fill(2)("under") ++
      (0 until 95).map(i => s"t$i")).toDF("v")
    val got = Frequency.heavyHitters(df.repartition(4), "v", 3, 100)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("at", 3L)), s"closed-bound semantics: $got")
  }

  test("the tail never reaches the shuffle: candidates are bounded at k per partition") {
    // white-box cousin of the scaladoc claim: with φ = 5% (k = 20) and a
    // huge singleton tail, per-partition MG can nominate at most 20
    // values — the exact output over 5000 tail values must still be
    // exactly the planted heavy hitters, and the run must not OOM-shape
    // (nothing here asserts timing; equality IS the superset proof)
    val df = corpus(tailSize = 5000)
    val expected = naive(df, "v", 5, 100)
    val got = Frequency.heavyHitters(df.repartition(8), "v", 5, 100)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("nulls are excluded from candidates and from N; non-string types work") {
    import spark.implicits._
    // 6×7L + 4×null + 4 singletons: N = 10 non-null, φ = 1/2 ⇒ only 7L
    val df = (Seq.fill(6)(Some(7L)) ++ Seq.fill(4)(None) ++
      Seq(Some(1L), Some(2L), Some(3L), Some(4L))).toDF("v")
    val got = Frequency.heavyHitters(df.repartition(3), "v", 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((7L, 6L)), s"nulls must not dilute N or appear: $got")
    // all-null input: no heavy hitters, no crash
    val allNull = Seq.fill[Option[Long]](5)(None).toDF("v")
    assert(Frequency.heavyHitters(allNull, "v", 1, 2).count() == 0)
  }

  test("candidate identity matches SQL equality: -0.0/0.0 merge, NaN groups, typed paths agree") {
    import spark.implicits._
    // a heavy group SPLIT across the two zero boxes, interleaved with a
    // decrementing tail in every partition — the adversarial shape for a
    // JVM-equality candidate pass (where -0.0 and 0.0 are distinct boxes
    // and each half could fall under the survivor threshold). SQL groups
    // them as ONE value of count 60, and so must the operator.
    val zeros = ((0 until 30).map(i => (i, -0.0d)) ++
      (0 until 30).map(i => (i + 30, 0.0d)) ++
      (0 until 40).map(i => (i + 60, i + 1.5d))).toDF("id", "v")
      .repartition(8, col("id")).select("v")
    val got = Frequency.heavyHitters(zeros, "v", 1, 2)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    assert(got == Set((0.0d, 60L)), s"-0.0 and 0.0 are one SQL group: $got")
    // same shape for FLOAT
    val fzeros = ((0 until 30).map(i => (i, -0.0f)) ++
      (0 until 30).map(i => (i + 30, 0.0f)) ++
      (0 until 40).map(i => (i + 60, i + 1.5f))).toDF("id", "v")
      .repartition(8, col("id")).select("v")
    val fgot = Frequency.heavyHitters(fzeros, "v", 1, 2)
      .collect().map(r => (r.getFloat(0), r.getLong(1))).toSet
    assert(fgot == Set((0.0f, 60L)), s"float zeros: $fgot")
    // Spark's SQL semantics group and join NaN = NaN — a heavy NaN is a
    // real heavy hitter, not tail-bucketed
    val nans = (Seq.fill(6)(Double.NaN) ++ Seq(1.0, 2.0, 3.0, 4.0)).toDF("v")
    val ngot = Frequency.heavyHitters(nans.repartition(3), "v", 1, 2).collect()
    assert(ngot.length == 1 && ngot(0).getDouble(0).isNaN &&
      ngot(0).getLong(1) == 6L, s"NaN must group: ${ngot.toSeq}")
  }

  test("typed fast paths dispatch for long/int (no boxed RDD scan); binary rejects loudly") {
    import spark.implicits._
    val longs = (Seq.fill(6)(7L) ++ Seq(1L, 2L, 3L, 4L)).toDF("v")
    val hhLong = Frequency.heavyHitters(longs.repartition(3), "v", 1, 2)
    assert(hhLong.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((7L, 6L)))
    // dispatch is observable in the plan: the typed paths are object
    // MapPartitions over the scan, the generic fallback surfaces as a
    // LogicalRDD (driver-assembled candidate relation)
    assert(!hhLong.queryExecution.analyzed.toString.contains("LogicalRDD"),
      "LongType must take the typed path, not the boxed Row RDD walk")
    val ints = (Seq.fill(6)(7) ++ Seq(1, 2, 3, 4)).toDF("v")
    val hhInt = Frequency.heavyHitters(ints.repartition(3), "v", 1, 2)
    assert(hhInt.collect().map(r => (r.getInt(0), r.getLong(1))).toSet ==
      Set((7, 6L)))
    assert(!hhInt.queryExecution.analyzed.toString.contains("LogicalRDD"))
    // the generic path still carries the remaining types (dates here)
    val dates = (Seq.fill(6)("2024-01-01") ++
      Seq("2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05"))
      .toDF("s").select(col("s").cast("date").as("v"))
    val hhDate = Frequency.heavyHitters(dates.repartition(3), "v", 1, 2)
    assert(hhDate.queryExecution.analyzed.toString.contains("LogicalRDD"))
    assert(hhDate.collect().map(_.getLong(1)).toSeq == Seq(6L))
    // BinaryType: reference-equality boxes can MISS a heavy hitter — loud
    val bin = Seq.fill(6)("x").toDF("s")
      .select(col("s").cast("binary").as("v"))
    val e = intercept[IllegalArgumentException] {
      Frequency.heavyHitters(bin, "v", 1, 2)
    }
    assert(e.getMessage.contains("BinaryType"))
  }

  test("recount: candidate lists dedupe under SQL equality, decide like the batch operator") {
    import spark.implicits._
    val df = corpus(tailSize = 1200)
    val expected = naive(df, "v", 5, 100)
    // a superset candidate list (with JVM-duplicate strings) decides
    // exactly; absent candidates contribute nothing
    val got = Frequency.recount(df, "v",
      Seq("alpha", "beta", "gamma", "delta", "alpha", "nope"), 5, 100)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected, s"$got vs $expected")
    // -0.0 and 0.0 are ONE SQL group: a candidate list carrying both
    // boxes must not double-join the zero rows (Seq.distinct would keep
    // both; the DataFrame distinct is the correct identity)
    val zeros = (Seq.fill(10)(0.0d) ++ Seq(1.5, 2.5, 3.5, 4.5)).toDF("v")
    val zgot = Frequency.recount(zeros, "v", Seq(0.0d, -0.0d), 1, 2)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    assert(zgot == Set((0.0d, 10L)),
      s"duplicated zero boxes must not inflate the count: $zgot")
    // null candidates are dropped, not joined
    assert(Frequency.recount(zeros, "v", Seq(null, 0.0d), 1, 2).count() == 1)
  }

  test("φ = 1 keeps only a value that IS the whole column; bad args raise") {
    import spark.implicits._
    val uni = Seq.fill(9)("only").toDF("v")
    val got = Frequency.heavyHitters(uni, "v", 1, 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("only", 9L)))
    val mixed = (Seq.fill(9)("most") :+ "other").toDF("v")
    assert(Frequency.heavyHitters(mixed, "v", 1, 1).count() == 0)
    intercept[IllegalArgumentException] {
      Frequency.heavyHitters(uni, "v", 0, 10)
    }
    intercept[IllegalArgumentException] {
      Frequency.heavyHitters(uni, "v", 11, 10)
    }
    intercept[IllegalArgumentException] {
      Frequency.heavyHitters(uni, "nope", 1, 2)
    }
    // a phi fine enough to un-bound the candidate broadcast raises
    // loudly with the remedy, never silently builds a 10^9-counter map
    val e = intercept[IllegalStateException] {
      Frequency.heavyHitters(uni, "v", 1, 1000000000L)
    }
    assert(e.getMessage.contains("maxCounters"))
    // ...and the bound is deliberate, not hard-coded: raised, the same φ
    // runs (and "only" at frequency 1 ≥ 10⁻⁹ is trivially heavy)
    val loose = Frequency.heavyHitters(uni, "v", 1, 1000000000L,
      maxCounters = Int.MaxValue).collect()
    assert(loose.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("only", 9L)))
  }
}
