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
