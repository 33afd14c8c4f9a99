package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** EXACT frequent-item analytics at corpus scale.
  *
  * The naive "GROUP BY value HAVING count ≥ φ·N" shuffles the FULL value
  * distribution — at 100 TB the long tail of singletons dominates the
  * shuffle even though none of it can ever pass the threshold.
  * [[heavyHitters]] keeps the answer exact while shuffling only a
  * provably-sufficient candidate set: a per-partition Misra–Gries pass
  * (Misra & Gries 1982; the Frequent algorithm) nominates candidates,
  * an exact recount restricted to the broadcast candidate set decides.
  */
object Frequency {

  /** All values of `column` whose exact frequency is ≥ φ·N (φ given as
    * the rational `phiNum/phiDen` — integer algebra end to end, no float
    * threshold), with their exact counts. NULLs are excluded from both
    * the candidates and N.
    *
    * Two passes over the data, ONE Spark action, no full-distribution
    * shuffle:
    *
    * 1. CANDIDATES — each partition runs Misra–Gries with
    *    k = ⌈phiDen/phiNum⌉ counters. MG keeps every value whose local
    *    count exceeds nᵢ/(k+1); if a value has global count ≥ φ·N, some
    *    partition must hold more than nᵢ/(k+1) of it (else summing the
    *    per-partition bounds gives count < N/(k+1) < φ·N, since
    *    k+1 > 1/φ by construction) — so the UNION of per-partition
    *    summaries is a proven superset of the global heavy hitters.
    *    At most k values survive per partition, so the candidate
    *    relation is bounded at k × partitions rows — broadcastable by
    *    construction, not by hope.
    * 2. EXACT RECOUNT — the data is scanned once more with the
    *    candidates broadcast; rows tag as their value (candidate) or
    *    NULL (tail), and ONE aggregate yields every candidate's exact
    *    count plus the tail bucket — which also supplies exact N, so no
    *    separate `count()` job runs. The φ test is the integer
    *    cross-multiplication `cnt · phiDen ≥ N · phiNum`
    *    (⟺ cnt ≥ ⌈φ·N⌉ for integer cnt).
    *
    * The N-row is a 1-row sum over the AGGREGATED relation (≤ k·P + 1
    * rows, bounded by the same argument as the broadcast) cross-joined
    * back — never a pass over the data, and the shared aggregate
    * subtree is one reused exchange. Overflow headroom: N·phiNum stays
    * within Long up to N ≈ 9·10¹⁸/phiDen.
    *
    * Output: (`column`, `cnt` long), one row per heavy hitter.
    * Deterministic for any partitioning — candidates are a superset
    * under EVERY split of the data, and the recount is exact.
    *
    * Identity is the column's SQL equality (the recount join's), and the
    * candidate pass mirrors it exactly: Spark groups and joins NaN = NaN
    * and normalizes -0.0 to 0.0, so the FLOAT paths normalize -0.0
    * before counting (JVM boxing already canonicalizes NaN bit patterns
    * under equals/hashCode) — a heavy group split across the two zero
    * boxes can never fall under the per-partition survivor threshold.
    * BinaryType columns are REJECTED loudly: Array[Byte] has
    * reference-only JVM equality, so the candidate pass would count
    * every row as its own value and a true heavy hitter could be
    * silently missed — cast to hex()/base64() upstream.
    */
  def heavyHitters(df: DataFrame, column: String,
                   phiNum: Long, phiDen: Long,
                   maxCounters: Int = 100000): DataFrame = {
    require(phiNum > 0 && phiDen >= phiNum,
      s"phi must be a rational in (0, 1]: $phiNum/$phiDen")
    val kL = (phiDen + phiNum - 1) / phiNum // ⌈1/φ⌉ ⇒ k+1 > 1/φ
    // the whole method is premised on k·partitions candidates being
    // broadcast-sized; a tiny φ silently un-bounds that, so the bound is
    // ARMED (the Guards contract), not assumed
    if (kL > maxCounters) throw new IllegalStateException(
      s"heavyHitters: phi = $phiNum/$phiDen needs $kL counters per " +
        s"partition, over maxCounters=$maxCounters — the candidate set " +
        s"(counters x partitions) must stay broadcast-sized for the " +
        s"recount. Use a coarser phi, raise maxCounters deliberately, " +
        s"or fall back to a plain GROUP BY/HAVING for low thresholds.")
    val k = kL.toInt
    val field = df.schema(column) // loud on a bad column name
    // JVM-equality hazard (see the scaladoc): byte arrays would make
    // every row its own candidate counter — a silent exactness break,
    // so the reject is loud, before any pass runs
    require(field.dataType != org.apache.spark.sql.types.BinaryType,
      s"heavyHitters: BinaryType column '$column' is unsupported — " +
        "Array[Byte] compares by JVM reference in the candidate pass, so " +
        "equal byte arrays would never share a counter and a true heavy " +
        "hitter could be missed; cast to hex()/base64() upstream")
    // working-column collisions rejected loudly (the Guards convention):
    // a source column with a reserved name would make the candidate-join
    // resolution ambiguous
    val matches = Names.matcher(df)
    for (reserved <- Seq("__hh_cand", "__hh_val", "__hh_total"))
      require(!matches(column, reserved),
        s"column name $reserved is reserved by Frequency.heavyHitters")
    val vals = df.select(col(column)).where(col(column).isNotNull)

    // pass 1: per-partition Misra–Gries. Genuine per-partition imperative
    // state (k counters), so mapPartitions is the honest tool here; the
    // decrement step amortizes O(1) per row (each decrement cancels an
    // increment). STRING/LONG/INT/DOUBLE/FLOAT columns take a typed
    // Dataset path (codegen'd deserializer, no Row boxing — strings are
    // the common corpus case, integral IDs the other); remaining types
    // fall back to the generic Row walk. The FLOAT paths normalize
    // -0.0 → 0.0 so candidate identity matches the recount's SQL
    // equality (the scaladoc's exactness argument).
    def misraGries[T](it: Iterator[T]): Iterator[T] = {
      // initial capacity capped: the map never exceeds k entries but a
      // deliberately-raised maxCounters must not pre-allocate a k-sized
      // table for a partition that holds three distinct values
      val counters = new java.util.HashMap[T, Long](
        math.min(2L * k, 1L << 16).toInt)
      while (it.hasNext) {
        val v = it.next()
        val cur = counters.get(v)
        if (cur != 0L || counters.containsKey(v)) counters.put(v, cur + 1)
        else if (counters.size < k) counters.put(v, 1L)
        else {
          val e = counters.entrySet().iterator()
          while (e.hasNext) {
            val en = e.next()
            if (en.getValue == 1L) e.remove() else en.setValue(en.getValue - 1)
          }
        }
      }
      val out = new java.util.ArrayList[T](counters.size)
      val ks = counters.keySet().iterator()
      while (ks.hasNext) out.add(ks.next())
      import scala.jdk.CollectionConverters._
      out.iterator().asScala
    }
    val cand = {
      import org.apache.spark.sql.Encoders
      import org.apache.spark.sql.types._
      field.dataType match {
        case StringType =>
          vals.as[String](Encoders.STRING)
            .mapPartitions(misraGries[String] _)(Encoders.STRING)
            .toDF("__hh_cand")
        case LongType =>
          vals.as[Long](Encoders.scalaLong)
            .mapPartitions(misraGries[Long] _)(Encoders.scalaLong)
            .toDF("__hh_cand")
        case IntegerType =>
          vals.as[Int](Encoders.scalaInt)
            .mapPartitions(misraGries[Int] _)(Encoders.scalaInt)
            .toDF("__hh_cand")
        case DoubleType =>
          // d == 0.0 is true for BOTH zeros: the branch rewrites -0.0 to
          // the canonical +0.0 the recount's SQL equality groups under
          vals.as[Double](Encoders.scalaDouble)
            .mapPartitions(it => misraGries(it.map(d => if (d == 0.0d) 0.0d else d)))(
              Encoders.scalaDouble)
            .toDF("__hh_cand")
        case FloatType =>
          vals.as[Float](Encoders.scalaFloat)
            .mapPartitions(it => misraGries(it.map(f => if (f == 0.0f) 0.0f else f)))(
              Encoders.scalaFloat)
            .toDF("__hh_cand")
        case _ =>
          val candRdd = vals.rdd.mapPartitions(it => misraGries(it.map(_.get(0))).map(Row(_)))
          df.sparkSession.createDataFrame(candRdd,
            StructType(Seq(StructField("__hh_cand", field.dataType))))
      }
    }.distinct() // ≤ k rows per partition in, tiny shuffle

    // pass 2: one aggregate over candidate-tagged values. The left join
    // keys on a ≤ k·P-row relation — broadcast is bounded by
    // construction (the Guards/t15 bounded-broadcast rule).
    val agg = vals
      .join(broadcast(cand), col(column) === col("__hh_cand"), "left")
      .select(col("__hh_cand").as("__hh_val")) // NULL = non-candidate tail
      .groupBy("__hh_val").agg(count(lit(1)).as("cnt"))
    // exact N = the sum over the BOUNDED aggregate (≤ k·P + 1 rows) as a
    // broadcast 1-row cross join; the shared agg subtree is one exchange,
    // reused — no single-partition window, no second pass for N
    val total = agg.agg(sum("cnt").as("__hh_total"))
    agg.crossJoin(broadcast(total))
      .where(col("__hh_val").isNotNull &&
        col("cnt") * phiDen >= col("__hh_total") * phiNum)
      .select(col("__hh_val").as(column), col("cnt"))
  }
}
