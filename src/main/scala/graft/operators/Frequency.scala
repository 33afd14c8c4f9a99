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
// Serializable: the per-partition passes close over the object's own
// mgPartial/mergeMG (shared with the streaming twin), so the singleton
// rides the task closure
object Frequency extends Serializable {

  /** ⌈1/φ⌉ counters (so k+1 > 1/φ — the superset premise), ARMED at
    * `maxCounters` (the Guards contract): a tiny φ must raise with the
    * remedy, never silently un-bound the candidate set. Shared by the
    * batch operator and its streaming twin
    * ([[graft.streaming.StreamOps]]) so the two bounds cannot drift. */
  private[graft] def counterBudget(phiNum: Long, phiDen: Long,
                                   maxCounters: Int): Int = {
    require(phiNum > 0 && phiDen >= phiNum,
      s"phi must be a rational in (0, 1]: $phiNum/$phiDen")
    val kL = (phiDen + phiNum - 1) / phiNum // ⌈1/φ⌉ ⇒ k+1 > 1/φ
    if (kL > maxCounters) throw new IllegalStateException(
      s"heavyHitters: phi = $phiNum/$phiDen needs $kL counters per " +
        s"partition, over maxCounters=$maxCounters — the candidate set " +
        s"(counters x partitions) must stay broadcast-sized for the " +
        s"recount. Use a coarser phi, raise maxCounters deliberately, " +
        s"or fall back to a plain GROUP BY/HAVING for low thresholds.")
    kL.toInt
  }

  /** Per-partition WEIGHTED Misra–Gries partial: surviving (value,
    * counter weight) pairs, at most `k` of them. Weights UNDER-count the
    * partition's true frequencies by at most nᵢ/(k+1) and never
    * over-count — the invariant [[mergeMG]] preserves, which is what
    * makes the partials mergeable across micro-batches (the streaming
    * twin) as well as union-able into a candidate superset (the batch
    * operator). Genuine per-partition imperative state, so an iterator
    * walk is the honest tool; the decrement step amortizes O(1)/row. */
  private[graft] def mgPartial[T](it: Iterator[T], k: Int): Iterator[(T, Long)] = {
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
    val out = new java.util.ArrayList[(T, Long)](counters.size)
    val es = counters.entrySet().iterator()
    while (es.hasNext) { val en = es.next(); out.add((en.getKey, en.getValue)) }
    import scala.jdk.CollectionConverters._
    out.iterator().asScala
  }

  /** PAIRWISE merge of two Misra–Gries summaries back down to ≤ k
    * counters (Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable
    * Summaries", PODS 2012): sum weights; if more than k survive,
    * subtract the (k+1)-largest weight from every counter and drop the
    * non-positive. The error bound stays ≤ N/(k+1) under ANY pairwise
    * merge tree, so a value with true count ≥ φ·N (φ > 1/(k+1)) always
    * survives — merged summaries nominate a proven superset exactly
    * like a single pass. Merge PAIRWISE only (fold summaries two at a
    * time); merging loose per-value entries one at a time would double
    * the error bound. */
  private[graft] def mergeMG[T](a: Map[T, Long], b: Map[T, Long],
                                k: Int): Map[T, Long] = {
    val m = scala.collection.mutable.HashMap.empty[T, Long]
    a.foreach { case (v, w) => m.update(v, m.getOrElse(v, 0L) + w) }
    b.foreach { case (v, w) => m.update(v, m.getOrElse(v, 0L) + w) }
    if (m.size <= k) m.toMap
    else {
      val ws = m.values.toArray
      java.util.Arrays.sort(ws)
      val sub = ws(ws.length - (k + 1)) // (k+1)-th largest
      m.iterator.collect { case (v, w) if w > sub => v -> (w - sub) }.toMap
    }
  }

  /** EXACT decision over an explicit candidate list — pass 2 of
    * [[heavyHitters]] standing alone, for callers that obtained their
    * candidates elsewhere (the streaming twin's merged summary, a prior
    * run, a side channel). Output and integer-threshold semantics are
    * identical to [[heavyHitters]]; the answer is exact iff `candidates`
    * is a superset of the true heavy hitters (which a Misra–Gries
    * summary over the same data guarantees). One aggregate, candidates
    * broadcast, the tail map-side-bucketed — never a full-distribution
    * shuffle. */
  def recount(df: DataFrame, column: String, candidates: Seq[Any],
              phiNum: Long, phiDen: Long): DataFrame = {
    require(phiNum > 0 && phiDen >= phiNum,
      s"phi must be a rational in (0, 1]: $phiNum/$phiDen")
    val field = df.schema(column)
    checkWorkingNames(df, column)
    val vals = df.select(col(column)).where(col(column).isNotNull)
    val candRows = candidates.filter(_ != null)
    // dedupe under SQL equality (DataFrame distinct), NOT Seq.distinct's
    // JVM equality: -0.0 and 0.0 (or scale-differing decimals) are one
    // SQL group but distinct JVM boxes — a duplicated candidate row
    // would multiply every matching row through the recount join,
    // silently inflating counts and N
    val cand = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(candRows.map(Row(_)): _*),
      StructType(Seq(StructField("__hh_cand", field.dataType))))
      .distinct()
    exactDecide(vals, cand, column, phiNum, phiDen)
  }

  private def checkWorkingNames(df: DataFrame, column: String): Unit = {
    // working-column collisions rejected loudly (the Guards convention):
    // a source column with a reserved name would make the candidate-join
    // resolution ambiguous
    val matches = Names.matcher(df)
    for (reserved <- Seq("__hh_cand", "__hh_val", "__hh_total"))
      require(!matches(column, reserved),
        s"column name $reserved is reserved by Frequency.heavyHitters")
  }

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
    val k = counterBudget(phiNum, phiDen, maxCounters)
    val field = df.schema(column) // loud on a bad column name
    // JVM-equality hazard (see the scaladoc): byte arrays would make
    // every row its own candidate counter — a silent exactness break,
    // so the reject is loud, before any pass runs
    require(field.dataType != org.apache.spark.sql.types.BinaryType,
      s"heavyHitters: BinaryType column '$column' is unsupported — " +
        "Array[Byte] compares by JVM reference in the candidate pass, so " +
        "equal byte arrays would never share a counter and a true heavy " +
        "hitter could be missed; cast to hex()/base64() upstream")
    checkWorkingNames(df, column)
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
    def misraGries[T](it: Iterator[T]): Iterator[T] = mgPartial(it, k).map(_._1)
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

    exactDecide(vals, cand, column, phiNum, phiDen)
  }

  /** Pass 2 shared by [[heavyHitters]] and [[recount]]: one aggregate
    * over candidate-tagged values. The left join keys on a bounded
    * relation — broadcast by construction (the Guards/t15
    * bounded-broadcast rule); exact N = the sum over the BOUNDED
    * aggregate (≤ candidates + 1 rows) as a broadcast 1-row cross join;
    * the shared agg subtree is one exchange, reused — no
    * single-partition window, no second pass for N. */
  private def exactDecide(vals: DataFrame, cand: DataFrame, column: String,
                          phiNum: Long, phiDen: Long): DataFrame = {
    val agg = vals
      .join(broadcast(cand), col(column) === col("__hh_cand"), "left")
      .select(col("__hh_cand").as("__hh_val")) // NULL = non-candidate tail
      .groupBy("__hh_val").agg(count(lit(1)).as("cnt"))
    val total = agg.agg(sum("cnt").as("__hh_total"))
    agg.crossJoin(broadcast(total))
      .where(col("__hh_val").isNotNull &&
        col("cnt") * phiDen >= col("__hh_total") * phiNum)
      .select(col("__hh_val").as(column), col("cnt"))
  }
}
