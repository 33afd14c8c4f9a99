package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{abs, col, explode, lit, sequence, sum, when}

/** INCREMENTAL CHANGES between retained snapshots — the change-data-feed
  * read of the version chain (the Delta CDF / Iceberg incremental-scan
  * idea on the lake's generation records; the reference's lake is the
  * system of record a training pipeline re-reads, `README.md:113-117`,
  * and this is the read that makes re-reads INCREMENTAL): "exactly what changed since
  * training run A" as one bounded read, the companion primitive to
  * `VERSION AS OF` (which answers "exactly what run A saw").
  *
  * '''The plan is metadata-first''': the two snapshots' LIVE KEY LISTS
  * (generation records, [[LakeVersions.liveAt]]) diff at the OBJECT
  * level — only keys on exactly one side are read at all. Surviving
  * rows that a rewrite merely COPIED into a replacement object appear
  * on both sides and cancel in ONE signed-count aggregation (each
  * changed object read once, one shuffle — a naive
  * exceptAll-per-direction reads every object twice and shuffles
  * twice), so the result is exact ROW-level change:
  *
  *  - `insert` rows: present now (or at `to`), absent at `from` —
  *    appends, MERGE/overwrite inserts, and the post-values of updates;
  *  - `delete` rows: present at `from`, absent now — deletions and the
  *    pre-values of updates (an update is delete+insert, the CDF
  *    convention without a before/after image column; an hour MOVE
  *    shows the same way).
  *
  * Cost scales with CHANGED objects, never table size (a full-table
  * compaction between the snapshots degrades this to a bounded
  * full-diff — rows still cancel exactly). Row identity is the table's
  * columns + `_event_hour`; `_object_key` is deliberately NOT identity
  * (rewrites change it by construction). Multiset semantics throughout:
  * duplicate rows count, `exceptAll` subtracts occurrences.
  *
  * Needs history retention ([[LakeVersions.setRetain]]) — the `from`
  * snapshot must still name live bytes; loud errors name the remedy
  * (the liveAt contract). */
object LakeChanges {

  val ChangeTypeCol = "_change_type"

  /** Changes between retained generation/tag `from` and the CURRENT
    * table (the common shape: "what moved since run A"). */
  def since(spark: SparkSession, rootUri: String, table: String,
            from: String): DataFrame = {
    val store = new HadoopStore(rootUri)
    val f = LakeVersions.resolveVersion(store, table, from)
    val fromKeys = LakeVersions.liveAt(store, table, f)
    val view = LakeVersions.tableView(store, table)
    diff(spark, store, table, fromKeys,
      LakeReader.listTableKeys(store, table, None, Some(view)),
      LakeVersions.dvsAt(store, table, f), view.dvs,
      LakeVersions.eqdelsAt(store, table, f), view.eqdels)
  }

  /** Changes between two retained generations/tags, `(from, to]`. */
  def between(spark: SparkSession, rootUri: String, table: String,
              from: String, to: String): DataFrame = {
    val store = new HadoopStore(rootUri)
    val f = LakeVersions.resolveVersion(store, table, from)
    val t = LakeVersions.resolveVersion(store, table, to)
    require(f <= t, s"graft-lake changes: from (gen $f) must be <= to (gen $t)")
    diff(spark, store, table,
      LakeVersions.liveAt(store, table, f),
      LakeVersions.liveAt(store, table, t),
      LakeVersions.dvsAt(store, table, f),
      LakeVersions.dvsAt(store, table, t),
      LakeVersions.eqdelsAt(store, table, f),
      LakeVersions.eqdelsAt(store, table, t))
  }

  private def diff(spark: SparkSession, store: Store, table: String,
                   fromKeys: Seq[String], toKeys: Seq[String],
                   fromDvs: Map[String, LakeVersions.DvRef],
                   toDvs: Map[String, LakeVersions.DvRef],
                   fromEq: Seq[LakeEqDeletes.EqRef] = Nil,
                   toEq: Seq[LakeEqDeletes.EqRef] = Nil): DataFrame = {
    val old = fromKeys.toSet
    val cur = toKeys.toSet
    // merge-on-read: an object live on BOTH sides whose delete vector
    // CHANGED between the snapshots holds row-level change without a key
    // diff — it reads on both sides (under each side's own vector), its
    // unchanged rows cancel in the signed aggregation, the newly-dead
    // positions net out as deletes. Vectors only grow on a live object,
    // so the feed cost stays bounded by CHANGED objects.
    val dvChanged = (old intersect cur).filter(k =>
      fromDvs.get(k).map(_.key) != toDvs.get(k).map(_.key))
    // EQUALITY deletes ([[LakeEqDeletes]]): an object live on both
    // sides whose EFFECTIVE filter set differs between the snapshots
    // (an eq-delete landed — or was folded — in the window, and the
    // object is in its scope) reads on both sides the same way; the
    // matched rows net out as deletes. The read here is bounded by the
    // eq-delete's SCOPE, the feed's honest cost — fold early with
    // compact to keep windows cheap.
    val fromEqC = LakeEqDeletes.compile(store, table, fromEq)
    val toEqC = LakeEqDeletes.compile(store, table, toEq)
    def effEq(eqs: Seq[LakeEqDeletes.Compiled], k: String): Set[String] =
      eqs.filter(_.inScope(k)).map(_.ref.key).toSet
    val eqChanged0 =
      if (fromEq.isEmpty && toEq.isEmpty) Set.empty[String]
      else (old intersect cur).filter(k =>
        effEq(fromEqC, k) != effEq(toEqC, k))
    // EVOLVED table: both sides align onto the DECLARED schema (the
    // `from` snapshot may predate an ALTER — its rows null-fill/widen,
    // so a row whose values did not change never shows as changed).
    // Hoisted above the eq prune: the declared columns also type the
    // wire values for the zone-band check below.
    val declared = LakeSchemas.current(store, table).map(_.schema)
    // SIDECAR-PRUNED eq scope (blooms round 17, zone bands round 19):
    // an eq-delete's scope is every older object, but an object whose
    // sidecars REFUTE all of the differing deletes' values holds no
    // matching row — its rows are identical on both sides and would
    // cancel in the signed aggregation anyway. Skip reading it at all:
    // a GDPR delete's feed window then reads O(containing objects),
    // not O(scope). Two metadata-sized sidecar reads per candidate
    // decide; the checks COMPOSE — the bloom refutes exact membership
    // where a bloom was built, the zone band refutes by VALUE RANGE on
    // numeric/time columns the tracker covers even where no bloom
    // exists (a ranged user-id delete over an id-clustered table skips
    // every out-of-band object the bloom alone would keep). Missing/
    // torn sidecars keep conservatively (read — never wrong, just
    // unpruned).
    val eqChanged =
      if (eqChanged0.isEmpty) eqChanged0
      else {
        val byKey = (fromEqC ++ toEqC)
          .groupBy(_.ref.key).map { case (k, cs) => k -> cs.head }
        // wire → zone-band conversion needs column types: the declared
        // schema when present, else one header peek (metadata-sized,
        // once per feed) — unknown columns skip the band check
        val colTypes: Map[String, graft.types.ColType] =
          declared.map(_.columns.toMap).getOrElse(
            try LakeReader.peekSchema(store, eqChanged0.head, table)
              .columns.toMap
            catch { case _: Exception => Map.empty })
        def bandOf(cn: String, wire: String)
            : Option[java.math.BigDecimal] =
          colTypes.get(cn).flatMap { t =>
            try LakeReader.probeBand(t, LakeDelta.externalFromWire(t)(wire))
            catch { case _: Exception => None } // unparsable wire: keep
          }
        eqChanged0.filter { k =>
          val differing = (effEq(fromEqC, k) union effEq(toEqC, k)) --
            (effEq(fromEqC, k) intersect effEq(toEqC, k))
          lazy val blooms = BloomMaps.read(store, k)
          lazy val stats = ZoneMaps.read(store, k)
          differing.exists { refKey =>
            // a CONJUNCTION can match a row only if EVERY column holds
            // SOME value its bloom might contain AND its zone band
            // admits (absent sidecars keep conservatively)
            byKey(refKey).conj.forall { case (cn, vs) =>
              vs.exists(v =>
                BloomMaps.mightContain(blooms, cn, v) &&
                  bandOf(cn, v).forall(b =>
                    ZoneMaps.mayContain(stats, cn, b, b)))
            }
          }
        }
      }
    val gone = (old -- cur ++ dvChanged ++ eqChanged).toSeq.sorted
    val fresh = (cur -- old ++ dvChanged ++ eqChanged).toSeq.sorted
    def readAligned(keys: Seq[String],
                    dvs: Map[String, LakeVersions.DvRef],
                    eqs: Seq[LakeEqDeletes.Compiled]): DataFrame =
      declared match {
        case Some(d) =>
          LakeReader.readKeysAligned(spark, store, table, keys, d,
            Some(dvs), Some(eqs))
        case None => LakeReader.readKeys(spark, store, table, keys,
          Some(dvs), Some(eqs))
      }
    // the schema must resolve even when one side is empty; a read of
    // ZERO keys cannot (readKeys requires objects). A declared table's
    // shape is STATIC (no metadata I/O — a backfill-append feed with an
    // empty gone side must not header-peek the whole fresh side twice);
    // otherwise the other side's read supplies it.
    def emptyShape(other: Seq[String],
                   otherDvs: Map[String, LakeVersions.DvRef],
                   otherEqs: Seq[LakeEqDeletes.Compiled])
        : org.apache.spark.sql.types.StructType =
      declared.map(LakeDataSource.outputStruct)
        .getOrElse(readAligned(other, otherDvs, otherEqs).schema)
    def rows(keys: Seq[String], dvs: Map[String, LakeVersions.DvRef],
             eqs: Seq[LakeEqDeletes.Compiled],
             other: Seq[String],
             otherDvs: Map[String, LakeVersions.DvRef],
             otherEqs: Seq[LakeEqDeletes.Compiled]): DataFrame =
      if (keys.nonEmpty) readAligned(keys, dvs, eqs)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        emptyShape(other, otherDvs, otherEqs))
    if (gone.isEmpty && fresh.isEmpty) {
      // no object changed — an empty, correctly-shaped feed (the table
      // must exist for the schema; firstTableKey enforces like any read)
      val k = LakeReader.firstTableKey(store, table)
        .orElse(cur.headOption).getOrElse(throw new IllegalArgumentException(
          s"no lake objects for table $table under ${store.rootUri}"))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        emptyShape(Seq(k), toDvs, toEqC))
        .withColumn(ChangeTypeCol, lit("insert")).limit(0)
    }
    val before = rows(gone, fromDvs, fromEqC, fresh, toDvs, toEqC)
    val after = rows(fresh, toDvs, toEqC, gone, fromDvs, fromEqC)
    // signed multiset difference: -1 per pre-image row, +1 per
    // post-image row; net 0 = a surviving copy (cancels), net > 0 =
    // that many inserts, net < 0 = that many deletes. Grouping equality
    // matches exceptAll's (null = null, NaN = NaN), so this is the
    // multiset diff computed in one pass. `explode(sequence(...))`
    // re-materializes multiplicity for genuinely duplicated rows.
    // Working column names PROBE for collision-freedom: `_net` etc. are
    // legal data column names ([[graft.types.TableSchema]] reserves only
    // the read-derived ones), and a silent collision would corrupt the
    // grouping; `_change_type` itself IS reserved at schema declaration.
    val dataCols = before.columns.toSeq
    def freshName(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(n => !dataCols.contains(n)).get
    val signCol = freshName("_net_sign")
    val netCol = freshName("_net")
    val dupCol = freshName("_dup")
    val net = before.withColumn(signCol, lit(-1L))
      .unionByName(after.withColumn(signCol, lit(1L)))
      .groupBy(dataCols.map(col): _*)
      .agg(sum(col(signCol)).as(netCol))
      .where(col(netCol) =!= 0L)
    net.withColumn(ChangeTypeCol,
        when(col(netCol) > 0L, "insert").otherwise("delete"))
      .withColumn(dupCol,
        explode(sequence(lit(1), abs(col(netCol)).cast("int"))))
      .drop(netCol, dupCol)
  }
}
