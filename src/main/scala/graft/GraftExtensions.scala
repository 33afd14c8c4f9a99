package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.exprs
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Session-extensions installer: enables the engine's SQL functions via
  * `spark.sql.extensions=graft.GraftExtensions` (the idiomatic cluster
  * deployment path — no imperative call needed), mirroring
  * [[org.apache.spark.sql.graft.exprs.register]] for already-built
  * sessions. No planner rules are injected: every operator in this engine
  * is either a Spark built-in plan or a scalar expression (SURVEY.md §4.2).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def lit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got: $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[exprs.type].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - SQL-reproducible document fingerprint"),
      (es: Seq[Expression]) => exprs.RollingHash(es.head)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash"),
      (es: Seq[Expression]) => exprs.SimHash64(es.head)))
    ext.injectFunction((FunctionIdentifier("shingles"),
      info("shingles", "shingles(array<string>, n) - distinct n-gram shingles"),
      (es: Seq[Expression]) => exprs.Shingles(es.head, lit(es(1), "shingles n").toInt)))
    ext.injectFunction((FunctionIdentifier("minhash"),
      info("minhash", "minhash(array<string>, k[, seed]) - MinHash signature"),
      (es: Seq[Expression]) => exprs.MinHashSig(es.head, lit(es(1), "minhash k").toInt,
        if (es.size > 2) lit(es(2), "minhash seed") else 1L)))
    ext.injectFunction((FunctionIdentifier("srp_sig"),
      info("srp_sig", "srp_sig(array<double>, bits[, planeOffset]) - SRP LSH signature"),
      (es: Seq[Expression]) => exprs.SrpSig(es.head, lit(es(1), "srp_sig bits").toInt,
        if (es.size > 2) lit(es(2), "srp_sig planeOffset").toInt else 0)))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(array<double>, array<double>) - cosine similarity"),
      (es: Seq[Expression]) => exprs.CosineSim(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("jaccard_milli"),
      info("jaccard_milli", "jaccard_milli(array<string>, array<string>) - set Jaccard in milli-units"),
      (es: Seq[Expression]) => exprs.JaccardMilli(es.head, es(1))))
  }
}
