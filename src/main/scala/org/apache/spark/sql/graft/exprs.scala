package org.apache.spark.sql.graft

import graft.functions.HashImpls

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions. Hosted under `org.apache.spark.sql` because
  * the expression-authoring surface (`AbstractDataType`, the classic
  * Column↔Expression bridge) is `private[sql]` — the standard technique for
  * out-of-tree expression libraries. Kernels live in
  * [[graft.functions.HashImpls]] (public, shared by interpreted eval and
  * generated code), so each `doGenCode` is a single static call and the
  * expression stays inside whole-stage codegen. */
object exprs {

  /** `rolling_hash(str) -> bigint` — SQL-reproducible document fingerprint. */
  case class RollingHash(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = HashImpls.rollingHash(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.rollingHash($c)")
    override protected def withNewChildInternal(c: Expression): RollingHash = copy(child = c)
  }

  /** `simhash64(array<string>) -> bigint` — 64-bit SimHash fingerprint. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = HashImpls.simHash64(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.simHash64($c)")
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  }

  /** `minhash(array<string>, k) -> array<bigint>` — single-pass K-perm
    * MinHash signature. */
  case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      HashImpls.minHash(v.asInstanceOf[ArrayData], numHashes, seed)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.HashImpls.minHash($c, $numHashes, ${seed}L)")
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  }

  /** `srp_sig(array<double>, bits) -> bigint` — single-pass signed-random-
    * projection LSH signature (see [[graft.functions.HashImpls.srpSignature]]). */
  case class SrpSig(child: Expression, bits: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      HashImpls.srpSignature(v.asInstanceOf[ArrayData], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.srpSignature($c, $bits)")
    override protected def withNewChildInternal(c: Expression): SrpSig = copy(child = c)
  }

  def rolling_hash(c: Column): Column =
    ExpressionUtils.column(RollingHash(ExpressionUtils.expression(c)))
  def simhash64(c: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(c)))
  def minhash(c: Column, k: Int, seed: Long): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(c), k, seed))
  def srp_sig(c: Column, bits: Int): Column =
    ExpressionUtils.column(SrpSig(ExpressionUtils.expression(c), bits))

  /** Register the custom expressions for the SQL surface
    * (`SELECT rolling_hash(text) ...`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_hash")
    reg.createOrReplaceTempFunction("rolling_hash", es => RollingHash(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "scala_udf")
  }
}
