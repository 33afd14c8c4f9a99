package graft.examples

import graft.Sessions
import graft.functions.{Redact, Text}
import graft.lake.{LakeReader, LakeWriter}
import graft.operators.{Dedup, Sampling}
import graft.types.{ColType, TableSchema}

import org.apache.spark.sql.functions._

/** End-to-end training-data preparation over the library surface: curate
  * (quality gates → language filter → exact dedup) → redact PII →
  * deterministic train/holdout split → land both corpora as typed-CSV lake
  * tables → read back and reconcile counts. Every stage is an operator the
  * oracle suite verifies individually; this demo proves they compose.
  */
object TrainingPrepDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"

    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val qc = Text.qualityColumns(col("text")).toMap
    val quality = docs.filter(
      qc("n_words") >= 10 && qc("alpha_ratio_milli") >= 500 &&
        Text.langId(col("text")) === "en")
    val keep = Dedup.exact(quality, "doc_id", "text").select(col("keep_id").as("doc_id"))
    val kept = quality.join(keep, Seq("doc_id"), "left_semi")
    val redacted = kept.select(col("doc_id"), Redact.redact(col("text")).as("text"))
    val (train, holdout) = Sampling.split(redacted, col("doc_id"), holdoutMilli = 100)

    val root = s"file:///tmp/graft-trainprep/${java.util.UUID.randomUUID()}"
    def schema(t: String) = TableSchema(t, Seq(
      "doc_id" -> ColType.CInteger, "text" -> ColType.CString))
    LakeWriter.write(train, schema("train_docs"), root)
    LakeWriter.write(holdout, schema("holdout_docs"), root)

    val nTotal = docs.count()
    val nKept = kept.count()
    val nTrain = LakeReader.read(spark, root, "train_docs").count()
    val nHoldout = LakeReader.read(spark, root, "holdout_docs").count()
    println(s"TRAINPREP total=$nTotal curated=$nKept train=$nTrain holdout=$nHoldout")
    assert(nTrain + nHoldout == nKept, "split must partition the curated corpus")
    assert(nHoldout > 0 && nTrain > nHoldout, "holdout ~10% of corpus")
    spark.stop()
  }
}
