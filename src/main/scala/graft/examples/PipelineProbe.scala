package graft.examples
import graft.{Sessions, SparkEntry}
import org.apache.spark.sql.functions._

/** Probe: (1) MinHash-LSH recall vs exact Jaccard at sf0.1 (10x the verify
  * scale); (2) custom expressions through the SQL surface; (3) SRP-LSH ANN
  * recall vs brute force. */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val dir = "/root/testdata/sf0.1"
    val exact = SparkEntry.queries("d02_jaccard_pairs")(spark, dir).cache()
    val lsh = SparkEntry.queries("d03_minhash_pairs")(spark, dir).cache()
    val nExact = exact.count(); val nLsh = lsh.count()
    val missed = exact.except(lsh).count()
    val extra = lsh.except(exact).count()
    println(s"PROBE1 exact=$nExact lsh=$nLsh missed=$missed extra=$extra")

    org.apache.spark.sql.graft.exprs.register(spark)
    spark.read.parquet(s"$dir/documents.parquet").createOrReplaceTempView("documents")
    spark.sql("SELECT rolling_hash(text) AS h, simhash64(split(lower(text), ' ')) AS sh FROM documents LIMIT 3").show(false)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val bf = SparkEntry.queries("d06_knn_bruteforce")(spark, dir).select("query_id", "neighbor_id")
    val srp = SparkEntry.queries("d07_knn_srp")(spark, dir).select("query_id", "neighbor_id")
    val hit = bf.intersect(srp).count()
    println(s"PROBE3 srp_recall@5=${hit}/${bf.count()} (corpus=${emb.count()})")
    spark.stop()
  }
}
