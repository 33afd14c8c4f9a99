package graft.examples
import graft.Sessions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val queries = emb.filter(col("vec_id") < 20)
      val bf = Similarity.bruteForceTopK(emb, queries, 5).select("query_id", "neighbor_id").cache()
      val srp = Similarity.srpTopK(emb, queries, 5).select("query_id", "neighbor_id")
      val ivf = Similarity.ivfTopK(emb, queries, 5).select("query_id", "neighbor_id")
      val n = bf.count()
      println(s"RECALL $sf n=$n srp=${bf.intersect(srp).count()} ivf=${bf.intersect(ivf).count()}")
    }
    spark.stop()
  }
}
