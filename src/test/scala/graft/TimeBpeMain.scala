package graft
import org.apache.spark.sql.SparkSession
object TimeBpeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .select(org.apache.spark.sql.functions.col("o_comment").as("text"))
      .limit(3000)
    val t0 = System.nanoTime()
    val m = graft.operators.BpeTrainer.train(docs, 400)
    println(s"o_comment limit=3000 learnable=${m.size} wall=${(System.nanoTime()-t0)/1e9}")
    spark.stop()
  }
}
