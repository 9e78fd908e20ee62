package graft
import org.apache.spark.sql.SparkSession

/** Wall-clock harness for BPE training at production-ish merge counts
  * (the round-10 criterion: a 256-merge train within 3× of a 16-merge
  * train — i.e. merge count must NOT multiply cluster work). Numbers
  * are recorded in COVERAGE.md.
  */
object TimeBpeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .select(org.apache.spark.sql.functions.col("o_comment").as("text"))
      .limit(3000)
    docs.cache(); docs.count()
    def time(n: Int, maxLocal: Long): Unit = {
      val t0 = System.nanoTime()
      val m = graft.operators.BpeTrainer.train(docs, n,
        maxLocalWords = maxLocal)
      val eng = if (maxLocal == 0) "distributed" else "local"
      println(f"engine=$eng%s merges=$n%d learnable=${m.size}%d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time(16, Long.MaxValue) // JVM+Spark warm-up, then the measured runs
    time(16, Long.MaxValue)
    time(256, Long.MaxValue)
    time(400, Long.MaxValue)
    time(16, 0)
    time(64, 0)
    spark.stop()
  }
}
