package graft
import org.apache.spark.sql.SparkSession

/** Wall-clock harness for BPE training at production-ish merge counts
  * (the round-10 criterion: a 256-merge train within 3× of a 16-merge
  * train — i.e. merge count must NOT multiply cluster work). Corpus =
  * sf0.1 documents text + a deterministic syllable vocabulary (the
  * real corpus alone exhausts after ~106 merges). Numbers are recorded
  * in COVERAGE.md.
  */
object TimeBpeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val syl = Array("ka", "ti", "mo", "ru", "sel", "pon", "dra", "vex",
      "qua", "lin", "zor", "fi", "hem", "bus")
    val rich = (0 until 20000).map { i =>
      val len = 3 + i % 5
      val word = (0 until len).map(j =>
        syl((i / math.max(1, j * 3 + 1) + j * 7 + i % (j + 2)) % syl.length))
        .mkString
      Seq.fill(2 + i % 7)(word).mkString(" ")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(org.apache.spark.sql.functions.col("text"))
      .unionAll(rich.toDF("text"))
    docs.cache(); docs.count()
    def time(n: Int, maxLocal: Long): Unit = {
      val t0 = System.nanoTime()
      // force BOTH tier gates the same way so the printed engine label
      // always matches the engine that actually ran
      val m = graft.operators.BpeTrainer.train(docs, n,
        maxLocalWords = maxLocal, maxLocalSymbols = maxLocal)
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
