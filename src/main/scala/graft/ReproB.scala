import org.apache.spark.sql.SparkSession
object ReproB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    graft.ops.FileOps.materializeDocFiles(spark, sf)
    def once(): Seq[(String, Double)] = graft.SparkEntry.queries.toSeq.map { case (n, f) =>
      val t0 = System.nanoTime(); f(spark, sf).count(); n -> (System.nanoTime()-t0)/1e9
    }
    once() // warm
    val r = once()
    r.sortBy(-_._2).take(15).foreach { case (n, t) => println(f"STEADY $n%-24s $t%.2f") }
    println(f"STEADYTOTAL ${r.map(_._2).sum}%.1f")
    spark.stop()
  }
}
