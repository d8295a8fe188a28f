package graft.tools
import org.apache.spark.sql.SparkSession
object QTime {
  def main(args: Array[String]): Unit = {
    // mirror graft.Bench's session so timings are comparable to BENCH_r*.json
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (q <- args.drop(1)) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"$q: ${(System.nanoTime()-t0)/1e9}%.1f s, $n rows")
    }
    spark.stop()
  }
}
