package graft.tools
import org.apache.spark.sql.SparkSession

/** Diagnostic: run one SparkEntry query and dump it to parquet (for
  * out-of-band DuckDB oracle replays at non-default SFs). */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    val Array(dir, name, out) = args.take(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, dir).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
