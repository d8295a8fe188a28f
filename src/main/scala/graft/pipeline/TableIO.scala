package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage seam (SURVEY §2b P1/P11): the north star writes Iceberg tables;
  * this sandbox has no Iceberg runtime jars, so the default implementation
  * is parquet-with-identical-semantics behind the same interface. A real
  * deployment swaps in an Iceberg catalog implementation (writeTo /
  * createOrReplace) without touching pipeline code.
  */
trait TableIO extends Serializable {
  def write(df: DataFrame, name: String): Unit
  def append(df: DataFrame, name: String): Unit
  def read(spark: SparkSession, name: String): DataFrame
  def exists(spark: SparkSession, name: String): Boolean
}

final class ParquetTableIO(root: String) extends TableIO {
  private def path(name: String) = s"$root/$name"

  override def write(df: DataFrame, name: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path(name))

  override def append(df: DataFrame, name: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path(name))

  override def read(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(path(name))

  override def exists(spark: SparkSession, name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(name), "_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}
