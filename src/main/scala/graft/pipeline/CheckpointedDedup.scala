package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.DedupConfig

/** Checkpointed, resumable pipeline runner (SURVEY §2b P10–P12; north rule:
  * "resumable from checkpoint with per-partition lineage + metrics").
  *
  * Every stage materializes its output table plus per-partition lineage
  * rows in a `metrics` table:
  *   (run_id, stage, partition_id, rows_in, rows_out, checksum, hll_sketch, ts)
  * A stage is complete iff its table exists AND its metrics rows are
  * present; a re-submitted run with the same run_id skips completed stages
  * and reproduces IDENTICAL final assignments (everything downstream of the
  * deterministic generator/pipeline is deterministic by construction:
  * seeded permutations, stable sort keys, deterministic compaction).
  *
  * The checksum is an order-insensitive bit_xor of xxhash64 over the
  * stage's key columns; the HLL sketch counts distinct conv_ids per
  * partition — both are the reference sketch families doing the metrics
  * job the north star assigns them (SURVEY §2b P12).
  */
final class CheckpointedDedup(
    io: TableIO,
    cfg: DedupConfig = DedupConfig(),
    runId: String = "run-0") {

  import CheckpointedDedup._

  private def metricsName = s"$runId/metrics"

  /** Stages that executed (not resumed) in the last `run` call. */
  var computedStages: List[String] = Nil

  def run(transcripts: DataFrame): DataFrame = {
    val spark = transcripts.sparkSession
    computedStages = Nil

    val docs = stage(spark, "docs", keyCols = Seq("conv_id"),
      rowsInOf = () => transcripts.count()) { () =>
      DedupPipeline.buildDocs(transcripts)
    }
    val sigs = stage(spark, "signatures", keyCols = Seq("conv_id"),
      rowsInOf = () => docs.count()) { () =>
      DedupPipeline.signatures(docs, cfg)
    }
    val bands = stage(spark, "bands", keyCols = Seq("conv_id", "band_key"),
      rowsInOf = () => sigs.count()) { () =>
      DedupPipeline.bands(sigs, cfg)
    }
    val cand = stage(spark, "cand_pairs", keyCols = Seq("a", "b"),
      rowsInOf = () => bands.count()) { () =>
      DedupPipeline.candidatePairs(bands, cfg)
    }
    val verified = stage(spark, "verified_pairs", keyCols = Seq("a", "b"),
      rowsInOf = () => cand.count()) { () =>
      DedupPipeline.verifyPairs(cand, docs, cfg)
    }
    val assignments = stage(spark, "cluster_assignments", keyCols = Seq("conv_id", "cluster_id"),
      rowsInOf = () => verified.count()) { () =>
      DedupPipeline.connectedComponents(verified, sigs.select(col("conv_id")))
    }
    assignments
  }

  /** Read the metrics table (for tests / the resume planner). */
  def metrics(spark: SparkSession): DataFrame = io.read(spark, metricsName)

  private def stageComplete(spark: SparkSession, name: String): Boolean =
    io.exists(spark, s"$runId/$name") &&
      io.exists(spark, metricsName) &&
      !metrics(spark).where(col("stage") === name).isEmpty

  private def stage(spark: SparkSession, name: String, keyCols: Seq[String],
                    rowsInOf: () => Long)(compute: () => DataFrame): DataFrame = {
    if (stageComplete(spark, name)) {
      io.read(spark, s"$runId/$name")
    } else {
      val out = compute()
      io.write(out, s"$runId/$name")
      computedStages = computedStages :+ name
      val persisted = io.read(spark, s"$runId/$name")
      val rowsIn = rowsInOf()
      val lineage = partitionLineage(persisted, keyCols)
        .withColumn("run_id", lit(runId))
        .withColumn("stage", lit(name))
        .withColumn("rows_in", lit(rowsIn))
        .withColumn("ts", current_timestamp())
        .select("run_id", "stage", "partition_id", "rows_in", "rows_out",
          "checksum", "hll_sketch", "ts")
      io.append(lineage, metricsName)
      persisted
    }
  }
}

object CheckpointedDedup {
  /** Per-partition counters over a materialized stage output. */
  def partitionLineage(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val keyHash = xxhash64(keyCols.map(col): _*)
    val convLike = keyCols.head
    df.withColumn("partition_id", spark_partition_id())
      .groupBy(col("partition_id"))
      .agg(
        count(lit(1)).as("rows_out"),
        coalesce(bit_xor(keyHash), lit(0L)).as("checksum"),
        graft.functions.hll_agg(col(convLike), 12).as("hll_sketch"))
  }
}
