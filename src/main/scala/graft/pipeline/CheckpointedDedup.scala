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

  /** @param docsBuilder optional replacement for the docs stage body —
    *   callers whose input layout has a cheaper correct reconstruction
    *   (BucketedCorpus.readDocs streams docs off the bucket sort) inject
    *   it here; output must be identical to buildDocs (DocsSortedSpec). */
  def run(transcripts: DataFrame,
          docsBuilder: Option[() => DataFrame] = None): DataFrame = {
    val spark = transcripts.sparkSession
    computedStages = Nil

    val docs = stage(spark, "docs", keyCols = Seq("conv_id"),
      rowsInOf = () => transcripts.count()) { () =>
      docsBuilder.map(_.apply()).getOrElse(DedupPipeline.buildDocs(transcripts))
    }
    val sigs = stage(spark, "signatures", keyCols = Seq("conv_id"),
      rowsInOf = () => docs.count()) { () =>
      // checkpoint only what downstream stages consume: bands need the
      // minhash, CC needs conv_id, simhash is a cheap per-doc metric. The
      // shingle array (~8x the text bytes) is recomputed pair-locally by
      // verifyPairs and must NOT be materialized — at 100 TB the shingle
      // blow-up would dominate the checkpoint footprint.
      DedupPipeline.signatures(docs, cfg)
        .select(col("conv_id"), col("doc_len"), col("minhash"), col("simhash"))
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

  /** Stages with lineage rows at construction time — read ONCE per runner
    * (resume used to pay a metrics-table read per stage). The per-stage
    * table existence check stays live (cheap FS/catalog lookup, no job). */
  private var metricsStageSet: Option[Set[String]] = None
  private def stagesWithLineage(spark: SparkSession): Set[String] = {
    if (metricsStageSet.isEmpty) {
      metricsStageSet = Some(
        if (!io.exists(spark, metricsName)) Set.empty
        else metrics(spark).select(col("stage")).distinct()
          .collect().map(_.getString(0)).toSet)
    }
    metricsStageSet.get
  }

  private def stageComplete(spark: SparkSession, name: String): Boolean =
    stagesWithLineage(spark).contains(name) && io.exists(spark, s"$runId/$name")

  private val profile = sys.env.contains("SPARK_GRAFT_CKPT_PROFILE")
  private def prof[A](label: String)(f: => A): A = {
    if (!profile) f
    else {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ckpt] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
  }

  /** rows_out total of the stage computed immediately before, when that
    * stage ran in THIS call (resumed predecessors fall back to rowsInOf —
    * a metadata-only parquet count). Chaining the totals removes one count
    * job per stage: rows_in(stage N) == sum(rows_out(stage N-1)). */
  private var prevRowsOut: Long = -1L

  private def stage(spark: SparkSession, name: String, keyCols: Seq[String],
                    rowsInOf: () => Long)(compute: () => DataFrame): DataFrame = {
    if (prof(s"$name complete?")(stageComplete(spark, name))) {
      prevRowsOut = -1L
      io.read(spark, s"$runId/$name")
    } else {
      val out = compute()
      prof(s"$name write")(io.write(out, s"$runId/$name"))
      // stage output is on disk: release any intermediates the pipeline
      // persisted while computing it (verifyPairs' spread, winnow tables)
      DedupPipeline.unpersistIntermediates(spark)
      computedStages = computedStages :+ name
      val persisted = io.read(spark, s"$runId/$name")
      val rowsIn = prof(s"$name rowsIn")(
        if (prevRowsOut >= 0) prevRowsOut else rowsInOf())
      // collect the per-partition lineage (<= #partitions small rows): one
      // aggregation job yields BOTH the metrics rows and the rows_out
      // total the next stage needs; the append then writes driver-local
      // data with no second pass over the stage output
      val lineageLocal = prof(s"$name lineage")(
        partitionLineage(persisted, keyCols).collect())
      prevRowsOut = lineageLocal.map(_.getLong(1)).sum
      val lineage = spark.createDataFrame(
          java.util.Arrays.asList(lineageLocal: _*),
          lineageLocal.headOption.map(_.schema)
            .getOrElse(partitionLineage(persisted, keyCols).schema))
        .withColumn("run_id", lit(runId))
        .withColumn("stage", lit(name))
        .withColumn("rows_in", lit(rowsIn))
        .withColumn("ts", current_timestamp())
        .select("run_id", "stage", "partition_id", "rows_in", "rows_out",
          "checksum", "hll_sketch", "ts")
      prof(s"$name append")(io.append(lineage, metricsName))
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
