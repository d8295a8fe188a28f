package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.DedupConfig
import graft.pipeline.DedupPipeline

/** Isolate the verify stage (P7) and A/B its join structure at one core
  * count. BenchStages r5 showed verify's wall at 32 cores is dominated not
  * by the pair_verify kernel (259 core-s, 1.56x inflation vs 8 threads)
  * but by the docs-side subtree `d = docs semi-join candIds` being
  * computed TWICE (once per side join): two ~220 core-s stages at 32
  * threads vs ~35 core-s each at 8 — a 5.4x inflation of the cached-text
  * decode, the same pathology BandProbe found on the cached-minhash scan.
  *
  *   sbt "runMain graft.tools.VerifyProbe <cores> <corpusDir> <modes-csv> [reps]"
  *
  * modes: base     — verifyPairsById as shipped
  *        dbase    — the pre-r5 inline plan: semi-joined `d` NOT persisted
  *                   (kept explicit so the A/B stays runnable after the
  *                   winner was wired into verifyPairsById)
  *        dpersist — persist `d` so the b-side join re-reads the small
  *                   candidate-docs cache instead of re-scanning the full
  *                   docs cache
  *        nosemi   — drop the candIds semi-join (join docs directly)
  *        single   — explode pair sides, ONE docs join, re-pair by
  *                   (a,b) groupBy
  * Runs the modes interleaved (m1 m2 ... m1 m2 ...) x reps in ONE JVM over
  * one shared setup; prints VERIFY_SECONDS per leg.
  */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val corpusDir = args(1)
    val modes = args(2).split(",").toSeq
    val reps = if (args.length > 3) args(3).toInt else 2
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig()

    val docs = graft.pipeline.BucketedCorpus.readDocs(spark, corpusDir)
      .withColumn("id", xxhash64(col("conv_id")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    docs.count()
    val sigs = docs.withColumn("sig",
        graft.functions.text_signature(col("doc"), cfg.shingleK, cfg.numHashes, cfg.seed))
      .select(col("id"), col("sig.minhash").as("minhash"))
    val cand = DedupPipeline.candidatePairsById(
        DedupPipeline.bandsById(sigs, cfg), cfg)
      .persist(StorageLevel.MEMORY_AND_DISK)
    cand.count()

    // JIT warm-up on a small slice (same kernel classes, tiny input)
    DedupPipeline.run(
      graft.pipeline.BucketedCorpus.readAuto(spark, corpusDir)
        .where(col("conv_id") <= "conv-000200"), cfg).count()

    def runLeg(mode: String): (Double, Long) = {
      val parts = spark.sessionState.conf.numShufflePartitions
      val spread = cand.repartition(parts, col("a"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val candIds = spread.select(col("a").as("id"))
        .unionByName(spread.select(col("b").as("id")))
        .distinct()
      def gates(j: DataFrame): DataFrame = j
        .withColumn("pv",
          graft.functions.pair_verify(col("doc_a"), col("doc_b"), cfg.shingleK, cfg.seed))
        .withColumn("jaccard", col("pv.jaccard"))
        .where(col("jaccard") >= lit(cfg.tauJaccard))
        .where(graft.functions.lcs_at_least(col("doc_a"), col("doc_b"),
          least(lit(cfg.tauLcs),
            (least(length(col("doc_a")), length(col("doc_b"))) / 2).cast("int"))))
        .select(least(col("ca"), col("cb")).as("a"),
          greatest(col("ca"), col("cb")).as("b"), col("jaccard"))
      var dPersisted: Option[DataFrame] = None
      val v: DataFrame = mode match {
        case "base" =>
          DedupPipeline.verifyPairsById(cand, docs, cfg).select(col("a"), col("b"), col("jaccard"))
        case "dbase" =>
          val d = docs.select(col("id"), col("conv_id"), col("doc"))
            .join(candIds, Seq("id"), "left_semi")
          gates(spread
            .join(d.select(col("id").as("a"), col("conv_id").as("ca"), col("doc").as("doc_a")), Seq("a"))
            .join(d.select(col("id").as("b"), col("conv_id").as("cb"), col("doc").as("doc_b")), Seq("b")))
        case "dpersist" =>
          val d = docs.select(col("id"), col("conv_id"), col("doc"))
            .join(candIds, Seq("id"), "left_semi")
            .persist(StorageLevel.MEMORY_AND_DISK)
          dPersisted = Some(d)
          gates(spread
            .join(d.select(col("id").as("a"), col("conv_id").as("ca"), col("doc").as("doc_a")), Seq("a"))
            .join(d.select(col("id").as("b"), col("conv_id").as("cb"), col("doc").as("doc_b")), Seq("b")))
        case "nosemi" =>
          val d = docs.select(col("id"), col("conv_id"), col("doc"))
          gates(spread
            .join(d.select(col("id").as("a"), col("conv_id").as("ca"), col("doc").as("doc_a")), Seq("a"))
            .join(d.select(col("id").as("b"), col("conv_id").as("cb"), col("doc").as("doc_b")), Seq("b")))
        case "single" =>
          // one docs scan: explode each pair into its two sides, join docs
          // once, then re-pair. pair key = (a, b) ids.
          val sides = spread.select(col("a"), col("b"),
              explode(array(struct(col("a").as("id"), lit(0).as("s")),
                struct(col("b").as("id"), lit(1).as("s")))).as("e"))
            .select(col("a"), col("b"), col("e.id").as("id"), col("e.s").as("s"))
          val d = docs.select(col("id"), col("conv_id"), col("doc"))
            .join(candIds, Seq("id"), "left_semi")
          val joined = sides.join(d, Seq("id"))
          gates(joined.groupBy(col("a"), col("b"))
            .agg(
              max(when(col("s") === 0, col("conv_id"))).as("ca"),
              max(when(col("s") === 0, col("doc"))).as("doc_a"),
              max(when(col("s") === 1, col("conv_id"))).as("cb"),
              max(when(col("s") === 1, col("doc"))).as("doc_b")))
      }
      val t0 = System.nanoTime()
      val n = v.count()
      val sec = (System.nanoTime() - t0) / 1e9
      spread.unpersist(blocking = true)
      dPersisted.foreach(_.unpersist(blocking = true))
      (sec, n)
    }

    for (r <- 1 to reps; m <- modes) {
      val (sec, n) = runLeg(m)
      println(f"VERIFY_SECONDS=$sec%.2f ROWS=$n MODE=$m REP=$r CORES=$cores")
    }
    spark.stop()
  }
}
