package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.DedupConfig

/** Physical-plan contracts: the properties that make these operators
  * viable at 100 TB must hold in the EXECUTED plan, not just in intent —
  * filter pushdown into the parquet scan, column pruning, broadcast for
  * small dimensions, no cartesian products in the pipeline, and the
  * signature kernel inside WholeStageCodegen. A regression here is a
  * performance bug even while results stay correct. */
class PlanContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("q01: shipdate predicate pushes down to the parquet scan") {
    assume(new java.io.File(sf).isDirectory)
    val p = plan(graft.SparkEntry.queries("q01_lineitem_pricing_agg")(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushed filter in:\n${p.take(2000)}")
  }

  test("q01: scan reads only the referenced columns (pruning)") {
    assume(new java.io.File(sf).isDirectory)
    val p = plan(graft.SparkEntry.queries("q01_lineitem_pricing_agg")(spark, sf))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"),
      s"unpruned scan: $readSchema")
  }

  test("pipeline docs view prunes the documents scan to doc_id + text") {
    assume(new java.io.File(sf).isDirectory)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("string").as("conv_id"), col("text").as("doc"),
        length(col("text")).cast("long").as("doc_len"))
    val p = plan(DedupPipeline.signatures(docs, DedupConfig()))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"unpruned scan: $readSchema")
  }

  test("q02: the customer dimension joins via broadcast, not shuffle") {
    assume(new java.io.File(sf).isDirectory)
    val p = plan(graft.SparkEntry.queries("q02_orders_customer_join")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n${p.take(2000)}")
  }

  test("ANN brute force broadcasts the query side (scan-once pattern)") {
    assume(new java.io.File(sf).isDirectory)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.ops.Ann.bruteForceTopK(emb, emb.where(col("vec_id") < 10), 5))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"corpus side must not shuffle:\n${p.take(1500)}")
  }

  test("signature computation stays inside WholeStageCodegen") {
    // non-literal source so the projection is not constant-folded away
    val docs = spark.range(100)
      .select(col("id").cast("string").as("conv_id"),
        concat(lit("doc text number "), col("id")).as("doc"),
        lit(20L).as("doc_len"))
    val p = plan(DedupPipeline.signatures(docs, DedupConfig()))
    // "*(n)" is the WholeStageCodegen marker in the plan string; the
    // text_signature projection must sit under one, not in a fallback
    val sigLine = p.linesIterator.find(_.contains("text_signature")).getOrElse("")
    assert(sigLine.contains("*("), s"signature projection not codegen'd:\n$p")
  }

  test("no cartesian product anywhere in the end-to-end dedup plan") {
    val turns = Transcripts.generate(50)
    val asg = DedupPipeline.run(Transcripts.asDataFrame(spark, turns, 4), DedupConfig())
    val p = plan(asg)
    assert(!p.contains("CartesianProduct"), s"cartesian in pipeline:\n${p.take(2000)}")
  }

  test("bucketed transcripts reconstruct docs with NO shuffle (100 TB layout)") {
    // The production 10^12-turn table is stored bucketed by conv_id —
    // Spark's bucketed scan then satisfies buildDocs' groupBy(conv_id)
    // distribution requirement and the whole P2 stage runs exchange-free
    // (the scattered-layout corpus pays exactly one shuffle; see
    // BENCH/BASELINE.md docs-stage notes). Contract: no Exchange operator
    // in the executed plan over the bucketed table; results identical to
    // the scattered path.
    val turns = Transcripts.generate(80)
    val tdf = Transcripts.asDataFrame(spark, turns, 5)
    val tbl = "graft_bucketed_transcripts"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    tdf.write.bucketBy(8, "conv_id").sortBy("conv_id", "turn_idx")
      .format("parquet").saveAsTable(tbl)
    try {
      val docs = DedupPipeline.buildDocs(spark.table(tbl))
      val p = plan(docs)
      assert(!p.contains("Exchange"),
        s"bucketed doc reconstruction must be shuffle-free:\n${p.take(2000)}")
      val viaBuckets = docs.select("conv_id", "doc").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val viaShuffle = DedupPipeline.buildDocs(tdf).select("conv_id", "doc")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(viaBuckets === viaShuffle)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
