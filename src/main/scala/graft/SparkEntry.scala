package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.DedupConfig
import graft.ops.{Ann, TextOps}
import graft.pipeline.{DedupPipeline, Transcripts}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every SQL-checkable query casts double aggregates through decimal(18,2)
  * on BOTH sides so Spark and DuckDB compute identical exact sums (double
  * summation order is engine-dependent; decimal addition is not), and
  * aliases every computed column identically on both sides.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship: the full near-dup detection + clustering pipeline on a
    * deterministic synthetic transcripts corpus (driver smoke-checks rows>0). */
  def entry(spark: SparkSession): DataFrame = {
    val turns = Transcripts.generate(200)
    DedupPipeline.run(Transcripts.asDataFrame(spark, turns, 8), DedupConfig())
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational / SQL-checkable --------------------------------------
    "q01_lineitem_pricing_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1995-12-31 23:59:59")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(28,4)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q02_orders_customer_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          countDistinct(col("o_custkey")).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    "q03_events_heavy_hitters" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
        .orderBy(col("n").desc, col("event_type"))
        .limit(5)
    }),

    "q04_events_first_per_user" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .orderBy(col("user_id"))
    }),

    "q05_docs_exact_dedup" -> ((s, dir) => {
      // md5 key (not xxhash64) so DuckDB can replay it; the scale path uses
      // TextOps.exactDedup's 8-byte fingerprint instead.
      t(s, dir, "documents")
        .select(col("doc_id"), md5(regexp_replace(trim(col("text")), "\\s+", " ")).as("h"))
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .orderBy(col("h"))
    }),

    "q06_docs_token_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextOps.subwordCount(col("text")).cast("long").as("n_subwords"),
          length(col("text")).cast("long").as("len"))
        .orderBy(col("doc_id"))
    }),

    "q07_docs_quality" -> ((s, dir) => {
      val len = length(col("text")).cast("double")
      val safeLen = greatest(len, lit(1.0))
      t(s, dir, "documents")
        .select(col("doc_id"),
          ((len - length(regexp_replace(col("text"), "[.,;:!?]", ""))) / safeLen).as("punct_ratio"),
          ((len - length(regexp_replace(col("text"), "[0-9]", ""))) / safeLen).as("digit_ratio"))
        .orderBy(col("doc_id"))
    }),

    // word-trigram Jaccard between consecutive doc ids — n-gram Jaccard as
    // an exact, SQL-checkable operator (the all-pairs variant rides LSH)
    "q08_docs_ngram_jaccard" -> ((s, dir) => {
      val t0 = t(s, dir, "documents")
        .select(col("doc_id"), graft.functions.word_ngrams(col("text"), 3).as("tri"))
      val l = t0.select(col("doc_id").as("a"), col("tri").as("ta"))
      val r = t0.select(col("doc_id").as("b"), col("tri").as("tb"))
      l.join(r, col("b") === col("a") + 1)
        .where(size(col("ta")) > 0 && size(col("tb")) > 0)
        .select(col("a"), col("b"),
          (size(array_intersect(col("ta"), col("tb"))).cast("double") /
            size(array_union(col("ta"), col("tb")))).as("ngram_jaccard"))
        .orderBy(col("a"))
    }),

    // winnowing-fingerprint dedup: the fingerprint set doubles as the LSH
    // band key (docs sharing any fingerprint become candidates), then the
    // exact Jaccard gate verifies — a third candidate-generation modality
    // next to MinHash banding and SimHash banding
    "q09_docs_winnow_neardup" -> ((s, dir) => {
      val cfg = DedupConfig()
      val docs = t(s, dir, "documents")
        .select(col("doc_id").cast("string").as("conv_id"), col("text").as("doc"),
          length(col("text")).cast("long").as("doc_len"))
      val fp = docs.select(col("conv_id"),
        posexplode(graft.functions.winnow_fingerprints(col("doc"), 8, 16))
          .as(Seq("band_idx", "band_key")))
      val cand = DedupPipeline.candidatePairs(fp, cfg)
      DedupPipeline.verifyPairs(cand, docs, cfg)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("a"), col("b"))
    }),

    // ---- dedup pipeline on the documents table (rows-only checks) --------
    "q10_docs_lsh_neardup_pairs" -> ((s, dir) => {
      val cfg = DedupConfig()
      val docs = t(s, dir, "documents")
        .select(col("doc_id").cast("string").as("conv_id"), col("text").as("doc"),
          length(col("text")).cast("long").as("doc_len"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sigs = DedupPipeline.signatures(docs, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = DedupPipeline.candidatePairs(DedupPipeline.bands(sigs, cfg), cfg)
      DedupPipeline.verifyPairs(cand, docs, cfg)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"),
          col("lcs_len"), col("simhash_dist"))
        .orderBy(col("a"), col("b"))
    }),

    "q11_docs_lsh_clusters" -> ((s, dir) => {
      val cfg = DedupConfig()
      val docs = t(s, dir, "documents")
        .select(col("doc_id").cast("string").as("conv_id"), col("text").as("doc"),
          length(col("text")).cast("long").as("doc_len"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sigs = DedupPipeline.signatures(docs, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = DedupPipeline.candidatePairs(DedupPipeline.bands(sigs, cfg), cfg)
      val verified = DedupPipeline.verifyPairs(cand, docs, cfg)
      DedupPipeline.connectedComponents(verified, docs.select(col("conv_id")))
        .orderBy(col("conv_id"))
    }),

    "q12_transcripts_dedup_e2e" -> ((s, _) => {
      val turns = Transcripts.generate(500)
      DedupPipeline.run(Transcripts.asDataFrame(s, turns, 16), DedupConfig())
        .orderBy(col("conv_id"))
    }),

    "q13_docs_simhash_fingerprints" -> ((s, dir) => {
      val cfg = DedupConfig()
      val docs = t(s, dir, "documents")
        .select(col("doc_id").cast("string").as("conv_id"), col("text").as("doc"),
          length(col("text")).cast("long").as("doc_len"))
      DedupPipeline.signatures(docs, cfg)
        .select(col("conv_id"), col("simhash"), size(col("shingles")).as("n_shingles"))
        .orderBy(col("conv_id"))
    }),

    // ---- similarity search over embeddings (rows-only) -------------------
    "q14_embeddings_ann_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 10)
      Ann.bruteForceTopK(emb, queries, 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("score"), 6).as("score"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "q15_embeddings_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 10)
      Ann.lshTopK(emb, queries, 5, nPlanes = 6, nTables = 8)
        .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("score"), 6).as("score"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "q23_embeddings_ann_ivf" -> ((s, dir) => {
      import graft.ops.Ivf
      val emb = t(s, dir, "embeddings")
      val model = Ivf.fit(emb, k = 16, iters = 5)
      Ivf.topK(emb, emb.where(col("vec_id") < 10), model, 5, nProbe = 4)
        .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("score"), 6).as("score"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "q16_embeddings_neardup" -> ((s, dir) => {
      // the driver corpus has no planted embedding dups (max cosine ~0.51);
      // tau=0.3 exercises the operator non-trivially at every sf
      Ann.nearDupPairs(t(s, dir, "embeddings"), 0.3, nPlanes = 4, nTables = 8)
        .orderBy(col("a"), col("b"))
    }),

    // ---- text analysis (rows-only where not SQL-expressible) -------------
    "q17_docs_langid" -> ((s, dir) => {
      TextOps.langId(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang_pred"), col("lang_score"))
        .orderBy(col("doc_id"))
    }),

    "q18_docs_simhash_neardup" -> ((s, dir) => {
      val cfg = DedupConfig()
      val docs = t(s, dir, "documents")
        .select(col("doc_id").cast("string").as("conv_id"), col("text").as("doc"),
          length(col("text")).cast("long").as("doc_len"))
      val sigs = DedupPipeline.signatures(docs, cfg)
      DedupPipeline.simhashNearDupPairs(sigs, maxDist = 6, cfg)
        .orderBy(col("a"), col("b"))
    }),

    "q19_media_stats" -> ((s, _) => {
      import graft.ops.Multimodal
      Multimodal.mediaStats(Multimodal.syntheticMedia(s, 2000))
    }),

    // ---- sketch aggregates (SURVEY §2a families) --------------------------
    "q20_sketch_hll_distinct" -> ((s, dir) => {
      import graft.functions._
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(hll_count_distinct(col("l_partkey"), 12).as("approx_parts"),
          hll_count_distinct(col("l_orderkey"), 12).as("approx_orders"))
        .orderBy(col("l_returnflag"))
    }),

    "q21_sketch_kll_quantiles" -> ((s, dir) => {
      import graft.functions._
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(kll_sketch_agg(col("l_extendedprice"), 200).as("sk"))
        .select(col("l_returnflag"),
          kll_quantiles(col("sk"), array(lit(0.25), lit(0.5), lit(0.75), lit(0.95))).as("quantiles"),
          kll_rank(col("sk"), lit(30000.0)).as("rank_30k"),
          kll_partition_boundaries(col("sk"), 8).as("range_bounds"))
        .orderBy(col("l_returnflag"))
    }),

    // event_type cardinality << sketch capacity ⇒ offset stays 0 ⇒ the
    // sketch is EXACT here, so this one is SQL-checkable vs DuckDB.
    "q22_sketch_freq_heavy" -> ((s, dir) => {
      import graft.functions._
      t(s, dir, "events")
        .agg(freq_top_items(freq_sketch_agg(col("event_type"), 10), false).as("t"))
        .select(explode(col("t")).as("r"))
        .select(col("r.item").as("item"), col("r.estimate").as("estimate"))
        .orderBy(col("estimate").desc, col("item"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_lineitem_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1995-12-31 23:59:59'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_orders_customer_join" ->
      """SELECT c_mktsegment,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         COUNT(DISTINCT o_custkey) AS n_customers
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q03_events_heavy_hitters" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type
         ORDER BY n DESC, event_type LIMIT 5""",
    "q04_events_first_per_user" ->
      """SELECT user_id, event_id, event_type, ts FROM (
           SELECT user_id, event_id, event_type, ts,
                  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id""",
    "q05_docs_exact_dedup" ->
      """SELECT md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS h,
         MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
         FROM documents GROUP BY 1 ORDER BY h""",
    "q06_docs_token_stats" ->
      """SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
                   w -> GREATEST(1, CAST(CEIL(length(w) / 4.0) AS INT)))) AS BIGINT) END AS n_subwords,
         length(text) AS len
         FROM documents ORDER BY doc_id""",
    "q22_sketch_freq_heavy" ->
      """SELECT event_type AS item, COUNT(*) AS estimate
         FROM events GROUP BY 1 ORDER BY estimate DESC, item""",
    "q08_docs_ngram_jaccard" ->
      """WITH t AS (
           SELECT doc_id,
                  CASE WHEN len(w) >= 3
                       THEN list_transform(range(len(w)-2),
                            i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
                       ELSE [] END AS tri
           FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                 FROM documents))
         SELECT a.doc_id AS a, b.doc_id AS b,
                CAST(len(list_distinct(list_intersect(a.tri, b.tri))) AS DOUBLE)
                  / len(list_distinct(a.tri || b.tri)) AS ngram_jaccard
         FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
         WHERE len(a.tri) > 0 AND len(b.tri) > 0
         ORDER BY a""",
    "q07_docs_quality" ->
      """SELECT doc_id,
         (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
           / GREATEST(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
           / GREATEST(CAST(length(text) AS DOUBLE), 1.0) AS digit_ratio
         FROM documents ORDER BY doc_id"""
  )
}
