package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core._

/** The Spark-native near-duplicate detection + clustering pipeline
  * (BASELINE.json north_star; stage numbering per SURVEY.md §2b).
  *
  * Scale design notes (100 TB / 10^12 turns):
  *  - P2 doc reconstruction: ONE shuffle on conv_id; stable (turn_idx, ts)
  *    ordering done with array_sort inside the aggregate, not a window
  *    (windows would shuffle + sort the full turn stream twice).
  *  - P3/P4 signatures: map-side only, no shuffle. One pass computes
  *    shingles + MinHash + SimHash per doc.
  *  - P5 banding: map-side explode; band keys are codegen'd built-ins
  *    (xxhash64 over signature slices).
  *  - P6 candidates: groupBy-free "chain + star" within each band bucket
  *    using window functions — emits ≤ 2 edges per bucket member instead of
  *    the O(m²) all-pairs self-join. Connectivity within a bucket is
  *    preserved (star to the bucket min + chain between sort-adjacent
  *    members), so cluster-level dup-pair recall is unaffected while hot
  *    boilerplate buckets (the skew driver) stay LINEAR. This is the
  *    structural skew guard; AQE skew-join splitting covers the residual
  *    joins (P9).
  *  - P7 verification: pairs carry raw text (not 8x-bigger shingle
  *    arrays); a fused expression computes exact Jaccard + SimHash
  *    distance pair-locally, Jaccard gates FIRST, suffix-automaton LCS
  *    runs only on survivors. Pair streams explicitly spread so AQE's
  *    size-based coalescing can't serialize the CPU-heavy phase.
  *  - P8 clustering: alternating large-star/small-star contraction
  *    (O(log n) rounds), window-min based — no collect_list, no RDDs;
  *    lineage cut per round with localCheckpoint.
  */
object DedupPipeline {

  /** Intermediates persisted by pipeline stages (verifyPairs' spread pair
    * stream, the winnow bucket/vocabulary tables, run()'s docs/sigs),
    * tracked per session so long-lived callers can release them: Spark
    * never auto-unpersists, and repeated library calls in one session
    * would otherwise accumulate cached blocks (ADVICE r3). Unpersisting
    * is safe at any point — downstream frames recompute — but call it
    * after materializing stage output (CheckpointedDedup does, per
    * stage). Verify-style callers that clearCache() per query need
    * nothing. */
  private val trackedPersists =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]()

  /** Verify-stage candidate-docs persist (VerifyProbe winner, r5);
    * SPARK_GRAFT_VERIFY_DPERSIST=0 re-selects the inline loser per JVM. */
  private def dPersist: Boolean =
    sys.env.getOrElse("SPARK_GRAFT_VERIFY_DPERSIST", "1") != "0"

  private def trackPersist(df: DataFrame): DataFrame = {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    trackedPersists
      .computeIfAbsent(df.sparkSession,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]())
      .add(df)
    df
  }

  /** Release every intermediate this pipeline persisted in `spark`. */
  def unpersistIntermediates(spark: SparkSession): Unit = {
    val q = trackedPersists.remove(spark)
    if (q != null) {
      val it = q.iterator()
      while (it.hasNext) {
        try it.next().unpersist(false)
        catch { case _: Throwable => }
      }
    }
  }

  /** P2: transcripts → docs(conv_id, doc, n_turns, doc_len).
    * Stable turn ordering: array_sort over struct(turn_idx, ts, text) sorts
    * lexicographically by field order — deterministic tie-break per
    * input_hint ("per-turn text equality under stable turn ordering").
    *
    * Layout note for the 10^12-turn table: store it BUCKETED by conv_id
    * (bucketBy + sortBy at write time) and this stage's groupBy runs
    * exchange-free — Spark's bucketed scan satisfies the aggregation's
    * distribution requirement, so the one shuffle this stage pays on a
    * scattered layout disappears entirely (pinned by PlanContractSpec
    * "bucketed transcripts reconstruct docs with NO shuffle"). */
  def buildDocs(transcripts: DataFrame): DataFrame =
    transcripts
      .select(col("conv_id"), col("turn_idx"), col("ts"), col("text"))
      .groupBy(col("conv_id"))
      .agg(
        concat_ws("\n",
          transform(
            array_sort(collect_list(struct(col("turn_idx"), col("ts"), col("text")))),
            s => s.getField("text"))).as("doc"),
        count(lit(1)).cast("int").as("n_turns"))
      .withColumn("doc_len", length(col("doc")).cast("long"))

  private val docsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("conv_id",
      org.apache.spark.sql.types.StringType, nullable = true), // null is a legal group key
    org.apache.spark.sql.types.StructField("doc",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("n_turns",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("doc_len",
      org.apache.spark.sql.types.LongType, nullable = false)))

  /** P2 over the PRODUCTION layout: streaming doc reconstruction for
    * inputs whose partitions are (a) conv_id-disjoint and (b) sorted by
    * (conv_id, turn_idx) within each partition — exactly what
    * BucketedCorpus.write lays down (one sorted file per bucket; with
    * Iceberg: `bucket(N, conv_id)` partitioning + a (conv_id, turn_idx)
    * sort order). Output is IDENTICAL to buildDocs (DocsSortedSpec pins
    * byte-equality incl. turn_idx tie-breaks and null text): one forward
    * pass per partition, O(1) state per in-flight conversation — no hash
    * table of every group in the task and no per-group array_sort. At
    * 10^12 turns this is the difference between an ObjectHashAggregate
    * buffering a task's entire bucket and a constant-memory merge; on the
    * 1M-conv bench corpus it is also ~1.7-2x faster wall at both widths
    * (DocsProbe: persist 5.99 -> 2.99 s at 8 cores, 2.55 -> 1.51 s at 32).
    *
    * Rows with equal (conv_id, turn_idx) — which the file sort leaves in
    * arbitrary relative order — are buffered per run and ordered by
    * (ts, text) with nulls first, matching buildDocs' array_sort struct
    * semantics; text comparison is by unsigned UTF-8 bytes (UTF8String
    * order), not String.compareTo (UTF-16 order differs above the BMP).
    * turn_idx monotonicity inside a partition is ASSERTED per row, so a
    * caller handing this a non-conforming layout fails loudly instead of
    * silently concatenating out of order. Use BucketedCorpus.readDocs,
    * which engages this path only when the layout guarantees hold. */
  def buildDocsSorted(transcripts: DataFrame): DataFrame = {
    val spark = transcripts.sparkSession
    val projected =
      transcripts.select(col("conv_id"), col("turn_idx"), col("ts"), col("text"))
    // Loud guard against the one layout violation the per-row monotonicity
    // assert CANNOT catch: a direct file scan whose partitions are byte
    // ranges rather than whole bucket files (Spark splits multi-row-group
    // files at maxPartitionBytes when the scan is not bucket-aligned) — a
    // conversation straddling a split emits two partial docs, each still
    // sorted. A plan WITH an exchange re-establishes its own partitioning
    // (the caller's repartition + sortWithinPartitions contract, exercised
    // by the specs), so only the direct-scan shape is rejected. Production
    // callers go through BucketedCorpus.readDocs, which pins
    // bucketedScan=true before calling here.
    // AQE hides the tree behind AdaptiveSparkPlanExec (no children), so
    // collect/exists must recurse into its inputPlan — otherwise an
    // unaligned split scan under an adaptive wrapper passed the guard
    // unverified, and the mere PRESENCE of the wrapper counted as
    // "repartitioned" (ADVICE r5: only a real ShuffleExchange
    // re-establishes partitioning).
    def deepCollect[A](p: org.apache.spark.sql.execution.SparkPlan)(
        f: PartialFunction[org.apache.spark.sql.execution.SparkPlan, A]): Seq[A] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          deepCollect(a.inputPlan)(f)
        case q if f.isDefinedAt(q) => Seq(f(q))
      }.flatten
    val plan = projected.queryExecution.executedPlan
    val unalignedScans = deepCollect(plan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec if !s.bucketedScan => s
    }
    val repartitioned = deepCollect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.nonEmpty
    require(unalignedScans.isEmpty || repartitioned,
      "buildDocsSorted: input is a direct file scan without bucket-aligned " +
        "partitions (bucketedScan=false) — file splitting would silently " +
        "break conversations across tasks; use BucketedCorpus.readDocs, or " +
        "repartition+sortWithinPartitions by (conv_id, turn_idx) explicitly")
    // InternalRow path (r6): the old external-Row form decoded every turn's
    // text to a java.lang.String, built docs in a StringBuilder, then paid
    // createDataFrame's Row→InternalRow re-encode of every doc — at 1M
    // convs the docs stage spent 46 of its 196 core-seconds in GC
    // (BenchStages r6 baseline). This form reads the scan's UTF8Strings
    // zero-copy, buffers turn bytes in REUSED scratch arrays (zero per-turn
    // allocation), and emits InternalRows directly — identical output
    // (DocsSortedSpec byte-equality incl. ties, nulls, non-BMP lengths).
    val rdd = projected.queryExecution.toRdd.mapPartitions { it =>
      new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
        import org.apache.spark.unsafe.Platform
        import org.apache.spark.unsafe.types.UTF8String
        // `started` (not cur == null) marks the no-open-conversation
        // state: a null conv_id is a legal GROUP BY key in buildDocs, so
        // the stream path must emit it as its own group too, not silently
        // graft its turns onto the next conversation
        private var started = false
        private var cur: UTF8String = null      // cloned (scan rows are reused)
        private var nTurns = 0
        private var anyText = false             // concat_ws skips null elems
        private var lastIdx = 0
        private var lastIdxNull = false
        private var idxSeen = false
        // doc assembly buffer (reused across conversations)
        private var doc = new Array[Byte](1 << 14)
        private var docLen = 0
        // tie run: rows sharing (conv_id, turn_idx), ordered on flush by
        // (ts NULLS FIRST, text-bytes NULLS FIRST) — buildDocs' array_sort
        // struct semantics. Turn text bytes are copied into one reused
        // scratch buffer; parallel arrays carry per-entry offsets/ts.
        private var scratch = new Array[Byte](1 << 14)
        private var scratchLen = 0
        private var runN = 0
        private var runEnd = new Array[Int](8)   // end offset in scratch
        private var runNullText = new Array[Boolean](8)
        private var runTs = new Array[Long](8)
        private var runTsNull = new Array[Boolean](8)
        private var pending: org.apache.spark.sql.catalyst.InternalRow = null
        private var done = false

        private def growDoc(need: Int): Unit =
          if (docLen + need > doc.length)
            doc = java.util.Arrays.copyOf(doc, math.max(doc.length * 2, docLen + need))
        private def growScratch(need: Int): Unit =
          if (scratchLen + need > scratch.length)
            scratch = java.util.Arrays.copyOf(scratch, math.max(scratch.length * 2, scratchLen + need))
        private def growRun(): Unit = if (runN == runEnd.length) {
          runEnd = java.util.Arrays.copyOf(runEnd, runN * 2)
          runNullText = java.util.Arrays.copyOf(runNullText, runN * 2)
          runTs = java.util.Arrays.copyOf(runTs, runN * 2)
          runTsNull = java.util.Arrays.copyOf(runTsNull, runN * 2)
        }

        /** unsigned byte compare of scratch slices [sa,ea) vs [sb,eb) */
        private def cmpSlice(sa: Int, ea: Int, sb: Int, eb: Int): Int = {
          val n = math.min(ea - sa, eb - sb)
          var i = 0
          while (i < n) {
            val d = (scratch(sa + i) & 0xff) - (scratch(sb + i) & 0xff)
            if (d != 0) return d
            i += 1
          }
          (ea - sa) - (eb - sb)
        }
        /** run order: ts nulls first, then ts, then text (nulls first, bytes) */
        private def runLt(a: Int, b: Int): Boolean = {
          if (runTsNull(a) != runTsNull(b)) return runTsNull(a)
          if (!runTsNull(a) && runTs(a) != runTs(b)) return runTs(a) < runTs(b)
          if (runNullText(a) != runNullText(b)) return runNullText(a)
          if (runNullText(a)) return false
          cmpSlice(if (a == 0) 0 else runEnd(a - 1), runEnd(a),
            if (b == 0) 0 else runEnd(b - 1), runEnd(b)) < 0
        }
        private def appendEntry(i: Int): Unit = {
          nTurns += 1
          if (!runNullText(i)) {
            val s = if (i == 0) 0 else runEnd(i - 1)
            val n = runEnd(i) - s
            growDoc(n + 1)
            if (anyText) { doc(docLen) = '\n'; docLen += 1 }
            System.arraycopy(scratch, s, doc, docLen, n)
            docLen += n
            anyText = true
          }
        }
        private def flushRun(): Unit = {
          if (runN == 1) appendEntry(0)
          else if (runN > 0) {
            // insertion sort of entry indices (runs are tiny: tie groups)
            val idx = new Array[Int](runN)
            var i = 0
            while (i < runN) { idx(i) = i; i += 1 }
            i = 1
            while (i < runN) {
              val v = idx(i)
              var j = i - 1
              while (j >= 0 && runLt(v, idx(j))) { idx(j + 1) = idx(j); j -= 1 }
              idx(j + 1) = v
              i += 1
            }
            i = 0
            while (i < runN) { appendEntry(idx(i)); i += 1 }
          }
          runN = 0
          scratchLen = 0
        }
        private def emit(): org.apache.spark.sql.catalyst.InternalRow = {
          flushRun()
          val docStr = UTF8String.fromBytes(java.util.Arrays.copyOf(doc, docLen))
          val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](cur, docStr, nTurns, docStr.numChars().toLong))
          docLen = 0; nTurns = 0; anyText = false
          lastIdxNull = false; idxSeen = false
          r
        }

        override def hasNext: Boolean = {
          if (pending != null) return true
          if (done) return false
          while (it.hasNext) {
            val r = it.next()
            val id = if (r.isNullAt(0)) null else r.getUTF8String(0)
            val idxNull = r.isNullAt(1)
            val idx = if (idxNull) 0 else r.getInt(1)
            val sameConv = started &&
              (if (cur == null) id == null else id != null && cur.equals(id))
            val out =
              if (started && !sameConv) { pending = emit(); true } else false
            if (!sameConv) { cur = if (id == null) null else id.clone(); started = true }
            if (idxSeen && (idxNull != lastIdxNull || (!idxNull && idx != lastIdx))) {
              // null turn_idx sorts first (struct-field NullsFirst), so a
              // null AFTER a non-null — or any decrease — is a violation
              require(lastIdxNull || (!idxNull && idx >= lastIdx),
                s"buildDocsSorted: partition not sorted by (conv_id, turn_idx) " +
                  s"at conv_id=$id turn_idx=${if (idxNull) "null" else idx} " +
                  s"after ${if (lastIdxNull) "null" else lastIdx}")
              flushRun()
            }
            lastIdx = idx; lastIdxNull = idxNull; idxSeen = true
            growRun()
            if (r.isNullAt(2)) { runTsNull(runN) = true; runTs(runN) = 0L }
            else { runTsNull(runN) = false; runTs(runN) = r.getLong(2) }
            if (r.isNullAt(3)) runNullText(runN) = true
            else {
              runNullText(runN) = false
              val t = r.getUTF8String(3)
              val n = t.numBytes()
              growScratch(n)
              Platform.copyMemory(t.getBaseObject, t.getBaseOffset,
                scratch, Platform.BYTE_ARRAY_OFFSET + scratchLen, n)
              scratchLen += n
            }
            runEnd(runN) = scratchLen
            runN += 1
            if (out) return true
          }
          done = true
          if (started) { pending = emit(); started = false; return true }
          false
        }
        override def next(): org.apache.spark.sql.catalyst.InternalRow = {
          val r = pending; pending = null; r
        }
      }
    }
    org.apache.spark.sql.GraftBridge.internalCreateDataFrame(spark, rdd, docsSchema)
  }

  /** P3+P4: docs → signatures(conv_id, doc_len, shingles, minhash, simhash).
    * Catalyst expression path (graft.functions.text_signature): one pass
    * over the UTF-8 bytes, zero-copy, stays inside WholeStageCodegen.
    * Deliberately does NOT carry the doc text: signatures flow through the
    * banding/verification joins, and shuffling the raw corpus alongside
    * them would multiply shuffle volume (the doc is re-joined only for the
    * few pairs that survive the Jaccard gate). */
  def signatures(docs: DataFrame, cfg: DedupConfig): DataFrame =
    docs.withColumn("sig",
        graft.functions.text_signature(col("doc"), cfg.shingleK, cfg.numHashes, cfg.seed))
      .select(col("conv_id"), col("doc_len"),
        col("sig.shingles").as("shingles"),
        col("sig.minhash").as("minhash"),
        col("sig.simhash").as("simhash"))

  /** P4-only projection: (conv_id, simhash) for consumers that read ONLY
    * the simhash — same shingle pass and fingerprint as `signatures` (the
    * values are bit-identical, SignatureSpec) without the 64-affine-hash
    * minhash loop, which is ~95% of the signature kernel's multiply-adds. */
  def simhashSignatures(docs: DataFrame, cfg: DedupConfig): DataFrame =
    docs.select(col("conv_id"),
      graft.functions.simhash64(col("doc"), cfg.shingleK, cfg.seed).as("simhash"))

  /** Slice-1 UDF variant, kept for benchmarking expression-vs-UDF. */
  def signaturesUdf(docs: DataFrame, cfg: DedupConfig): DataFrame = {
    val k = cfg.shingleK; val n = cfg.numHashes; val seed = cfg.seed
    val sigUdf = udf { (text: String) =>
      val sh = Shingles.shinglesOf(if (text == null) "" else text, k, seed)
      val mh = graft.functions.TextSignatureExpr.hasher(n, seed)
      (sh, mh.signature(sh), SimHash64.fingerprint(sh))
    }
    docs.withColumn("sig", sigUdf(col("doc")))
      .select(col("conv_id"), col("doc"), col("doc_len"),
        col("sig._1").as("shingles"),
        col("sig._2").as("minhash"),
        col("sig._3").as("simhash"))
  }

  /** P5: signatures → bands(conv_id, band_idx, band_key).
    * band_key folds the band index in, so one global shuffle key space
    * serves all bands. Map-side only. */
  def bands(signatures: DataFrame, cfg: DedupConfig): DataFrame = {
    val r = cfg.rowsPerBand
    val keys = transform(
      sequence(lit(0), lit(cfg.bands - 1)),
      i => xxhash64(i, slice(col("minhash"), i * lit(r) + lit(1), lit(r))))
    signatures
      .select(col("conv_id"), posexplode(keys).as(Seq("band_idx", "band_key")))
  }

  /** P6: bands → cand_pairs(a, b) with a < b.
    * Chain + star per band bucket via window functions (see scale notes).
    * Bucket membership is sorted by (xxhash64(conv_id), conv_id) — a
    * deterministic total order with 8-byte primary sort keys (see
    * chainStar below for the measurement); output pairs are re-oriented
    * a < b lexicographically.
    *
    * Connectivity assumption (probabilistic, NOT structural): every bucket
    * member gets a direct edge to the bucket's first member under the
    * order, so two true dups sharing a bucket stay connected through it —
    * unless that member is a false-positive band collision that then fails
    * the Jaccard gate AND the chain intermediates between them fail it
    * too. A missed link therefore needs a false positive ordered below
    * both dups in EVERY one of the cfg.bands=32 independent bands that
    * catch the pair; with per-band FP rates ≪ 1 the joint miss
    * probability is negligible (measured: recall 1.0 at 200 and 2000
    * convs vs the exact oracle, under both orderings). The alternative —
    * all-pairs per bucket — is the O(m²) skew hazard this design exists
    * to avoid; simhashNearDupPairs shows the bounded all-pairs variant
    * where a pair-level contract is required.
    *
    * Salted band keys (P5/P9): with cfg.bandSalt = S > 1 each bucket is
    * split into S deterministic sub-buckets — the per-window sort for a hot
    * boilerplate bucket is bounded at bucket/S — and connectivity across
    * sub-buckets is restored by chaining the S sub-bucket minima in a
    * second, tiny window pass (≤ S rows per band key). */
  /** Chain+star edges generated map-side from a SORTED bucket member
    * array (no window sort): chain = adjacent members, star = first
    * member to every member beyond the second (the chain already links
    * first to member 2). Identical edge set to the windowed chainStar
    * when the array uses the same bucket order. */
  private[pipeline] def chainStarArrayEdges(ms: Column): Column = concat(
    filter(zip_with(ms, slice(ms, lit(2), greatest(size(ms) - 1, lit(1))),
      (a, b) => struct(a.as("a"), b.as("b"))), p => p.getField("b").isNotNull),
    transform(slice(ms, lit(3), greatest(size(ms) - 2, lit(1))),
      y => struct(element_at(ms, 1).as("a"), y.as("b"))))

  /** A/B alternative to candidatePairs (unsalted path): hash-aggregate
    * per-bucket sorted member arrays, then emit chain+star edges
    * map-side — replaces the global (band_key, conv_id) window SORT of
    * the 9.6M-row band stream with a hash aggregation. Bucket arrays are
    * materialized per key, so this variant is for salt-bounded/advised
    * streams (the windowed form streams hot buckets in O(1) memory).
    *
    * MEASURED (graft.tools.CandAB, 300k convs, identical 110,344-pair
    * output, empty symmetric difference): window 3.11 s / agg 3.25 s at
    * 32 cores, window 4.77 s / agg 5.74 s at 8 — the windowed form wins
    * at both widths AND has the better skew story, so it stays the
    * production path; this one remains as the measured alternative. */
  private[graft] def candidatePairsAgg(bands: DataFrame, cfg: DedupConfig): DataFrame = {
    bands.groupBy(col("band_key"))
      // members sorted by (xxhash64(conv_id), conv_id) — the same bucket
      // order the windowed production path uses, so the emitted edge set
      // is identical
      .agg(transform(
        sort_array(collect_list(struct(xxhash64(col("conv_id")).as("h"), col("conv_id")))),
        s => s.getField("conv_id")).as("ms"))
      .where(size(col("ms")) >= 2)
      .select(explode(chainStarArrayEdges(col("ms"))).as("e"))
      .where(col("e.a") =!= col("e.b"))
      .select(least(col("e.a"), col("e.b")).as("a"),
        greatest(col("e.a"), col("e.b")).as("b"))
      .distinct()
  }

  def candidatePairs(bands: DataFrame, cfg: DedupConfig): DataFrame = {
    val salted = if (cfg.bandSalt > 1) {
      bands.withColumn("salt", pmod(xxhash64(col("conv_id")), lit(cfg.bandSalt)))
    } else bands.withColumn("salt", lit(0L))

    def chainStar(df: DataFrame, parts: Seq[String]): DataFrame = {
      val pcols = parts.map(col)
      // Bucket members are ordered by (xxhash64(conv_id), conv_id), not by
      // conv_id: chain+star connectivity holds under ANY deterministic
      // total order, and the window sort — this stage's dominant cost —
      // compares one 8-byte long (ties broken by the string) instead of
      // UTF8 strings. Measured (CandAB, 1M-conv band stream): 13.8 → 11.1 s
      // at 32 cores, 19.6 → 18.9 s at 8; stage 8→32 ratio 0.36 → 0.43.
      val ord = Seq(col("h"), col("conv_id"))
      val w = Window.partitionBy(pcols: _*).orderBy(ord: _*)
      val wAll = Window.partitionBy(pcols: _*)
        .orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // ONE pass over the window output: both edge kinds are emitted from
      // the same row via a 2-element explode (a union of two filters over
      // the window subtree would shuffle + sort the band stream TWICE —
      // Spark has no automatic subtree reuse without an explicit persist).
      // chain edge: (prev, conv_id) when prev exists; star edge:
      // (bucket_first, conv_id) when it adds information beyond the chain
      // (null `when` arms drop out in the filter below).
      //
      // The repartition is EXPLICIT for the same reason as verifyPairs
      // step 1: left to AQE, the window's exchange coalesces to ~cores
      // (35 partitions at 32 cores, 14 at 8 on the 1M band stream) and
      // this stage's uniform sort-heavy tasks then run in two waves with
      // a mostly-idle second wave — measured 7.6 s of the 14.7 s stage
      // wall at 32 cores. An explicit partition count is honored by AQE,
      // keeps tasks ~1/8 the size (cache-friendlier sorts), and satisfies
      // the window's required distribution so no second exchange appears.
      val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
      df
        .repartition(nParts, pcols: _*)
        .withColumn("h", xxhash64(col("conv_id")))
        .withColumn("prev", lag(col("conv_id"), 1).over(w))
        .withColumn("bmin", first(col("conv_id")).over(wAll))
        .select(explode(array(
          struct(col("prev").as("a"), col("conv_id").as("b")),
          struct(when(col("bmin") =!= col("conv_id") && col("bmin") =!= col("prev"),
            col("bmin")).as("a"), col("conv_id").as("b")))).as("e"))
        .where(col("e.a").isNotNull)
        // orient a < b explicitly (hash order is not conv_id order); self
        // edges (band_key hash collisions within one conv) drop here
        .where(col("e.a") =!= col("e.b"))
        .select(least(col("e.a"), col("e.b")).as("a"),
          greatest(col("e.a"), col("e.b")).as("b"))
    }

    if (cfg.bandSalt > 1) {
      val within = chainStar(salted.select(col("band_key"), col("salt"), col("conv_id")),
        Seq("band_key", "salt"))
      // sub-bucket minima, then link them per band key (tiny: ≤ S rows/key)
      val minima = salted.groupBy(col("band_key"), col("salt"))
        .agg(min(col("conv_id")).as("conv_id"))
      val across = chainStar(minima.select(col("band_key"), col("conv_id")), Seq("band_key"))
      within.unionByName(across)
        .distinct()
    } else {
      chainStar(bands.select(col("band_key"), col("conv_id")), Seq("band_key"))
        .distinct()
    }
  }

  /** P7: verify candidate pairs with exact Jaccard (the oracle-parity
    * gate) then the LCS check on survivors (north_star: "exact Jaccard
    * plus suffix-array longest-common-substring checks" — applied in
    * decision form, see Lcs.hasCommonRun; Lcs.lcsLength keeps the exact
    * automaton). Returns verified_pairs(a, b, jaccard, simhash_dist,
    * simhash_ok).
    *
    * Gate semantics:
    *  - Jaccard ≥ cfg.tauJaccard gates FIRST (identical criterion to the
    *    recall oracle — OracleDedup — so pipeline recall is measured
    *    against exactly this bar).
    *  - The LCS gate is length-adaptive: lcs_len ≥ min(cfg.tauLcs,
    *    min(|doc_a|, |doc_b|) / 2). A genuine near-dup at J ≥ 0.8 keeps a
    *    common run ≥ roughly L/(e+1) with e edits, and J ≥ 0.8 bounds e to
    *    ~(L-k)/(4k·...) — in practice runs ≫ tauLcs for long docs, while
    *    docs shorter than 2·tauLcs only need half their length (so a
    *    near-edge edit on a short doc never drops a legit dup). A
    *    block-shuffled adversarial pair (high set overlap, no long common
    *    run) on long docs fails the 64-char bar.
    *  - cfg.simhashMaxDist is RECORDED (simhash_ok column), not gated:
    *    at J near tau the Hamming distance legitimately exceeds small
    *    thresholds, so gating on it would cut recall below the oracle bar.
    *
    * Shuffle discipline at scale:
    *  1. candidate pairs (tiny rows) are explicitly SPREAD across the full
    *     shuffle-partition count — AQE's size-based coalescing would fold
    *     the CPU-heavy verification onto 1-2 tasks otherwise;
    *  2. docs are semi-joined down to ids that appear in a pair before
    *     joining (candidates are a small fraction of the corpus);
    *  3. the join carries RAW TEXT, not precomputed shingle arrays (the
    *     shingle set is ~8x the text size); pair_verify recomputes both
    *     shingle sets pair-locally in one fused expression (Jaccard +
    *     SimHash distance), and the O(n) rolling-hash LCS decision runs
    *     only on Jaccard-gate survivors.
    */
  def verifyPairs(candPairs: DataFrame, docs: DataFrame,
                  cfg: DedupConfig): DataFrame = {
    // persisted because BOTH the candidate-id semi-join below and the
    // verification join consume it — without the cache the whole upstream
    // candidate subtree (banding windows / winnow tiers) computes twice.
    // No explicit partition count on the spread: with one, AQE must leave
    // the exchange alone, so a few-thousand-pair stream (sf0.1 queries,
    // resume re-verification) pays 4 stages x 256 near-empty task launches;
    // without one, AQE's parallelism-first coalescing keeps ~total-cores
    // partitions for heavy streams (it ignores the 64 MB advisory target
    // and respects only the 1 MB minimum) and folds tiny streams to a
    // handful of tasks. Hash-distributing on `a` still spreads hot heads
    // across whatever count AQE picks.
    val spread = trackPersist(candPairs.repartition(col("a")))

    val candIds = spread.select(col("a").as("conv_id"))
      .unionByName(spread.select(col("b").as("conv_id")))
      .distinct()
    // persisted for the same reason as the id path (verifyPairsById): both
    // side joins consume d, and recomputing it re-scans the full docs
    // cache twice (VerifyProbe A/B — see verifyPairsById).
    val d0 = docs.select(col("conv_id"), col("doc"))
      .join(candIds, Seq("conv_id"), "left_semi")
    val d = if (dPersist) trackPersist(d0) else d0

    spread
      .join(d.select(col("conv_id").as("a"), col("doc").as("doc_a")), Seq("a"))
      .join(d.select(col("conv_id").as("b"), col("doc").as("doc_b")), Seq("b"))
      .withColumn("pv",
        graft.functions.pair_verify(col("doc_a"), col("doc_b"), cfg.shingleK, cfg.seed))
      .withColumn("jaccard", col("pv.jaccard"))
      .where(col("jaccard") >= lit(cfg.tauJaccard)) // the oracle-parity gate
      // north-star LCS check, length-adaptive: common run ≥ min(tauLcs,
      // minLen/2) must exist. Decision form (Lcs.hasCommonRun) — the exact
      // automaton cost ~7ms/pair and its allocation churn made verify the
      // worst-scaling stage at 32 cores (GC contention).
      .where(graft.functions.lcs_at_least(col("doc_a"), col("doc_b"),
        least(lit(cfg.tauLcs),
          (least(length(col("doc_a")), length(col("doc_b"))) / 2).cast("int"))))
      .select(col("a"), col("b"), col("jaccard"),
        col("pv.simhash_dist").as("simhash_dist"),
        (col("pv.simhash_dist") <= lit(cfg.simhashMaxDist)).as("simhash_ok"))
  }

  /** Complete near-dup PAIR listing: verified edges → connected
    * components → exhaustive intra-cluster verification. Chain+star keeps
    * candidate generation linear per bucket, so a true pair inside a
    * 4+-member bucket may never be DIRECTLY tested (coverage of direct
    * pairs is probabilistic — candidatePairs doc); cluster connectivity,
    * however, is near-certain (a J ≥ τ pair shares ~13 of 32 band buckets
    * in expectation, each bucket a chain of verified family edges). This
    * operator turns that into a STRUCTURAL pair-level contract: group the
    * cluster members and re-verify all intra-cluster pairs with the exact
    * Jaccard + LCS gates. The output is inherently quadratic in family
    * size — that is the ask ("list every near-dup pair"); dedup itself
    * consumes clusters (run/CheckpointedDedup), not this listing. */
  def completeNearDupPairs(verified: DataFrame, docs: DataFrame,
                           cfg: DedupConfig): DataFrame = {
    val asg = connectedComponents(verified.select(col("a"), col("b")),
      docs.select(col("conv_id")))
    val intra = asg.groupBy(col("cluster_id"))
      .agg(sort_array(collect_list(col("conv_id"))).as("ms"))
      .where(size(col("ms")) >= 2)
      .select(explode(arrayCombos(col("ms"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    verifyPairs(intra, docs, cfg)
  }

  /** SimHash near-dup pairs via pigeonhole banding: split the 64-bit
    * fingerprint into 4×16-bit bands; any pair within Hamming distance 3
    * agrees on at least one band (pigeonhole), and this operator emits ALL
    * pairs within each band bucket — so the returned PAIR SET is complete
    * for dist ≤ 3 among docs whose buckets fit cfg.maxBucketSize. Pairs at
    * distance 4..maxDist are found with high probability only. Buckets
    * larger than cfg.maxBucketSize (boilerplate pile-ups) are excluded from
    * pair emission — the standard LSH skew guard; count them with
    * `oversizedBuckets` rather than silently assuming zero.
    *
    * Unlike the MinHash path this does NOT use chain+star thinning: the
    * contract here is pair-level (dist ≤ 3 ⇒ pair emitted), and thinning
    * inside a 4+-member bucket would drop non-adjacent non-min pairs. The
    * all-pairs join stays cheap because 16-bit band keys spread docs across
    * 65k buckets; the cap bounds the worst case. */
  def simhashNearDupPairs(signatures: DataFrame, maxDist: Int, cfg: DedupConfig): DataFrame = {
    val bands = simhashBands(signatures)
    val sized = bands.withColumn("bucket_n",
      count(lit(1)).over(Window.partitionBy(col("band_key"))))
    val kept = sized.where(col("bucket_n") <= cfg.maxBucketSize)
    kept.as("l").join(kept.as("r"),
        col("l.band_key") === col("r.band_key") && col("l.conv_id") < col("r.conv_id"))
      .select(col("l.conv_id").as("a"), col("r.conv_id").as("b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("simhash_dist"))
      .where(col("simhash_dist") <= maxDist)
      .distinct()
  }

  /** Weight marking a connectivity link pair (tier-2 sub-bucket minima
    * chain) — passes any overlap prefilter unconditionally. */
  private[pipeline] val WinnowLinkWeight: Long = 1L << 40

  /** All ordered pairs (a < b) of a SORTED members array, generated
    * map-side: flatten(x_i × tail_i). No join, no shuffle. */
  private def arrayCombos(ms: Column): Column =
    flatten(transform(ms, (x, i) =>
      transform(slice(ms, i + lit(2), size(ms)), y =>
        struct(x.as("a"), y.as("b")))))

  /** Internal: the weighted candidate-pair stream (a, b, wt, tier) BEFORE
    * per-pair aggregation — exposed for the linear-growth scale tests.
    * tier 1 rows carry wt = 1 (exact co-occurrence counts); tier 2 rows
    * carry wt = S (unbiased estimates); link rows carry WinnowLinkWeight. */
  private[graft] def winnowPairStream(buckets: DataFrame, allPairsCap: Int,
                                      subBucketSize: Int,
                                      tier2PairRecall: Boolean = false): DataFrame = {
    // tier 1: bounded all-pairs; each co-occurrence contributes exactly 1.
    // Two chained explodes instead of one explode over a nested combo
    // array: arrayCombos materializes C(m,2) two-field structs per bucket
    // row before the Generate can stream them (32k InternalRows for a
    // 256-member bucket); posexplode + slice keeps everything in primitive
    // long arrays and streams pairs through both Generates pipelined
    val t1 = buckets.where(col("m") <= allPairsCap)
      .select(col("ms"), posexplode(col("ms")).as(Seq("i", "a")))
      .select(col("a"),
        explode(slice(col("ms"), col("i") + lit(2), size(col("ms")))).as("b"),
        lit(1L).as("wt"))
      .select(col("a"), col("b"), col("wt"))
    // tier 2: deterministic salted sub-buckets of ~subBucketSize members
    // (salt is per (doc, bucket), so each bucket splits independently).
    // Work per bucket is LINEAR in bucket size — what makes
    // template-family buckets safe at 100x corpus.
    val t2 = trackPersist(buckets.where(col("m") > allPairsCap)
      .withColumn("S", ceil(col("m").cast("double") / subBucketSize).cast("int"))
      .withColumn("subs", transform(sequence(lit(0), col("S") - 1),
        s => filter(col("ms"), x =>
          pmod(xxhash64(x, col("band_key")), col("S").cast("long")) === s.cast("long")))))
    // within each sub-bucket: chain+star by default (≤ 2 edges per member
    // — the candidatePairs pattern, LINEAR in bucket size), or full
    // all-pairs when tier2PairRecall is on. Either way a co-occurrence is
    // observed with probability ~1/S per shared bucket, so weighting it by
    // S makes sum(wt) an (approximately) UNBIASED estimate of the pair's
    // true shared-fingerprint count. High variance per observation (S per
    // hit) — the prefilter's tier-2 branch therefore also demands a
    // minimum observation count. tier2PairRecall extends PAIR-level recall
    // into docs whose vocabulary is >allPairsCap-frequency (w.h.p., not
    // guaranteed), at the cost of generating the sub-bucket quadratic.
    def chainStarEdges(sub: Column): Column = concat(
      // chain: sorted-adjacent members
      filter(zip_with(sub, slice(sub, lit(2), greatest(size(sub) - 1, lit(1))),
        (a, b) => struct(a.as("a"), b.as("b"))), p => p.getField("b").isNotNull),
      // star: sub-bucket min to every non-adjacent member
      transform(slice(sub, lit(3), greatest(size(sub) - 2, lit(1))),
        y => struct(element_at(sub, 1).as("a"), y.as("b"))))
    val edgeGen: Column => Column = if (tier2PairRecall) arrayCombos else chainStarEdges
    val t2pairs = t2
      .select(col("S"), explode(flatten(transform(col("subs"), sub => edgeGen(sub)))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("S").cast("long").as("wt"))
    // sub-bucket minima chain: keeps every tier-2 bucket CONNECTED through
    // its sub-bucket minima (the candidatePairs salt pattern) even when a
    // pair never shares a sub-bucket — cluster-level recall is structural,
    // pair-level recall within tier-2 is probabilistic (documented below)
    val mn = sort_array(filter(transform(col("subs"), sub => array_min(sub)), x => x.isNotNull))
    val t2links = t2
      .select(explode(filter(
        zip_with(mn, slice(mn, lit(2), greatest(size(mn) - 1, lit(1))),
          (a, b) => struct(a.as("a"), b.as("b"))),
        p => p.getField("b").isNotNull)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), lit(WinnowLinkWeight).as("wt"))
    t1.unionByName(t2pairs).unionByName(t2links)
  }

  /** Winnowing-fingerprint candidate pairs (third candidate modality next
    * to MinHash and SimHash banding): docs sharing DISCRIMINATIVE
    * fingerprints become candidates. The frequency tiers are FIXED
    * absolute constants (not corpus-proportional — a cap that grows with n
    * re-creates the O((n/c)²) hot-bucket hazard this design exists to
    * avoid):
    *  - bucket ≤ allPairsCap: exact all-pairs, generated map-side from the
    *    bucket's sorted member array (one groupBy shuffle, no self-join);
    *  - allPairsCap < bucket ≤ stopFpFreq: salted sub-buckets (all-pairs
    *    within, S-weighted co-occurrence counting, minima chain links) —
    *    work stays LINEAR in bucket size; pair-level recall in this tier
    *    is probabilistic (a pair sharing B such buckets is missed with
    *    probability ~exp(-B/S)), cluster connectivity is structural via
    *    the minima chains;
    *  - bucket > stopFpFreq: stop-fingerprints (boilerplate; the standard
    *    winnowing/MOSS frequency cap) — no near-dup signal, dropped, and
    *    countable via winnowStopFingerprints (no silent caps).
    * The prefilter keeps pairs whose (estimated) shared-fingerprint count
    * is ≥ minFpOverlap of the smaller doc's kept vocabulary: true near-dup
    * pairs at tau-level similarity have near-total containment (winnow
    * fingerprints min-sample the shared shingle runs; measured: every true
    * pair at sf0.01/sf0.1 sits at ratio 1.0, template cousins below 0.9),
    * so they reach pair_verify while hot-family buckets stop costing
    * O(family²) verifications. */
  def winnowCandidatePairs(docs: DataFrame, k: Int, w: Int,
                           cfg: DedupConfig,
                           minFpOverlap: Double = 0.4,
                           allPairsCap: Int = 256,
                           subBucketSize: Int = 64,
                           stopFpFreq: Int = 4096,
                           tier2PairRecall: Boolean = false): DataFrame = {
    // id-keyed internals (same rationale as the minhash path): the tier-1
    // pair stream is quadratic in template-family size — 6.5M weighted
    // instances from 5k docs at sf0.1 — and every explode/shuffle/groupBy
    // row carried two conv_id strings. Re-keying the SAME generic body by
    // xxhash64(conv_id) makes those rows three fixed longs; the survivor
    // set (3-4 orders of magnitude smaller) maps back through a join and
    // re-orients lexicographically. Tier-1 all-pairs evidence and cluster
    // connectivity are key-insensitive and unchanged; the tier-2 sub-bucket
    // split hashes the key VALUE (pmod(xxhash64(key, band), S)), so the
    // tier-2 probabilistic pair sample differs between the long-keyed and
    // string-fallback paths (ADVICE r4) — A/B runs via
    // SPARK_GRAFT_STRING_PATH compare recall, not candidate identity.
    // Guarded by the same uniqueness check + string fallback as run().
    val u = docs.agg(count(lit(1)), count_distinct(xxhash64(col("conv_id")))).head()
    if (u.getLong(0) == u.getLong(1) && !sys.env.contains("SPARK_GRAFT_STRING_PATH")) {
      val idDocs = docs.select(xxhash64(col("conv_id")).as("conv_id"), col("doc"))
      val idPairs = winnowCandidatePairsKeyed(idDocs, k, w, cfg, minFpOverlap,
        allPairsCap, subBucketSize, stopFpFreq, tier2PairRecall)
      val idMap = docs.select(xxhash64(col("conv_id")).as("k"), col("conv_id"))
      idPairs
        .join(idMap.select(col("k").as("a"), col("conv_id").as("ca")), Seq("a"))
        .join(idMap.select(col("k").as("b"), col("conv_id").as("cb")), Seq("b"))
        .select(least(col("ca"), col("cb")).as("a"),
          greatest(col("ca"), col("cb")).as("b"))
    } else {
      winnowCandidatePairsKeyed(docs, k, w, cfg, minFpOverlap,
        allPairsCap, subBucketSize, stopFpFreq, tier2PairRecall)
    }
  }

  /** The winnow candidate body, generic over the `conv_id` column type
    * (string corpus keys or 64-bit ids — every operation on the key is
    * type-agnostic: sort_array, xxhash64 salting, least/greatest). */
  private def winnowCandidatePairsKeyed(docs: DataFrame, k: Int, w: Int,
                           cfg: DedupConfig,
                           minFpOverlap: Double,
                           allPairsCap: Int,
                           subBucketSize: Int,
                           stopFpFreq: Int,
                           tier2PairRecall: Boolean): DataFrame = {
    // bucket sizes FIRST, member arrays only for buckets the tiers will
    // read (m ∈ [2, stopFpFreq]): stop-fingerprint buckets — template
    // fingerprints shared by up to the whole corpus — previously paid a
    // full sort_array(collect_list) before being dropped (VERDICT r4 #4).
    // One Exchange total: the count comes from a window over the
    // band_key-partitioned stream and the groupBy below reuses that
    // partitioning (band_key ⊂ grouping keys → no second shuffle).
    val fps = docs.select(col("conv_id"),
      explode(graft.functions.winnow_fingerprints(col("doc"), k, w)).as("band_key"))
    val buckets = trackPersist(fps
      .withColumn("m", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band_key"))))
      .where(col("m").between(2, stopFpFreq))
      .groupBy(col("band_key"), col("m"))
      .agg(sort_array(collect_list(col("conv_id"))).as("ms")))
    // kept vocabulary sizes per doc (the prefilter denominators), split by
    // tier: the tier-1 ratio is an EXACT containment measure (both its
    // numerator and denominator count only ≤ allPairsCap fingerprints) —
    // zero sampling variance, so the oracle-exactness of the prefilter
    // never rides on the tier-2 estimate. Counted over post-stop-cap
    // buckets only: a templated doc's raw fingerprint count is dominated
    // by stop-fingerprints, which would deflate the ratio for exactly the
    // pairs the tiers exist to preserve.
    val nFp = trackPersist(buckets.select(explode(col("ms")).as("conv_id"), col("m"))
      .groupBy(col("conv_id"))
      .agg(sum(when(col("m") <= allPairsCap, 1L).otherwise(0L)).as("nf1"),
        count(lit(1)).as("nfall")))
    // exact early drop: any pair passing the tier-1 branch needs
    // t1_shared >= minFpOverlap * min(nf1 over the WHOLE corpus), so pairs
    // below that global floor (the vast cousin tail — most candidate pairs
    // co-occur exactly once) never reach the per-doc joins. The floors are
    // one tiny driver-side row over the per-doc vocabulary table. The
    // tier-2 estimate branch gets its OWN floor from min(nfall): a pure
    // tier-2 doc (nf1 = 0 — exactly the tier2PairRecall target) can have a
    // final threshold min(nfall)·overlap below the tier-1 floor, so gating
    // the est branch with earlyT1 dropped pairs the final predicate keeps
    // (ADVICE r3).
    val floors = nFp.agg(
      coalesce(min(when(col("nf1") > 0, col("nf1"))), lit(1L)),
      coalesce(min(col("nfall")), lit(1L))).head()
    val earlyT1 = math.max(1L, math.ceil(minFpOverlap * floors.getLong(0)).toLong)
    val earlyT2 = math.max(1L, math.ceil(minFpOverlap * floors.getLong(1)).toLong)
    // the estimate branch exists only for tier2PairRecall: with it off,
    // tier-2 chain+star observations serve cluster connectivity through
    // the minima links alone, and letting S-weighted hits through the
    // gates would only add verify load (min(nfall) can be 1, making the
    // early floor vacuous)
    val estBranch = lit(tier2PairRecall) &&
      col("est_shared") >= earlyT2 && col("n_obs") >= 4
    winnowPairStream(buckets, allPairsCap, subBucketSize, tier2PairRecall)
      .groupBy(col("a"), col("b"))
      .agg(sum(when(col("wt") === 1L, 1L).otherwise(0L)).as("t1_shared"),
        sum(when(col("wt") < WinnowLinkWeight, col("wt")).otherwise(0L)).as("est_shared"),
        sum(when(col("wt") < WinnowLinkWeight, 1L).otherwise(0L)).as("n_obs"),
        max(col("wt")).as("max_wt"))
      .where(col("t1_shared") >= earlyT1 || estBranch ||
        col("max_wt") >= WinnowLinkWeight)
      // no broadcast hint: nFp is per-doc (10^9 rows at corpus scale) —
      // AQE broadcasts it when the actual size is small
      .join(nFp.select(col("conv_id").as("a"), col("nf1").as("nf1a"),
        col("nfall").as("nfalla")), Seq("a"))
      .join(nFp.select(col("conv_id").as("b"), col("nf1").as("nf1b"),
        col("nfall").as("nfallb")), Seq("b"))
      .where(
        // exact tier-1 containment (the oracle-bearing branch; zero
        // variance — the tier-2 estimate never gates a tier-1-evidenced pair)
        (least(col("nf1a"), col("nf1b")) > 0 &&
          col("t1_shared") >= least(col("nf1a"), col("nf1b")) * minFpOverlap) ||
        // unbiased whole-vocabulary estimate with a minimum-observation
        // guard (single S-weighted hits are noise) — tier2PairRecall only
        (lit(tier2PairRecall) &&
          col("est_shared") >= least(col("nfalla"), col("nfallb")) * minFpOverlap &&
          col("n_obs") >= 4) ||
        // sub-bucket minima links: connectivity is structural, not gated
        col("max_wt") >= WinnowLinkWeight)
      .select(col("a"), col("b"))
  }

  /** Fingerprint buckets with ≥ 2 members as (band_key, ms sorted members,
    * m size) — the shared substrate of the winnow tiers. */
  private[graft] def winnowBuckets(docs: DataFrame, k: Int, w: Int): DataFrame =
    docs.select(col("conv_id"),
        explode(graft.functions.winnow_fingerprints(col("doc"), k, w)).as("band_key"))
      .groupBy(col("band_key"))
      .agg(sort_array(collect_list(col("conv_id"))).as("ms"))
      .withColumn("m", size(col("ms")))
      .where(col("m") >= 2)

  /** Stop-fingerprint buckets the winnow path excluded (bucket > stopFpFreq)
    * — surface these as a metric (no silent caps). */
  def winnowStopFingerprints(docs: DataFrame, k: Int, w: Int,
                             stopFpFreq: Int = 4096): DataFrame =
    // counts only — no member arrays for buckets that exist to be counted
    docs.select(col("conv_id"),
        explode(graft.functions.winnow_fingerprints(col("doc"), k, w)).as("band_key"))
      .groupBy(col("band_key"))
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > stopFpFreq)

  private def simhashBands(signatures: DataFrame): DataFrame = {
    val bandKeys = array((0 until 4).map { b =>
      // fold band index into the key: (band, 16-bit slice)
      xxhash64(lit(b), shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)))
    }: _*)
    signatures.select(col("conv_id"), col("simhash"),
      posexplode(bandKeys).as(Seq("band_idx", "band_key")))
  }

  /** Band buckets over cfg.maxBucketSize that simhashNearDupPairs excluded
    * — surface these as a metric (no silent caps). */
  def oversizedSimhashBuckets(signatures: DataFrame, cfg: DedupConfig): DataFrame =
    simhashBands(signatures)
      .groupBy(col("band_key")).agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > cfg.maxBucketSize)

  /** P8: connected components over verified pair edges.
    * Returns cluster_assignments(conv_id, cluster_id) for every node in
    * `allNodes`; singletons get their own id; cluster_id = min member id.
    *
    * Adaptive strategy: dup-pair edge sets are a small fraction of the
    * corpus (dup rate × n, NOT n²), so up to `driverMaxEdges` the exact
    * union-find runs on the driver — one collect, zero iterative shuffles.
    * Above the threshold (10^12-turn corpora with high dup rates) it
    * switches to alternating large-star/small-star contraction (Kiveris et
    * al., MR-CC) expressed with window mins only — no collect_list, no
    * GraphX/RDD — converging in O(log n) rounds with per-round
    * localCheckpoint lineage cuts. Both paths produce IDENTICAL
    * assignments (min-id representative), so the switch is invisible to
    * resume/recall.
    *
    * `localContraction`: None (default) probes the edge stream's locality
    * and runs the per-partition contraction pre-pass only when it would
    * pay (see localContract); Some(b) forces it on/off. */
  def connectedComponents(edges0: DataFrame, allNodes: DataFrame,
                          maxIter: Int = 50,
                          driverMaxEdges: Long = 2000000L,
                          localContraction: Option[Boolean] = None): DataFrame = {
    val spark = edges0.sparkSession

    // materialize the edge set ONCE: the size probe and whichever CC path
    // follows both consume it (without this, the count action would
    // recompute the entire upstream verify subtree)
    val ccProf = sys.env.contains("SPARK_GRAFT_CC_PROFILE")
    def prof[A](label: String)(f: => A): A = {
      if (!ccProf) f
      else {
        val t0 = System.nanoTime()
        val r = f
        println(f"[cc] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
    }
    val edges1 = edges0.select(col("a").as("u"), col("b").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edgeCount = prof("edge count")(edges1.count())
    if (edgeCount <= driverMaxEdges) {
      import spark.implicits._
      val uf = new UnionFind[String]()
      prof("collect+union") {
        // coalesce before collect: narrow over the cached partitions, so
        // the collect job launches ~32 tasks instead of one per shuffle
        // partition (256 near-empty result fetches were measurable fixed
        // cost on a stage that is serial everywhere else)
        edges1.coalesce(32).collect().foreach { r =>
          uf.union(r.getString(0), r.getString(1))
        }
      }
      edges1.unpersist(false)
      // no .sorted: the join is order-insensitive and sorting ~1M driver
      // tuples was the stage's single-threaded tail at scale. parallelize
      // (not toDF): the driver-side Catalyst row conversion of ~2·edges
      // tuples was the NEXT single-threaded tail (measured 1.55 s of the
      // 2.2 s stage at 395k edges) — parallelize ships raw string pairs
      // and runs the conversion executor-side, 32-way. Non-identity rows
      // only: the left-join's coalesce already maps absent nodes to
      // themselves, so root/singleton identity entries (~40% of the map
      // at 357k edges) were dead broadcast weight.
      val asg = prof("assignments toDF")(
        spark.sparkContext
          .parallelize(scala.collection.immutable.ArraySeq.unsafeWrapArray(
            uf.nonIdentityAssignments()), 32)
          .toDF("conv_id", "root"))
      // broadcast the assignment map when it is certainly small (≤ 500k
      // edges ⇒ ≤ 1M entries, tens of MB) — skips shuffling allNodes;
      // near the 2M-edge cap the map can reach hundreds of MB, so there
      // AQE still picks from actual size
      val asgMaybeBc = if (edgeCount <= 500000L) broadcast(asg) else asg
      return allNodes.select(col("conv_id"))
        .join(asgMaybeBc, Seq("conv_id"), "left")
        .select(col("conv_id"), coalesce(col("root"), col("conv_id")).as("cluster_id"))
    }

    def largeStar(e: DataFrame): DataFrame = {
      val bidir = e.select(col("u"), col("v"))
        .unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val w = Window.partitionBy(col("u"))
      bidir
        .withColumn("m", least(col("u"), min(col("v")).over(w)))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val directed = e.select(
        greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val w = Window.partitionBy(col("u"))
      // single pass over the window output (see chainStar note)
      directed.withColumn("m", min(col("v")).over(w))
        .select(explode(array(
          when(col("v") =!= col("m"), struct(col("v").as("u"), col("m").as("v"))),
          struct(col("u"), col("m").as("v")))).as("e"))
        .where(col("e").isNotNull)
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .distinct()
    }

    // Local-contraction pre-pass: each task replaces its partition's edge
    // set with the star (member → local-component min) via an in-task
    // union-find. Connectivity-equivalent on the union — every local
    // component stays connected through its star, and nodes shared across
    // partitions still join them — and min-id assignments are unchanged
    // because every original node still appears in some star edge.
    // WHEN IT PAYS (measured — CcAb/CcScale): the win is per-round
    // shuffle volume, and it requires the edge stream to arrive with
    // locality. Verified dup pairs do — they leave the verify sort-merge
    // clustered by key and components are near-cliques (2 global rounds
    // at 1M convs) — and the pre-pass cut the 32-core star wall 15-20%
    // on the 357k-edge bench set. On adversarial input (long chains
    // hash-scattered across partitions: CcScale's 3.36M-edge chain+cross
    // graph) local stitching finds nothing — same 10 rounds, +19% wall
    // for the extra pass — hence the default yield probe that skips this
    // pass when the stream has no locality. Per-task memory is O(nodes in
    // partition),
    // bounded by partition sizing; a safety cap passes overflow edges
    // through uncontracted (connectivity never drops).
    def localContract(e: DataFrame): DataFrame = {
      import spark.implicits._
      val cap = 4000000
      e.select(col("u"), col("v")).as[(String, String)]
        .mapPartitions { it =>
          val uf = new graft.core.UnionFind[String]()
          val overflow = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          var n = 0
          it.foreach { case p @ (a, b) =>
            if (n < cap) { uf.union(a, b); n += 1 } else overflow += p
          }
          uf.nonIdentityAssignments().iterator ++
            overflow.iterator
        }
        .toDF("u", "v")
    }

    // Star-round partition sizing, MEASURED and rejected (r6): deriving
    // the round exchanges' width from the edge count (357k edges → 32
    // partitions at 32 cores) read consistently SLOWER than the session's
    // 256 in an interleaved A/B (star_on 3.1-3.2 s vs 2.4-2.5 s; 64
    // partitions likewise) — the star wall at this size is the sequential
    // job barriers per run, not per-task launch overhead, and 256 small
    // tasks overlap stragglers/GC pauses better than 32 larger sorts. The
    // env override stays for future same-sitting A/Bs; the default keeps
    // the session conf (scoped-conf plumbing retained so an override is
    // honored by every round exchange, then restored before the lazy
    // final join below).
    val starParts = sys.env.get("SPARK_GRAFT_CC_STAR_PARTS").map(_.toInt)
      .getOrElse(spark.sessionState.conf.numShufflePartitions)
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", starParts.toString)
    val converged0 = try {

    // Round-latency audit (r6): at 357k edges the star wall is the chain
    // of sequential job barriers, not shuffle bytes — so the up-front
    // distinct+checkpoint pass is GONE (every production edge stream —
    // verified pairs, the CC A/B parquet — is already distinct;
    // largeStar's v>u filter drops self loops and its own distinct dedups
    // the round output, so duplicates in a non-distinct caller stream
    // cost only round-1 window width, never correctness), and each round
    // below runs ONE job instead of two (fingerprint folded into the
    // checkpoint-materializing job).
    val doContract = localContraction.getOrElse(prof("contraction probe") {
      // Locality probe: in-task union-find over two partitions of the
      // materialized edge set. yield = starEdges/inEdges = 1 (to the
      // probe's precision) means local stitching finds NOTHING — every
      // in-partition component is a single edge (hash-scattered chains:
      // CcScale reads exactly 1.000) and the pre-pass would only add a
      // pass + checkpoint (+17-19% wall measured). Any real stitch
      // (pipeline dup pairs leave the verify sort-merge grouped by key;
      // CcAb's 357k-edge set reads 0.93) marks the clustered shape whose
      // pre-pass cuts the star wall 15-20% — the win comes from the
      // canonical (member, min) star form feeding round 1, not from the
      // raw edge-count reduction, so the cut sits near 1, not at the
      // break-even of edge counts. Probe cost: a scan of 2/P of the
      // already-persisted edge cache.
      val rdd = edges1.select(col("u"), col("v")).rdd
      val p = rdd.getNumPartitions
      if (p == 0) false
      else {
        val probeParts = (if (p == 1) Seq(0) else Seq(0, p / 2)).distinct
        val counts = spark.sparkContext.runJob(
          rdd,
          (it: Iterator[org.apache.spark.sql.Row]) => {
            val uf = new UnionFind[String]()
            var n = 0L
            it.foreach { r => uf.union(r.getString(0), r.getString(1)); n += 1 }
            (n, uf.assignments().count { case (m, root) => m != root }.toLong)
          },
          probeParts)
        val n = counts.map(_._1).sum
        val stars = counts.map(_._2).sum
        if (ccProf) println(f"[cc] probe: edges=$n stars=$stars yield=${
          if (n == 0) 1.0 else stars.toDouble / n}%.3f")
        n > 0 && stars.toDouble / n <= 0.98
      }
    })
    var edges =
      if (doContract) {
        val c = localContract(edges1).localCheckpoint(true)
        edges1.unpersist(false)
        c
      } else edges1.where(col("u") =!= col("v"))

    // One JOB per round: checkpoint the round's RDD and compute the
    // convergence fingerprint (count + xor of a per-row 64-bit hash —
    // internal detection only, same collision class as the old
    // bit_xor(xxhash64) agg) INSIDE the materializing runJob, then wrap
    // the checkpointed RDD back as a flat-plan DataFrame. The old form
    // paid a second agg job per round just to read back what the
    // materialization had already streamed past.
    val edgeSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("u",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType, nullable = true)))
    var converged = false
    var iter = 0
    var prevFp: (Long, Long) = (-1L, -1L)
    while (!converged && iter < maxIter) {
      val nextDf = smallStar(largeStar(edges))
      // rows are reused by the scan/exchange — copy before caching
      val rdd = nextDf.queryExecution.toRdd.map(_.copy()).localCheckpoint()
      val partFps = spark.sparkContext.runJob(rdd,
        (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
          var c = 0L
          var x = 0L
          while (it.hasNext) {
            val r = it.next()
            val hu = if (r.isNullAt(0)) 0 else r.getUTF8String(0).hashCode
            val hv = if (r.isNullAt(1)) 0 else r.getUTF8String(1).hashCode
            c += 1
            x ^= (hu.toLong << 32) ^ (hv.toLong & 0xffffffffL)
          }
          (c, x)
        })
      val fp = (partFps.map(_._1).sum, partFps.map(_._2).foldLeft(0L)(_ ^ _))
      converged = fp == prevFp
      prevFp = fp
      edges = org.apache.spark.sql.GraftBridge.internalCreateDataFrame(
        spark, rdd, edgeSchema)
      if (iter == 0) edges1.unpersist(false)
      iter += 1
    }
    if (ccProf) println(s"[cc] global rounds: $iter")
    edges
    } finally spark.conf.set("spark.sql.shuffle.partitions", savedParts)

    // After convergence every edge is (member, root) with root = component min.
    val roots = converged0.groupBy(col("u")).agg(min(col("v")).as("root"))
    allNodes.select(col("conv_id"))
      .join(roots.select(col("u").as("conv_id"), col("root")), Seq("conv_id"), "left")
      .select(col("conv_id"),
        coalesce(col("root"), col("conv_id")).as("cluster_id"))
  }

  // ---- id-keyed internal path --------------------------------------------
  //
  // Between the scan and the final output the pipeline keys docs by
  // id = xxhash64(conv_id) instead of the conv_id string. Motivation is
  // byte traffic through the shuffle/sort stages: at high core counts the
  // shared memory bus is the scarce resource (BENCH/BASELINE.md MemBw:
  // per-thread DRAM bandwidth at 32 threads is ~7x lower than at 8), so a
  // fixed 8-byte sort/join key in place of a variable-length UTF8 string
  // (+16 bytes/row in UnsafeRow terms, plus pointer-chasing comparisons)
  // directly lifts the wide-cluster legs. The banding window ALREADY
  // ordered members by xxhash64(conv_id) — the id path just stops carrying
  // the string alongside its own hash. conv_id strings re-enter through
  // the verification join (they ride with the doc text, which dominates
  // that join's bytes anyway), so no extra mapping join exists.
  //
  // Correctness: ids are verified globally unique with one cheap
  // aggregation over the persisted docs (count vs count_distinct; at 10^6
  // docs the collision probability is ~3e-8, at 10^9 ~3e-2 — the check is
  // NOT optional); on a collision run() falls back to the string path,
  // whose candidate order (xxhash64(conv_id), conv_id) the id order
  // refines, producing the identical edge set when ids are unique.

  /** P5, id form: bands(id, band_key). Same band keys as `bands`. */
  private[graft] def bandsById(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val r = cfg.rowsPerBand
    val keys = transform(
      sequence(lit(0), lit(cfg.bands - 1)),
      i => xxhash64(i, slice(col("minhash"), i * lit(r) + lit(1), lit(r))))
    sigs.select(col("id"), explode(keys).as("band_key"))
  }

  /** P6, id form: chain+star per band bucket ordered by id — the same
    * total order as the public path (id IS xxhash64(conv_id)), minus the
    * string payload in the window sort. Returns (a, b) ids, a < b. */
  private[graft] def candidatePairsById(bands: DataFrame, cfg: DedupConfig): DataFrame = {
    def chainStar(df: DataFrame, parts: Seq[String]): DataFrame = {
      val pcols = parts.map(col)
      val w = Window.partitionBy(pcols: _*).orderBy(col("id"))
      val wAll = Window.partitionBy(pcols: _*).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // EXPLICIT repartition for the same wave-quantization reason as the
      // string path's chainStar (r5): left to AQE, the window exchange on
      // the fused sig+band stream coalesces to ~cores (34 partitions at 32
      // cores on the 1M-conv corpus — BenchStages r6: 34 tasks, med 1.88 s
      // → a 2-wave stage with a 2-task second wave, ~1.8 s of idle width).
      // An explicit count is honored by AQE and satisfies the window's
      // required distribution, so no second exchange appears.
      val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
      df
        .repartition(nParts, pcols: _*)
        .withColumn("prev", lag(col("id"), 1).over(w))
        .withColumn("bmin", first(col("id")).over(wAll))
        .select(explode(array(
          struct(col("prev").as("a"), col("id").as("b")),
          struct(when(col("bmin") =!= col("id") && col("bmin") =!= col("prev"),
            col("bmin")).as("a"), col("id").as("b")))).as("e"))
        .where(col("e.a").isNotNull)
        .where(col("e.a") =!= col("e.b"))
        .select(least(col("e.a"), col("e.b")).as("a"),
          greatest(col("e.a"), col("e.b")).as("b"))
    }
    if (cfg.bandSalt > 1) {
      val salted = bands.withColumn("salt", pmod(col("id"), lit(cfg.bandSalt.toLong)))
      val within = chainStar(salted.select(col("band_key"), col("salt"), col("id")),
        Seq("band_key", "salt"))
      val minima = salted.groupBy(col("band_key"), col("salt"))
        .agg(min(col("id")).as("id"))
      val across = chainStar(minima.select(col("band_key"), col("id")), Seq("band_key"))
      within.unionByName(across).distinct()
    } else {
      chainStar(bands.select(col("band_key"), col("id")), Seq("band_key")).distinct()
    }
  }

  /** P7, id form: candidate (a, b) id pairs verified against docs carrying
    * (id, conv_id, doc). Output schema and orientation (a < b
    * lexicographically by conv_id) match `verifyPairs` exactly — the
    * strings re-enter via the doc join, not a separate mapping. */
  private[graft] def verifyPairsById(candPairs: DataFrame, docsWithId: DataFrame,
                                        cfg: DedupConfig): DataFrame = {
    val parts = candPairs.sparkSession.sessionState.conf.numShufflePartitions
    val spread = trackPersist(candPairs.repartition(parts, col("a")))
    val candIds = spread.select(col("a").as("id"))
      .unionByName(spread.select(col("b").as("id")))
      .distinct()
    // d (the candidate-doc subset) is consumed by BOTH side joins below.
    // Unpersisted, each join re-scans the FULL docs cache through its own
    // semi-join build — at 32 threads that cached-text decode inflates
    // ~5x in core-seconds (the same memory-stall pathology BandProbe found
    // on the cached-minhash scan). Persisting d scans docs ONCE and feeds
    // both joins from the (smaller, candidates-only) cache: VerifyProbe
    // interleaved warm legs at 32 cores 8.9–13.6 s vs 12.6–24.1 s inline —
    // wins every pair (1.35–2.7x) AND removes the bandwidth-weather
    // variance of the double full-cache scan; ~wash at 8 cores (the scan
    // isn't stalled there), so the gain lands on 8→32 efficiency. At 10^12
    // turns candidates are a tiny fraction of the corpus, so the extra
    // cache is small while the avoided second full-corpus pass dominates.
    // SPARK_GRAFT_VERIFY_DPERSIST=0 re-selects the inline plan per JVM for
    // future same-sitting A/Bs.
    val d0 = docsWithId.select(col("id"), col("conv_id"), col("doc"))
      .join(candIds, Seq("id"), "left_semi")
    val d = if (dPersist) trackPersist(d0) else d0
    spread
      .join(d.select(col("id").as("a"), col("conv_id").as("ca"), col("doc").as("doc_a")), Seq("a"))
      .join(d.select(col("id").as("b"), col("conv_id").as("cb"), col("doc").as("doc_b")), Seq("b"))
      .withColumn("pv",
        graft.functions.pair_verify(col("doc_a"), col("doc_b"), cfg.shingleK, cfg.seed))
      .withColumn("jaccard", col("pv.jaccard"))
      .where(col("jaccard") >= lit(cfg.tauJaccard))
      .where(graft.functions.lcs_at_least(col("doc_a"), col("doc_b"),
        least(lit(cfg.tauLcs),
          (least(length(col("doc_a")), length(col("doc_b"))) / 2).cast("int"))))
      .select(least(col("ca"), col("cb")).as("a"),
        greatest(col("ca"), col("cb")).as("b"),
        col("jaccard"),
        col("pv.simhash_dist").as("simhash_dist"),
        (col("pv.simhash_dist") <= lit(cfg.simhashMaxDist)).as("simhash_ok"))
  }

  /** Full pipeline: transcripts → cluster_assignments(conv_id, cluster_id). */
  def run(transcripts: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame =
    runWithDocs(buildDocs(transcripts), cfg)

  /** Full pipeline over pre-reconstructed docs (conv_id, doc, n_turns,
    * doc_len) — the entry for layouts with their own reconstruction path
    * (BucketedCorpus.readDocs streams docs off the bucket sort). */
  def runWithDocs(docs0: DataFrame,
                  cfg: DedupConfig = DedupConfig()): DataFrame = {
    // docs/sigs feed multiple downstream joins — persist so the signature
    // computation runs once, not once per consumer (the checkpointed
    // runner materializes to parquet instead)
    val docs = trackPersist(docs0
      .withColumn("id", xxhash64(col("conv_id"))))
    // banding needs only the minhash; dropping the shingle arrays (~16x
    // the minhash size) from the persisted footprint keeps the cache hot.
    // Persist ONLY when the salted path consumes bands twice (within +
    // across-minima): at bandSalt=1 (default) sigs has exactly one
    // consumer, and caching it costs a ~1 GB columnar write PLUS a
    // per-row array decode on re-read that is the pipeline's
    // worst-scaling stage (BandProbe: the cached-minhash scan+explode
    // runs 51 core-s at 8 threads but 190 at 32 — eff 0.27, pure memory
    // stall). Unpersisted, text_signature fuses straight into the band
    // explode + exchange in one codegen pass over the docs cache.
    val sigs0 = docs.withColumn("sig",
        graft.functions.text_signature(col("doc"), cfg.shingleK, cfg.numHashes, cfg.seed))
      .select(col("id"), col("sig.minhash").as("minhash"))
    val sigs = if (cfg.bandSalt > 1) trackPersist(sigs0) else sigs0
    // measurement escape hatch: force the string path for A/B runs
    val forceString = sys.env.contains("SPARK_GRAFT_STRING_PATH")
    // xxhash64 collision (probability ~n²/2^65): identical semantics on
    // string keys; candidate order (xxhash64(conv_id), conv_id) is the
    // order the id path refines
    def stringPath(): DataFrame = {
      val sigsStr = trackPersist(signatures(docs, cfg)
        .select(col("conv_id"), col("minhash")))
      connectedComponents(
        verifyPairs(candidatePairs(bands(sigsStr, cfg), cfg), docs, cfg),
        docs.select(col("conv_id")))
    }
    if (forceString) stringPath()
    else {
      val assigned = connectedComponents(
        verifyPairsById(candidatePairsById(bandsById(sigs, cfg), cfg), docs, cfg),
        docs.select(col("conv_id")))
      // xxhash64-injectivity audit, POST-HOC off the docs cache (one row
      // per conversation). connectedComponents materializes the edge set
      // internally, so by this point docs is cached and the agg is a
      // ~0.1 s cache read. The former EAGER probe (rawIds.distinct + agg
      // before the main DAG) was a whole extra column-pruned corpus scan
      // plus a distinct shuffle — at 10^12 turns a full extra pass over
      // the conv_id column, and a width-invariant ~1-3 s on every bench
      // leg (ProbeCost: 3.2/2.9 s cold at 8/32 cores). Optimism is safe:
      // on the ~2^-45 collision the id-keyed work is discarded unseen and
      // the string-keyed pipeline recomputes identical semantics.
      val u = docs.agg(count(lit(1)), count_distinct(col("id"))).head()
      if (u.getLong(0) == u.getLong(1)) assigned else stringPath()
    }
  }
}
