package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp

/** Deterministic synthetic transcripts generator (FIXTURES.md §1).
  * Schema matches BASELINE.json input_hint:
  * (conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING, ts TIMESTAMP)
  *
  * Planted duplicate classes: exact copies, near dups (per-token edit rate p),
  * turn-subset dups (drop first/last turn), boilerplate templates shared by
  * ~5% of conversations (the skew driver), and independent distractors.
  * Rows are emitted shuffled across conv_ids so doc reconstruction must
  * actually order by (turn_idx, ts).
  */
object Transcripts {

  final case class Turn(conv_id: String, turn_idx: Int, role: String,
                        text: String, tool: String, ts: Timestamp)

  private val roles = Array("user", "assistant", "tool")
  private val tools = Array("search", "calculator", "browser", "python")

  /** Deterministic pseudo-word vocabulary (~5k words). */
  private def vocab(rnd: java.util.Random): Array[String] = {
    val syll = Array("ka", "lo", "mi", "ta", "re", "su", "no", "pi", "ve", "da",
      "zu", "fe", "gi", "ho", "ja", "ku", "le", "mo", "ni", "pa")
    Array.tabulate(5000) { _ =>
      val n = 2 + rnd.nextInt(3)
      (0 until n).map(_ => syll(rnd.nextInt(syll.length))).mkString
    }
  }

  /** Generate the corpus locally (driver-side, deterministic).
    * @param nConvs number of base conversations (total rows scale ~12×) */
  def generate(nConvs: Int, seed: Long = 42L): Seq[Turn] = {
    val rnd = new java.util.Random(seed)
    val words = vocab(rnd)

    def sentence(len: Int): String =
      (0 until len).map(_ => words(rnd.nextInt(words.length))).mkString(" ")

    def toolJson(): String =
      s"""{"query": "${sentence(3)}", "result": [${rnd.nextInt(100)}, ${rnd.nextInt(100)}]}"""

    // Zipf-truncated turn count in [2, 64]
    def nTurns(): Int = {
      val z = math.min(64, 2 + (math.pow(rnd.nextDouble(), 3.0) * 62).toInt)
      z
    }

    def baseConv(id: String, t0: Long): Vector[Turn] = {
      val n = nTurns()
      Vector.tabulate(n) { i =>
        val role = roles(if (i % 2 == 0) 0 else { if (rnd.nextDouble() < 0.15) 2 else 1 })
        val isTool = role == "tool"
        val text = if (isTool) toolJson() else sentence(6 + rnd.nextInt(20))
        Turn(id, i, role, text, if (isTool) tools(rnd.nextInt(tools.length)) else null,
          new Timestamp(t0 + i * 1000L))
      }
    }

    def editTokens(text: String, p: Double): String = {
      val toks = text.split(" ")
      toks.map { t =>
        if (rnd.nextDouble() < p) words(rnd.nextInt(words.length)) else t
      }.mkString(" ")
    }

    val out = Vector.newBuilder[Turn]
    var cid = 0
    def nextId(): String = { cid += 1; f"conv-$cid%06d" }

    // boilerplate template (~5% of convs share it with tiny substitutions)
    val template = baseConv("template", 0L).map(_.text)

    var i = 0
    while (i < nConvs) {
      val id = nextId()
      val t0 = 1700000000000L + i * 100000L
      val kind = rnd.nextDouble()
      if (kind < 0.05) {
        // boilerplate: shared template, one token substituted per turn
        out ++= template.zipWithIndex.map { case (txt, ti) =>
          val t2 = if (ti == template.length - 1) txt + " " + words(rnd.nextInt(words.length)) else txt
          Turn(id, ti, roles(ti % 2), t2, null, new Timestamp(t0 + ti * 1000L))
        }
      } else {
        val conv = baseConv(id, t0)
        out ++= conv
        val dup = rnd.nextDouble()
        if (dup < 0.10) {
          // exact dup
          val id2 = nextId(); i += 1
          out ++= conv.map(t => t.copy(conv_id = id2))
        } else if (dup < 0.25) {
          // near dup at edit rate p
          val p = Array(0.01, 0.05, 0.10)(rnd.nextInt(3))
          val id2 = nextId(); i += 1
          out ++= conv.map(t => t.copy(conv_id = id2, text = editTokens(t.text, p)))
        } else if (dup < 0.32 && conv.length > 3) {
          // turn-subset dup: drop first or last turn
          val id2 = nextId(); i += 1
          val sub = if (rnd.nextBoolean()) conv.tail else conv.init
          out ++= sub.zipWithIndex.map { case (t, ti) => t.copy(conv_id = id2, turn_idx = ti) }
        }
      }
      i += 1
    }

    // deterministic shuffle across conv_ids (doc reconstruction must sort)
    val turns = out.result()
    val shuffled = turns.zipWithIndex
      .sortBy { case (t, ix) => graft.core.MinHasher.mix64(seed ^ ix.toLong) }
      .map(_._1)
    shuffled
  }

  // ---- distributed generation ------------------------------------------

  /** One block's turns, generated executor-side. Content is deterministic
    * in (blockIdx, blockSize, nConvs, seed) and independent of
    * partitioning/retries (each block owns its Random). Dup families stay
    * within a block — the same conv-id-adjacent structure the driver
    * generator plants. */
  private[pipeline] def blockTurns(blockIdx: Long, blockSize: Int, nConvs: Long,
                                   seed: Long, words: Array[String],
                                   template: Vector[String]): Iterator[Turn] = {
    val startIdx = blockIdx * blockSize
    val endIdx = math.min(startIdx + blockSize, nConvs)
    if (startIdx >= endIdx) return Iterator.empty
    val rnd = new java.util.Random(graft.core.MinHasher.mix64(seed ^ (blockIdx + 0x5bf03635L)))

    def sentence(len: Int): String =
      (0 until len).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    def toolJson(): String =
      s"""{"query": "${sentence(3)}", "result": [${rnd.nextInt(100)}, ${rnd.nextInt(100)}]}"""
    def nTurns(): Int = math.min(64, 2 + (math.pow(rnd.nextDouble(), 3.0) * 62).toInt)
    def baseConv(id: String, t0: Long): Vector[Turn] = {
      val n = nTurns()
      Vector.tabulate(n) { i =>
        val role = roles(if (i % 2 == 0) 0 else { if (rnd.nextDouble() < 0.15) 2 else 1 })
        val isTool = role == "tool"
        val text = if (isTool) toolJson() else sentence(6 + rnd.nextInt(20))
        Turn(id, i, role, text, if (isTool) tools(rnd.nextInt(tools.length)) else null,
          new Timestamp(t0 + i * 1000L))
      }
    }
    def editTokens(text: String, p: Double): String =
      text.split(" ").map { t =>
        if (rnd.nextDouble() < p) words(rnd.nextInt(words.length)) else t
      }.mkString(" ")

    val out = Vector.newBuilder[Turn]
    var cid = startIdx
    def nextId(): String = { cid += 1; f"conv-$cid%09d" }
    var i = startIdx
    while (i < endIdx) {
      val id = nextId()
      val t0 = 1700000000000L + i * 100000L
      val kind = rnd.nextDouble()
      if (kind < 0.05) {
        out ++= template.zipWithIndex.map { case (txt, ti) =>
          val t2 = if (ti == template.length - 1) txt + " " + words(rnd.nextInt(words.length)) else txt
          Turn(id, ti, roles(ti % 2), t2, null, new Timestamp(t0 + ti * 1000L))
        }
      } else {
        val conv = baseConv(id, t0)
        out ++= conv
        val dup = rnd.nextDouble()
        if (dup < 0.10 && i + 1 < endIdx) {
          val id2 = nextId(); i += 1
          out ++= conv.map(t => t.copy(conv_id = id2))
        } else if (dup < 0.25 && i + 1 < endIdx) {
          val p = Array(0.01, 0.05, 0.10)(rnd.nextInt(3))
          val id2 = nextId(); i += 1
          out ++= conv.map(t => t.copy(conv_id = id2, text = editTokens(t.text, p)))
        } else if (dup < 0.32 && conv.length > 3 && i + 1 < endIdx) {
          val id2 = nextId(); i += 1
          val sub = if (rnd.nextBoolean()) conv.tail else conv.init
          out ++= sub.zipWithIndex.map { case (t, ti) => t.copy(conv_id = id2, turn_idx = ti) }
        }
      }
      i += 1
    }
    out.result().iterator
  }

  /** Distributed corpus generation: conv-id blocks generated on the
    * executors (the driver-side `generate` holds the whole corpus in one
    * Seq — fine for tests, a non-starter for 1M+ conversation benches).
    * Same dup-class mix; the shared boilerplate template is built once
    * driver-side and shipped in the task closure. Output is scattered by
    * (conv_id, turn_idx) hash so doc reconstruction must re-order. */
  def generateDf(spark: SparkSession, nConvs: Long, seed: Long = 42L,
                 blockSize: Int = 4096, outPartitions: Int = 64): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, xxhash64}
    val words = vocab(new java.util.Random(seed))
    val template: Vector[String] = {
      val r = new java.util.Random(graft.core.MinHasher.mix64(seed) | 1L)
      val n = math.min(64, 2 + (math.pow(r.nextDouble(), 3.0) * 62).toInt)
      Vector.tabulate(n) { _ =>
        (0 until 6 + r.nextInt(20)).map(_ => words(r.nextInt(words.length))).mkString(" ")
      }
    }
    val nBlocks = (nConvs + blockSize - 1) / blockSize
    val genParts = math.max(1, math.min(nBlocks, 256L)).toInt
    spark.range(0, nBlocks, 1, genParts).as[Long]
      .mapPartitions(_.flatMap(b => blockTurns(b, blockSize, nConvs, seed, words, template)))
      .toDF()
      .repartition(outPartitions, xxhash64(col("conv_id"), col("turn_idx")))
  }

  def asDataFrame(spark: SparkSession, turns: Seq[Turn], numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val df = turns.toDF()
    if (numPartitions > 0) df.repartition(numPartitions) else df
  }

  /** Reconstruct per-conversation documents driver-side for the oracle —
    * MUST use the same ordering + separator as the pipeline's buildDocs. */
  def docsLocal(turns: Seq[Turn]): Seq[(String, String)] =
    turns.groupBy(_.conv_id).toSeq.sortBy(_._1).map { case (id, ts) =>
      id -> ts.sortBy(t => (t.turn_idx, t.ts.getTime)).map(_.text).mkString("\n")
    }
}
