package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`
  * (doc_id, text, lang, source, n_chars): token counting, quality scoring,
  * language-ID heuristic, document fingerprinting. All built from codegen'd
  * `functions._` — no UDFs in these paths, so filters/projections stay
  * inside WholeStageCodegen and push down to the parquet scan.
  */
object TextOps {

  /** Whitespace token count, empty-safe (SQL-oracle parity: split on \s+). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: tokens further split at letter/digit boundaries
    * and long words counted as ceil(len/4) pieces — a deterministic proxy
    * for tokenizer budgeting at scale (no tokenizer libs in this sandbox). */
  def subwordCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(
      aggregate(
        split(trim(text), "\\s+"),
        lit(0),
        (acc, w) => acc + greatest(lit(1), ceil(length(w) / lit(4.0)).cast("int"))))

  private val punctClass = "[.,;:!?'\"()\\[\\]{}]"

  /** Quality features: doc length, token count, mean token length,
    * punctuation ratio, digit ratio, uppercase ratio, stopword ratio. */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val len = length(t).cast("double")
    val safeLen = greatest(len, lit(1.0))
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("punct_ratio",
        (len - length(regexp_replace(t, punctClass, ""))) / safeLen)
      .withColumn("digit_ratio",
        (len - length(regexp_replace(t, "[0-9]", ""))) / safeLen)
      .withColumn("space_ratio",
        (len - length(regexp_replace(t, " ", ""))) / safeLen)
      .withColumn("mean_token_len",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(length(regexp_replace(t, "\\s+", "")).cast("double") / col("n_tokens")))
  }

  /** Composite quality score in [0,1]: long enough, not punct/digit-heavy,
    * word lengths in a natural band. Deterministic, SQL-free scoring used
    * for corpus filtering at scale. */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame =
    qualityFeatures(df, textCol).withColumn("quality_score",
      round(
        least(lit(1.0), col("n_tokens").cast("double") / lit(32.0)) * lit(0.4)
          + when(col("punct_ratio") < 0.1, lit(0.2)).otherwise(lit(0.0))
          + when(col("digit_ratio") < 0.2, lit(0.2)).otherwise(lit(0.0))
          + when(col("mean_token_len").between(2.5, 9.0), lit(0.2)).otherwise(lit(0.0)),
        4))

  private val stopwords = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "por", "que"))

  /** n-gram/stopword language-ID heuristic: per-language stopword hit rate
    * over the token stream; argmax wins, "und" (undetermined) when no
    * language clears the floor. Pure array functions — distributes as a
    * single projection. */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val nToks = greatest(size(toks), lit(1)).cast("double")
    val scored = stopwords.foldLeft(df.withColumn("__toks", toks)) {
      case (acc, (lang, words)) =>
        acc.withColumn(s"__score_$lang",
          size(filter(col("__toks"), w => w.isin(words: _*))).cast("double") / nToks)
    }
    val langs = stopwords.keys.toSeq
    val best = langs.map(l => struct(col(s"__score_$l").as("s"), lit(l).as("l")))
    scored
      .withColumn("__best", greatest(best: _*))
      .withColumn("lang_pred",
        when(col("__best.s") >= 0.02, col("__best.l")).otherwise(lit("und")))
      .withColumn("lang_score", round(col("__best.s"), 4))
      .drop((langs.map(l => s"__score_$l") :+ "__toks" :+ "__best"): _*)
  }

  /** Document fingerprint: xxhash64 of the whitespace-normalized text —
    * the exact-dedup key (differs from md5: 8 bytes, codegen'd, good enough
    * for grouping at 10^12 scale with 64-bit collision odds). */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(trim(text), "\\s+", " "))

  /** Exact dedup: one keep-row per distinct normalized text; keeps the
    * smallest id. Single hash-shuffle on the 8-byte fingerprint (NOT on the
    * full text — at 100 TB the shuffle payload matters). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
}
