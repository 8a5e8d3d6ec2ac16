package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Bloom64

/** Text-analysis operators for a large-scale training-data pipeline:
  * language ID, quality scoring, token counting, document fingerprinting.
  * All pure column expressions or deterministic UDFs — no external models
  * (none exist on disk); the heuristics are the standard public ones
  * (stopword-ratio language ID, length/punct/stopword quality features,
  * Rabin-Karp rolling-hash fingerprints).
  */
object TextAnalysis {

  // --- token counting ---

  /** Whitespace token count — pure Catalyst, codegen'd. Empty elements are
    * dropped: split on leading whitespace emits a "" head ("  the cat" would
    * count 3, and "" would count 1 token), which inflated the count and
    * skewed stopword_ratio's denominator.
    */
  def tokenCountWs(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** BPE-ish token estimate: letter runs, digit runs, and single symbols
    * each count as one token — pure Catalyst via regexp_extract_all.
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  // --- quality scoring ---

  /** Punctuation ratio over total chars, 6dp. */
  def punctRatio(text: Column): Column =
    round(length(regexp_replace(text, "[^.!?,;:]", "")) /
      greatest(length(text), lit(1)), 6)

  /** Ratio of tokens that are (English-ish) stopwords, 6dp — one quality
    * feature; language profiles below reuse the same mechanism.
    */
  val enStop: Seq[String] =
    Seq("the", "a", "an", "of", "to", "in", "and", "or", "is", "are", "on", "for", "with", "by", "at", "from")

  def stopwordRatio(text: Column, stopwords: Seq[String] = enStop): Column = {
    // same empty-token drop as tokenCountWs so the denominator counts words
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    round(size(filter(toks, t => t.isin(stopwords.map(lit): _*))) /
      greatest(size(toks), lit(1)).cast("double"), 6)
  }

  /** Composite quality score in [0,1]: favors mid-length docs with low
    * punctuation density and some stopword mass (the usual crawl-quality
    * heuristic shape).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text) / lit(500.0), lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round((lenScore + punctPenalty + stopScore) / 3.0, 6)
  }

  // --- language ID (stopword-profile heuristic) ---

  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"),
    "es" -> Seq("el", "la", "los", "y", "es", "en", "que", "para", "una", "por"),
    "pt" -> Seq("o", "a", "os", "e", "é", "em", "que", "para", "uma", "não"))

  /** Deterministic heuristic language ID: argmax stopword-hit ratio over the
    * embedded profiles; 'und' (undetermined) when nothing matches.
    */
  val langIdUdf = udf((text: String) => {
    if (text == null || text.isEmpty) "und"
    else {
      val toks = text.toLowerCase.split("\\s+")
      val scores = langProfiles.view.mapValues { sw =>
        val set = sw.toSet
        toks.count(set.contains)
      }.toSeq
      val (best, hits) = scores.maxBy { case (lang, h) => (h, lang) }
      if (hits == 0) "und" else best
    }
  })

  // --- document fingerprinting (rolling hash / winnowing-lite) ---

  /** Polynomial window hash over token windows of size w (the shared
    * [[TextDedup.windowHash]] kernel — NOT a rolling Rabin-Karp: the
    * mix-finalized recipe is not rollable, and w is a small constant, so
    * each window is recomputed); the document fingerprint is the MINIMUM
    * window hash (min-sampling — stable under edits far from the minimum).
    */
  val fingerprintUdf = udf((text: String, w: Int) => {
    if (text == null) 0L
    else {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) 0L
      else if (toks.length <= w) Bloom64.mix(toks.mkString(" ").hashCode.toLong)
      else {
        var min = Long.MaxValue
        var i = 0
        while (i + w <= toks.length) {
          val m = TextDedup.windowHash(toks, i, w)
          if (m < min) min = m
          i += 1
        }
        min
      }
    }
  })

  /** One-stop enrichment used by the demo query. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_tokens_ws", tokenCountWs(col(textCol)))
      .withColumn("n_tokens_bpe", tokenCountBpe(col(textCol)))
      .withColumn("punct_ratio", punctRatio(col(textCol)))
      .withColumn("stopword_ratio", stopwordRatio(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("lang_pred", langIdUdf(col(textCol)))
      .withColumn("fingerprint", fingerprintUdf(col(textCol), lit(5)))
}
