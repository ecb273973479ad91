package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID (stopword n-gram
  * heuristic), quality scoring (length/punctuation/stopword ratios), token
  * counting (whitespace + BPE-ish regex), and document fingerprinting
  * (md5 content fingerprint + 64-bit polynomial rolling hash).
  *
  * Everything is `functions._` expressions (codegen); the only state is the
  * static stopword lists, which fold into the plan as literals.
  */
object TextAnalysis {

  /** Tiny per-language marker-word lists (top function words). Deliberately
    * small: the heuristic is "count marker hits per language, argmax".
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "dans", "que", "une", "pour"),
    "es" -> Seq("el", "la", "que", "los", "del", "las", "por", "con", "una", "para"))

  private def toks(text: Column): Column =
    split(lower(regexp_replace(trim(text), "[^\\p{L}\\p{N}\\s]", " ")), "\\s+")

  /** Marker-hit count for one language. */
  def markerHits(text: Column, lang: String): Column =
    aggregate(toks(text), lit(0), (acc, t) =>
      acc + when(t.isin(markers(lang): _*), 1).otherwise(0))

  /** Heuristic language id: argmax of marker hits; "und" (undetermined)
    * when no marker hits at all.
    */
  def langId(text: Column): Column = {
    val scored = markers.keys.toSeq.sorted.map { l =>
      struct(markerHits(text, l).as("hits"), lit(l).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text), "\\s+")))

  /** Corpus-level top-k token frequencies (vocabulary head — the standard
    * first look at a new corpus, and the input to stopword/boilerplate
    * lists). `explode` → map-side-combined `groupBy(token)` (the shuffle
    * carries one row per DISTINCT token per partition, not per occurrence)
    * → `TakeOrderedAndProject` for the top k (no full sort). Deterministic
    * ties: count desc, then token asc.
    */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(toks(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("token"))
      .limit(k)

  /** BPE-ish token count: GPT-2-style pre-tokenizer regex pieces
    * (word / number / punctuation runs with leading-space affinity).
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text,
      lit("'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"), lit(0)))

  /** Quality score in [0,1]: blend of length band, alpha ratio, punctuation
    * ratio, stopword ratio, and mean word length band — the standard cheap
    * heuristics used to pre-filter web text.
    */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^\\p{L}]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val words = tokenCountWs(text).cast("double")
    val stop = aggregate(toks(text), lit(0), (acc, t) =>
      acc + when(t.isin(markers.values.flatten.toSeq: _*), 1).otherwise(0)).cast("double")
    val lenScore = when(n >= 200 && n <= 20000, 1.0)
      .when(n >= 50, 0.5).otherwise(0.1)
    val alphaRatio = when(n > 0, alpha / n).otherwise(0.0)
    val punctScore = when(n > 0 && punct / n <= 0.1, 1.0).otherwise(0.4)
    val stopScore = when(words > 0 && stop / words >= 0.05, 1.0).otherwise(0.3)
    val meanWord = when(words > 0, alpha / words).otherwise(0.0)
    val wordScore = when(meanWord >= 3 && meanWord <= 12, 1.0).otherwise(0.4)
    round(lenScore * 0.25 + alphaRatio * 0.25 + punctScore * 0.15 +
      stopScore * 0.2 + wordScore * 0.15, 4)
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * stable, portable (any engine reproduces it).
    */
  def fingerprintMd5(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Polynomial rolling hash over characters (base 31, modulo a 48-bit
    * prime-ish constant — ANSI mode forbids natural Long overflow) — the
    * incremental-update-friendly fingerprint, as one `aggregate` over the
    * codepoint sequence (codegen; no UDF).
    */
  private val RollingMod = 251799813685119L // < 2^48, so acc*31+c < 2^53
  def fingerprintRolling(text: Column): Column =
    aggregate(
      transform(split(lower(regexp_replace(trim(text), "\\s+", " ")), ""),
        ch => when(length(ch) > 0, ascii(ch)).otherwise(0)),
      lit(0L), (acc, c) => pmod(acc * lit(31L) + c.cast("long"), lit(RollingMod)))

  /** One-pass text profile of a corpus. */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      langId(col(textCol)).as("lang_id"),
      tokenCountWs(col(textCol)).as("tokens_ws"),
      tokenCountBpe(col(textCol)).as("tokens_bpe"),
      qualityScore(col(textCol)).as("quality"),
      fingerprintMd5(col(textCol)).as("fingerprint"))
}
