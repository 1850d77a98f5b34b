package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All pure `functions._` expressions (whole-stage codegen, no UDFs) so
  * they survive a 100x scale-up inside one WholeStageCodegen span.
  * Column-in/column-out style composes into any pipeline.
  */
object TextOps {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword estimate: words + digit runs + punctuation clusters
    * (a cheap deterministic proxy for tokenizer counts). */
  def subwordCount(text: Column): Column =
    tokenCount(text) +
      size(regexp_extract_all(text, lit("[0-9]{2,}|[^a-zA-Z0-9\\s]{2,}"), lit(0)))

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean word
    * length — the usual pretraining heuristics, rounded for stable compare. */
  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it", "le", "la",
    "el", "der", "die", "und", "et", "de", "y", "que")

  def punctRatio(text: Column): Column =
    round(length(regexp_replace(text, "[a-zA-Z0-9\\s]+", "")).cast("double") /
      greatest(length(text), lit(1)), 4)

  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val stops = filter(toks, t => t.isin(stopwords: _*))
    round(size(stops).cast("double") / greatest(size(toks), lit(1)), 4)
  }

  def meanWordLen(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    round(length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(size(toks), lit(1)), 4)
  }

  def qualityScore(text: Column): Column =
    round(least(length(text).cast("double") / 500.0, lit(1.0)) * 0.4 +
      (lit(1.0) - punctRatio(text)) * 0.3 + stopwordRatio(text) * 0.3, 4)

  /** n-gram-heuristic language id over a tiny stopword table; returns the
    * language whose markers hit most (deterministic tie-break by order). */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "fr" -> Seq(" le ", " la ", " et ", " est "),
    "es" -> Seq(" el ", " y ", " que ", " es "),
    "de" -> Seq(" der ", " die ", " und ", " ist "),
    "zh" -> Seq("的", "是", "了", "在"))

  def langScore(text: Column, lang: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    langMarkers.find(_._1 == lang).get._2
      .map(m => when(padded.contains(m), 1).otherwise(0))
      .reduce[Column](_ + _)
  }

  def langId(text: Column): Column = {
    // deterministic argmax: nested whens in marker order, >= later ones
    val scored = langMarkers.map { case (l, _) => (l, langScore(text, l)) }
    scored.zipWithIndex.foldRight(lit("und")) { case (((l, s), i), els) =>
      val laters = scored.drop(i + 1).map(_._2)
      val geAll = laters.foldLeft(s > 0) { (acc, o) => acc && s >= o }
      when(geAll, lit(l)).otherwise(els)
    }
  }

  /** Rolling-hash document fingerprint: md5 of the alnum-normalized text
    * (stable across engines). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))

  // ---------------------------------------------- Gopher-style filtering
  /** Duplicate word-trigram fraction (Gopher/RefinedWeb-style repetition
    * signal): 1 - distinct/total over the doc's word 3-grams; 0 when the
    * doc has fewer than 3 tokens. Boilerplate-heavy and degenerate
    * (looping) documents score high. */
  def dupTrigramFraction(text: Column): Column = {
    val sh = Dedup.shingles(text)
    when(size(sh) < 1, lit(0.0d))
      .otherwise(round(lit(1.0d) -
        size(array_distinct(sh)).cast("double") / size(sh), 4))
  }

  /** Symbol ratio: characters that are neither alphanumeric nor
    * whitespace, over total characters. */
  def symbolRatio(text: Column): Column =
    round(length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
      greatest(length(text), lit(1)), 4)

  /** Composite Gopher-style keep/drop verdict — the standard pretraining
    * document filter expressed as ONE codegen'd boolean column: word count
    * in [minWords, maxWords], mean word length in [3, 10], symbol ratio
    * below 0.1, stopword ratio above 0.03, duplicate-trigram fraction
    * below 0.2. Thresholds are parameters so corpora can tune them; every
    * term is deterministic and SQL-expressible (DuckDB-oracled as
    * q_gopher). */
  def gopherKeep(text: Column, minWords: Int = 50, maxWords: Int = 100000): Column =
    tokenCount(text).between(minWords, maxWords) &&
      meanWordLen(text).between(3.0, 10.0) &&
      (symbolRatio(text) < 0.1) &&
      (stopwordRatio(text) > 0.03) &&
      (dupTrigramFraction(text) < 0.2)

  /** HTML/boilerplate strip — the step every crawl corpus needs BEFORE any
    * quality signal ([[gopherKeep]] over raw markup sees tag soup as
    * symbols and drops everything). Pure codegen'd string expressions,
    * applied in the standard order:
    *   1. drop `<script>`/`<style>` elements WITH their content
    *      (case-insensitive, dotall — inline JS/CSS is not text);
    *   2. drop `<!-- comments -->`;
    *   3. replace every remaining tag with a space (tag boundaries become
    *      word boundaries: `a</p><p>b` must not fuse into `ab`);
    *   4. decode the six entities that dominate real markup — `&nbsp;`
    *      `&lt;` `&gt;` `&quot;` `&#39;` and `&amp;` LAST, so the
    *      double-escaped `&amp;lt;` correctly yields literal `&lt;`;
    *   5. collapse whitespace and trim.
    * Known regex-stripper limits (documented, standard): a `>` inside an
    * attribute value ends the tag early; an unclosed `<script>` leaks its
    * body. Every step is plain regexp_replace/replace — the identical
    * chain recomputes in DuckDB (q_html_strip is hash-checked). */
  def htmlStrip(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
