package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** D2 — the pluggable tokenizer seam. The reference plugs the IK
  * analyzer jar into its word-split UDTF
  * (`gmall-realtime/.../app/function/MyUDTF.java` feeding
  * `app/dws/KeywordStatsApp.java:50-54`); that jar does not exist in
  * this environment, so the seam is typed instead: a tokenizer is any
  * `Column => Column` producing `array<string>`, and every strategy
  * here is a codegen'd native expression (split / regexp), never a
  * UDF. Swapping in a real IK/BPE vocabulary is one more entry in
  * this object — no query changes shape. */
object Tokenizers {

  /** Whitespace split — the testdata's delimiter and the reference's
    * effective behavior on pre-segmented text. May emit empty tokens
    * on repeated delimiters; filter `length(w) > 0` downstream (kept
    * out of the tokenizer so the seam stays a pure split). */
  val whitespace: Column => Column = c => split(c, " ")

  /** Lowercased word extraction — regex-match all `[a-z0-9]+` runs.
    * Robust to punctuation-glued tokens; never emits empties. */
  val words: Column => Column =
    c => regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** Mixed-script CJK tokenization — the standard dictionary-free
    * fallback when no IK/segmentation model is available (what Lucene's
    * CJKAnalyzer does): contiguous CJK runs (Han, kana, Hangul — no
    * word delimiters in these scripts) become overlapping character
    * BIGRAMS, Latin/digit runs become lowercased words, everything
    * else is a delimiter. A single-char CJK run is kept as-is rather
    * than dropped. Pure codegen'd expressions (regexp + transform +
    * flatten), no UDF, so it rides whole-stage codegen like every
    * other strategy. */
  val cjkBigrams: Column => Column = { c =>
    // kana via BLOCKS, not scripts: the long-vowel mark ー (U+30FC) is
    // Script=Common but Block=Katakana, and splitting データ at it
    // would corrupt every prolonged-vowel word
    val cjk = "\\p{IsHan}\\p{InHiragana}\\p{InKatakana}\\p{IsHangul}"
    val runs = regexp_extract_all(c, lit(s"[$cjk]+|[A-Za-z0-9]+"), lit(0))
    flatten(transform(runs, r =>
      when(r.rlike(s"^[$cjk]"),
        when(length(r) >= 2,
          transform(sequence(lit(1), length(r) - 1), i => r.substr(i, lit(2))))
          .otherwise(array(r)))
        .otherwise(array(lower(r)))))
  }

  /** Character n-gram shingles over the whitespace-collapsed text —
    * the language-agnostic fallback (what IK degrades to on unknown
    * scripts). */
  def charNgrams(n: Int): Column => Column = { c =>
    val s = regexp_replace(lower(c), " +", " ")
    // guard short inputs explicitly: Spark's sequence(1, 0) defaults
    // to step -1 and yields [1, 0], not an empty array
    when(length(s) >= n,
      transform(
        sequence(lit(1), length(s) - (n - 1)),
        i => s.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  }
}
