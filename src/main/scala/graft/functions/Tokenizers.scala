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
