package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text normalization for the index build path and the query path.
  *
  * Reproduces the reference normalizer (one function so the two
  * paths can never diverge — reference duplicates it at
  * `mapper/main.py:56-57` (build) and `main/app.py:67-68` (lookup)):
  *   1. collapse runs of whitespace to a single space — Python `re` `\s`
  *      is Unicode-aware, so we use `(?U)` (UNICODE_CHARACTER_CLASS);
  *      Java's default `\s` is ASCII-only and would DELETE (not split on)
  *      NBSP-like separators via step 3, merging adjacent words. Python
  *      additionally treats the C0 separator controls U+001C..U+001F as
  *      whitespace (str.isspace semantics) although Unicode White_Space
  *      excludes them — the class below lists them explicitly. Pinned by
  *      the Python-golden corpus (TextNormGoldenSpec).
  *   2. lowercase
  *   3. strip everything outside `[a-z0-9 ]` (ASCII keep-set: punctuation
  *      AND non-ASCII letters are removed — "café" → "caf")
  *
  * Oracle note: DuckDB's RE2 `\s` is ASCII-only; the fixture corpus
  * contains no non-ASCII whitespace (verified), so the DuckDB twin SQL
  * stays byte-identical on fixture data. The Unicode gap is pinned by a
  * unit test instead of the oracle.
  *
  * All functions are `Column → Column` so they stay inside Catalyst
  * whole-stage codegen — no UDFs, no serialization boundary.
  */
object TextNorm {

  /** Normalize a text column: `mapper/main.py:56-57`. After this, token
    * boundaries are single ASCII spaces.
    */
  def normalize(c: Column): Column =
    regexp_replace(lower(regexp_replace(c, "(?U)[\\s\\x1c-\\x1f]+", " ")), "[^a-z0-9 ]", "")

  /** Tokenize normalized text into a non-empty-word array.
    * Python `.split()` (`mapper/main.py:60`) drops empty tokens; Spark
    * `split` emits them (leading space, all-punctuation words) — filter.
    */
  def tokens(c: Column): Column =
    filter(split(normalize(c), " "), t => length(t) > lit(0))

  /** Unicode-aware normalizer — the opt-in MULTILINGUAL mode of the
    * pipeline family (dedup shingles, quality signals, LMs, BPE all
    * consume a token stream; the §2-parity [[normalize]] strips every
    * non-ASCII letter, so CJK/Cyrillic/Arabic text tokenizes to NOTHING
    * and silently passes every gate — the normal case for a real
    * multilingual crawl). §2-parity callers keep [[normalize]]; this
    * mode is threaded as a `tok` parameter where it matters.
    *
    *   1. collapse whitespace to one space — Unicode `\s` PLUS category
    *      Z (NBSP & friends are separators, not strippable letters:
    *      deleting them would MERGE adjacent words) plus U+0085 NEL and
    *      the C0 separators, the same class the DuckDB twin spells as
    *      RE2 `[\s\p{Z}\x{0085}\x1c-\x1f]` (ASCII `\s` ∪ Z ∪ NEL —
    *      the two engines' classes are equal by construction);
    *   2. lowercase (Unicode; known cross-engine edge: U+0130 İ lowers
    *      to `i̇` (i + combining dot) on the JVM but `i` in DuckDB —
    *      oracle fixtures avoid it, the JVM behavior is spec-pinned);
    *   3. keep letters, digits, spaces: strip `[^\p{L}\p{N} ]`
    *      (category classes — identical in Java regex and RE2);
    *   4. space out Han/Hiragana/Katakana code points so
    *      scriptio-continua runs tokenize per character (word-boundary
    *      shingles are meaningless on an unsegmented 200-char run;
    *      char-grams are the standard CJK dedup unit) — Java spells
    *      the scripts `\p{IsHan}`, RE2 `\p{Han}`;
    *   5. re-collapse the introduced double spaces and trim.
    *
    * All plain `Column → Column` regex algebra: row-parallel, no UDF,
    * scan-cost at 100 TB like [[normalize]].
    */
  def normalizeUnicode(c: Column): Column = {
    val ws = regexp_replace(c, "(?U)[\\s\\p{Z}\\u0085\\x1c-\\x1f]+", " ")
    val kept = regexp_replace(lower(ws), "[^\\p{L}\\p{N} ]", "")
    val cjk = regexp_replace(kept, "([\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}])", " $1 ")
    trim(regexp_replace(cjk, " {2,}", " "))
  }

  /** Tokenize with the Unicode normalizer — same split/filter contract
    * as [[tokens]]. Pass as the `tok` parameter of the dedup/quality
    * family to stop non-Latin text from vanishing at the tokenizer. */
  def tokensUnicode(c: Column): Column =
    filter(split(normalizeUnicode(c), " "), t => length(t) > lit(0))

  /** Normalize a lookup key the way the UI does (`main/app.py:67-68`):
    * trim, lowercase, strip non-alphanumerics (Unicode `\s` in the
    * keep-set, mirroring Python `re`). Driver-side (plain String): the
    * key is a scalar, not a column.
    */
  def normalizeKey(s: String): String =
    // Locale.ROOT: default-locale toLowerCase turns "I" into dotless ı
    // under Turkish-family locales, which the keep-set then strips —
    // the column path (Spark lower()) and Python .lower() are both
    // locale-independent, so this must be too
    s.trim.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("(?U)[^a-z0-9\\s\\x1c-\\x1f]", "")

  /** Driver-side tokenization of a FREE-TEXT query with the exact
    * column-path semantics ([[normalize]] then [[tokens]]): lowercase,
    * collapse Unicode whitespace + C0 separators, strip everything
    * outside [a-z0-9 ], split, drop empties. Multi-word retrieval
    * entry points ([[graft.index.InvertedIndex.bm25TopK]]) must share
    * one normalization with the indexed corpus or queries silently
    * miss — the [[normalizeKey]] discipline, lifted to word lists. */
  def queryTerms(s: String): Seq[String] =
    s.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("(?U)[\\s\\x1c-\\x1f]+", " ")
      .replaceAll("[^a-z0-9 ]", "")
      .split(" ").toSeq.filter(_.nonEmpty)

  /** Input validation for lookup keys: `main/app.py:43-44` rejects any
    * input containing whitespace (`^[^\s\n]+$`) — Python `\s`, so the
    * class is Unicode plus the C0 separators, like the normalizer.
    */
  def isValidKey(s: String): Boolean = s.matches("(?U)^[^\\s\\x1c-\\x1f]+$")
}
