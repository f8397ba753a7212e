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
