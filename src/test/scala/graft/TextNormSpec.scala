package graft

import org.apache.spark.sql.functions._
import graft.core.TextNorm
import SparkSpec.spark.implicits._

class TextNormSpec extends SparkSpec {

  private def norm(s: String): String =
    Seq(s).toDF("t").select(TextNorm.normalize(col("t"))).as[String].head()

  private def toks(s: String): Seq[String] =
    Seq(s).toDF("t").select(TextNorm.tokens(col("t"))).as[Seq[String]].head()

  test("normalize collapses whitespace, lowercases, strips non-ASCII-alnum") {
    assert(norm("Hello,  World!\n42") === "hello world 42")
    assert(norm("café") === "caf") // reference strips non-ASCII letters
    assert(norm("") === "")
  }

  test("normalize treats Unicode whitespace as a boundary (Python re parity)") {
    // NBSP: Python \s matches it -> space -> two tokens. ASCII-only \s
    // would DELETE it (via the alnum strip), merging the words.
    assert(norm("a\u00a0b") === "a b")
    assert(norm("x\u2003y") === "x y") // em-space
  }

  test("tokens drops empty tokens like Python str.split") {
    assert(toks("  Hello   world  ") === Seq("hello", "world"))
    assert(toks("...") === Seq.empty) // all-punctuation
    assert(toks("a.b") === Seq("ab")) // punctuation strips, not splits
  }

  test("normalizeKey mirrors the UI path and matches build normalization") {
    assert(TextNorm.normalizeKey("  DaTa!  ") === "data")
    assert(TextNorm.normalizeKey("Café") === "caf")
  }

  test("isValidKey rejects whitespace-bearing input") {
    assert(TextNorm.isValidKey("word"))
    assert(!TextNorm.isValidKey("two words"))
    assert(!TextNorm.isValidKey(""))
    // Python \s parity: Unicode whitespace and the C0 separators are
    // whitespace to the reference's validator too
    assert(!TextNorm.isValidKey("a\u00a0b")) // NBSP
    assert(!TextNorm.isValidKey("a\u001cb")) // file separator
    assert(!TextNorm.isValidKey("a\u2003b")) // em space
  }

  test("normalizeKey is locale-independent (Turkish dotted-I trap)") {
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      // default-locale lowercasing would give dotless \u0131, which the
      // keep-set strips -> "stanbul"; Locale.ROOT keeps the ascii i
      assert(TextNorm.normalizeKey("Istanbul") === "istanbul")
    } finally java.util.Locale.setDefault(saved)
  }
  private def toksUni(s: String): Seq[String] =
    Seq(s).toDF("t").select(TextNorm.tokensUnicode(col("t"))).as[Seq[String]].head()

  test("tokensUnicode: letters/digits of every script survive, CJK splits per char") {
    // expected values cross-checked against the DuckDB RE2 twin
    // (TOKS_UNI) — the same eight inputs produce the same token lists
    assert(toksUni("H\u00e9llo, W\u00f6rld!") === Seq("h\u00e9llo", "w\u00f6rld"))
    assert(toksUni("\u041f\u0440\u0438\u0432\u0435\u0442, \u043c\u0438\u0440! \u041f\u0440\u0438\u0432\u0435\u0442\u2026") === Seq("\u043f\u0440\u0438\u0432\u0435\u0442", "\u043c\u0438\u0440", "\u043f\u0440\u0438\u0432\u0435\u0442"))
    assert(toksUni("hello\u00a0world") === Seq("hello", "world"))
    assert(toksUni("\u6a5f\u68b0\u5b66\u7fd2\u306f\u697d\u3057\u3044") === Seq("\u6a5f", "\u68b0", "\u5b66", "\u7fd2", "\u306f", "\u697d", "\u3057", "\u3044"))
    assert(toksUni("\u0645\u0631\u062d\u0628\u0627 \u0628\u0627\u0644\u0639\u0627\u0644\u0645 123") === Seq("\u0645\u0631\u062d\u0628\u0627", "\u0628\u0627\u0644\u0639\u0627\u0644\u0645", "123"))
    assert(toksUni("abc\u4f60\u597ddef") === Seq("abc", "\u4f60", "\u597d", "def"))
    assert(toksUni("MIXED Ascii and \u041a\u0438\u0440\u0438\u043b\u043b\u0438\u0446\u0430") === Seq("mixed", "ascii", "and", "\u043a\u0438\u0440\u0438\u043b\u043b\u0438\u0446\u0430"))
    assert(toksUni("") === Seq())
    // ASCII text tokenizes identically under both modes (superset contract)
    assert(toksUni("  Hello,   world! 42 ") === toks("  Hello,   world! 42 "))
  }

  test("tokensUnicode: the ASCII tokenizer erases non-Latin text, the Unicode one keeps it") {
    assert(toks("\u041f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440") === Seq.empty)
    assert(toksUni("\u041f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440").nonEmpty)
  }
}
