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
}
