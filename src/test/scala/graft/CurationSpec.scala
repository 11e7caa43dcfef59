package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- c4Clean -------------------------------------------------------------

  private val c4docs = Seq(
    // 2 keepable lines + 1 short + 1 unpunctuated -> too_few_lines at min 3
    (1L, "one two three four five six.\nshort line.\nseven eight nine ten eleven twelve!\nno terminal punctuation here at all"),
    // 3 keepable lines -> pass; cleaned drops the bad line
    (2L, "alpha beta gamma delta epsilon.\nzeta eta theta iota kappa?\nbad\nlambda mu nu xi omicron pi.\""),
    (3L, "a fine page with many good words here.\nanother fine long sentence right here too.\nthird fine long sentence sits right here.\nsee Lorem Ipsum for details."),
    (4L, "a fine page with many good words here.\nanother fine long sentence right here too.\nthird fine long sentence sits right here.\nif (x) { y }"),
    (5L, null.asInstanceOf[String]),
    (6L, "")
  ).toDF("doc_id", "text")

  private def c4Row(id: Long): Row =
    Curation.c4Clean(c4docs, "doc_id", "text").filter(col("doc_id") === id).head()

  test("c4Clean keeps only terminal-punctuated lines with >=5 words") {
    val r = c4Row(2L)
    assert(r.getAs[Boolean]("keep"))
    assert(r.getAs[Int]("n_lines") === 4 && r.getAs[Int]("n_kept") === 3)
    val cleaned = r.getAs[String]("cleaned_text")
    assert(cleaned.split("\n").length === 3 && !cleaned.contains("bad"))
  }

  test("c4Clean page rules fire in order and empty the cleaned text") {
    val byId = Curation.c4Clean(c4docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[String]("reject_reason") === "too_few_lines")
    assert(byId(3L).getAs[String]("reject_reason") === "lorem_ipsum") // case-insensitive
    assert(byId(4L).getAs[String]("reject_reason") === "brace")
    assert(byId(5L).getAs[String]("reject_reason") === "missing_text")
    assert(byId(6L).getAs[String]("reject_reason") === "too_few_lines")
    Seq(1L, 3L, 4L, 5L, 6L).foreach { id =>
      assert(!byId(id).getAs[Boolean]("keep"))
      assert(byId(id).getAs[String]("cleaned_text") === "")
    }
  }

  // --- gopherGate ----------------------------------------------------------

  // 12 words incl. both required stopwords, all alphabetic, no repeats
  private val goodText =
    "the quick brown fox jumps over a lazy dog near running water"

  private val gopherDocs = Seq(
    (1L, goodText),
    (2L, "the a short"),                                   // too_few_words
    (3L, Seq.fill(6)("the a xx yy zz").mkString(" ")),     // mean word len < 3
    (4L, ("the a " + Seq.range(0, 15).map(i => s"$i$i$i").mkString(" "))), // digits -> non_alpha
    (5L, goodText.replace("the ", "zzz ")),                // only 'a' present -> stopwords
    (6L, "the a " + Seq.fill(12)("word").mkString(" ")),   // dup_frac 11/14 -> repetition
    (7L, null.asInstanceOf[String])                        // missing_text
  ).toDF("doc_id", "text")

  test("c4Clean treats CRLF pages like LF pages (the \\r never survives)") {
    val lf = Seq((1L, "alpha beta gamma delta epsilon.\nzeta eta theta iota kappa?\nlambda mu nu xi omicron pi.")).toDF("doc_id", "text")
    val crlf = Seq((1L, "alpha beta gamma delta epsilon.\r\nzeta eta theta iota kappa?\r\nlambda mu nu xi omicron pi.")).toDF("doc_id", "text")
    val a = Curation.c4Clean(lf, "doc_id", "text").head()
    val b = Curation.c4Clean(crlf, "doc_id", "text").head()
    assert(b.getAs[Boolean]("keep"), "CRLF page rejected")
    assert(b.getAs[Int]("n_kept") === a.getAs[Int]("n_kept"))
    assert(b.getAs[String]("cleaned_text") === a.getAs[String]("cleaned_text"))
    assert(!b.getAs[String]("cleaned_text").contains("\r"))
  }

  test("gopherGate applies rules first-failing-wins with audited signals") {
    val r = Curation.gopherGate(gopherDocs, "doc_id", "text",
      stopwords = Seq("the", "a"), minWords = 10, maxDupFrac = 0.5)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Boolean]("keep") && r(1L).getAs[String]("reject_reason") == null)
    assert(r(2L).getAs[String]("reject_reason") === "too_few_words")
    assert(r(3L).getAs[String]("reject_reason") === "word_length")
    assert(r(4L).getAs[String]("reject_reason") === "non_alpha_words")
    assert(r(5L).getAs[String]("reject_reason") === "stopwords")
    assert(r(6L).getAs[String]("reject_reason") === "repetition")
    assert(r(7L).getAs[String]("reject_reason") === "missing_text")
    assert(r(1L).getAs[Int]("word_count") === 12 && r(1L).getAs[Int]("n_stopwords") === 2)
    assert(r(6L).getAs[Double]("dup_frac") > 0.5)
    assert(r(7L).getAs[Int]("word_count") === 0) // null contract: zeroed signals
  }

  test("gopherGate word-count bounds are inclusive-exclusive as specified") {
    val d = Seq((1L, Seq.fill(10)("w").mkString(" "))).toDF("doc_id", "text")
    // exactly minWords words -> the count rule passes (repetition fires later)
    val r = Curation.gopherGate(d, "doc_id", "text", Seq("w", "x"),
      minWords = 10, maxDupFrac = 0.99).head()
    assert(r.getAs[String]("reject_reason") !== "too_few_words")
  }

  // --- piiRedact -----------------------------------------------------------

  test("piiRedact counts and redacts all three classes, all occurrences") {
    val d = Seq(
      (1L, "mail me at a.b+c@sub.example.org or x@y.io, box 10.20.30.40, call +1 555-867-5309 or 555 123 4567 now"),
      (2L, "no pii in this perfectly ordinary sentence"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = Curation.piiRedact(d, "doc_id", "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_email") === 2L)
    assert(r(1L).getAs[Long]("n_ip") === 1L)
    assert(r(1L).getAs[Long]("n_phone") === 2L)
    val red = r(1L).getAs[String]("redacted_text")
    assert(red.contains("<EMAIL>") && red.contains("<IP>") && red.contains("<PHONE>"))
    assert(!red.contains("@") && !red.contains("10.20.30.40") && !red.contains("5309"))
    // negative control: untouched text, zero counts
    assert(r(2L).getAs[Long]("n_email") === 0L &&
      r(2L).getAs[String]("redacted_text") === "no pii in this perfectly ordinary sentence")
    // null contract: zero counts, null redaction
    assert(r(3L).getAs[Long]("n_email") === 0L && r(3L).isNullAt(r(3L).fieldIndex("redacted_text")))
  }

  test("pii patterns do not cross-match each other's plants") {
    // an email's digits must not count as phone/ip; an ip must not count as phone
    val d = Seq((1L, "user120@mail3.example.com and 10.0.137.25 here")).toDF("doc_id", "text")
    val r = Curation.piiRedact(d, "doc_id", "text").head()
    assert(r.getAs[Long]("n_email") === 1L)
    assert(r.getAs[Long]("n_ip") === 1L)
    assert(r.getAs[Long]("n_phone") === 0L)
  }

  // --- scale shape ----------------------------------------------------------

  test("curation gates are pure projections: zero exchanges in the plan") {
    val d = Seq((1L, "a b.")).toDF("doc_id", "text")
    Seq(
      Curation.c4Clean(d, "doc_id", "text"),
      Curation.gopherGate(d, "doc_id", "text", Seq("a")),
      Curation.piiRedact(d, "doc_id", "text")
    ).foreach { out =>
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    }
  }
}
