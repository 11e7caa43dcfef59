package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Corpus
import graft.multimodal.Multimodal

/** The image quality gate: rule semantics, first-failing-rule precedence,
  * and the shuffle-free plan shape (a gate that shuffles is wrong at any
  * scale — it must fuse into the scan).
  */
class MultimodalGateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sw = Seq("the", "of", "and", "a")

  private def row(w: Int, h: Int, fmt: String, caption: String,
      byteLen: Int): (String, Array[Byte], Int, Int, String, String) =
    ("id", Array.fill[Byte](byteLen)(1), w, h, fmt, caption)

  private def reason(rows: (String, Array[Byte], Int, Int, String, String)*): Seq[String] = {
    val df = rows.toSeq.toDF("image_id", "bytes", "w", "h", "fmt", "caption")
    Multimodal.qualityGate(df, sw,
      expectedByteLen = Some(col("w").cast("long") * col("h") + 1))
      .select("reject_reason").collect().map(_.getString(0)).toSeq
  }

  test("each rule fires on its own violation; a clean row passes with null") {
    val good = row(16, 16, "raw", "crisp photo of mountain lake", 257)
    assert(reason(good) == Seq(null))
    assert(reason(row(8, 8, "raw", "crisp photo of mountain lake", 65))
      == Seq("too_small"))
    assert(reason(row(16, 8, "raw", "crisp photo of mountain lake", 129))
      == Seq("bad_aspect"))
    assert(reason(row(16, 16, "webp", "crisp photo of mountain lake", 257))
      == Seq("bad_fmt"))
    assert(reason(row(16, 16, "raw", "crisp photo of mountain lake", 256))
      == Seq("corrupt"))
    assert(reason(row(16, 16, "raw", "two words", 257))
      == Seq("caption_short"))
    assert(reason(row(16, 16, "raw", "the of and a lake", 257))
      == Seq("caption_stopwordy"))
  }

  test("precedence: the FIRST failing rule wins, in the documented order") {
    // violates every rule at once -> too_small (rule 1)
    assert(reason(row(8, 4, "webp", "the", 2)) == Seq("too_small"))
    // violates 2..6 -> bad_aspect
    assert(reason(row(32, 16, "webp", "the", 2)) == Seq("bad_aspect"))
    // violates 4..6 -> corrupt before the caption rules
    assert(reason(row(16, 16, "raw", "the", 9)) == Seq("corrupt"))
  }

  test("null fields are rejected as missing_field, not silently passed") {
    val df = Seq[(String, Array[Byte], Integer, Integer, String, String)](
      ("a", Array[Byte](1), 16, 16, "raw", null),
      ("b", Array[Byte](1), null, 16, "raw", "crisp photo of mountain lake"),
      ("c", Array[Byte](1), 16, 16, null, "crisp photo of mountain lake"),
      ("d", null, 16, 16, "raw", "crisp photo of mountain lake"))
      .toDF("image_id", "bytes", "w", "h", "fmt", "caption")
    val out = Multimodal.qualityGate(df, sw,
      expectedByteLen = Some(col("w").cast("long") * col("h") + 1))
      .select("reject_reason").collect().map(_.getString(0)).toSeq
    assert(out == Seq.fill(4)("missing_field"))
    // without the corrupt rule armed, null bytes are NOT a missing field
    val noBytes = Multimodal.qualityGate(df.where(col("image_id") === "d"), sw)
      .select("reject_reason").head.getString(0)
    assert(noBytes == null)
  }

  test("expectedByteLen = None skips the corrupt rule (no bytes required)") {
    val df = Seq((16, 16, "raw", "crisp photo of mountain lake"))
      .toDF("w", "h", "fmt", "caption")
    val out = Multimodal.qualityGate(df, sw)
    assert(out.select("reject_reason").head.getString(0) == null)
  }

  test("empty caption: token rules treat it as zero tokens, not a crash") {
    assert(reason(row(16, 16, "raw", "", 257)) == Seq("caption_short"))
    assert(reason(row(16, 16, "raw", "   ", 257)) == Seq("caption_short"))
  }

  test("gate plan is shuffle-free (pure map over the scan)") {
    val df = Multimodal.qualityGate(
      Corpus.events(spark, Corpus.Params(rows = 200L)), Corpus.Stopwords,
      expectedByteLen = Some(col("w").cast("long") * col("h") + 1))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gate shuffled:\n$plan")
  }

  test("gate on the synthesized corpus: every outcome class is populated") {
    val planted = Corpus.events(spark, Corpus.Params(rows = 2000L))
      .withColumn("bytes", when(col("seq") % 19 === 0,
        expr("substring(bytes, 1, cast(length(bytes) - 1 as int))"))
        .otherwise(col("bytes")))
    val outcomes = Multimodal.qualityGate(planted, Corpus.Stopwords,
      expectedByteLen = Some(col("w").cast("long") * col("h") + 1))
      .groupBy(coalesce(col("reject_reason"), lit("pass")).as("o"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(outcomes.contains("pass") && outcomes("pass") > 0)
    assert(outcomes.contains("too_small") && outcomes.contains("bad_aspect"))
    assert(outcomes.contains("corrupt"))
    // planted corruption only survives to the corrupt rule on 16x16 rows
    assert(outcomes("corrupt") <= 2000 / 19 + 1)
    assert(outcomes.values.sum == 2000)
  }
}
