package graft

import java.lang.Double.doubleToRawLongBits

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quality

class QualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "good solid prose with useful content", true),
    (2L, "good useful prose and more good content", true),
    (3L, "spam spam buy now spam", false),
    (4L, "buy spam now", false),
    (5L, "neutral words appear here", true),
    (6L, null.asInstanceOf[String], false) // null text -> bias-only score
  ).toDF("doc_id", "text", "y")

  test("log-count-ratio signs: pos-only terms score up, neg-only down") {
    val r = Quality.nbClassifierScore(docs, "doc_id", "text", col("y"),
        dim = 1 << 12).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2),
        x.getBoolean(3)))).toMap
    // 'good'/'prose'/'useful' never in a neg doc; 'spam'/'buy' never in pos
    assert(r(1L)._2 > 0 && r(2L)._2 > 0)
    assert(r(3L)._2 < 0 && r(4L)._2 < 0)
    assert(r(1L)._3 && !r(3L)._3)
    // binarized features: doc 3's repeated 'spam' counts once (3 distinct)
    assert(r(3L)._1 == 3L)
    // null text: zero terms, score = rounded bias alone (ln(3/3) = 0 -> eps)
    assert(r(6L)._1 == 0L && r(6L)._2 == 0.0)
  }

  test("scores are bit-identical across partition layouts") {
    def run(parts: Int) =
      Quality.nbClassifierScore(docs.repartition(parts), "doc_id", "text",
        col("y"), dim = 64).collect()
        .map(x => (x.getLong(0), x.getLong(1), doubleToRawLongBits(x.getDouble(2))))
        .sortBy(_._1)
    assert(run(1).sameElements(run(7)))
  }

  test("bucket collisions fold into one feature consistently (dim=1)") {
    // every term lands in bucket 0: all docs share the single feature, so
    // scores separate ONLY by bias + n_terms * w0 — still deterministic
    val r = Quality.nbClassifierScore(docs, "doc_id", "text", col("y"), dim = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r.size == 6)
  }

  test("single-class weak label fails fast") {
    val e = intercept[IllegalArgumentException] {
      Quality.nbClassifierScore(docs, "doc_id", "text", lit(true), dim = 16)
    }
    assert(e.getMessage.contains("single class"))
  }

  test("empty corpus fails fast with the single-class diagnostic, not NPE") {
    val e = intercept[IllegalArgumentException] {
      Quality.nbClassifierScore(docs.limit(0), "doc_id", "text",
        lit(true), dim = 16)
    }
    assert(e.getMessage.contains("single class"))
  }

  test("over-rail dim fails fast") {
    val e = intercept[IllegalArgumentException] {
      Quality.nbClassifierScore(docs, "doc_id", "text", col("y"),
        dim = 1 << 23, maxBroadcastDim = 1 << 22)
    }
    assert(e.getMessage.contains("must broadcast"))
  }

  test("null labels count as negative") {
    val d = Seq((1L, "alpha beta", Some(true)),
      (2L, "gamma delta", Option.empty[Boolean]))
      .toDF("doc_id", "text", "y")
    // nulls -> negative, so both classes exist and training succeeds
    val r = Quality.nbClassifierScore(d, "doc_id", "text", col("y"), dim = 32)
      .collect()
    assert(r.length == 2)
  }

  test("bucketMap is the corpus' distinct vocabulary with in-range buckets") {
    val m = Quality.bucketMap(docs, "text", dim = 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet.contains("spam") && m.keySet.contains("good"))
    assert(m.values.forall(b => b >= 0 && b < 8))
    assert(m.size == docs.where(col("text").isNotNull)
      .select(explode(split(col("text"), " "))).distinct().count())
  }
}
