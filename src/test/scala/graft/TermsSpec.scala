package graft

import java.lang.Double.doubleToRawLongBits

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Caches, Terms}

/** The Terms operators ship a vocabulary-broadcast kernel (default path)
  * and a join-formulation fallback; the kernel replays the fallback's
  * expression arithmetic (BigDecimal HALF_UP rounding, long/long → double
  * division, UTF8 binary tie order) and must be BIT-equal to it — any ulp
  * divergence here is exactly the float-boundary class that broke the
  * round-4 driver gate.
  */
class TermsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic Zipf-ish corpus with nulls, empties, unicode, repeats. */
  private def corpus(nDocs: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val vocab = (Array.tabulate(40)(i => s"w$i") ++
      Array("héllo", "世界", "a" * 30, "x.y,z", "W0")) // case-distinct twin
    val rows = (1L to nDocs.toLong).map { i =>
      if (i % 17 == 0) (i, null.asInstanceOf[String])
      else if (i % 13 == 0) (i, "   ")
      else {
        val n = 1 + rnd.nextInt(60)
        val words = Array.fill(n) {
          // Zipf-ish: low ids much more likely
          val z = math.min(vocab.length - 1,
            (math.pow(rnd.nextDouble(), 3) * vocab.length).toInt)
          vocab(z)
        }
        (i, words.mkString(" "))
      }
    }
    rows.toDF("doc_id", "text")
  }

  private def bits(d: Double): Long = doubleToRawLongBits(d)

  test("tfidfTopK kernel ≡ join fallback, bit-equal scores, same ranking") {
    val d = corpus(240, seed = 7).repartition(5)
    val fast = Terms.tfidfTopK(d, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(5), r.getString(1),
        r.getLong(2), r.getLong(3), bits(r.getDouble(4)))).sortBy(x => (x._1, x._2))
    val slow = Terms.tfidfTopKShuffle(d, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(5), r.getString(1),
        r.getLong(2), r.getLong(3), bits(r.getDouble(4)))).sortBy(x => (x._1, x._2))
    Caches.releaseAll()
    assert(fast.length == slow.length)
    assert(fast.sameElements(slow))
  }

  test("unigramLogProb kernel ≡ join fallback, bit-equal nll") {
    val d = corpus(240, seed = 11).repartition(5)
    val fast = Terms.unigramLogProb(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), bits(r.getDouble(1)), r.getLong(2)))
      .sortBy(_._1)
    val slow = Terms.unigramLogProbShuffle(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), bits(r.getDouble(1)), r.getLong(2)))
      .sortBy(_._1)
    Caches.releaseAll()
    assert(fast.length == slow.length)
    assert(fast.sameElements(slow))
  }

  test("rail overflow falls back to the join formulation, same answer") {
    val d = corpus(60, seed = 3)
    val a = Terms.tfidfTopK(d, "doc_id", "text", k = 2, maxBroadcastVocab = 1)
      .collect().map(r => (r.getLong(0), r.getInt(5), r.getString(1))).sorted
    val b = Terms.tfidfTopKShuffle(d, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(5), r.getString(1))).sorted
    val c = Terms.unigramLogProb(d, "doc_id", "text", maxBroadcastVocab = 1)
      .collect().map(r => (r.getLong(0), bits(r.getDouble(1)))).sorted
    val e = Terms.unigramLogProbShuffle(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), bits(r.getDouble(1)))).sorted
    Caches.releaseAll()
    assert(a.sameElements(b))
    assert(c.sameElements(e))
  }
}
