package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs: DataFrame = (1L to 60L).map { i =>
    (i, Seq("aa", "bb", "cc")((i % 3).toInt),
      if (i % 11 == 0) "" // empty docs: zero tokens
      else Seq.fill((i % 9).toInt + 1)("w").mkString(" "))
  }.toDF("id", "grp", "text")

  private val toks =
    size(filter(split(trim(col("text")), "\\s+"), x => x =!= ""))

  // ---- packSequences ----

  private def pack(df: DataFrame, nBuckets: Int = 64, seqLen: Long = 7L)
      : Seq[(Long, Long, Long, Long, Long, Long)] =
    Sampling.packSequences(df, "id", toks, seqLen, seed = 3L, nBuckets)
      .select("id", "n_tokens", "cum_before", "seq_first", "seq_last",
        "offset_in_seq")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq

  /** Sequential Scala oracle: sort by (xxhash64(seed,id), id), running sum. */
  private def bruteForce(seqLen: Long = 7L)
      : Seq[(Long, Long, Long, Long, Long, Long)] = {
    val rows = docs
      .select(col("id"), xxhash64(lit(3L), col("id")).as("h"),
        toks.cast("long").as("nt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._2, t._1))
    var cum = 0L
    rows.map { case (id, _, nt) =>
      val cb = cum; cum += nt
      (id, nt, cb, cb / seqLen, (cb + math.max(nt, 1L) - 1L) / seqLen,
        cb % seqLen)
    }.sortBy(_._1).toSeq
  }

  test("packSequences matches the sequential concat-and-chunk oracle") {
    assert(pack(docs) === bruteForce())
  }

  test("packSequences is invariant to nBuckets and partition layout") {
    val base = pack(docs)
    for (nb <- Seq(1, 5, 64); parts <- Seq(1, 7, 13))
      assert(pack(docs.repartition(parts), nBuckets = nb) === base,
        s"nBuckets=$nb parts=$parts")
  }

  test("packSequences structural identities") {
    val r = pack(docs)
    // offsets are global and contiguous: each doc starts where the previous
    // ended (zero-token docs tie on cum_before with their successor, so
    // sort them first within a tie)
    val inOrder = r.sortBy(t => (t._3, t._2))
    inOrder.zip(inOrder.tail).foreach { case (a, b) =>
      assert(a._3 + a._2 === b._3, s"gap after id=${a._1}")
    }
    r.foreach { case (id, nt, cb, sf, sl, off) =>
      assert(off === cb % 7L, s"id=$id offset")
      assert(sf === cb / 7L, s"id=$id seq_first")
      if (nt === 0L) assert(sl === sf, s"id=$id empty doc spans")
      else assert(sl === (cb + nt - 1L) / 7L, s"id=$id seq_last")
    }
    // the test data must actually exercise boundary-spanning docs
    assert(r.exists(t => t._5 > t._4), "no doc spans a sequence boundary")
  }

  test("packSequences never runs a fact-sized single-partition window") {
    import org.apache.spark.sql.execution.window.WindowExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = Sampling.packSequences(docs, "id", toks, 7L)
      val windows = out.queryExecution.executedPlan.collect {
        case w: WindowExec => w
      }
      assert(windows.nonEmpty)
      windows.foreach { w =>
        // a global (empty partitionSpec) window is legal ONLY over the
        // tiny per-bucket aggregate, never over fact rows
        if (w.partitionSpec.isEmpty)
          assert(w.child.collectFirst {
            case a if a.nodeName.toLowerCase.contains("aggregate") => a
          }.nonEmpty, s"global window over non-aggregated input:\n$w")
      }
      // and the fact-side prefix window must partition by the bucket
      assert(windows.exists(w => w.partitionSpec.nonEmpty))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("packSequences rejects non-positive seqLen") {
    intercept[IllegalArgumentException] {
      Sampling.packSequences(docs, "id", toks, 0L)
    }
  }

  // ---- temperatureSample ----

  private def temp(df: DataFrame, alpha: Double, target: Long)
      : Seq[(Long, String, Long, Boolean)] =
    Sampling.temperatureSample(df, Seq("grp"), "id", alpha, target,
        seed = 9L)
      .select("id", "grp", "rate_ppm", "kept")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq

  test("alpha=1 is a plain proportional subsample: one uniform rate") {
    val r = temp(docs, alpha = 1.0, target = 30L)
    val rates = r.map(_._3).distinct
    assert(rates.size === 1)
    assert(rates.head === math.round(30.0 / 60.0 * 1e6))
  }

  test("lower alpha narrows the expected per-stratum count spread") {
    // skewed strata: 40/15/5 rows
    val skewed = ((1L to 40L).map((_, "big")) ++ (41L to 55L).map((_, "mid"))
      ++ (56L to 60L).map((_, "small")))
      .map { case (i, g) => (i, g, "w w w") }.toDF("id", "grp", "text")
    def spread(alpha: Double): Double = {
      val byGrp = temp(skewed, alpha, target = 30L)
        .groupBy(_._2).map { case (_, rs) =>
          rs.head._3.toDouble / 1e6 * rs.size } // expected kept count
      byGrp.max - byGrp.min
    }
    assert(spread(0.3) < spread(0.7) && spread(0.7) < spread(1.0))
  }

  test("rates clamp at 1e6 and expected total tracks the target") {
    // target larger than a small stratum can supply -> its rate clamps
    val skewed = ((1L to 50L).map((_, "big")) ++ (51L to 53L).map((_, "tiny")))
      .map { case (i, g) => (i, g, "w") }.toDF("id", "grp", "text")
    val r = temp(skewed, alpha = 0.2, target = 40L)
    val tiny = r.filter(_._2 == "tiny")
    assert(tiny.forall(_._3 === 1000000L) && tiny.forall(_._4))
    val expected = r.groupBy(_._2).map { case (_, rs) =>
      rs.head._3.toDouble / 1e6 * rs.size }.sum
    assert(math.abs(expected - 40.0) < 41.0 * 0.35) // clamp loses some mass
  }

  test("temperatureSample is deterministic across partition layouts") {
    val base = temp(docs, alpha = 0.5, target = 30L)
    for (parts <- Seq(1, 7, 13))
      assert(temp(docs.repartition(parts), alpha = 0.5, target = 30L) === base)
  }

  test("null stratum rows are a stratum: null-safe rate join keeps them") {
    val withNull = Seq((1L, "aa", "w w"), (2L, null, "w"), (3L, null, "w w w"))
      .toDF("id", "grp", "text")
    val r = Sampling.temperatureSample(withNull, Seq("grp"), "id", 0.5, 2L)
      .select("id", "rate_ppm").collect().map(_.getLong(0)).sorted
    assert(r === Array(1L, 2L, 3L))
  }

  test("maxStrata rail fails fast on a fine-grained key") {
    val e = intercept[IllegalStateException] {
      Sampling.temperatureSample(docs, Seq("id"), "id", 0.5, 10L,
        maxStrata = 5)
    }
    assert(e.getMessage.contains("maxStrata"))
  }

  test("alpha outside (0,1] is rejected") {
    intercept[IllegalArgumentException] {
      Sampling.temperatureSample(docs, Seq("grp"), "id", 0.0, 10L)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureSample(docs, Seq("grp"), "id", 1.5, 10L)
    }
  }
}
