package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Rng
import graft.operators.Stats

class StatsExtSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("qnorm matches published standard-normal quantiles to 1e-8") {
    // reference values: standard tables / scipy.stats.norm.ppf
    val golden = Seq(
      0.5 -> 0.0,
      0.975 -> 1.959963984540054,
      0.95 -> 1.6448536269514722,
      0.995 -> 2.5758293035489004,
      0.9 -> 1.2815515655446004,
      0.01 -> -2.3263478740408408,
      0.001 -> -3.090232306167813)
    golden.foreach { case (p, want) =>
      assert(math.abs(Stats.qnorm(p) - want) < 1e-8,
        s"qnorm($p) = ${Stats.qnorm(p)}, want $want")
    }
    // symmetry
    assert(math.abs(Stats.qnorm(0.3) + Stats.qnorm(0.7)) < 1e-12)
  }

  /** O(n^2) tau-b oracle with scipy tie handling. */
  private def tauOracle(xs: Seq[Double], ys: Seq[Double]): Double = {
    val n = xs.length
    var s = 0L; var tx = 0L; var ty = 0L
    for (i <- 0 until n; j <- i + 1 until n) {
      val dx = math.signum(xs(i) - xs(j))
      val dy = math.signum(ys(i) - ys(j))
      s += (dx * dy).toLong
      if (dx == 0) tx += 1
      if (dy == 0) ty += 1
    }
    val tot = n.toLong * (n - 1) / 2
    s / math.sqrt((tot - tx).toDouble * (tot - ty).toDouble)
  }

  test("kendall tau-b matches the O(n^2) oracle, with and without ties") {
    // deterministic data: 3 groups, heavy ties in x (quantized), some in y
    val data = (0 until 600).map { i =>
      val g = "g" + (i % 3)
      val x = Rng.int(Rng.hash(5L, i, 1), 20).toDouble // many ties
      val y = (Rng.double01(Rng.hash(5L, i, 2)) * 100).floor +
        (if (i % 7 == 0) 0.0 else Rng.double01(Rng.hash(5L, i, 3)))
      (g, x, y)
    }
    val got = Stats.kendall(data.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("kendall_tau")).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val want = tauOracle(rows.map(_._2), rows.map(_._3))
      assert(math.abs(got(g) - want) < 1e-12, s"group $g: got ${got(g)} want $want")
    }
  }

  test("kendall: perfect concordance / discordance / degenerate groups") {
    val d = Seq(
      ("up", 1.0, 10.0), ("up", 2.0, 20.0), ("up", 3.0, 30.0),
      ("dn", 1.0, 30.0), ("dn", 2.0, 20.0), ("dn", 3.0, 10.0),
      ("const", 1.0, 5.0), ("const", 2.0, 5.0), ("const", 3.0, 5.0))
      .toDF("g", "x", "y")
    val got = Stats.kendall(d, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("kendall_tau")).toMap
    assert(got("up") == 1.0)
    assert(got("dn") == -1.0)
    assert(got("const").isNaN) // zero y-variance -> undefined, NaN like scipy
  }

  test("bootstrap sampling is deterministic given the seed") {
    val df = (0 until 5000).map(i => (i.toLong, i * 0.5)).toDF("id", "v")
    def runOnce() = df.sample(withReplacement = true, 0.5, seed = 42L)
      .agg(count(lit(1)), sum(col("v"))).head()
    val a = runOnce(); val b = runOnce()
    assert(a == b, "same seed must reproduce the same bootstrap sample")
    val c = df.sample(withReplacement = true, 0.5, seed = 43L)
      .agg(count(lit(1)), sum(col("v"))).head()
    assert(a != c, "different seed should (overwhelmingly) differ")
    // sample-size concentration: E[n]=2500, loose 6-sigma-ish bounds
    val n = a.getLong(0)
    assert(n > 2100 && n < 2900, s"bootstrap size $n outside plausible range")
  }
}
