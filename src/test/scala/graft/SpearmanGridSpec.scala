package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Caches, Stats}

/** Round-6 optimization guard: [[Stats.spearmanGridX]] replaces the x-rank
  * window (a second full-fact sort serialized per group) with a tiny
  * (group, x) grid aggregate + broadcast join. The twin must produce the
  * SAME ranks bit for bit — rank() = (#strictly-below) + 1 and the RANGE
  * peer count = the grid cell count — so the corr inputs are identical
  * doubles and the rounded output cannot drift. Pinned here across tie
  * patterns, null groups/values, several partition layouts, and the
  * rail fallback.
  */
class SpearmanGridSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def canon(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect().toSeq
      .map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToRawLongBits(d)
        case x => x
      })
      .sortBy(_.mkString("|"))
  }

  /** 600 rows, 3 groups, x on an 11-value grid with heavy ties (including
    * a null x cell and a null group), y near-continuous with a few planted
    * ties so both rank paths exercise tie averaging.
    */
  private def facts = {
    spark.range(600).select(
      when(col("id") % 3 === 0, "A")
        .when(col("id") % 3 === 1, "N").otherwise(lit(null)).as("g"),
      when(col("id") % 97 === 0, lit(null))
        .otherwise((col("id") % 11).cast("double")).as("x"),
      when(col("id") % 53 === 0, lit(7.5))
        .otherwise(col("id").cast("double") * 1.37 % 100.0).as("y"))
  }

  test("spearmanGridX ≡ spearman bit-for-bit across layouts") {
    for (parts <- Seq(1, 5, 16)) {
      val d = facts.repartition(parts)
      val a = canon(Stats.spearman(d, Seq("g"), "x", "y")
        .withColumn("spearman", round(col("spearman") + 1.7e-8, 4)))
      Caches.releaseAll()
      val b = canon(Stats.spearmanGridX(d, Seq("g"), "x", "y")
        .withColumn("spearman", round(col("spearman") + 1.7e-8, 4)))
      Caches.releaseAll()
      assert(a == b, s"grid twin diverged at $parts partitions")
    }
  }

  test("grid rail overflow falls back to the window form, same answer") {
    // x unique per row => grid is fact-sized; rail of 10 forces fallback
    val d = facts.withColumn("x", col("y") * 3.0 + 1.0)
    val a = canon(Stats.spearman(d, Seq("g"), "x", "y"))
    Caches.releaseAll()
    val b = canon(Stats.spearmanGridX(d, Seq("g"), "x", "y", maxGridRows = 10))
    Caches.releaseAll()
    assert(a == b)
  }
}
