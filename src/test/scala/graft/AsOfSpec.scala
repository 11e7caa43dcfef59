package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.operators.AsOf
import graft.features.FeaturePipeline

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Single-threaded, obviously-correct oracle for the as-of join. */
  def bruteForce(
      probes: Seq[(String, Long)],
      events: Seq[(String, Long, Long, Double)] // entity, t, seq, v
  ): Map[(String, Long), Option[(Long, Double)]] =
    probes.map { case (e, pt) =>
      val cand = events.filter(ev => ev._1 == e && ev._2 <= pt)
      val best =
        if (cand.isEmpty) None
        else { val m = cand.maxBy(ev => (ev._2, ev._3)); Some((m._2, m._4)) }
      (e, pt) -> best
    }.toMap

  test("as-of join matches brute-force oracle incl. edge cases") {
    val events = Seq(
      ("a", 100L, 1L, 1.0), ("a", 200L, 2L, 2.0), ("a", 200L, 3L, 2.5), // dup ts
      ("a", 400L, 4L, 4.0),
      ("b", 150L, 5L, 10.0),
      ("c", 999L, 6L, 7.0))
    val probes = Seq(
      ("a", 50L), // before first -> null
      ("a", 100L), // exactly at event -> visible
      ("a", 200L), // duplicate ts -> greatest seq wins (2.5)
      ("a", 300L), // between
      ("a", 10000L), // after last
      ("b", 150L), ("b", 149L),
      ("d", 500L)) // entity with no events
    val evDf = events.toDF("entity_id", "event_ms", "seq", "v")
    val prDf = probes.toDF("entity_id", "probe_ms")
    val got = AsOf.join(prDf, evDf, "entity_id", "probe_ms", "event_ms",
        attach = Seq("v"), tie = Some("seq"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getDouble(3)))))
      .toMap
    val want = bruteForce(probes, events)
    assert(got.size == probes.size)
    probes.foreach { p => assert(got(p) == want(p), s"probe $p: got ${got(p)} want ${want(p)}") }
  }

  test("as-of join on generated corpus matches brute-force at 1k rows") {
    val p = Corpus.Params(rows = 1000, entities = 10)
    val ev = Corpus.events(spark, p).select("entity_id", "event_ms", "seq", "phash")
    val pr = Corpus.probes(spark, p)
    val events = ev.as[(String, Long, Long, Long)].collect().toSeq
      .map(t => (t._1, t._2, t._3, t._4.toDouble))
    val probes = pr.select("entity_id", "probe_ms").as[(String, Long)].collect().toSeq
    val want = bruteForce(probes, events)
    val got = AsOf.join(pr, ev, "entity_id", "probe_ms", "event_ms", tie = Some("seq"))
      .select("entity_id", "probe_ms", "asof_time", "asof_phash")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3).toDouble))))
      .toMap
    probes.foreach { pb => assert(got(pb) == want(pb), s"probe $pb") }
  }

  test("determinism: identical results at different parallelism/partitioning") {
    val p = Corpus.Params(rows = 2000, entities = 15, partitions = 3)
    val p2 = p.copy(partitions = 13)
    def digest(params: Corpus.Params): Long = {
      import org.apache.spark.sql.functions._
      // order-insensitive commutative digest; bit_xor avoids ANSI sum overflow
      FeaturePipeline.flagship(spark, params)
        .select(xxhash64(to_json(struct(col("*")))).as("h"))
        .agg(expr("bit_xor(h)")).as[Long].head()
    }
    assert(digest(p) == digest(p2))
  }

  test("flagship returns rows with populated features") {
    val df = FeaturePipeline.flagship(spark, Corpus.Params(rows = 500, entities = 10))
    assert(df.count() > 0)
    val nonNull = df.filter(df("asof_quality").isNotNull)
    assert(nonNull.count() > 0)
  }
}
