package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{Corpus, Rng}
import graft.operators.AsOf

/** The skew-safe as-of join must be semantically identical to the plain
  * union-tag as-of join on every input — incl. duplicate timestamps, probes
  * before any event, empty entities, and Zipf-hot entities (its raison
  * d'être: the hot entity's timeline spreads over (entity, time-bucket)
  * partitions instead of one window task).
  */
class AsOfSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(to_json(struct(df.columns.sorted.map(col): _*)))
      .collect().map(_.getString(0)).toSet

  test("skew-safe as-of equals plain as-of on the hot-entity corpus") {
    val p = Corpus.Params(rows = 3000, entities = 8) // e00000 very hot
    val ev = Corpus.events(spark, p).select("entity_id", "event_ms", "seq", "phash")
    val pr = Corpus.probes(spark, p, perEntity = 16)
    val plain = AsOf.join(pr, ev, "entity_id", "probe_ms", "event_ms",
      tie = Some("seq"))
    val safe = AsOf.joinSkewSafe(pr, ev, "entity_id", "probe_ms", "event_ms",
      tie = Some("seq"), timeBuckets = 16)
    // align schemas: plain asof_time is long already for long probe_ms
    assert(canon(plain.select(col("entity_id"), col("probe_ms"),
        col("asof_time").cast("long").as("t"), col("asof_phash"))) ==
      canon(safe.select(col("entity_id"), col("probe_ms"),
        col("asof_time").cast("long").as("t"), col("asof_phash"))))
  }

  test("skew-safe as-of: randomized equivalence incl. edge cases") {
    for (trial <- 0 until 10) {
      val seed = 500L + trial
      val events = (0 until 120).map { i =>
        ("e" + Rng.int(Rng.hash(seed, i), 3), // few entities -> dup timestamps
          (100L + Rng.int(Rng.hash(seed, 1000 + i), 50)),
          i.toLong, Rng.double01(Rng.hash(seed, 2000 + i)))
      }
      val probes = (0 until 40).map { j =>
        ("e" + Rng.int(Rng.hash(seed, 3000 + j), 4), // incl. entity w/o events
          (90L + Rng.int(Rng.hash(seed, 4000 + j), 80)))
      }
      val evDf = events.toDF("entity_id", "event_ms", "seq", "v")
      val prDf = probes.toDF("entity_id", "probe_ms")
      val plain = AsOf.join(prDf, evDf, "entity_id", "probe_ms", "event_ms",
        tie = Some("seq"))
      val safe = AsOf.joinSkewSafe(prDf, evDf, "entity_id", "probe_ms", "event_ms",
        tie = Some("seq"), timeBuckets = 7)
      assert(canon(plain.select(col("entity_id"), col("probe_ms"),
          col("asof_time").cast("long").as("t"), col("asof_v"), col("asof_seq"))) ==
        canon(safe.select(col("entity_id"), col("probe_ms"),
          col("asof_time").cast("long").as("t"), col("asof_v"), col("asof_seq"))),
        s"trial $trial mismatch")
    }
  }

  test("skew-safe window partitions by (entity, bucket), not entity alone") {
    val p = Corpus.Params(rows = 2000, entities = 4)
    val ev = Corpus.events(spark, p).select("entity_id", "event_ms", "seq", "phash")
    val pr = Corpus.probes(spark, p)
    val safe = AsOf.joinSkewSafe(pr, ev, "entity_id", "probe_ms", "event_ms",
      tie = Some("seq"), timeBuckets = 16)
    safe.collect()
    val plan = safe.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("windowspecdefinition(entity_id"), plan)
    assert(plan.contains("__bkt"), "expected (entity, bucket) window partitioning")
  }
}
