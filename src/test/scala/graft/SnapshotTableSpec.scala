package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.tables.SnapshotTable

class SnapshotTableSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmpRoot(tag: String): String = {
    val p = Files.createTempDirectory(s"graft-snap-$tag")
    p.toString
  }

  private def digestOf(df: org.apache.spark.sql.DataFrame): Long =
    df.select(xxhash64(to_json(struct(df.columns.sorted.map(col): _*))).as("h"))
      .agg(expr("bit_xor(h)")).head().getLong(0)

  test("commit+read roundtrips content exactly") {
    val root = tmpRoot("rt")
    val ev = Corpus.events(spark, Corpus.Params(rows = 500, entities = 10))
      .drop("bytes") // binary json-digest is format-noise; content parity via cols
    val id = SnapshotTable.commit(ev, root, "entity_id", "event_ms", buckets = 8)
    assert(id == 0L)
    val back = SnapshotTable.read(spark, root).drop(SnapshotTable.BucketCol)
    assert(back.count() == 500)
    assert(digestOf(back.select(ev.columns.map(col): _*)) == digestOf(ev))
  }

  test("idempotent re-commit rewrites nothing and preserves digests") {
    val root = tmpRoot("idem")
    val ev = Corpus.events(spark, Corpus.Params(rows = 300, entities = 8)).drop("bytes")
    SnapshotTable.commit(ev, root, "entity_id", "event_ms", buckets = 4)
    val s0 = SnapshotTable.currentSnapshot(root).get
    SnapshotTable.commit(ev, root, "entity_id", "event_ms", buckets = 4)
    val s1 = SnapshotTable.currentSnapshot(root).get
    assert(s1.id == s0.id + 1)
    // same digests, same data dirs (no bucket rewritten)
    assert(s1.buckets.map(b => (b.bucket, b.digest, b.dir)) ==
      s0.buckets.map(b => (b.bucket, b.digest, b.dir)))
  }

  test("incremental commit rewrites only changed buckets; time travel works") {
    val root = tmpRoot("incr")
    val p = Corpus.Params(rows = 400, entities = 8)
    val ev = Corpus.events(spark, p).drop("bytes")
    SnapshotTable.commit(ev, root, "entity_id", "event_ms", buckets = 8)
    val s0 = SnapshotTable.currentSnapshot(root).get

    // append rows for ONE entity only -> only that entity's bucket changes
    val extra = Corpus.events(spark, p.copy(rows = 430)).drop("bytes")
      .filter(col("seq") >= 400 && col("entity_id") === "e00000")
    val ev2 = ev.unionByName(extra)
    SnapshotTable.commit(ev2, root, "entity_id", "event_ms", buckets = 8)
    val s1 = SnapshotTable.currentSnapshot(root).get

    val changed = s1.buckets.filter(b =>
      s0.buckets.find(_.bucket == b.bucket).exists(_.digest != b.digest))
    assert(changed.nonEmpty && changed.size < 8, s"changed=${changed.size}")
    val reusedDirs = s1.buckets.filterNot(b => changed.exists(_.bucket == b.bucket))
      .map(_.dir).toSet
    val oldDirs = s0.buckets.map(_.dir).toSet
    assert(reusedDirs.subsetOf(oldDirs), "unchanged buckets must reuse files")

    // time travel to snapshot 0 reproduces the original content
    val back0 = SnapshotTable.read(spark, root, Some(s0.id)).drop(SnapshotTable.BucketCol)
    assert(back0.count() == 400)
    val back1 = SnapshotTable.read(spark, root, Some(s1.id)).drop(SnapshotTable.BucketCol)
    assert(back1.count() == ev2.count())
  }

  test("lineage table exposes per-bucket manifests across snapshots") {
    val root = tmpRoot("lin")
    val p = Corpus.Params(rows = 300, entities = 6)
    val ev = Corpus.events(spark, p).drop("bytes")
    SnapshotTable.commit(ev.filter(col("seq") < 200), root, "entity_id", "event_ms", buckets = 4)
    SnapshotTable.commit(ev, root, "entity_id", "event_ms", buckets = 4)
    val lin = SnapshotTable.lineage(spark, root)
    // one row per (snapshot, non-empty bucket), manifests row-exact vs JSON
    val wantRows = SnapshotTable.snapshot(root, 0L).buckets.size +
      SnapshotTable.snapshot(root, 1L).buckets.size
    assert(lin.count() == wantRows)
    assert(lin.where(col("is_current")).select("snapshot_id").distinct().head.getLong(0) == 1L)
    val s1 = SnapshotTable.snapshot(root, 1L)
    val fromDf = lin.where(col("snapshot_id") === 1L)
      .select("bucket", "rows", "watermark", "digest")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(fromDf == s1.buckets.map(b => (b.bucket, b.rows, b.watermark, b.digest)).toSet)
    // incremental-diff use: changed buckets between snapshots via the table
    val changed = lin.groupBy("bucket")
      .agg(countDistinct(col("digest")).as("nd")).where(col("nd") > 1).count()
    assert(changed > 0)
  }

  test("watermarks track max event time per bucket") {
    val root = tmpRoot("wm")
    val ev = Corpus.events(spark, Corpus.Params(rows = 200, entities = 5)).drop("bytes")
    SnapshotTable.commit(ev, root, "entity_id", "event_ms", buckets = 4)
    val wm = SnapshotTable.watermark(root).get
    val trueMaxPerBucket = ev
      .withColumn(SnapshotTable.BucketCol, pmod(xxhash64(col("entity_id")), lit(4)).cast("int"))
      .groupBy(SnapshotTable.BucketCol).agg(max("event_ms").as("m"))
      .agg(min("m")).head().getLong(0)
    assert(wm == trueMaxPerBucket)
  }

  test("resume after simulated kill: rerun yields identical snapshot digests") {
    val rootA = tmpRoot("killA")
    val rootB = tmpRoot("killB")
    val ev = Corpus.events(spark, Corpus.Params(rows = 300, entities = 8)).drop("bytes")

    // clean run
    SnapshotTable.commit(ev, rootA, "entity_id", "event_ms", buckets = 4)

    // killed run: staging files written but pointer never swapped
    val stage = Paths.get(rootB, "data", "s0_0")
    Files.createDirectories(stage)
    Files.writeString(stage.resolve("_partial"), "killed mid-write")
    // rerun commits from scratch; stale staging dir is simply not referenced
    SnapshotTable.commit(ev, rootB, "entity_id", "event_ms", buckets = 4)

    val a = SnapshotTable.currentSnapshot(rootA).get
    val b = SnapshotTable.currentSnapshot(rootB).get
    assert(a.buckets.map(x => (x.bucket, x.rows, x.watermark, x.digest)) ==
      b.buckets.map(x => (x.bucket, x.rows, x.watermark, x.digest)))
    // and readback digests agree
    val da = digestOf(SnapshotTable.read(spark, rootA).drop(SnapshotTable.BucketCol))
    val db = digestOf(SnapshotTable.read(spark, rootB).drop(SnapshotTable.BucketCol))
    assert(da == db)
  }
}
