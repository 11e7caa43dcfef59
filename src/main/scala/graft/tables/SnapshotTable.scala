package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-shaped table layout: partitioned Parquet + JSON snapshot metadata
  * with per-partition lineage manifests and an atomically-swapped pointer.
  *
  * No Iceberg runtime jar exists in this environment (SURVEY.md §7.0), so the
  * engine owns the same *semantics* with zero new dependencies:
  *
  *  - snapshots: every commit creates `snapshots/v<id>.json` listing, per
  *    entity-hash bucket, the data directory, row count, watermark
  *    (max event time), and an order-insensitive content digest
  *    (bit_xor of row hashes — commutative, so equal at any parallelism);
  *  - time travel: `read(root, Some(id))` reconstructs exactly snapshot id;
  *  - resumable, idempotent commits: a commit diffs its per-bucket digests
  *    against the parent snapshot and rewrites ONLY buckets whose digest
  *    changed (the reference's resume-if-exists checkpoint contract,
  *    `az_ml_models.R:270-282,330-345`, generalized to partitions);
  *  - atomic visibility: the `CURRENT` pointer file is swapped with an
  *    atomic rename; a killed writer leaves only unreferenced staging files.
  *
  * Layout:
  * {{{
  *   root/CURRENT                    # "v<id>\n"
  *   root/snapshots/v<id>.json      # manifest (see Manifest)
  *   root/data/s<id>_<attempt>/pbucket=<k>/ (parquet files)
  * }}}
  */
object SnapshotTable {

  val BucketCol = "pbucket"

  final case class BucketManifest(bucket: Int, dir: String, rows: Long,
      watermark: Long, digest: Long)
  final case class Snapshot(id: Long, parent: Long,
      entityCol: String, timeCol: String, buckets: Seq[BucketManifest])

  // --- tiny hand-rolled JSON (no extra deps; schema is fixed) --------------
  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }

  private def toJson(s: Snapshot): String = {
    val bs = s.buckets.sortBy(_.bucket).map { b =>
      s"""{"bucket":${b.bucket},"dir":"${esc(b.dir)}","rows":${b.rows},""" +
        s""""watermark":${b.watermark},"digest":${b.digest}}"""
    }.mkString("[", ",", "]")
    s"""{"id":${s.id},"parent":${s.parent},"entity_col":"${esc(s.entityCol)}",""" +
      s""""time_col":"${esc(s.timeCol)}","buckets":$bs}"""
  }

  private def field(json: String, name: String): String = {
    val m = (s""""$name":("[^"]*"|-?\\d+)""").r.findFirstMatchIn(json)
      .getOrElse(throw new IllegalStateException(s"missing field $name in manifest"))
    m.group(1).stripPrefix("\"").stripSuffix("\"")
  }

  private def fromJson(json: String): Snapshot = {
    val bucketsPart = json.substring(json.indexOf("\"buckets\":") + 10)
    val items = "\\{[^{}]*\\}".r.findAllIn(bucketsPart).toSeq
    Snapshot(
      field(json, "id").toLong, field(json, "parent").toLong,
      field(json, "entity_col"), field(json, "time_col"),
      items.map(it => BucketManifest(field(it, "bucket").toInt, field(it, "dir"),
        field(it, "rows").toLong, field(it, "watermark").toLong,
        field(it, "digest").toLong)))
  }

  // --- pointer --------------------------------------------------------------
  def currentId(root: String): Option[Long] = {
    val p = Paths.get(root, "CURRENT")
    if (Files.exists(p)) Some(Files.readString(p).trim.stripPrefix("v").toLong) else None
  }

  def snapshot(root: String, id: Long): Snapshot =
    fromJson(Files.readString(Paths.get(root, "snapshots", s"v$id.json")))

  def currentSnapshot(root: String): Option[Snapshot] =
    currentId(root).map(snapshot(root, _))

  private def swapPointer(root: String, id: Long): Unit = {
    val dir = Paths.get(root)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s"CURRENT.tmp$id")
    Files.writeString(tmp, s"v$id\n")
    Files.move(tmp, dir.resolve("CURRENT"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Commit `df` as a new snapshot of the table at `root`.
    * Returns the new snapshot id. Buckets whose digest equals the parent
    * snapshot's are NOT rewritten — their files are reused (resume path).
    */
  def commit(df0: DataFrame, root: String, entityCol: String, timeCol: String,
      buckets: Int = 16): Long = {
    val spark = df0.sparkSession
    val df = df0.withColumn(BucketCol, pmod(xxhash64(col(entityCol)), lit(buckets)).cast("int"))
    val rowHash = xxhash64(to_json(struct(df0.columns.sorted.map(col): _*)))
    val man = df.withColumn("__h", rowHash)
      .groupBy(col(BucketCol))
      .agg(count(lit(1)).as("rows"), max(col(timeCol)).cast("long").as("wm"),
        expr("bit_xor(__h)").as("digest"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    val parent = currentSnapshot(root)
    val parentBuckets: Map[Int, BucketManifest] =
      parent.map(_.buckets.map(b => b.bucket -> b).toMap).getOrElse(Map.empty)
    val newId = parent.map(_.id + 1).getOrElse(0L)

    // a bucket is unchanged only if digest AND row count AND watermark all
    // match the parent manifest: bit_xor alone cancels pairs, so adding two
    // identical rows (exact duplicates are central to this corpus) would
    // otherwise leave the digest unchanged and silently drop the new rows
    val changed = man.filter { case (k, (rows, wm, dg)) =>
      !parentBuckets.get(k).exists(b =>
        b.digest == dg && b.rows == rows && b.watermark == wm)
    }.keys.toSeq.sorted

    // unique staging dir per attempt: a killed previous attempt never
    // collides and its garbage is unreferenced
    var attempt = 0
    var stage: Path = null
    do {
      stage = Paths.get(root, "data", s"s${newId}_$attempt")
      attempt += 1
    } while (Files.exists(stage))

    if (changed.nonEmpty) {
      df.filter(col(BucketCol).isin(changed.map(Integer.valueOf): _*))
        .sortWithinPartitions(col(entityCol), col(timeCol))
        .write.partitionBy(BucketCol).mode("overwrite").parquet(stage.toString)
    }

    val newBuckets = man.toSeq.sortBy(_._1).map { case (k, (rows, wm, dg)) =>
      if (changed.contains(k))
        BucketManifest(k, s"${stage.toString}/$BucketCol=$k", rows, wm, dg)
      else parentBuckets(k)
    }
    val snap = Snapshot(newId, parent.map(_.id).getOrElse(-1L), entityCol, timeCol, newBuckets)
    val snapsDir = Paths.get(root, "snapshots")
    Files.createDirectories(snapsDir)
    Files.writeString(snapsDir.resolve(s"v$newId.json"), toJson(snap))
    swapPointer(root, newId)
    newId
  }

  /** Read the table at a snapshot (default: current). Reconstructs exactly
    * the committed content, including the bucket column.
    */
  def read(spark: SparkSession, root: String, id: Option[Long] = None): DataFrame = {
    val snap = id.map(snapshot(root, _)).orElse(currentSnapshot(root))
      .getOrElse(throw new IllegalStateException(s"no snapshot at $root"))
    snap.buckets
      .filter(b => b.rows > 0)
      .map(b => spark.read.parquet(b.dir).withColumn(BucketCol, lit(b.bucket)))
      .reduceOption(_.unionByName(_))
      .getOrElse(spark.emptyDataFrame)
  }

  /** Per-partition lineage across ALL snapshots as a queryable DataFrame
    * (snapshot_id, parent_id, bucket, dir, rows, watermark, digest,
    * is_current) — the "work table over table metadata" surface (SURVEY.md
    * §2.1 S9): incremental jobs diff `rows`/`digest` between snapshot ids to
    * find what changed without touching data files.
    */
  def lineage(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val cur = currentId(root)
    val snapsDir = Paths.get(root, "snapshots")
    val snaps =
      if (!Files.exists(snapsDir)) Seq.empty[Snapshot]
      else Files.list(snapsDir).iterator().asScala
        .filter(_.getFileName.toString.matches("v\\d+\\.json"))
        .map(p => fromJson(Files.readString(p))).toSeq
    snaps.sortBy(_.id)
      .flatMap(s => s.buckets.map(b => (s.id, s.parent, b.bucket, b.dir,
        b.rows, b.watermark, b.digest, cur.contains(s.id))))
      .toDF("snapshot_id", "parent_id", "bucket", "dir", "rows", "watermark",
        "digest", "is_current")
  }

  /** Global watermark of a snapshot = min over buckets (all buckets complete
    * up to at least this event time).
    */
  def watermark(root: String, id: Option[Long] = None): Option[Long] = {
    val snap = id.map(snapshot(root, _)).orElse(currentSnapshot(root))
    snap.map(_.buckets.map(_.watermark).min)
  }
}
