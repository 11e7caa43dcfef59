package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session cache registry for operator-internal persists.
  *
  * Several operators materialize an intermediate consumed by MULTIPLE
  * downstream exchanges (the dedup inverted index, skew-safe phase-1):
  * without a persist, Spark recomputes the full upstream lineage once per
  * consumer (measured 5x recompute of the n-gram index in ngramJaccard).
  * At warehouse scale these intermediates would be materialized tables;
  * in-session they are registered here so callers that loop over many
  * queries (Verify, Bench) can release them deterministically between
  * invocations — `unpersist(blocking = true)`, because lazily-released
  * blocks compete with the next persist for storage memory.
  */
object Caches {

  private val registered = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val broadcasts =
    scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.broadcast.Broadcast[_]]

  /** Persist and register `df`; returns the persisted frame. */
  def cache(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized {
      val c = df.persist(level)
      registered += c
      c
    }

  /** Register an ALREADY-persisted frame for deterministic release (used by
    * iterative operators that manage persist/unpersist per round and hand
    * only the final round to the registry).
    */
  def register(df: DataFrame): DataFrame = synchronized {
    registered += df
    df
  }

  /** The compute plan BELOW each registered persist (the cached-relation
    * child plan), for plan-shape assertions — e.g. "the funnel staging
    * pass is a zero-Exchange projection" (PlanShapeSpec).
    */
  def snapshotPlans(): Seq[String] = synchronized {
    registered.toSeq.map { df =>
      df.queryExecution.executedPlan.collectFirst {
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          s.relation.cachedPlan.toString
      }.getOrElse(df.queryExecution.executedPlan.toString)
    }
  }

  /** Broadcast `v` and register the handle for release: the kernel fast
    * paths (TF-IDF / NLL vocabularies, NB weights, over-threshold line
    * sets) ship value broadcasts into UDF closures, and a bare
    * `sparkContext.broadcast` leaks its executor blocks until the driver
    * GCs the handle — across a many-query session those blocks accumulate
    * against execution memory (guide §5). `releaseAll` unpersists them
    * (NOT destroy: an unpersisted broadcast transparently re-ships if the
    * plan is re-executed, so callers keep lazy-re-execution semantics).
    */
  def broadcast[T: scala.reflect.ClassTag](
      sc: org.apache.spark.SparkContext, v: T)
      : org.apache.spark.broadcast.Broadcast[T] = synchronized {
    val b = sc.broadcast(v)
    broadcasts += b
    b
  }

  def releaseAll(): Unit = synchronized {
    registered.foreach(df =>
      try df.unpersist(blocking = true) catch { case _: Throwable => () })
    registered.clear()
    broadcasts.foreach(b =>
      try b.unpersist(blocking = true) catch { case _: Throwable => () })
    broadcasts.clear()
  }
}
