package graft

import org.apache.spark.sql.SparkSession

/** spark-submit entry for the MULTI-JVM scaling evidence: the same corpus
  * feature job as [[Bench]] part 2, but the master comes from spark-submit
  * (`local-cluster[workers,coresPerWorker,memMB]`), so each "executor" is a
  * real separate JVM with its own heap, serialization boundary and shuffle
  * client — the closest this no-cluster sandbox gets to N vs 4N executors.
  * [[Bench]] invokes this twice (1 worker vs 4 workers) via ProcessBuilder
  * and parses the one marker line this main prints:
  *
  * {{{ GRAFT_CLUSTER_RESULT {"sec":..,"rows":..,"digest":..,"reps":[..]} }}}
  *
  * args: corpusPath corpusRows reps [warmPath warmRows]
  * (warmPath: the small same-schema corpus used for the untimed warm run —
  * same plan, 1/8 the rows, so the warm run stops costing a full timed-run
  * wall; defaults to the corpus itself for standalone use)
  */
object BenchCluster {
  def main(args: Array[String]): Unit = {
    val Array(path, rowsS, repsS) = args.take(3)
    val rows = rowsS.toLong
    val reps = repsS.toInt
    val (warmPath, warmRows) =
      if (args.length >= 5) (args(3), args(4).toLong) else (path, rows)
    val spark = SparkSession.builder().getOrCreate() // master/conf from submit
    spark.sparkContext.setLogLevel("WARN")
    try {
      Bench.corpusRun(spark, warmPath, warmRows) // warm-up (codegen + executor JIT)
      val runs = (1 to reps).map(_ => Bench.corpusRun(spark, path, rows))
      val best = runs.minBy(_._1)
      val repsJson = runs.map(r => f"${r._1}%.2f").mkString("[", ",", "]")
      println(f"""GRAFT_CLUSTER_RESULT {"sec":${best._1}%.2f,"rows":${best._2},"digest":${best._3},"reps":$repsJson}""")
    } finally spark.stop()
  }
}
