package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: synthesize the image+caption corpus, build per-entity×timestamp
    * feature vectors (lag/backfill/session/dim-broadcast), attach them to
    * as-of probes. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.features.FeaturePipeline.flagship(
      spark, graft.corpus.Corpus.Params(rows = 2000L, entities = 20))
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesRel.all ++ QueriesAgg.all ++ QueriesText.all ++ QueriesCorpus.all ++
      QueriesMisc.all ++ QueriesExt.all ++ QueriesR3.all ++ QueriesR4.all ++
      QueriesR5.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueriesRel.oracle ++ QueriesAgg.oracle ++ QueriesText.oracle ++
      QueriesMisc.oracle ++ QueriesCorpus.oracle ++ QueriesExt.oracle ++
      QueriesR3.oracle ++ QueriesR4.oracle ++ QueriesR5.oracle
}
