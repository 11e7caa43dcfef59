package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus vocabulary / term-weighting operators — the token-side analog of
  * the reference's univariate feature ranking (score every (entity,
  * feature) cell, keep the strongest per entity; cf. the per-gene effect
  * ranking in `Fig-2C_D_plot_univariate.R`), applied to documents × terms.
  */
object Terms {

  /** Top-k TF-IDF terms per document: tf = in-document term count,
    * idf = ln((N+1)/(df+1)) + 1 (the smoothed sklearn formulation — never
    * divides by zero, never goes negative), score rounded to 6 dp BEFORE
    * ranking so the top-k cut is reproducible across engines; ties break
    * by term ascending. Output: (id, term, tf, df, tfidf, rk).
    *
    * Scale shape: tf is ONE map-side-combined (doc, term) count over the
    * exploded tokens — the only corpus-sized shuffle. df reuses the tf
    * rows (one row per (doc, term), so a count per term IS the document
    * frequency): the second aggregation shuffles vocabulary-sized data,
    * not corpus-sized. N arrives as a broadcast single-row cross join —
    * no driver-side action, the whole operator stays one lazy plan. The
    * final top-k is a per-document row_number window over k + |doc vocab|
    * rows per group.
    */
  def tfidfTopK(df: DataFrame, id: String, text: String, k: Int): DataFrame = {
    val tf = df.select(col(id), explode(Text.tokens(col(text))).as("term"))
      .groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(id))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * (log((col("__n") + 1) / (col("df") + 1)) + 1), 6))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col(id), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rk"))
  }
}
