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
    * exploded tokens — the only corpus-sized shuffle — persisted via
    * [[Caches]] because it feeds two consumers with DIFFERENT prunings
    * (the scored rows keep tf, the df aggregation would drop it), so
    * Catalyst's exchange reuse cannot deduplicate them and the token
    * explode would otherwise run twice over the corpus. df reuses the tf
    * rows (one row per (doc, term), so a count per term IS the document
    * frequency): the second aggregation shuffles vocabulary-sized data,
    * not corpus-sized. N arrives as a broadcast single-row cross join —
    * no driver-side action. The final top-k is a per-document row_number
    * window (Spark plans it as WindowGroupLimit, pre-pruning to k per
    * group before the exchange).
    */
  def tfidfTopK(df: DataFrame, id: String, text: String, k: Int): DataFrame = {
    val tf = termCounts(df, id, text)
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

  /** Per-document unigram negative log-likelihood — the CCNet-style
    * language-model quality proxy with no external LM: score(doc) = mean
    * over the doc's tokens of -ln(count(token)/total_tokens) under the
    * corpus' OWN unigram distribution (Wenzek et al. 2020 bucket docs by
    * LM perplexity; the unigram NLL is the model-free analog). Atypical
    * documents — wrong language, garbled, rare-token spam — score high;
    * boilerplate scores low. Output: (id, nll, n_tokens).
    *
    * Scale shape: ONE corpus-sized map-side-combined (doc, term) count —
    * persisted via [[Caches]], see [[tfidfTopK]] — feeds both sides: the
    * vocabulary aggregate over it is vocab-sized, the grand total rides in
    * as a broadcast single-row cross join, and the per-doc fold is a
    * second aggregation of the same (doc, term) rows. No token-level row
    * ever shuffles twice.
    */
  def unigramLogProb(df: DataFrame, id: String, text: String): DataFrame = {
    val tf = termCounts(df, id, text)
    val vocab = tf.groupBy("term").agg(sum("tf").as("cnt"))
    val tot = vocab.agg(sum("cnt").as("__tot"))
    tf.join(vocab, Seq("term"))
      .crossJoin(broadcast(tot))
      .groupBy(col(id))
      .agg(
        round(-sum(col("tf") * log(col("cnt") / col("__tot"))) /
          sum(col("tf")), 6).as("nll"),
        sum(col("tf")).as("n_tokens"))
  }

  /** The shared corpus-sized intermediate: one (doc, term) count row per
    * distinct in-document term, map-side combined, persisted because every
    * consumer prunes it differently (defeating exchange reuse).
    */
  private def termCounts(df: DataFrame, id: String, text: String): DataFrame =
    Caches.cache(
      df.select(col(id), explode(Text.tokens(col(text))).as("term"))
        .groupBy(col(id), col("term")).agg(count(lit(1)).as("tf")))
}
