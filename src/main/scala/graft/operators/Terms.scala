package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus vocabulary / term-weighting operators — the token-side analog of
  * the reference's univariate feature ranking (score every (entity,
  * feature) cell, keep the strongest per entity; cf. the per-gene effect
  * ranking in `Fig-2C_D_plot_univariate.R`), applied to documents × terms.
  *
  * Join-key discipline: every post-tf join/aggregation is keyed by
  * `xxhash64(term)` — the same 8-byte-key rule as
  * [[Dedup.dedupLines]]/[[Dedup.decontaminate]] — so the vocabulary-sized
  * exchanges carry 8-byte keys instead of term text; the term string rides
  * only on the tf rows that need it in the output. A 64-bit collision
  * merges two terms' statistics (probability ~n²/2⁶⁵ — ~3e-8 at a 10^9-term
  * vocabulary), the accepted trade of the house discipline.
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
    * rows (one row per (doc, term), so a count per term-hash IS the
    * document frequency): the second aggregation shuffles vocabulary-sized
    * 8-byte keys, not corpus-sized text. N arrives as a broadcast
    * single-row cross join — no driver-side action. The final top-k is a
    * per-document row_number window (Spark plans it as WindowGroupLimit,
    * pre-pruning to k per group before the exchange).
    */
  def tfidfTopK(df: DataFrame, id: String, text: String, k: Int): DataFrame = {
    val tf = termCounts(df, id, text)
    val dfreq = tf.groupBy("__th").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(id))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, Seq("__th"))
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
    * The per-doc fold sums in FIXED POINT: each term's ln(cnt/tot) is
    * quantized once — deterministically, per term — to a 1e-9-grid long,
    * and the document sum is Σ tf·q over decimal(38,0), which is exact and
    * associative. A plain double sum of irrational logs is
    * partial-aggregation-ORDER-sensitive; round 4 measured exactly that
    * (a different partition count flipped a 6-dp rounding boundary on one
    * of 500 rows). The final division back to double is a pure function of
    * (exact sum, n_tokens), so the output is bit-identical at any
    * parallelism; the house +1.7e-8 non-grid epsilon then guards the
    * engine-boundary ulp on the quantization itself.
    *
    * Scale shape: ONE corpus-sized map-side-combined (doc, term) count —
    * persisted via [[Caches]], see [[tfidfTopK]] — feeds both sides: the
    * vocabulary aggregate over it is vocab-sized (8-byte term-hash keys),
    * the grand total rides in as a broadcast single-row cross join, and
    * the per-doc fold is a second aggregation of the same (doc, term)
    * rows. No token-level row ever shuffles twice.
    */
  def unigramLogProb(df: DataFrame, id: String, text: String): DataFrame = {
    val tf = termCounts(df, id, text)
    val vocab = tf.groupBy("__th").agg(sum("tf").as("cnt"))
    val tot = vocab.agg(sum("cnt").as("__tot"))
    // per-term quantized log-prob: round() is HALF_UP like DuckDB's, so the
    // oracle reproduces q exactly from the same (cnt, tot) integers
    val q = round(log(col("cnt") / col("__tot")) * 1e9, 0).cast("long")
    tf.join(vocab, Seq("__th"))
      .crossJoin(broadcast(tot))
      .withColumn("__q", q)
      .groupBy(col(id))
      .agg(
        round(-sum((col("tf").cast("decimal(19,0)") * col("__q").cast("decimal(19,0)"))
            .cast("decimal(38,0)")).cast("double") / 1e9 /
          sum(col("tf")).cast("double") + 1.7e-8, 6).as("nll"),
        sum(col("tf")).as("n_tokens"))
  }

  /** The shared corpus-sized intermediate: one (doc, term, term-hash) count
    * row per distinct in-document term, map-side combined, persisted
    * because every consumer prunes it differently (defeating exchange
    * reuse). `__th` = xxhash64(term) is computed here once so downstream
    * joins/aggregations never key by the string.
    */
  private def termCounts(df: DataFrame, id: String, text: String): DataFrame =
    Caches.cache(
      df.select(col(id), explode(Text.tokens(col(text))).as("term"))
        .groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
        .withColumn("__th", xxhash64(col("term"))))
}
