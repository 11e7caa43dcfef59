package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Training-data deduplication operators over a document/caption corpus.
  *
  * Scale notes (the whole point of these): nothing here is O(n^2) over the
  * corpus. Every near-dup variant reduces to (a) a per-row signature
  * projection (codegen, no shuffle), (b) a bucket-key explode bounded by a
  * small constant (bands / shingle df-threshold), (c) an equi-join on bucket
  * keys so Spark's hash-partitioned join does candidate generation, and
  * (d) exact verification only on candidate pairs.
  */
object Dedup {

  /** Exact dedup: canonical representative (min id) per identical text.
    * One hash-aggregate; at 100 TB group by xxhash64(text) first so the
    * shuffle carries 8-byte keys instead of full documents.
    */
  def exact(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), col(text), xxhash64(col(text)).as("__k"))
      .groupBy("__k")
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"),
        min(col(text)).as(text))
      .drop("__k")

  /** Fingerprint dedup: exact dedup after whitespace normalization via the
    * rolling-hash document fingerprint (order-sensitive).
    */
  def byFingerprint(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), Text.fingerprint(col(text)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Character shingles of length n over the whitespace-normalized text.
    * NOTE: char shingles are only discriminative over large vocabularies;
    * on small/overlapping vocabularies use [[tokenGrams]] (word n-grams) or
    * every pair looks like a near-dup and candidate sets go quadratic.
    */
  def shingles(text: Column, n: Int): Column = {
    val norm = regexp_replace(trim(text), "\\s+", " ")
    array_distinct(filter(
      transform(sequence(lit(1), greatest(length(norm) - (n - 1), lit(1))),
        i => norm.substr(i, lit(n))),
      s => length(s) === n))
  }

  /** Distinct word n-grams of the whitespace-tokenized text. */
  def tokenGrams(text: Column, n: Int): Column = {
    val tk = Text.tokens(text)
    array_distinct(
      when(size(tk) >= n,
        transform(sequence(lit(1), size(tk) - (n - 1)),
          i => array_join(slice(tk, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>")))
  }

  /** MinHash signature: for each of k hash families, min over grams of
    * xxhash64(seed_i, gram). Pure projection (no shuffle). Single pass over
    * the gram array (k hashes per gram, min-combined via zip_with) — NOT k
    * separate array traversals, which would re-derive the gram array k times
    * once CollapseProject inlines it.
    */
  def minhashSignature(grams: Column, k: Int): Column =
    aggregate(grams,
      array_repeat(lit(Long.MaxValue), lit(k)),
      (acc, g) => zip_with(acc,
        array((0 until k).map(i => xxhash64(lit(i), g)): _*),
        (a, b) => least(a, b)))

  /** MinHash+LSH near-dup pairs: signature → bands → bucket join → exact
    * shingle-Jaccard verification, filtered by `minJaccard`.
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Scale shape (what keeps this sane at 10^12 docs):
    *  - the banding join carries ONLY (band, bucket, id) — 24 bytes/row —
    *    never texts or shingle arrays;
    *  - mega-buckets (non-discriminative signatures, e.g. near-empty docs or
    *    tiny vocabularies) are dropped via `maxBucket` BEFORE the self-join,
    *    bounding the candidate count at buckets·maxBucket² instead of n²;
    *  - exact verification joins the candidate PAIRS back to the texts and
    *    recomputes shingles in a projection (two hash joins on ids).
    */
  def minhashLsh(df: DataFrame, id: String, text: String,
      shingleN: Int = 3, k: Int = 16, rowsPerBand: Int = 4,
      minJaccard: Double = 0.7, maxBucket: Int = 64,
      gramFn: (Column, Int) => Column = tokenGrams): DataFrame = {
    val bands = k / rowsPerBand
    val sigd = df.select(col(id).as("__id"),
      minhashSignature(gramFn(col(text), shingleN), k).as("__sig"))
    val banded = sigd.select(col("__id"),
      posexplode(array((0 until bands).map { b =>
        xxhash64((col("__sig")(b * rowsPerBand) +:
          (1 until rowsPerBand).map(r => col("__sig")(b * rowsPerBand + r))): _*)
      }: _*)).as(Seq("__band", "__bucket")))
    // mega-bucket guard: the hot-bucket list is tiny by definition -> compute
    // it with a map-side-combined groupBy and strip via broadcast anti-join
    // (no full window sort over the banded rows)
    val hot = banded.groupBy(col("__band"), col("__bucket"))
      .agg(count(lit(1)).as("__n")).where(col("__n") > maxBucket)
      .select("__band", "__bucket")
    val capped = banded.join(broadcast(hot), Seq("__band", "__bucket"), "left_anti")
    // candidate pairs WITHOUT a self-join (signatures evaluated once):
    // bucket members are collected (bounded by maxBucket) and exploded
    val pairs = capped.groupBy(col("__band"), col("__bucket"))
      .agg(collect_list(col("__id")).as("__ids"))
      .where(size(col("__ids")) > 1)
      .select(explode(col("__ids")).as("id_a"), col("__ids"))
      .select(col("id_a"), explode(col("__ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .distinct()
    // exact verification only touches candidate docs: semi-join the corpus
    // down to candidates before computing gram arrays
    val candIds = pairs.select(col("id_a").as("__cid"))
      .union(pairs.select(col("id_b").as("__cid"))).distinct()
    val texts = df.join(candIds, col(id) === col("__cid"), "left_semi")
      .select(col(id), gramFn(col(text), shingleN).as("__sh"))
    pairs
      .join(texts.toDF("id_a", "__sha"), Seq("id_a"))
      .join(texts.toDF("id_b", "__shb"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("__sha"), col("__shb"))).cast("double") /
          size(array_union(col("__sha"), col("__shb"))), 6).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** SimHash (64-bit): sign-sum of per-token hash bits weighted by presence.
    * Near-dups = pairs within `maxHamming`; candidate generation by exact
    * match on 4 16-bit chunks (any chunk equal → candidate), which is
    * complete for maxHamming <= 3 by pigeonhole.
    */
  def simhash(text: Column): Column = {
    val toks = Text.tokens(text)
    val hs = transform(toks, t => xxhash64(t))
    // for each bit, +1 if set else -1, summed over tokens; bit set iff sum>0
    (0 until 64).map { b =>
      val votes = aggregate(hs, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** @param maxBucket chunk buckets above this size are dropped before the
    *   self-join (scale guard against non-discriminative sign patterns);
    *   recall is complete for hamming<=3 only among docs in kept buckets —
    *   at web scale a hot 16-bit chunk means those docs are near-identical
    *   anyway and should go through exact dedup first.
    */
  def simhashPairs(df: DataFrame, id: String, text: String,
      maxHamming: Int = 3, maxBucket: Int = 256): DataFrame = {
    val sigd = df.select(col(id).as("__id"), simhash(col(text)).as("__sig"))
    val chunked = sigd.select(col("__id"), col("__sig"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("__sig"), c * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("__chunk", "__key")))
      .withColumn("__bsz",
        count(lit(1)).over(Window.partitionBy(col("__chunk"), col("__key"))))
      .where(col("__bsz") <= maxBucket)
      .drop("__bsz")
    val a = chunked.select(col("__chunk"), col("__key"), col("__id").as("id_a"),
      col("__sig").as("__siga"))
    val b = chunked.select(col("__chunk"), col("__key"), col("__id").as("id_b"),
      col("__sig").as("__sigb"))
    a.join(b, Seq("__chunk", "__key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__siga").bitwiseXOR(col("__sigb"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
  }

  /** Exact n-gram (token) Jaccard near-dup via an inverted-index join:
    * candidate pairs must share at least one n-gram whose document frequency
    * is below `maxDf` (bounds join fan-out; rare-gram blocking), then exact
    * Jaccard = |A∩B| / (|A|+|B|-|A∩B|) from shared-gram counts.
    * Fully relational — the same plan runs in any SQL engine (oracle'd).
    */
  def ngramJaccard(df: DataFrame, id: String, text: String,
      n: Int = 3, minJaccard: Double = 0.6, maxDf: Long = 20): DataFrame = {
    val grams = df.select(col(id).as("__id"), Text.tokens(col(text)).as("__toks"))
      .select(col("__id"), explode(expr(
        s"transform(sequence(1, greatest(size(__toks) - ${n - 1}, 0))," +
          s" i -> array_join(slice(__toks, i, $n), ' '))")).as("gram"))
      .where(length(col("gram")) > 0)
      .distinct()
    val sizes = grams.groupBy("__id").agg(count(lit(1)).as("__sz"))
    val dfreq = grams.groupBy("gram").agg(count(lit(1)).as("__df"))
    val rare = grams.join(dfreq.where(col("__df") <= maxDf), Seq("gram"))
    val pairs = rare.select(col("gram"), col("__id").as("id_a"))
      .join(rare.select(col("gram"), col("__id").as("id_b")), Seq("gram"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // exact shared-gram count over ALL grams, but only for candidate pairs
    val inter = pairs
      .join(grams.toDF("id_a", "gram"), Seq("id_a"))
      .join(grams.toDF("id_b", "gram"), Seq("id_b", "gram"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("__inter"))
    inter
      .join(sizes.toDF("id_a", "__sza"), Seq("id_a"))
      .join(sizes.toDF("id_b", "__szb"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(col("__inter").cast("double") /
          (col("__sza") + col("__szb") - col("__inter")), 6).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }
}
