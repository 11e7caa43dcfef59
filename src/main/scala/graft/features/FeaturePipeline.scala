package graft.features

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.corpus.Corpus
import graft.functions.Text
import graft.operators.AsOf

/** Flagship pipeline: per-entity×timestamp feature vectors over the
  * image+caption corpus (BASELINE.json north_star).
  *
  * Generalizes the reference's fold-local feature derivation
  * (`train_functions.R:138-176`: stats from the training partition only,
  * applied forward) to event time: every feature at time t is a function of
  * events with event_time <= t only — enforced structurally by
  * unbounded-PRECEDING window frames and the as-of join, and proven by the
  * leakage property suite.
  *
  * Plan shape (scale notes):
  *  - scalar caption/phash features: pure projections, zero shuffle,
  *    whole-stage codegen;
  *  - dimension feature table (the text-mining rank-table analog,
  *    `text_mining_feature/Erlotinib.csv:1`): collected once on the driver
  *    (it is small by definition) and shipped as literal maps inside the
  *    plan — broadcast semantics with zero join shuffle;
  *  - entity metadata: broadcast hash join (no shuffle of the fact side);
  *  - all temporal features share ONE window layout (hash by entity, sort by
  *    (entity, time, seq)) → exactly one shuffle + one sort end-to-end.
  */
object FeaturePipeline {

  /** Tiny per-entity metadata table: entity → topic assignment (broadcast). */
  def entityDim(spark: SparkSession, entities: Int, topics: Int = 5): DataFrame = {
    import spark.implicits._
    (0 until entities)
      .map(e => ("e%05d".format(e), "topic%d".format(e % topics)))
      .toDF("entity_id", "topic")
  }

  /** Compute the feature vector table from an event-shaped corpus.
    *
    * @param events  columns: image_id, caption, phash, entity_id, event_ms, seq
    * @param dim     dimension feature table (topic, token, rank, n, n_pos, score)
    * @param entDim  entity metadata (entity_id, topic)
    * @param gapMs   sessionization gap threshold
    */
  def features(events: DataFrame, dim: DataFrame, entDim: DataFrame,
      gapMs: Long = Corpus.SessionGapMs): DataFrame = {

    // --- broadcast the small dimension feature table as literal maps -------
    // (driver-side collect of a SMALL dim only; never of fact data)
    val dimRows = dim.select("topic", "token", "rank", "score").collect()
    val rankMap: Map[String, Int] =
      dimRows.map(r => s"${r.getString(0)}#${r.getString(1)}" -> r.getInt(2)).toMap
    val scoreMap: Map[String, Double] =
      dimRows.map(r => s"${r.getString(0)}#${r.getString(1)}" -> r.getDouble(3)).toMap
    val rankLit = typedLit(rankMap)
    val scoreLit = typedLit(scoreMap)

    val stop = Corpus.Stopwords

    // --- entity metadata: broadcast hash join (no fact shuffle) ------------
    val withTopic = events.join(broadcast(entDim), Seq("entity_id"), "left")

    // --- scalar caption + dim-token features (projection only) -------------
    // ONE traversal of the token array computes every token-derived feature.
    // Two prior formulations were benchmarked and rejected:
    //  (a) per-feature Column expressions: each feature re-tokenized the
    //      caption and checked stopwords with 30 isin string compares;
    //  (b) a single aggregate() HOF with typedLit(Map) lookups: Catalyst map
    //      LITERALS are ArrayBasedMapData — map_contains_key/element_at do a
    //      LINEAR SCAN (O(|dim|) string compares per probe), ~7 ms/row.
    // A typed UDF with closure-captured Scala HashMaps does O(1) probes per
    // token; this is the documented exception to the expressions-first
    // policy (SURVEY §2.12), justified by measurement. Tokenization matches
    // Text.tokens (trim + split \s+ + drop empties) — golden-spec'd.
    val stopSet = stop.toSet
    val tfUdf = udf((topic: String, caption: String) => {
      val toks =
        if (caption == null) Array.empty[String]
        else caption.trim.split("\\s+").filter(_.nonEmpty)
      var n = 0; var sw = 0; var dm = 0; var dmr = Int.MaxValue; var dss = 0.0
      val tp = if (topic == null) "" else topic
      toks.foreach { t =>
        n += 1
        if (stopSet(t)) sw += 1
        val key = tp + "#" + t
        rankMap.get(key) match {
          case Some(r) =>
            dm += 1
            if (r < dmr) dmr = r
            dss += scoreMap(key)
          case None =>
        }
      }
      (n, sw, dm, dmr, dss)
    })
    // (CollapseProject never duplicates non-cheap exprs like UDF calls, so
    // the single "__tf" alias is evaluated once per row.)
    val tf = tfUdf(col("topic"), col("caption"))
      .cast("struct<n:int,sw:int,dm:int,dmr:int,dss:double>")
    // quality formula mirrors Text.qualityScore exactly (golden-spec'd)
    val nD = col("__tf")("n").cast("double")
    val swr = when(col("__tf")("n") > 0, col("__tf")("sw") / nD).otherwise(lit(0.0))
    val lenScore = least(nD / lit(8.0), lit(1.0))
    val punct = Text.punctRatio(col("caption"))
    val swScore = lit(1.0) - abs(swr - lit(0.35)) / lit(0.65)
    val scalar = withTopic
      .withColumn("__tf", tf)
      .withColumn("token_count", col("__tf")("n").cast("long"))
      .withColumn("caption_len", length(col("caption")).cast("long"))
      .withColumn("stopword_ratio", round(swr, 6))
      .withColumn("quality", round(greatest(lit(0.0), least(lit(1.0),
        lenScore * lit(0.4) + (lit(1.0) - punct) * lit(0.3) + swScore * lit(0.3))), 6))
      .withColumn("dim_matched", col("__tf")("dm").cast("long"))
      .withColumn("dim_min_rank",
        when(col("__tf")("dm") > 0, col("__tf")("dmr")))
      .withColumn("dim_score_sum", round(col("__tf")("dss"), 6))
      // a sparsely-populated signal to demonstrate rolling backfill
      .withColumn("sparse_quality", when(col("token_count") >= 6, col("quality")))
      .drop("__tf")

    // --- one shared window layout for every temporal feature ---------------
    val w = Window.partitionBy(col("entity_id")).orderBy(col("event_ms"), col("seq"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    scalar
      .withColumn("phash_prev", lag(col("phash"), 1).over(w))
      .withColumn("phash_prev_hamming",
        graft.functions.HammingDistance.hamming(col("phash"), col("phash_prev")))
      .withColumn("dt_prev_ms", col("event_ms") - lag(col("event_ms"), 1).over(w))
      .withColumn("__new",
        when(col("dt_prev_ms").isNull || col("dt_prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(wRun) - 1L)
      .withColumn("__rn", row_number().over(w))
      .withColumn("session_pos",
        col("__rn") - last(when(col("__new") === 1L, col("__rn")), ignoreNulls = true).over(wRun))
      .withColumn("quality_filled", last(col("sparse_quality"), ignoreNulls = true).over(wRun))
      .withColumn("running_quality_mean", round(avg(col("quality")).over(wRun), 6))
      .drop("__new", "__rn", "phash_prev", "bytes", "caption", "fmt")
  }

  /** Attach the point-in-time feature vector to arbitrary (entity, t) probes
    * — the engine's flagship query: "the feature vector in effect at t".
    */
  def asOfFeatures(probes: DataFrame, features: DataFrame): DataFrame =
    AsOf.join(probes, features
        .select("entity_id", "event_ms", "seq", "image_id", "token_count", "quality",
          "phash_prev_hamming", "session_idx", "session_pos", "quality_filled",
          "running_quality_mean", "dim_matched", "dim_score_sum"),
      entity = "entity_id", probeTime = "probe_ms", eventTime = "event_ms",
      tie = Some("seq"))

  /** End-to-end flagship at a given scale (synthesize → features → as-of). */
  def flagship(spark: SparkSession, p: Corpus.Params): DataFrame = {
    val ev = Corpus.events(spark, p)
    val dim = Corpus.dimFeatures(spark, p.seed)
    val ed = entityDim(spark, p.entities)
    asOfFeatures(Corpus.probes(spark, p), features(ev, dim, ed))
  }
}
