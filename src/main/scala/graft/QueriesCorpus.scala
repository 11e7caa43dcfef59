package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.Corpus
import graft.features.FeaturePipeline
import graft.multimodal.Multimodal
import graft.operators.AsOf

/** Queries over the synthesized image+caption corpus (the `input_hint`
  * table). These exercise the engine's flagship path and the multimodal
  * binary plumbing; they are independent of the sfDir testdata and have no
  * SQL oracle (driver records rows-only) — their correctness gates are the
  * ScalaTest suites (leakage, codec/PSNR, phash recomputation, determinism).
  */
object QueriesCorpus {

  private val P = Corpus.Params(rows = 2000L, entities = 20)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // flagship: per-entity×timestamp feature vectors attached to as-of probes
    "corpus_flagship_asof" -> ((s, _) => FeaturePipeline.flagship(s, P)),

    // the raw feature-vector table itself
    "corpus_feature_vectors" -> ((s, _) => {
      val ev = Corpus.events(s, P)
      FeaturePipeline.features(ev, Corpus.dimFeatures(s, P.seed),
        FeaturePipeline.entityDim(s, P.entities))
        .drop("event_time")
    }),

    // multimodal: decode + pixel stats + phash recompute check per fmt
    "mm_decode_stats" -> ((s, _) =>
      Multimodal.decodeStats(Corpus.images(s, P)).toDF()
        .groupBy(col("fmt"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("px_mean")), 4).as("avg_px_mean"),
          sum(when(col("phash_matches"), 1L).otherwise(0L)).as("n_phash_ok"))),

    // multimodal: thumbnail extraction (binary out), summarized
    "mm_thumbnails" -> ((s, _) =>
      Multimodal.thumbnails(Corpus.images(s, P)).toDF()
        .select(col("image_id"), col("tw"), col("th"),
          length(col("thumb")).as("thumb_bytes"))),

    // multimodal: frame sampling (flatMap one-to-many plumbing)
    "mm_frame_sample" -> ((s, _) =>
      Multimodal.frameSample(Corpus.images(s, P), everyK = 4).toDF()
        .groupBy(col("image_id")).agg(count(lit(1)).as("n_frames"),
          round(avg(col("px_mean")), 4).as("mean_frame_px"))),

    // corpus as-of against the probe matrix (edge cases incl. before-first)
    "corpus_probe_asof" -> ((s, _) => {
      val ev = Corpus.events(s, P).select("entity_id", "event_ms", "seq", "phash", "caption")
      AsOf.join(Corpus.probes(s, P), ev, "entity_id", "probe_ms", "event_ms",
        tie = Some("seq"))
    })
  )
}
