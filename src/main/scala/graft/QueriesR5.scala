package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.Quality

/** Round-5 addition: model-based quality filtering — the classifier gate of
  * the modern curation stack (GPT-3 app. A LR filter, CCNet fastText gate,
  * DCLM/FineWeb-Edu quality classifiers). The query trains the NB
  * log-count-ratio model ON the documents corpus from a deterministic weak
  * label (verbosity: token count > 40 — splits every test scale ~2:1) and
  * scores every document. DuckDB replays TRAINING AND INFERENCE end to end
  * from integer counts: tokens and the weak label are recomputed in SQL,
  * bucketing comes from the dumped vocab-sized (term, bucket) map (DuckDB
  * cannot xxhash64 — the [[Dumps]] discipline), and the 1e-6 fixed-point
  * weight quantization makes every per-document sum an exact BIGINT fold
  * on both engines.
  */
object QueriesR5 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val Dim = 4096
  private val LabelMinTokens = 40

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_quality_classifier" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dumps.write(Quality.bucketMap(docs, "text", Dim), "nb_buckets")
      Quality.nbClassifierScore(docs, "doc_id", "text",
        size(Text.tokens(col("text"))) > LabelMinTokens, dim = Dim)
    }))

  val oracle: Map[String, String] = Map(
    "txt_quality_classifier" ->
      s"""WITH toks AS (SELECT doc_id,
         |    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS tk
         |  FROM documents),
         |lab AS (SELECT doc_id, coalesce(len(tk) > $LabelMinTokens, false) AS y, tk
         |  FROM toks),
         |dt AS (SELECT DISTINCT doc_id, term
         |  FROM (SELECT doc_id, unnest(tk) AS term FROM lab)),
         |bm AS (SELECT term, bucket
         |  FROM read_parquet('${Dumps.Dir}/nb_buckets.parquet/*.parquet')),
         |cnt AS (SELECT bucket,
         |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS pos,
         |    sum(CASE WHEN y THEN 0 ELSE 1 END) AS neg
         |  FROM dt JOIN bm USING (term) JOIN lab USING (doc_id)
         |  GROUP BY 1),
         |tots AS (SELECT sum(pos) AS tp, sum(neg) AS tn FROM cnt),
         |nd AS (SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS np,
         |    sum(CASE WHEN y THEN 0 ELSE 1 END) AS nn FROM lab),
         |w AS (SELECT bucket,
         |    CAST(round(ln(((pos + 1.0) / (tp + 1.0 * $Dim)) /
         |                  ((neg + 1.0) / (tn + 1.0 * $Dim))) * 1e6, 0) AS BIGINT) AS wq
         |  FROM cnt CROSS JOIN tots),
         |b AS (SELECT CAST(round(ln(np * 1.0 / nn) * 1e6, 0) AS BIGINT) AS bq FROM nd),
         |s AS (SELECT doc_id, sum(wq) AS sw, count(*) AS ng
         |  FROM dt JOIN bm USING (term) JOIN w USING (bucket)
         |  GROUP BY 1)
         |SELECT l.doc_id,
         |  coalesce(s.ng, 0) AS n_terms,
         |  round((coalesce(s.sw, 0) + b.bq) / 1e6 + 1.7e-8, 6) AS score,
         |  round((coalesce(s.sw, 0) + b.bq) / 1e6 + 1.7e-8, 6) > 0 AS pred
         |FROM lab l LEFT JOIN s USING (doc_id) CROSS JOIN b""".stripMargin)
}
