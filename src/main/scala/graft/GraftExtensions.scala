package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.GraftBridge

import graft.corpus.Corpus
import graft.functions.{HammingDistance, Text}

/** Session-extension entry point (SURVEY.md §2.12): registers the engine's
  * SQL surface for every session of a cluster via
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions
  *
  * so SQL users get the native `hamming(a, b)` expression (whole-stage
  * codegen) and the text-analysis functions without any driver-side
  * registration call. Programmatic sessions can equivalently call
  * [[GraftExtensions.registerAll]] or `.withExtensions(new GraftExtensions)`.
  *
  * The text functions expand to trees of codegen'd built-ins (Text.scala's
  * Column formulations bridged to expressions) — no UDFs enter the plan.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {

  private def col1(f: Column => Column): Seq[Expression] => Expression =
    exprs => GraftBridge.catalystExpression(f(GraftBridge.column(exprs.head)))

  /** name -> expression builder, shared by the extension and registerAll. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "hamming" -> ((exprs: Seq[Expression]) => HammingDistance(exprs(0), exprs(1))),
    "graft_fingerprint" -> col1(Text.fingerprint),
    "graft_lang_id" -> col1(Text.langId),
    "graft_token_count" -> col1(c => Text.tokenCount(c).cast("long")),
    "graft_bpe_count" -> col1(Text.bpeTokenCount),
    "graft_quality" -> col1(c => Text.qualityScore(c, Corpus.Stopwords)),
    "graft_stopword_ratio" -> col1(c => Text.stopwordRatio(c, Corpus.Stopwords)),
    "graft_dup_word_frac" -> col1(Text.dupWordFrac),
    "graft_top_bigram_frac" -> col1(Text.topBigramFrac),
    "graft_signif" -> col1(graft.operators.Stats.significance))

  /** Register the same functions into an already-built session. */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
