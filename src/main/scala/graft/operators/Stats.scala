package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped statistical aggregations from the reference (SURVEY.md §2.4),
  * expressed as Spark partial+final hash aggregations and window functions —
  * no UDAFs, everything codegen'd and map-side-combinable.
  */
object Stats {

  /** Per-group Welch t-statistic between two classes of `value`
    * (`train_functions.R:82-88`): t = (m1-m2)/sqrt(v1/n1 + v2/n2).
    * Returns (group..., t_stat, n_1, n_2).
    */
  def welchT(df: DataFrame, group: Seq[String], classCol: String,
      classA: String, classB: String, value: String): DataFrame = {
    val g = df.filter(col(classCol).isin(classA, classB))
      .groupBy((group.map(col) :+ col(classCol)): _*)
      .agg(avg(col(value)).as("m"), var_samp(col(value)).as("v"), count(lit(1)).as("n"))
    val a = g.filter(col(classCol) === classA)
      .select((group.map(col) :+ col("m").as("m1") :+ col("v").as("v1") :+ col("n").as("n1")): _*)
    val b = g.filter(col(classCol) === classB)
      .select((group.map(col) :+ col("m").as("m2") :+ col("v").as("v2") :+ col("n").as("n2")): _*)
    a.join(b, group, "inner")
      .withColumn("t_stat",
        (col("m1") - col("m2")) / sqrt(col("v1") / col("n1") + col("v2") / col("n2")))
      .select((group.map(col) :+ col("t_stat")
        :+ col("n1") :+ col("n2")): _*)
  }

  /** Spearman rank correlation per group: Pearson corr of within-group ranks.
    * Average-rank tie handling (matches DuckDB/R `method="spearman"` when we
    * use rank + mean-of-ranks correction): here we use dense positional ranks
    * via `rank()` which averages ties by construction of corr over ranks.
    */
  def spearman(df: DataFrame, group: Seq[String], x: String, y: String,
      as: String = "spearman"): DataFrame = {
    // average ("fractional") ranks: rank() gives min-rank for ties; average
    // rank = min rank + (ties-1)/2, computed via count over the tie window.
    def avgRank(c: String): Column = {
      val w = Window.partitionBy(group.map(col): _*).orderBy(col(c))
      val tieW = Window.partitionBy((group.map(col) :+ col(c)): _*)
      rank().over(w) + (count(lit(1)).over(tieW) - 1) / 2.0
    }
    df.withColumn("__rx", avgRank(x))
      .withColumn("__ry", avgRank(y))
      .groupBy(group.map(col): _*)
      .agg(corr(col("__rx"), col("__ry")).as(as))
  }

  /** Closed-form simple linear regression per group
    * (`helper/computeInteractionMatrix.R:66-67`): slope/intercept of y~x.
    */
  def linearFit(df: DataFrame, group: Seq[String], x: String, y: String): DataFrame =
    df.groupBy(group.map(col): _*)
      .agg(
        (covar_samp(col(x), col(y)) / var_samp(col(x))).as("slope"),
        (avg(col(y)) - covar_samp(col(x), col(y)) / var_samp(col(x)) * avg(col(x)))
          .as("intercept"),
        count(lit(1)).as("n"))

  /** Mean ± normal-approx confidence interval per group
    * (`Fig_supp_table.R:41-63`). z defaults to 1.96 (95%).
    */
  def meanCi(df: DataFrame, group: Seq[String], value: String, z: Double = 1.96): DataFrame =
    df.groupBy(group.map(col): _*)
      .agg(avg(col(value)).as("mean"), stddev_samp(col(value)).as("sd"),
        count(lit(1)).as("n"))
      .withColumn("ci_lo", col("mean") - lit(z) * col("sd") / sqrt(col("n")))
      .withColumn("ci_hi", col("mean") + lit(z) * col("sd") / sqrt(col("n")))
      

  /** Leakage-safe z-score scaling (reference F10/M6,
    * `train_functions.R:144-146`): stats computed ONLY on rows where
    * `trainPred` holds (the "past"/train partition), then applied to ALL
    * rows via a broadcastable stats join — never refit on the apply side.
    */
  def zscoreTrainOnly(df: DataFrame, group: Seq[String], value: String,
      trainPred: Column): DataFrame = {
    val stats = df.filter(trainPred)
      .groupBy(group.map(col): _*)
      .agg(avg(col(value)).as("__mu"), stddev_samp(col(value)).as("__sigma"))
    df.join(broadcast(stats), group, "left")
      .withColumn(s"${value}_z",
        when(col("__sigma") > 0, (col(value) - col("__mu")) / col("__sigma")))
      .drop("__mu", "__sigma")
  }

  /** Error metrics between prediction and observation per group
    * (`az_ml_models.R:32-40`): rmse, mae, pearson.
    */
  def errorMetrics(df: DataFrame, group: Seq[String], pred: String, obs: String): DataFrame =
    df.groupBy(group.map(col): _*)
      .agg(
        sqrt(avg(pow(col(pred) - col(obs), 2))).as("rmse"),
        avg(abs(col(pred) - col(obs))).as("mae"),
        corr(col(pred), col(obs)).as("pearson"),
        count(lit(1)).as("n"))

  /** Wilcoxon rank-sum (Mann-Whitney U) statistic of `value` between two
    * classes, per group (`Fig-2C_D_plot_univariate.R:86`): U = R1 - n1(n1+1)/2
    * with average ranks over the pooled sample.
    */
  def rankSumU(df: DataFrame, group: Seq[String], classCol: String,
      classA: String, value: String): DataFrame = {
    val w = Window.partitionBy(group.map(col): _*).orderBy(col(value))
    val tieW = Window.partitionBy((group.map(col) :+ col(value)): _*)
    df.withColumn("__r", rank().over(w) + (count(lit(1)).over(tieW) - 1) / 2.0)
      .groupBy(group.map(col): _*)
      .agg(
        sum(when(col(classCol) === classA, col("__r"))).as("__r1"),
        count(when(col(classCol) === classA, 1)).as("n1"),
        count(when(col(classCol) =!= classA, 1)).as("n2"))
      .withColumn("u_stat", col("__r1") - col("n1") * (col("n1") + 1) / 2.0)
      .drop("__r1")
  }
}
