package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the fastText-style classifier step of
  * the public web-corpus pipelines (CCNet's quality LM buckets, the
  * LLaMA/GPT-3 "looks like reference text" filters): distill cheap
  * weak labels (a rule battery like
  * [[graft.functions.TextFunctions.gopherRules]], or "is it
  * Wikipedia-linked") into a SOFT per-document probability that ranks
  * the gray zone the hard rules can only bisect.
  *
  * Split of labor, chosen for the 100 TB posture:
  *  - [[train]] runs Spark MLlib's LogisticRegression — an iterative
  *    treeAggregate over the TRAINING sample. Weak labels are cheap,
  *    so the sample can be large, but it is still a sample: train on
  *    bounded data, not the lake.
  *  - scoring ([[scoreColumn]]) leaves MLlib entirely: the fitted
  *    coefficients ride into the plan as literals and the score is a
  *    pure codegen'd column expression (w·x + b through a sigmoid) —
  *    no MLlib UDF in the corpus-wide path, streamable as-is (a
  *    stateless projection, the bm25ScoreBroadcast posture).
  *
  * The sigmoid's `exp` is transcendental, so scores stay OUT of
  * hash-exact gates (this repo's oracle discipline); the c11 gate pins
  * margin-robust booleans (label agreement, class separation) instead.
  */
object QualityClassifier {

  /** Fitted linear model: score = sigmoid(intercept + Σ wᵢ·xᵢ). */
  final case class Model(intercept: Double, weights: Seq[Double],
                         features: Seq[String])

  /** Fit logistic regression of `labelCol` (boolean/0-1) on the given
    * numeric feature columns. Deterministic given fixed data and
    * params up to float-reduction order; treat coefficients as
    * approximate (the gate's booleans carry margins).
    */
  def train(df: DataFrame, features: Seq[String], labelCol: String,
            maxIter: Int = 50, regParam: Double = 0.01): Model = {
    require(features.nonEmpty, "train needs at least one feature column")
    val prepared = df.select((features.map(c =>
      col(c).cast("double").as(c)) :+
      col(labelCol).cast("double").as("__label")): _*)
    val assembled = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("__features")
      .transform(prepared)
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setLabelCol("__label").setFeaturesCol("__features")
    val fitted = lr.fit(assembled)
    Model(fitted.intercept, fitted.coefficients.toArray.toSeq, features)
  }

  /** The fitted model as ONE codegen'd column over the feature columns
    * (resolved by name): P(label=1) in [0, 1]. Stateless — apply to a
    * batch or a stream unchanged. */
  def scoreColumn(m: Model): Column = {
    val z = m.features.zip(m.weights).foldLeft(lit(m.intercept)) {
      case (acc, (n, w)) => acc + lit(w) * col(n).cast("double")
    }
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}
