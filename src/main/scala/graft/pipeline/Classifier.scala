package graft.pipeline

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained document classifiers for corpus curation.
  *
  * The standard curation recipe (CCNet, RefinedWeb, FineWeb) scores
  * every crawled document with a cheap linear classifier — quality
  * vs. boilerplate, language, domain — trained on a small labeled set
  * and applied to the full corpus. This module provides that recipe
  * engine-side: hashed bag-of-words features (the fastText/VW hashing
  * trick, so the feature space is fixed-width and vocabulary-free) and
  * an L2-regularized logistic regression fit with Spark ML's
  * distributed L-BFGS.
  *
  * Scale shape:
  *   - featurization is a narrow map (native `split`/`filter` +
  *     HashingTF) — no vocabulary broadcast, no shuffle;
  *   - training aggregates gradients via treeAggregate over
  *     partitions — O(iterations) passes over the TRAINING SAMPLE
  *     only, which is the small labeled subset, never the corpus;
  *   - scoring broadcasts the fitted weight vector (numFeatures
  *     doubles, ~2 MB at 2^18) and evaluates inside the scan stage —
  *     the 100 TB pass is embarrassingly parallel with nothing moving.
  */
object Classifier {

  /** Lowercased word tokens via native functions (codegen'd; no UDF):
    * split on non-letter/digit runs, drop empties.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** Add a fixed-width hashed term-frequency feature vector. */
  def featurize(df: DataFrame, textCol: String,
                numFeatures: Int = 1 << 16,
                featuresCol: String = "features"): DataFrame = {
    val withTok = df.withColumn("__tokens", tokens(col(textCol)))
    new HashingTF()
      .setInputCol("__tokens").setOutputCol(featuresCol)
      .setNumFeatures(numFeatures)
      .transform(withTok)
      .drop("__tokens")
  }

  /** Fit an L2 logistic regression on `labelCol` (0.0/1.0) over hashed
    * bag-of-words features of `textCol`. The fit is a bounded
    * driver-side model estimation (same pattern as the IVF coarse
    * quantizer): deterministic given the input plan — L-BFGS over a
    * convex objective from a zero initial vector.
    */
  def trainTextClassifier(labeled: DataFrame, textCol: String,
                          labelCol: String,
                          numFeatures: Int = 1 << 16,
                          regParam: Double = 1e-4,
                          maxIter: Int = 30): LogisticRegressionModel =
    new LogisticRegression()
      .setFeaturesCol("features").setLabelCol(labelCol)
      .setRegParam(regParam).setElasticNetParam(0.0)
      .setMaxIter(maxIter).setStandardization(false)
      .fit(featurize(labeled, textCol, numFeatures))

  /** Score documents with a fitted model: adds `score` (P[label=1])
    * and `predicted` (0/1 at the 0.5 threshold). Evaluation is a
    * narrow map over the broadcast weights.
    */
  def score(model: LogisticRegressionModel, docs: DataFrame,
            textCol: String, numFeatures: Int = 1 << 16): DataFrame = {
    // work on a copy: setting column params on the shared (possibly
    // cached) model instance would race between concurrent scorers
    val scored = model.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setFeaturesCol("features")
      .setProbabilityCol("__prob").setPredictionCol("__pred")
      .setRawPredictionCol("__raw")
      .transform(featurize(docs, textCol, numFeatures))
    scored
      .withColumn("score", vectorElement(col("__prob"), 1))
      .withColumn("predicted", col("__pred").cast("int"))
      .drop("features", "__prob", "__pred", "__raw")
  }

  /** Persist a fitted classifier as a reloadable artifact — the same
    * train-once / score-everywhere contract as the persisted IVF index:
    * curation jobs load the frozen weights instead of refitting, so
    * scores are reproducible across pipeline runs and clusters.
    */
  def saveModel(model: LogisticRegressionModel, path: String): Unit =
    model.write.overwrite().save(path)

  /** Load a persisted classifier (uses the active SparkSession). */
  def loadModel(path: String): LogisticRegressionModel =
    LogisticRegressionModel.load(path)

  /** ml.Vector element access via the public vector_to_array fn. */
  private def vectorElement(v: Column, i: Int): Column =
    org.apache.spark.ml.functions.vector_to_array(v).getItem(i)

  /** Holdout accuracy of `predicted` vs `labelCol` as a single row —
    * the gate shape the correctness harness checks against a constant.
    */
  def accuracyGate(scoredHoldout: DataFrame, labelCol: String,
                   bound: Double): DataFrame =
    scoredHoldout
      .agg(avg(when(col("predicted") === col(labelCol).cast("int"), 1.0)
        .otherwise(0.0)).as("acc"))
      .select(when(col("acc") >= bound, lit("pass"))
        .otherwise(lit("fail")).as("status"))
}
