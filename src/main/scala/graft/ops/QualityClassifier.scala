package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fasttext-style WEAK-LABEL QUALITY CLASSIFIER — the GPT-3/LLaMA corpus
  * filter: train a linear classifier to recognize a trusted slice of the
  * corpus (the weak positive label), then score EVERY document with the
  * model's probability and keep the high scorers.
  *
  * Spark-first shape: hashed bag-of-words features (HashingTF — a narrow,
  * shuffle-free map; no vocabulary table to build or broadcast), logistic
  * regression via Spark ML's LBFGS (each iteration is one treeAggregate
  * over the corpus with a 2^`featureBits`-dim gradient — ~2 MB per task at
  * the default 18 bits, driver state is just the coefficient vector), and
  * scoring as another narrow map. No stage grows with corpus size except
  * the O(n) passes themselves.
  */
object QualityClassifier {

  /** Train on `labelCol` (boolean weak label) over `train`, score `score`.
    * Output: (id, p_quality ∈ [0,1], predicted_quality). Deterministic up
    * to floating-point reduction order — assert thresholds, not hashes. */
  def trainAndScore(train: DataFrame, score: DataFrame, labelCol: Column,
                    featureBits: Int = 18, maxIter: Int = 20,
                    regParam: Double = 0.01,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.HashingTF
    require(featureBits > 0 && featureBits <= 24, "featureBits in (0, 24]")
    val tf = new HashingTF()
      .setInputCol("__ws").setOutputCol("__feat")
      .setNumFeatures(1 << featureBits)
    def featurize(df: DataFrame): DataFrame =
      tf.transform(df.withColumn("__ws", TextAnalysis.words(col(textCol))))
    val fitted = new LogisticRegression()
      .setFeaturesCol("__feat").setLabelCol("__label")
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(featurize(train.withColumn("__label", labelCol.cast("double"))))
    import org.apache.spark.ml.functions.vector_to_array
    fitted.transform(featurize(score))
      .select(col(idCol),
        round(element_at(vector_to_array(col("probability")), 2), 6).as("p_quality"),
        (col("prediction") === 1.0).as("predicted_quality"))
  }
}
