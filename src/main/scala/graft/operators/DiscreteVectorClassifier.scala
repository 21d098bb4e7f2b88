package graft.operators

import org.apache.spark.ml.classification.{LinearSVC, LinearSVCModel}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-vs-all classifier over a multi-hot label vector (reference:
  * classification/DiscreteVectorClassifier.scala:20-110): fits one binary
  * LinearSVC per label-vector component; transform emits the full raw-
  * margin array per row (the reference needed reflection for `predictRaw`
  * on Spark 2.3 — public API since 3.0) plus the thresholded prediction
  * vector. Component fits run as concurrent Spark jobs, bounded by
  * `parallelism` (the reference's HasParallelismDemy). */
object DiscreteVectorClassifier {

  case class Model(models: Seq[(Int, LinearSVCModel)], numClasses: Int) {
    def transform(df: DataFrame, featuresCol: String): DataFrame = {
      val weights = models.map { case (i, m) =>
        (i, m.coefficients.toArray, m.intercept)
      }
      val n = numClasses
      val dim = weights.headOption.map(_._2.length).getOrElse(0)
      val scoreUdf = udf { (v: Vector) =>
        // a NULL or wrong-width feature vector used to NPE / AIOOBE four
        // task retries deep (or silently truncate the dot product when
        // SHORTER than the trained dim) — fail by name at the first row
        require(v != null,
          "DiscreteVectorClassifier.transform: NULL feature vector")
        require(v.size == dim || weights.isEmpty,
          s"DiscreteVectorClassifier.transform: feature vector has " +
            s"${v.size} components but the model was trained on $dim")
        val raw = new Array[Double](n)
        weights.foreach { case (i, w, b) =>
          var s = b
          val arr = v.toArray
          var j = 0
          while (j < arr.length) { s += w(j) * arr(j); j += 1 }
          raw(i) = s
        }
        raw
      }
      df.withColumn("rawPredictions", scoreUdf(col(featuresCol)))
        .withColumn("prediction",
          expr("transform(rawPredictions, m -> IF(m > 0, CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)))"))
    }
  }

  def fit(df: DataFrame, featuresCol: String, labelVecCol: String,
          parallelism: Int = 4): Model = {
    val first = df.select(col(labelVecCol)).limit(1).collect()
    require(first.nonEmpty,
      "DiscreteVectorClassifier.fit: empty training frame")
    val firstVec = first.head.getAs[Vector](0)
    require(firstVec != null,
      s"DiscreteVectorClassifier.fit: NULL $labelVecCol in the first row")
    val numClasses = firstVec.size
    // the first-row probe above sizes the model; EVERY row's label vector
    // still flows through this udf during each component fit, so a NULL
    // or wrong-width vector in row N must fail by name here, not as a
    // bare NPE/IndexOutOfBounds four task retries deep
    val componentLabel = udf { (v: Vector, i: Int) =>
      require(v != null,
        "DiscreteVectorClassifier.fit: NULL label vector")
      require(v.size == numClasses,
        s"DiscreteVectorClassifier.fit: label vector has ${v.size} " +
          s"components, expected $numClasses (sized from the first row)")
      v(i)
    }
    val ec = scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(parallelism))
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      val futures = (0 until numClasses).map { i =>
        Future {
          val train = df.select(col(featuresCol).as("features"),
            componentLabel(col(labelVecCol), lit(i)).as("label"))
          i -> new LinearSVC().setMaxIter(50).setRegParam(0.01).fit(train)
        }(ec)
      }
      Model(futures.map(Await.result(_, Duration.Inf)), numClasses)
    } finally ec.shutdown()
  }
}
