package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pipeline DSL (reference: mllib/Model.scala:17-256, ModelStep.scala,
  * ModelPlan.scala — the query-lifecycle driver of the reference platform).
  *
  * A `Model` is a named, ordered list of steps folded over one flowing
  * DataFrame; steps may read a named side DataFrame instead, emit named
  * outputs consumed by later steps, and snapshot (memoize) their result to
  * parquet keyed by (project, model, step) — re-runs reuse the snapshot,
  * which both cuts lineage (the reference's checkpoint pattern,
  * core/util/util.scala:44-78) and makes multi-step experiments resumable.
  *
  * `Plan` reproduces ModelPlan's experiment generation: set/switch produce
  * the cross-product of step-parameter variants (grid search).
  */
case class Step(
    name: String,
    op: (DataFrame, Map[String, DataFrame]) => DataFrame,
    input: Option[String] = None,         // read a named DF instead of the flow
    outputs: Seq[String] = Nil,           // also register result under these names
    select: Seq[String] = Nil,
    drop: Seq[String] = Nil,
    rename: Map[String, String] = Map.empty,
    repartition: Option[Int] = None,
    cache: Boolean = false,
    snapshot: Boolean = false)

case class RunResult(df: DataFrame, named: Map[String, DataFrame],
                     log: Seq[(String, Long)])

case class Model(project: String, name: String, steps: Seq[Step] = Nil,
                 snapshotBase: Option[String] = None) {

  def step(s: Step): Model = copy(steps = steps :+ s)
  def step(stepName: String, op: DataFrame => DataFrame): Model =
    step(Step(stepName, (df, _) => op(df)))

  private def snapshotPath(stepName: String): Option[String] =
    snapshotBase.map(b => s"$b/$project/$name/$stepName")

  /** Fold the steps over `source`. Steps with `snapshot = true` write
    * parquet at the step path and re-read it (plan cut); when the snapshot
    * already exists and `reuseSnapshots`, the step op is skipped entirely
    * (the reference's step memoization, mllib/Model.scala:210-242). */
  def run(source: DataFrame,
          namedDataFrames: Map[String, DataFrame] = Map.empty,
          reuseSnapshots: Boolean = true,
          stopAfter: Option[String] = None): RunResult = {
    val spark = source.sparkSession
    var named = namedDataFrames
    var flow = source
    val log = Seq.newBuilder[(String, Long)]
    val upTo = stopAfter.map(sa => steps.indexWhere(_.name == sa) + 1)
      .filter(_ > 0).getOrElse(steps.length)

    steps.take(upTo).foreach { s =>
      val t0 = System.nanoTime()
      val in = s.input.map(named(_)).getOrElse(flow)
      val path = if (s.snapshot) snapshotPath(s.name) else None
      val computed = path match {
        case Some(p) if reuseSnapshots && pathExists(spark, p) =>
          spark.read.parquet(p)
        case Some(p) =>
          val out = shape(s, s.op(in, named))
          out.write.mode("overwrite").parquet(p)
          spark.read.parquet(p)
        case None => shape(s, s.op(in, named))
      }
      val out = if (s.cache) computed.cache() else computed
      flow = out
      s.outputs.foreach(n => named += n -> out)
      log += s.name -> ((System.nanoTime() - t0) / 1000000)
    }
    RunResult(flow, named, log.result())
  }

  private def shape(s: Step, df0: DataFrame): DataFrame = {
    var df = df0
    s.repartition.foreach(n => df = df.repartition(n))
    if (s.select.nonEmpty) df = df.select(s.select.map(df.col): _*)
    if (s.drop.nonEmpty) df = df.drop(s.drop: _*)
    s.rename.foreach { case (from, to) => df = df.withColumnRenamed(from, to) }
    df
  }

  private def pathExists(spark: SparkSession, p: String): Boolean = {
    val hPath = new org.apache.hadoop.fs.Path(p)
    hPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hPath)
  }
}

/** Experiment generator (reference ModelPlan: set/switch/merge/repeat →
  * cross-product of model variants). A variant is a map of
  * "step.param" -> value handed to the step ops via the named-DF map's
  * sibling `params`. */
case class Plan(variants: Seq[Map[String, String]] = Seq(Map.empty)) {
  /** Fix a parameter across all variants. */
  def set(key: String, value: String): Plan =
    Plan(variants.map(_ + (key -> value)))
  /** Branch every variant over the given values (cross-product growth). */
  def switch(key: String, values: Seq[String]): Plan =
    Plan(for (v <- variants; x <- values) yield v + (key -> x))
  /** Concatenate another plan's variants. */
  def merge(other: Plan): Plan = Plan(variants ++ other.variants)
  def size: Int = variants.length
}
