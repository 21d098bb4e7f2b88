package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-job profile of one registry query (optimization round 19, guide
  * §1.1/§7): runs the named `SparkEntry.queries` entry under a listener
  * that records, per Spark job, wall time and the summed task metrics of
  * its stages (shuffle read/write bytes, input bytes, task count) — the
  * empirical "where does this query's time actually go" the UI would
  * show, usable headlessly. Warmup pass first (codegen), then one timed
  * pass. Test-scoped harness tooling, like [[NgramAb]].
  *
  * Usage: sbt "Test/runMain graft.tools.JobProfile <query> [sfDir]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <queryName> [sfDir]")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class Job(id: Int, var t0: Long = 0L, var t1: Long = 0L,
                   var tasks: Int = 0, var shufRead: Long = 0L,
                   var shufWrite: Long = 0L, var input: Long = 0L,
                   var taskTimeMs: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val stageToJob = mutable.HashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.synchronized {
          val j = Job(e.jobId, t0 = e.time)
          jobs(e.jobId) = j
          e.stageIds.foreach(s => stageToJob(s) = e.jobId)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          for (jid <- stageToJob.get(e.stageId); j <- jobs.get(jid)) {
            j.tasks += 1
            val m = e.taskMetrics
            if (m != null) {
              j.shufRead += m.shuffleReadMetrics.totalBytesRead
              j.shufWrite += m.shuffleWriteMetrics.bytesWritten
              j.input += m.inputMetrics.bytesRead
              j.taskTimeMs += m.executorRunTime
            }
          }
        }
    })

    val fn = graft.SparkEntry.queries(name)
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    // warmup at the small sf mirrors Bench's methodology
    try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => }
    clear()
    jobs.synchronized { jobs.clear(); stageToJob.clear() }
    val t0 = System.nanoTime()
    val nOut = fn(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // let the listener bus drain
    println(f"[job-profile] query=$name rows=$nOut wall=$wall%.2f s jobs=${jobs.size}")
    jobs.synchronized {
      jobs.values.foreach { j =>
        println(f"[job-profile]  job=${j.id}%3d wall=${(j.t1 - j.t0) / 1e3}%6.2f s " +
          f"tasks=${j.tasks}%4d taskTime=${j.taskTimeMs / 1e3}%7.2f s " +
          f"in=${j.input >> 20}%4d MB sr=${j.shufRead >> 20}%4d MB " +
          f"sw=${j.shufWrite >> 20}%4d MB")
      }
    }
    spark.stop()
  }
}
