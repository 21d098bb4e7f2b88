package graft

import org.apache.spark.sql.SparkSession
import graft.sources.Storage

/** Application bootstrap (reference core/Application.scala:6-55 +
  * Configuration): a main that parses `key=value` args (master, appname,
  * config), builds the SparkSession with graft's standard local tuning,
  * loads a JSON-ish config file through the Storage abstraction, and hands
  * (spark, storage, config) to the app body. */
trait Application {

  /** Defaults merged under the config file's values. */
  def defaultConfValues: Map[String, String] = Map.empty

  def run(spark: SparkSession, storage: Storage, config: Map[String, String]): Unit

  def main(args: Array[String]): Unit = {
    val kv = args.flatMap { s =>
      val i = s.indexOf('=')
      if (i <= 0 || i == s.length - 1) None
      else Some(s.substring(0, i).toLowerCase -> s.substring(i + 1))
    }.toMap
    val spark = {
      val b = SparkSession.builder()
        .master(kv.getOrElse("master", "local[*]"))
        .config("spark.sql.shuffle.partitions",
          Runtime.getRuntime.availableProcessors().toString)
        .config("spark.sql.session.timeZone", "UTC")
      kv.get("appname").fold(b)(b.appName).getOrCreate()
    }
    val storage = Storage.forSpark(spark)
    val config = defaultConfValues ++ kv.get("config").map { path =>
      parseConfig(storage.getNode(path).getContentAsString)
    }.getOrElse(Map.empty) ++ (kv - "master" - "appname" - "config")
    try run(spark, storage, config)
    finally storage.removeMarkedFiles()
  }

  /** Flat `"key": "value"` JSON (the reference's config shape) or
    * `key=value` lines. */
  private[graft] def parseConfig(text: String): Map[String, String] = {
    val jsonPair = "\"([^\"]+)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
    val pairs = jsonPair.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).replace("\\\"", "\"").replace("\\\\", "\\"))
      .toSeq
    if (pairs.nonEmpty) pairs.toMap
    else text.linesIterator.flatMap { l =>
      val i = l.indexOf('=')
      if (i <= 0) None else Some(l.substring(0, i).trim -> l.substring(i + 1).trim)
    }.toMap
  }
}
