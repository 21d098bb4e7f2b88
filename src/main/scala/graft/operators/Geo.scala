package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextKernels

/** Geospatial operators (reference SURVEY.md §2.13) without a geometry
  * library dependency: polygons are carried as coordinate arrays (the WKB
  * `binary` + bbox pattern of the reference, GeoManager.scala:53-62, with
  * the ring inlined as `array<struct<x,y>>` so the point-in-polygon test is
  * a pure JVM kernel).
  *
  * The join strategy is the reference's two-phase filter made Catalyst-
  * friendly: a cheap bbox range predicate — pushed down / usable by AQE —
  * prunes candidates before the exact ray-casting test runs as a UDF.
  * At scale, bbox pruning is what keeps this from being a cross join.
  */
object Geo {

  /** Ray-casting point-in-polygon (public algorithm). Ring = closed or
    * open sequence of (x, y). */
  def pointInRing(x: Double, y: Double, xs: Array[Double], ys: Array[Double]): Boolean = {
    var inside = false
    var i = 0
    var j = xs.length - 1
    while (i < xs.length) {
      if ((ys(i) > y) != (ys(j) > y) &&
        x < (xs(j) - xs(i)) * (y - ys(i)) / (ys(j) - ys(i)) + xs(i)) {
        inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  private val pipUdf = udf((x: Double, y: Double, ring: Seq[Double]) => {
    val n = ring.length / 2
    val xs = new Array[Double](n)
    val ys = new Array[Double](n)
    var i = 0
    while (i < n) { xs(i) = ring(2 * i); ys(i) = ring(2 * i + 1); i += 1 }
    pointInRing(x, y, xs, ys)
  })

  /** Two-phase point-in-polygon join.
    *
    * @param points   (pointCols..., xCol, yCol)
    * @param polygons must carry bbox columns `minX/maxX/minY/maxY` and a
    *                 flat `ring` array<double> [x0,y0,x1,y1,...]
    */
  def pointInPolygonJoin(points: DataFrame, xCol: String, yCol: String,
                         polygons: DataFrame): DataFrame = {
    val bbox = col(xCol) >= col("minX") && col(xCol) <= col("maxX") &&
      col(yCol) >= col("minY") && col(yCol) <= col("maxY")
    points.join(polygons, bbox)                       // phase 1: cheap range
      .where(pipUdf(col(xCol), col(yCol), col("ring"))) // phase 2: exact
  }

  /** Attach bbox columns from a flat ring array (ingest-time helper —
    * mirrors the reference storing MaxLat/MinLat/... beside the geometry). */
  def withBbox(polygons: DataFrame, ringCol: String = "ring"): DataFrame = polygons
    .withColumn("minX", expr(s"array_min(filter(transform($ringCol, (v, i) -> IF(i % 2 = 0, v, null)), v -> v IS NOT NULL))"))
    .withColumn("maxX", expr(s"array_max(filter(transform($ringCol, (v, i) -> IF(i % 2 = 0, v, null)), v -> v IS NOT NULL))"))
    .withColumn("minY", expr(s"array_min(filter(transform($ringCol, (v, i) -> IF(i % 2 = 1, v, null)), v -> v IS NOT NULL))"))
    .withColumn("maxY", expr(s"array_max(filter(transform($ringCol, (v, i) -> IF(i % 2 = 1, v, null)), v -> v IS NOT NULL))"))

  /** Address-to-street fuzzy localization (reference AddressLocalizator
    * capability): postcode equi-join prunes, then the best street per
    * address by positional token similarity. */
  private val simUdf = udf((a: String, b: String) =>
    TextKernels.tokenSetSimilarity(a, b))

  def localizeAddresses(addresses: DataFrame, addrCol: String, postcodeCol: String,
                        streets: DataFrame, streetCol: String,
                        streetPostcodeCol: String, minSimilarity: Double = 0.3): DataFrame = {
    val cand = addresses.join(streets,
      addresses(postcodeCol) === streets(streetPostcodeCol))
      .withColumn("_sim_", simUdf(col(addrCol), col(streetCol)))
      .where(col("_sim_") >= minSimilarity)
    val w = Window.partitionBy(addrCol, postcodeCol)
      .orderBy(col("_sim_").desc, col(streetCol))
    cand.withColumn("_rk_", row_number().over(w))
      .where(col("_rk_") === 1)
      .drop("_rk_")
      .withColumnRenamed("_sim_", "similarity")
  }

  /** GeoNames-style hierarchy flattener (reference twitter/GeoNames.scala:
    * 9-128): cascade of self-equi-joins denormalizing a parent-child
    * hierarchy into one row per leaf with all ancestor names. Generic:
    * `levels` = (levelName, parentKeyCol) from root to leaf. */
  def flattenHierarchy(nodes: DataFrame, idCol: String, parentCol: String,
                       nameCol: String, maxDepth: Int = 5): DataFrame = {
    // iterative join: path accumulates ancestor names root-first
    var acc = nodes.select(col(idCol).as("_nid_"), col(parentCol).as("_pid_"),
      array(col(nameCol)).as("path"))
    var i = 0
    var done = false
    while (i < maxDepth && !done) {
      val parents = nodes.select(col(idCol).as("_jid_"),
        col(parentCol).as("_jpid_"), col(nameCol).as("_pname_"))
      val next = acc.join(parents, acc("_pid_") === parents("_jid_"), "left")
        .select(col("_nid_"),
          coalesce(col("_jpid_"), lit(null)).as("_pid_"),
          when(col("_pname_").isNotNull,
            concat(array(col("_pname_")), col("path"))).otherwise(col("path"))
            .as("path"))
      done = next.where(col("_pid_").isNotNull).isEmpty
      acc = next
      i += 1
    }
    acc.select(col("_nid_").as(idCol), col("path"),
      array_join(col("path"), " > ").as("full_name"))
  }
}
