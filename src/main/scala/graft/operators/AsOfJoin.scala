package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — the time-series primitive Spark's built-in
  * joins lack: for every left row, attach the single LATEST right row with
  * `r.ts <= l.ts` on the same key (backward direction, inclusive — the
  * "price as of the trade", "last checkpoint before the event" lookup).
  *
  * Re-expression instead of an inequality join: Catalyst executes a plain
  * `l.key = r.key AND r.ts <= l.ts` + latest-wins as a join that multiplies
  * every left row by its whole right history before aggregating it away —
  * quadratic in events-per-key. Here both sides UNION into one stream with
  * a side marker, shuffle ONCE on the key, and a partitioned ordered window
  * carries the most recent right payload forward with
  * `last(payload, ignoreNulls)` over rows-unbounded-preceding — linear,
  * one shuffle, sort-merge-friendly. Right rows sort BEFORE left rows at
  * equal ts (side marker ascending), which is exactly the inclusive `>=`
  * semantics of DuckDB's native ASOF JOIN (the oracle).
  *
  * Determinism: duplicate right rows at the same (key, ts) are reduced to
  * the smallest-`rightTieCol` winner before the merge. Skew: a hot key
  * concentrates one window partition — pre-split hot keys by coarse time
  * range and stitch the last carried payload across range boundaries (the
  * [[Packing.packSequencesSharded]] two-phase recipe applies verbatim).
  *
  * NULL lanes keep the join's SQL semantics (round 17): right rows with
  * NULL key or NULL ts match nothing (equality/inequality on NULL is
  * never true); left rows with NULL key or NULL ts stay in the output
  * with a NULL `asof`.
  *
  * Output: every left column, plus a nullable `asof` struct of
  * `payloadCols` (null = no right row at or before the left ts). */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payloadCols: Seq[String],
               rightTieCol: String): DataFrame =
    merge(left, right, keyCol, tsCol, payloadCols, rightTieCol,
      descending = false, toleranceSeconds = None)

  /** [[backward]] with a staleness bound (pandas merge_asof `tolerance`):
    * a match older than `toleranceSeconds` before the left timestamp is
    * nulled out — the "quote is only good for N minutes" contract. Same
    * one-shuffle window program; the carried payload rides with its own
    * timestamp, so the bound is a row-local epoch-seconds comparison
    * (fractional-exact: both engines divide the same micros by 1e6). */
  def backwardWithin(left: DataFrame, right: DataFrame, keyCol: String,
                     tsCol: String, payloadCols: Seq[String],
                     rightTieCol: String,
                     toleranceSeconds: Double): DataFrame = {
    require(toleranceSeconds > 0, "toleranceSeconds must be positive")
    merge(left, right, keyCol, tsCol, payloadCols, rightTieCol,
      descending = false, toleranceSeconds = Some(toleranceSeconds))
  }

  /** Forward direction: the single EARLIEST right row with `r.ts >= l.ts`
    * ("next checkpoint after the event"). Same program with the window
    * order reversed — in descending-ts order, the last payload carried
    * forward is the smallest right ts at or above the left row. */
  def forward(left: DataFrame, right: DataFrame, keyCol: String,
              tsCol: String, payloadCols: Seq[String],
              rightTieCol: String): DataFrame =
    merge(left, right, keyCol, tsCol, payloadCols, rightTieCol,
      descending = true, toleranceSeconds = None)

  private val InternalCols =
    Seq("_rn_", "_pay_", "_side_", "_lrow_", "_m_", "_mts_")

  private def merge(left: DataFrame, right: DataFrame, keyCol: String,
                    tsCol: String, payloadCols: Seq[String],
                    rightTieCol: String, descending: Boolean,
                    toleranceSeconds: Option[Double]): DataFrame = {
    // the merge rides on reserved column names — a caller column with the
    // same name would be silently read as the internal marker
    InternalCols.foreach { c =>
      require(!left.columns.contains(c) && !right.columns.contains(c) &&
        !payloadCols.contains(c),
        s"AsOfJoin: column name '$c' is reserved by the merge program — " +
          "rename it upstream")
    }
    // "asof" is the PUBLIC output column: a LEFT side already carrying
    // one (e.g. a previous AsOfJoin's output re-joined) would expand to
    // two same-named columns and every downstream col("asof") dies with
    // AMBIGUOUS_REFERENCE — only the left side collides, so only it is
    // checked (a right-side 'asof' not in payloadCols never survives)
    require(!left.columns.contains("asof"),
      "AsOfJoin: the left side already has an 'asof' column — the output " +
        "would carry two; rename or drop it upstream")
    // NULL-lane semantics match the join this re-expresses (round 17):
    // SQL equality/inequality is never true on NULL, so a right row with
    // NULL key or NULL ts can match nothing — filtered here. Without the
    // filter the window machinery INVERTED the semantics: NULL keys
    // partition TOGETHER (a NULL-key left row picked up a NULL-key right
    // payload) and NULL timestamps sort NULLS FIRST (a NULL-ts right
    // payload was carried as "as of" into every later left row of its
    // key). Left rows with NULL key/ts stay in the output with a NULL
    // `asof`: right dirty rows are gone and NULLS-FIRST ordering places
    // dirty left rows before any real right row, so `last(_pay_)` sees
    // only nulls — no extra plan branch needed.
    val rClean = right.where(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val tieW = Window.partitionBy(keyCol, tsCol).orderBy(col(rightTieCol))
    val r1 = rClean.withColumn("_rn_", row_number().over(tieW))
      .where(col("_rn_") === 1)
    // the match timestamp rides inside the carried struct so a staleness
    // bound stays a row-local comparison after the window
    val pay = struct((col(tsCol).as("_mts_") +: payloadCols.map(col)): _*)
    val payType = r1.select(pay.as("_pay_")).schema("_pay_").dataType
    val lStruct = struct(left.columns.map(col): _*)
    val lType = left.select(lStruct.as("_lrow_")).schema("_lrow_").dataType
    val rU = r1.select(col(keyCol), col(tsCol), pay.as("_pay_"),
      lit(0).as("_side_"), lit(null).cast(lType).as("_lrow_"))
    val lU = left.select(col(keyCol), col(tsCol),
      lit(null).cast(payType).as("_pay_"),
      lit(1).as("_side_"), lStruct.as("_lrow_"))
    // NULLS FIRST in BOTH directions: Spark's desc default is NULLS LAST,
    // which would park a NULL-ts left row at the END of its forward-mode
    // partition where it inherits the last carried payload — a match for
    // a row SQL says matches nothing
    val tsOrder =
      if (descending) col(tsCol).desc_nulls_first else col(tsCol).asc_nulls_first
    val w = Window.partitionBy(keyCol)
      .orderBy(tsOrder, col("_side_"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rU.unionByName(lU)
      .withColumn("_m_", last(col("_pay_"), ignoreNulls = true).over(w))
      .where(col("_side_") === 1)
    val inBound = toleranceSeconds match {
      case None => col("_m_").isNotNull
      case Some(tol) =>
        val gap =
          if (descending)
            col("_m_._mts_").cast("double") - col(tsCol).cast("double")
          else col(tsCol).cast("double") - col("_m_._mts_").cast("double")
        col("_m_").isNotNull && gap <= lit(tol)
    }
    matched
      .withColumn("asof",
        when(inBound, col("_m_").dropFields("_mts_")))
      .select(col("_lrow_.*"), col("asof"))
  }
}
