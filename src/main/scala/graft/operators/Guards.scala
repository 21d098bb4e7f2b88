package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared in-plan guard kernels (round-16 consolidation: the same
  * five-line non-finite CASE used to be hand-rolled in four operators,
  * and each new float-keyed operator had to remember to copy it).
  *
  * Contract notes (the guard-contract rules):
  *  - raise_error payloads always coalesce NULL-able columns — a NULL in
  *    a concat would null-propagate into a message-less error;
  *  - NaN/±Inf must be rejected BEFORE any bigint/floor cast: Spark's
  *    non-ANSI casts silently map NaN → 0 and +Inf → Long.MaxValue,
  *    which corrupts shard-bounds probes and integer elections with no
  *    error anywhere in the output.
  */
object Guards {

  /** TRUE iff `d` (a double-cast column) is a finite number; NULL for
    * NULL input (three-valued — callers pick their NULL policy). */
  def isFiniteD(d: Column): Column =
    !isnan(d) && d > Double.NegativeInfinity && d < Double.PositiveInfinity

  /** NULL-TOLERANT finite guard: returns `pass` when `c` is NULL (the
    * caller's expression null-propagates) or finite, raises `msg` on
    * NaN/±Inf. The window-ordering contract: NULLs keep their ORDER BY
    * placement, non-finite values are upstream bugs. */
  def finiteOrRaise(c: Column, pass: Column, msg: Column): Column = {
    val d = c.cast("double")
    when(c.isNull, pass).when(isFiniteD(d), pass).otherwise(raise_error(msg))
  }

  /** STRICT finite guard: NULL is rejected too (the embedding-component
    * contract — a NULL component is as corrupt as a NaN one). */
  def finiteOrRaiseStrict(c: Column, pass: Column, msg: Column): Column =
    when(isFiniteD(c.cast("double")), pass).otherwise(raise_error(msg))

  /** Standard non-finite message: `op: non-finite what (value)` + extra
    * context columns, every payload coalesced. */
  def nonFiniteMsg(op: String, what: String, c: Column, ctx: Column*): Column =
    concat(Seq(lit(s"$op: non-finite $what ("),
      coalesce(c.cast("double").cast("string"), lit("NULL")),
      lit(")")) ++ ctx: _*)

  /** Exact integral narrowing: yields `c.cast("long")` ONLY when the
    * double view round-trips (so the value is integral and within long
    * range); raises by name otherwise. `cast("long")` alone silently
    * FLOORS 1.9 → 1 — the recurring guard-contract defect class (hit
    * weightedPrioritySample, then decimalQuantileSketch one commit
    * later). NULL passes through as NULL (callers pick their NULL
    * policy separately). */
  def integralLongOrRaise(c: Column, op: String, what: String): Column =
    when(c.isNull, lit(null).cast("long"))
      .when(c.cast("double") === c.cast("long").cast("double"), c.cast("long"))
      .otherwise(raise_error(concat(
        lit(s"$op: $what must be integral ("),
        coalesce(c.cast("string"), lit("NULL")),
        lit(") — quantize floats upstream"))))

  /** Schema-aware integral narrowing for "valCol must be integer-typed"
    * operator contracts: already-integral columns cast straight through
    * (the double round-trip would FALSELY reject legitimate longs past
    * 2^53), everything else goes through [[integralLongOrRaise]]. */
  def integralLongCol(df: DataFrame, valCol: String, op: String): Column = {
    import org.apache.spark.sql.types._
    df.select(col(valCol)).schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(valCol).cast("long")
      case _ => integralLongOrRaise(col(valCol), op, valCol)
    }
  }
}
