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

  /** Long-id gate for every mix64-keyed admission/sketch operator
    * (round-18 consolidation — this kernel was hand-rolled three times
    * across Sampling and Sketch in one diff, the exact drift this object
    * exists to kill): a NULL, non-numeric, or NON-INTEGRAL id raises BY
    * NAME. A NULL hash is never neutral downstream — it wins ascending
    * admission windows, lands rows in shard NULL, or addresses phantom
    * sketch registers — and a bare cast("long") would silently FLOOR a
    * fractional id (1.1 and 1.9 hash identically — correlated samples,
    * undercounting sketches) and map NaN to 0 (guard-contract rule: no
    * non-finite value reaches a bigint cast). Schema-aware like
    * [[integralLongCol]]: already-integral columns only null-check (the
    * round-trip would falsely reject snowflake-scale longs past 2^53). */
  def longIdOrRaise(df: DataFrame, idCol: String, op: String): Column = {
    import org.apache.spark.sql.types._
    val base = col(idCol).cast("long")
    val ok = df.select(col(idCol)).schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType => base.isNotNull
      // FLOAT/DOUBLE ids: the double round-trip alone proves integrality
      // (r18 ADVICE — the decimal(38,18) leg FALSELY rejected integral
      // doubles past 2^53: double→decimal casts via the shortest decimal
      // string, so 2^60 became ...847000000000000000 while the long cast
      // is ...846976). The decimal leg was also the only thing catching
      // long-RANGE saturation (±Inf and values >= 2^63 cast to
      // Long.Max/MinValue, whose double view can equal the input — e.g.
      // 2^63 === Long.MaxValue.toDouble), so it is replaced by an
      // explicit range bound: [-2^63, 2^63) is exactly representable in
      // doubles, and anything outside would have saturated silently.
      case FloatType | DoubleType =>
        val d = col(idCol).cast("double")
        base.isNotNull && d === base.cast("double") &&
          d >= lit(Long.MinValue.toDouble) && d < lit(9.223372036854775808e18)
      case _ => base.isNotNull &&
        col(idCol).cast("double") === base.cast("double") &&
        col(idCol).cast("decimal(38,18)") === base.cast("decimal(38,18)")
    }
    when(ok, base).otherwise(raise_error(concat(
      lit(s"$op: NULL, non-numeric or non-integral id "),
      coalesce(col(idCol).cast("string"), lit("NULL")),
      lit(" — rank-encode string ids upstream, quantize fractional ones"))))
  }

  /** Projected equi-join OUTPUT volume: Σ over distinct `keys` tuples of
    * leftOccurrences × rightOccurrences — the exact pre-filter row count
    * of `left.join(right, keys)`. Two vocabulary-sized aggregates + one
    * key-sized join; DECIMAL accumulation (a product of two
    * row-count-scale counts would wrap a LONG sum silently —
    * guard-contract rule 5). The shared plumbing of the round-18
    * candidate-volume probes (FuzzyLookup exact + fuzzy lanes,
    * ngramJaccardPairs) — callers own their bespoke raise messages. */
  def projectedJoinVolume(left: DataFrame, right: DataFrame,
                          keys: Seq[String]): java.math.BigInteger = {
    val l = left.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_lc_"))
    val r = right.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_rc_"))
    l.join(r, keys)
      .agg(coalesce(sum(col("_lc_").cast("decimal(38,0)") * col("_rc_")),
        lit(0).cast("decimal(38,0)")))
      .collect()(0).getDecimal(0).toBigInteger
  }

  /** Self-join form of [[projectedJoinVolume]]: Σ over keys of count² —
    * one aggregate instead of two plus a join. */
  def projectedSelfJoinVolume(keyed: DataFrame,
                              keys: Seq[String]): java.math.BigInteger =
    keyed.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_c_"))
      .agg(coalesce(sum(col("_c_").cast("decimal(38,0)") * col("_c_")),
        lit(0).cast("decimal(38,0)")))
      .collect()(0).getDecimal(0).toBigInteger

  /** Bucket size above which an LSH-family pair join is an effective
    * hang, not a slow query: within-bucket candidates are size²/2, so ONE
    * bucket at this bound emits ~5.5e11 pair rows before any distinct.
    * The round-16 sf1 soak measured the failure mode live (ann05 164.8x,
    * dd04 36x at 10x data, both from bucket-occupancy growth at fixed
    * key cardinality) — and until round 17 the only defense was scaladoc.
    * Sized three orders of magnitude above anything the gated queries or
    * the sf1 soak reach (max real buckets there are in the thousands), so
    * the probe is dormant everywhere except genuine degeneracy. */
  val DegenerateBucketBound: Long = 1L << 20

  /** Row bound above which a documented single-task lane (a global
    * `Window.orderBy` with no partitioning — one sequential sort task)
    * refuses by name instead of silently funneling the dataset through
    * one executor thread. 2^22 (~4.2M rows) is far above every gated
    * query and every documented small-data use (calendar-sized series,
    * demo corpora), and far below where a one-task sort of a 100 TB
    * input would quietly eat hours. The same contract shape as the
    * exact-ANN lane's loud 2^21 collect bound. */
  val SingleTaskRowBound: Long = 1L << 22

  /** Eager single-task-lane probe: counts `df` and raises by name with
    * the sharded/contract twin spelled out. `bound <= 0` disables — the
    * explicit opt-in to the sequential cost.
    *
    * Cost note: `count()` is not a second full evaluation of the
    * caller's plan — Catalyst prunes every deterministic projection a
    * bare count doesn't need (UDF-computed columns included), so over a
    * scan the probe collapses to a parquet row-group metadata count;
    * only cardinality-changing upstreams (aggregates, joins) genuinely
    * re-run, and those feed a documented small-output lane by
    * contract. */
  def singleTaskLaneProbe(df: DataFrame, op: String, bound: Long,
                          twinHint: String): Unit =
    if (bound > 0) {
      val n = df.count()
      require(n <= bound,
        s"$op: $n rows exceed the $bound-row single-task bound — this " +
          s"lane runs ONE global-sort task by documented contract and " +
          s"would serialize the whole dataset through a single executor " +
          s"thread; $twinHint")
    }

  /** Eager degenerate-bucket probe (the Packing bounds-probe house
    * pattern): one partial-aggregable groupBy-count over `keyed` — which
    * every caller derives from an already-persisted signature frame, so
    * the probe costs one cheap job, not a recompute — raising BY NAME
    * with the offending key, its row count, and the operator's sizing
    * knob when any bucket exceeds `bound`. Callers skip the probe when
    * their own cap (`maxBucketSize` etc.) already bounds every bucket
    * below `bound`. `bound <= 0` disables — the explicit "I accept the
    * quadratic cost" opt-out, never the default. */
  def degenerateBucketProbe(keyed: DataFrame, keys: Seq[String], op: String,
                            bound: Long, knobHint: String): Unit =
    if (bound > 0) {
      val hot = keyed.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("_bs_"))
        .where(col("_bs_") > bound)
        .orderBy(col("_bs_").desc).limit(1).collect()
      require(hot.isEmpty, {
        val r = hot.head
        val key = keys.zipWithIndex
          .map { case (k, i) => s"$k=${Option(r.get(i)).getOrElse("NULL")}" }
          .mkString(", ")
        s"$op: degenerate LSH bucket ($key) holds " +
          s"${r.getLong(keys.size)} rows > $bound — the within-bucket " +
          s"pair join would emit ~size^2/2 candidate rows from this " +
          s"bucket alone (an effective hang, soak-measured round 16); " +
          s"$knobHint"
      })
    }
}
