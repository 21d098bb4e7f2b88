package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality report (the deequ-shaped surface a curation
  * pipeline runs before promoting a snapshot): row-level predicates,
  * key-uniqueness, and referential-integrity checks, evaluated in as few
  * passes as the check types allow and emitted as one tidy
  * `(check, n_rows, n_violations)` table.
  *
  * Cost model: ALL row predicates share ONE partial+final aggregate over
  * the fact table (a `sum(when(!p, 1))` per check — adding a predicate
  * adds a column, not a pass); each uniqueness check is one
  * distinct-count aggregate on its key; each referential check is one
  * left-anti-join count against the (broadcastable) parent key set. At
  * 100 TB the predicate section is a single scan, which is why checks
  * are batched into one report instead of asserted one-by-one.
  */
object DataQuality {

  /** `rowChecks`: (name, predicate that GOOD rows satisfy).
    * `uniqueKeys`: (name, key columns that must be jointly unique) —
    * violations = n_rows − n_distinct(keys).
    * `refChecks`: (name, child key column, parent key set) — violations =
    * child rows (null or) absent from the parent. */
  def report(df: DataFrame,
             rowChecks: Seq[(String, Column)],
             uniqueKeys: Seq[(String, Seq[String])] = Seq.empty,
             refChecks: Seq[(String, String, DataFrame)] = Seq.empty): DataFrame = {
    require(rowChecks.nonEmpty || uniqueKeys.nonEmpty || refChecks.nonEmpty,
      "at least one check")
    val spark = df.sparkSession
    import spark.implicits._

    val nRows = df.count()
    val rowPart: Seq[(String, Long)] = if (rowChecks.isEmpty) Seq.empty else {
      val aggs = rowChecks.map { case (name, pred) =>
        sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(name)
      }
      val row = df.agg(aggs.head, aggs.tail: _*).collect().head
      rowChecks.zipWithIndex.map { case ((name, _), i) =>
        name -> (if (row.isNullAt(i)) 0L else row.getLong(i))
      }
    }
    val uniqPart = uniqueKeys.map { case (name, keys) =>
      val distinct = df.select(keys.map(col): _*).distinct().count()
      name -> (nRows - distinct)
    }
    val refPart = refChecks.map { case (name, childKey, parent) =>
      val parentKeys = parent.select(col(parent.columns.head).as("_pk_")).distinct()
      val bad = df.select(col(childKey).as("_ck_"))
        .join(parentKeys, col("_ck_") === col("_pk_"), "left_anti")
        .count()
      name -> bad
    }
    (rowPart ++ uniqPart ++ refPart)
      .map { case (name, viol) => (name, nRows, viol) }
      .toDF("check", "n_rows", "n_violations")
  }

  /** Benford first-digit audit (Newcomb 1881 / Benford 1938, public —
    * the standard fabricated-data smell test): observed leading-digit
    * shares of a positive integer column against the log10(1 + 1/d)
    * law. Naturally-occurring multiplicative quantities follow it;
    * uniform synthetics and hand-typed figures don't — both deviations
    * are the signal, so the report just lays shares side by side.
    *
    * Engine portability: the leading digit comes from the integer's
    * STRING form (integer-to-decimal-string is exact everywhere, unlike
    * float formatting), observed shares are integer ppm divisions, and
    * the expected share is log10 rounded to 1e-6 BEFORE comparison (the
    * bm01 ln discipline). One grouped aggregate — scan-bound. Output:
    * (digit INT, n_obs, obs_ppm, exp_ppm), digits 1-9. */
  def benfordReport(df: DataFrame, valCol: String): DataFrame = {
    val v = col(valCol).cast("long")
    df.where(v > 0)
      .select(substring(v.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
      .withColumn("obs_ppm",
        expr("(1000000 * n_obs) div sum(n_obs) over ()"))
      .withColumn("exp_ppm",
        expr("cast(round(log10(1.0 + 1.0 / digit) * 1000000) as bigint)"))
  }

  /** k-anonymity / l-diversity risk report (Sweeney 2002; Machanavajjhala
    * et al. 2007 — the standard publishable-data gates): every
    * quasi-identifier equivalence class with its size and the number of
    * distinct sensitive values it exposes. A class smaller than `k` means
    * those rows re-identify by joining the quasi columns against any
    * public roster; a class with fewer than `l` sensitive values leaks the
    * attribute even when identity stays hidden (everyone in the class
    * shares it). Training-data curation runs this before releasing any
    * aggregate or sample keyed on demographic-shaped columns.
    *
    * NULL in a quasi column is its own class (SQL GROUP BY semantics — the
    * conservative read: "unknown" still partitions the roster); NULL
    * sensitive values don't count toward diversity
    * (`count(DISTINCT)` semantics on both engines).
    *
    * Plan: one partial+final aggregate on the quasi key (count +
    * distinct-count), no joins, no windows — a single shuffle of
    * class-cardinality rows at any scale. Output: quasi columns +
    * (class_size, n_sensitive, k_anonymous, l_diverse), one row per
    * equivalence class. */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
                       sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"need k >= 1 and l >= 1, got k=$k l=$l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_anonymous", col("class_size") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }

  /** Recursive (c,l)-diversity (Machanavajjhala et al., "l-Diversity:
    * Privacy Beyond k-Anonymity", ICDE 2006 §4.2) — the stronger
    * criterion [[kAnonymityReport]]'s distinct-count misses: a class
    * whose sensitive values are 98 % "flu" is trivially 2-"diverse" yet
    * leaks the attribute with 98 % confidence. With per-class sensitive
    * frequencies sorted descending r₁ ≥ r₂ ≥ … ≥ r_m, the class is
    * (c,l)-diverse iff  r₁ < c · (r_l + r_{l+1} + … + r_m)  — the most
    * common value must not dominate the tail beyond factor `c`. Classes
    * with fewer than `l` distinct values fail by definition (the tail
    * sum is empty). `c` is passed as the exact rational cNum/cDen so the
    * test is pure integer: r₁·cDen < cNum·tail replays on any engine.
    *
    * NULL sensitive values are excluded (consistent with the distinct
    * count above); frequency ties broken by value so the "top" value is
    * deterministic even when r₁ ties.
    *
    * Plan: one (quasi, sensitive) count aggregate, one per-class
    * descending-frequency window for rank, one class rollup —
    * everything keyed on the class, nothing global. Output: quasi
    * columns + (class_size, n_sensitive, top_freq, tail_freq,
    * cl_diverse), one row per class. */
  def recursiveLDiversity(df: DataFrame, quasiCols: Seq[String],
                          sensitiveCol: String, l: Int,
                          cNum: Long, cDen: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(l >= 2, s"recursive (c,l)-diversity needs l >= 2, got $l")
    require(cNum > 0 && cDen > 0, "c must be a positive rational")
    val freq = df.where(col(sensitiveCol).isNotNull)
      .groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("_f_"))
    val w = Window.partitionBy(quasiCols.map(col): _*)
      .orderBy(col("_f_").desc, col(sensitiveCol))
    freq.withColumn("_rk_", row_number().over(w))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("_f_")).as("class_size"),
        count(lit(1)).as("n_sensitive"),
        max(when(col("_rk_") === 1, col("_f_"))).as("top_freq"),
        sum(when(col("_rk_") >= l, col("_f_")).otherwise(0L)).as("tail_freq"))
      .withColumn("cl_diverse",
        col("n_sensitive") >= l &&
          col("top_freq") * cDen < lit(cNum) * col("tail_freq"))
  }

  /** t-closeness (Li/Li/Venkatasubramanian, ICDE 2007) for a CATEGORICAL
    * sensitive attribute — the distributional criterion the frequency
    * tests above miss: a class is t-close when the total-variation
    * distance between ITS sensitive-value distribution and the GLOBAL
    * one is ≤ t, so a class can't reveal "this neighborhood is mostly
    * flu" even when it is k-anonymous and l-diverse.
    *
    * Distributions are PER-MILLE QUANTIZED before the distance: each
    * value's class share `p_v = (1000·f_cv) div n_class` and global
    * share `q_v = (1000·f_gv) div N` are exact integers, and
    * `tvd_milli = (Σ_v |p_v − q_v|) div 2` — so the metric replays
    * bit-identically on any engine at ANY scale (no product ever
    * exceeds 1000·count; exact-rational TVD would need count×count×1000
    * products that overflow BIGINT near 10⁹ rows). Values absent from a
    * class contribute their full q_v, folded in WITHOUT materializing
    * absent (class, value) rows: Σ_absent q_v = Σ_all q_v − Σ_present
    * q_v, with Σ_all q_v a global scalar. Quantization error is < 1‰
    * per distinct sensitive value — report t in milli against the same
    * quantized metric.
    *
    * NULL sensitive values are excluded (the [[kAnonymityReport]]
    * convention). Plan: one (quasi, sensitive) aggregate, one sensitive
    * aggregate, one broadcast join of per-value global counts onto the
    * class-value rows, one class rollup — every shuffle keyed, the only
    * broadcast the distinct-sensitive-value table. Output: quasi cols +
    * (class_size, tvd_milli, t_close), one row per class. */
  def tClosenessReport(df: DataFrame, quasiCols: Seq[String],
                       sensitiveCol: String, tMilli: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(tMilli >= 0, s"tMilli must be >= 0, got $tMilli")
    val rows = df.where(col(sensitiveCol).isNotNull)
    val cv = rows.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("_fcv_"))
    val gv = rows.groupBy(col(sensitiveCol))
      .agg(count(lit(1)).as("_fgv_"))
    val tot = gv.agg(sum(col("_fgv_")).as("_N_"))
    val gq = gv.crossJoin(broadcast(tot))
      .select(col(sensitiveCol),
        expr("(1000 * _fgv_) div _N_").as("_q_"))
    val sumQ = gq.agg(sum(col("_q_")).as("_sq_"))
    cv.join(broadcast(gq), sensitiveCol)
      .groupBy(quasiCols.map(col): _*)
      // p_v needs the CLASS total, known only after the rollup — so the
      // rollup carries the (f_cv, q_v) terms (bounded by the categorical
      // sensitive domain, never row-sized) and the quantized |p − q|
      // finishes row-locally in one array fold
      .agg(sum(col("_fcv_")).as("class_size"),
        sum(col("_fcv_")).as("_n_"),
        sum(col("_q_")).as("_qpres_"),
        collect_list(struct(col("_fcv_"), col("_q_"))).as("_terms_"))
      .crossJoin(broadcast(sumQ))
      .withColumn("tvd_milli", expr(
        """(aggregate(_terms_,
          |   CAST(0 AS BIGINT),
          |   (acc, t) -> acc + abs((1000 * t._fcv_) div _n_ - t._q_))
          | + _sq_ - _qpres_) div 2""".stripMargin))
      .select((quasiCols.map(col) :+ col("class_size") :+
        col("tvd_milli") :+
        (col("tvd_milli") <= tMilli).as("t_close")): _*)
  }
}
