package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
