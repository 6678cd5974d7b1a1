package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the contract gate a
  * pipeline runs before promoting a snapshot (the shape of Deequ's
  * VerificationSuite / dbt tests, as plain exact aggregations):
  * each check reports its violation COUNT, not just pass/fail, so a
  * 100-TB run distinguishes "3 bad rows, quarantine them" from
  * "half the table is broken, stop the promotion".
  *
  * Every check is one map-side-combinable aggregation over only the
  * columns it names (parquet column pruning keeps each branch's scan
  * narrow); the branches are independent members of a union, so Spark
  * schedules them concurrently. Nothing collects, nothing sorts.
  *
  * NULL semantics, identical on the DuckDB oracle: [[Checks.NotNull]]
  * counts NULLs; set and range checks PASS NULL rows (completeness is
  * NotNull's job — the Deequ convention, keeping each violation count
  * attributable to exactly one broken contract).
  */
object Checks {

  sealed trait Check { def label: String }

  /** Column must have no NULLs. */
  final case class NotNull(column: String) extends Check {
    val label = s"not_null($column)"
  }

  /** The column tuple must be unique; violations = surplus duplicate
    * rows (Σ per-group count−1 over groups seen more than once).
    */
  final case class Unique(columns: Seq[String]) extends Check {
    val label = s"unique(${columns.mkString(",")})"
  }

  /** Non-NULL values must belong to the given set. */
  final case class InSet(column: String, values: Seq[String]) extends Check {
    val label = s"in_set($column)"
  }

  /** Non-NULL values (try_cast to BIGINT) must lie in [lo, hi]. A
    * non-NULL value whose cast FAILS (a non-numeric string) is a
    * violation — it certainly isn't in the range, and counting it here
    * keeps it from slipping through the NotNull/InRange seam invisibly.
    */
  final case class InRange(column: String, lo: Long, hi: Long) extends Check {
    val label = s"in_range($column,$lo,$hi)"
  }

  /** Run every check; returns (check, n_violations, passed 0/1) in the
    * given check order (attach an ORDER BY check downstream for a
    * stable report).
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    checks.map { c =>
      val viol: DataFrame = c match {
        case NotNull(column) =>
          df.agg(coalesce(sum(when(col(column).isNull, 1L).otherwise(0L)),
            lit(0L)).as("n_violations"))
        case Unique(columns) =>
          df.groupBy(columns.map(col): _*)
            .agg(count(lit(1)).as("graft_n"))
            .filter(col("graft_n") > 1)
            .agg(coalesce(sum(col("graft_n") - 1), lit(0L)).as("n_violations"))
        case InSet(column, values) =>
          df.agg(coalesce(sum(when(
            col(column).isNotNull && !col(column).isin(values: _*),
            1L).otherwise(0L)), lit(0L)).as("n_violations"))
        case InRange(column, lo, hi) =>
          // try_cast (never throws under ANSI): NULL cast of a non-NULL
          // value = unparseable = a violation, not an invisible row
          val c = expr(s"try_cast(`$column` AS BIGINT)")
          df.agg(coalesce(sum(when(
            col(column).isNotNull && (c.isNull || c < lo || c > hi),
            1L).otherwise(0L)), lit(0L)).as("n_violations"))
      }
      viol.select(lit(c.label).as("check_name"), col("n_violations"),
        (col("n_violations") === 0L).cast("long").as("passed"))
    }.reduce(_ unionAll _)
  }

  /** Per-column profile — row count, NULL count, distinct count — the
    * completeness/cardinality summary a schema registry keeps per
    * snapshot. One branch per column so each parquet scan reads ONE
    * column; distinct counts are exact (a HLL approximation at scale
    * is [[Sketches.hllSketch]]'s job, with error bounds attached).
    */
  def columnProfile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "at least one column")
    columns.map { c =>
      df.agg(count(lit(1)).as("n_rows"),
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_null"),
          countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"))
    }.reduce(_ unionAll _)
  }
}
