package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator-level query module; each entry has
  * an exact DuckDB oracle in `oracleSql` when the semantics are
  * SQL-expressible (carve/binary operators get rows-only checks).
  */
object SparkEntry {

  private def allDefs: Map[String, QueryDef] =
    RelationalQueries.defs ++ ArtefactQueries.defs ++ CarveQueries.defs ++ LlmQueries.defs ++ BrowserQueries.defs ++ EventQueries.defs ++ SketchQueries.defs ++ ProfileQueries.defs ++ BridgeQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full scan→overlap-dedup→carve DAG over synthesized evidence.
    */
  def entry(spark: SparkSession): DataFrame =
    allDefs("q40_carve_pipeline").fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
