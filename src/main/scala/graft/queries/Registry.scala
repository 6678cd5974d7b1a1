package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: the Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle over the
  * same parquet tables. Column names/types must match exactly — the
  * driver sorts columns by name and hash-compares values.
  */
final case class QueryDef(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object Registry {
  /** Read one driver-provided table from the given sf directory.
    *
    * `events.parquet` stores TIMESTAMP(NANOS) which Spark 4 refuses to
    * read natively; we read nanos as Long (legacy conf) and convert to a
    * µs TimestampType column — the driver data is µs-aligned, and DuckDB
    * reads the same values at µs precision, so results stay comparable.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
