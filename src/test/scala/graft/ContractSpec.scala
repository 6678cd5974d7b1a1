package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver contract on [[SparkEntry]]: the flagship entry query
  * returns rows on the smoke scale factor, every oracle key names a
  * registered query, and every query's plan ANALYZES with unique,
  * non-empty column names (duplicate or empty names would break the
  * driver's sorted-column hash compare before any value is read).
  * Schema resolution only — execution is Verify's job.
  */
class ContractSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-contract-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("entry() returns rows at the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0L)
  }

  test("every oracle key names a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without a query: $missing")
  }

  test("depth-sample filter matches an independent JVM md5 of the key") {
    // The sf0.1 depth compare subsamples documents/embeddings with
    // `substr(md5(CAST(key AS STRING)),1,1) <= digit` evaluated by BOTH
    // engines (Spark here, DuckDB in tools/depth_compare.py). Pin the
    // predicate's semantics against java.security MD5 over the UTF-8 key
    // string — if all three agree on bytes-in/hex-out, the two engines
    // see identical sampled inputs.
    import org.apache.spark.sql.functions.col
    val docs = graft.queries.Registry.table(spark, dir, "documents")
    val kept = graft.queries.Registry.depthSample(docs, "documents", Some("1"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    val all = docs.select(col("doc_id")).collect().map(_.getLong(0))
    val expected = all.filter { id =>
      val h = md.digest(id.toString.getBytes("UTF-8"))
      val d = "%02x".format(h(0) & 0xff).charAt(0)
      d == '0' || d == '1'
    }.toSet
    assert(kept == expected, s"sampled set diverges: ${kept.size} vs ${expected.size}")
    assert(kept.nonEmpty && kept.size < all.length)
    // unknown digit rejected; non-sampled tables untouched
    intercept[IllegalArgumentException] {
      graft.queries.Registry.depthSample(docs, "documents", Some("z"))
    }
    val ords = graft.queries.Registry.table(spark, dir, "orders")
    assert(graft.queries.Registry.depthSample(ords, "orders", Some("0")) eq ords)
  }

  test("Registry.table normalizes every events-timestamp vintage to µs TimestampType") {
    // The driver's events.parquet has shipped ts as TIMESTAMP(NANOS)
    // (read as Long under the legacy conf), TIMESTAMP_NTZ, and plain
    // TIMESTAMP across rounds; the adapter must normalize all three to
    // the same µs TimestampType values. Synthesize one parquet per
    // vintage and pin both the read type and the normalized instant.
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-events-vintage")
    val micros = 1700000000123456L // 2023-11-14T22:13:20.123456Z
    def readTs(dir: String): (org.apache.spark.sql.types.DataType, Long) = {
      val df = graft.queries.Registry.table(spark, dir, "events")
      val tpe = df.schema("ts").dataType
      val v = df.select(unix_micros(col("ts"))).collect()(0).getLong(0)
      (tpe, v)
    }
    // vintage 1: Long column named ts (what nanosAsLong surfaces) in nanos
    val longDir = s"$base/long"
    spark.range(1).select(lit(micros * 1000L).as("ts"), lit(1L).as("event_id"))
      .write.parquet(s"$longDir/events.parquet")
    // vintage 2: TIMESTAMP_NTZ micros
    val ntzDir = s"$base/ntz"
    spark.range(1)
      .select(timestamp_micros(lit(micros)).cast("timestamp_ntz").as("ts"), lit(1L).as("event_id"))
      .write.parquet(s"$ntzDir/events.parquet")
    // vintage 3: session-zoned TIMESTAMP micros
    val tsDir = s"$base/ts"
    spark.range(1)
      .select(timestamp_micros(lit(micros)).as("ts"), lit(1L).as("event_id"))
      .write.parquet(s"$tsDir/events.parquet")
    for (d <- Seq(longDir, ntzDir, tsDir)) {
      val (tpe, v) = readTs(d)
      assert(tpe == org.apache.spark.sql.types.TimestampType, s"$d read as $tpe")
      assert(v == micros, s"$d normalized to $v, expected $micros")
    }
  }

  test("every query analyzes with unique, non-empty column names") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val cols = fn(spark, dir).schema.fieldNames.toSeq
        val dups = cols.groupBy(identity).collect { case (c, g) if g.size > 1 => c }
        if (cols.isEmpty || cols.exists(_.trim.isEmpty) || dups.nonEmpty)
          Some(s"$name: cols=$cols dups=${dups.toList}")
        else None
      } catch {
        case e: Exception => Some(s"$name: analysis failed: ${e.getMessage.take(120)}")
      }
    }
    assert(bad.isEmpty, s"driver-contract violations:\n${bad.mkString("\n")}")
  }
}
