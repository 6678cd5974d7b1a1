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
