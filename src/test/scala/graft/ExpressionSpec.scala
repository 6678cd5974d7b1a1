package graft

import graft.functions.{Entropy, GraftFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expressions: codegen'd shannon_entropy and the
  * scan_signatures Generator, from both the Column API and SQL.
  */
class ExpressionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("shannon_entropy matches the pure function and stays codegen'd") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq("aaaa", "abcd", "aabb").toDF("s")
      .select(col("s"), call_function("shannon_entropy", col("s").cast("binary")).as("e"))
    val rows = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("aaaa") == 0.0)
    assert(math.abs(rows("abcd") - 2.0) < 1e-12)
    assert(math.abs(rows("aabb") - 1.0) < 1e-12)
    assert(rows("abcd") == Entropy.shannon("abcd".getBytes))
    // the plan should not contain a BatchEvalPython/ScalaUDF node
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"))
  }

  test("scan_signatures generator works from SQL") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((1L, "xxJPGyy"), (2L, "JPG and JPG")).toDF("id", "s")
      .withColumn("data", col("s").cast("binary"))
      .createOrReplaceTempView("blobs")
    // pattern "JPG" = 4A5047
    val rows = spark.sql(
      """SELECT id, byte_offset, pattern_idx
        |FROM blobs LATERAL VIEW scan_signatures(data, '4A5047') t
        |ORDER BY id, byte_offset""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 0L), (2L, 8L)))
    assert(rows.forall(_.getInt(2) == 0))
  }

  test("scan_signatures with multiple patterns") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, "ABxCD")).toDF("id", "s").withColumn("data", col("s").cast("binary"))
      .createOrReplaceTempView("b2")
    val rows = spark.sql(
      "SELECT byte_offset, pattern_idx FROM b2 LATERAL VIEW scan_signatures(data, '4142,4344') t ORDER BY byte_offset")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(rows == Seq((0L, 0), (3L, 1)))
  }

  test("salted join spreads a hot key and matches the plain join") {
    import spark.implicits._
    // one hot key: 10k rows of key "hot", a few of others
    val big = (Seq.fill(10000)("hot") ++ Seq("a", "b", "c")).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("key", "v")
    val small = Seq(("hot", "H"), ("a", "A"), ("b", "B")).toDF("key", "label")
    val salted = graft.llm.Skew.saltedJoin(big, small, "key", 8)
    val plain = big.join(small, Seq("key"))
    assert(salted.count() == plain.count())
    assert(salted.agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0) ==
      plain.agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0))
  }

  test("salted aggregate equals direct aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (Seq.fill(5000)("hot") ++ Seq.fill(7)("cold")).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("key", "v")
    val salted = graft.llm.Skew.saltedAggregate(df, "key", 8,
      partials = Seq(sum("v").as("s"), count(lit(1)).as("c")),
      finals = Seq(sum("s").as("total"), sum("c").as("n")))
      .orderBy("key").collect()
    val direct = df.groupBy("key").agg(sum("v").as("total"), count(lit(1)).as("n"))
      .orderBy("key").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      direct.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("collapsed LSH dedup skips duplicate texts too short to shingle") {
    import spark.implicits._
    // docs 0-3 share a long text (shingles exist -> pairs); docs 10-12
    // share a 2-word text (no trigram shingles -> the naive per-doc LSH
    // produces no signature, hence NO pairs; the collapsed form must agree)
    val docs = (
      (0L to 3L).map(i => (i, "the quick brown fox jumps over the lazy dog")) ++
      (10L to 12L).map(i => (i, "hi there"))
    ).toDF("doc_id", "t")
    val pairs = graft.llm.Dedup.collapsedLshPairs(docs, "doc_id", "t", 3, 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("spark-ml MinHashLSH variant finds duplicate groups") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      val tail = if (i % 2 == 0) "alpha beta gamma delta epsilon zeta" else "one two three four five six"
      (i.toLong, s"$tail shared suffix tokens here")
    }.toDF("doc_id", "t")
    val sh = graft.llm.Dedup.shingles(docs, "doc_id", "t", 3)
    val pairs = graft.llm.Dedup.minHashLshMl(sh, numHashTables = 4, maxDistance = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // same-parity docs are identical texts -> must appear as candidates
    assert(pairs.forall { case (a, b) => (a % 2) == (b % 2) || true })
    assert(pairs.exists { case (a, b) => a % 2 == 0 && b % 2 == 0 })
    assert(pairs.exists { case (a, b) => a % 2 == 1 && b % 2 == 1 })
    // cross-parity pairs are far (distance > 0.4) and must be absent
    assert(!pairs.exists { case (a, b) => (a % 2) != (b % 2) })
  }
}
