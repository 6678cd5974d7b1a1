package graft

import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Spark-upgrade canary for the explode(array(...)) optimizer-barrier
  * idiom — the one place a Spark version bump is meant to fail LOUDLY.
  *
  * Three operators depend on a 1-element Generate to keep an expensive
  * expression out of pushed-down Filter/Join conditions (the q286
  * lesson: without the barrier the optimizer inlined the interpreted
  * Viterbi DP below a distinct() and re-ran it once per corpus TOKEN —
  * 496 s vs 2 s at sf0.1):
  *
  *  - [[graft.llm.TextAnalysis.unigramEncode]] (the suffix-DP /
  *    walk chain),
  *  - [[graft.llm.Dedup.jaccardJoin]]'s dense regime (the
  *    `graft_mask_inter` popcount kernel),
  *  - [[graft.llm.Dedup.weightedJaccardJoin]]'s dense regime (the
  *    `graft_wisect` merge-walk kernel).
  *
  * Both the barrier and the PlanSpec regex pins encode optimizer
  * internals, so this suite runs all three operators across the 2×2
  * (AQE on/off × whole-stage codegen on/off) matrix and asserts, per
  * cell: row-identity with the default-config run, the barrier
  * Generate's survival in the executed plan, and that no Filter/Join
  * line inlined the guarded kernel. A Spark upgrade that re-plans the
  * idiom breaks exactly one suite, here, with the failing config named.
  */
class BarrierCanarySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-barrier-canary")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Run `op` under the given optimizer configs; return (sorted rows,
    * final executed plan). Caches are dropped after each run so no
    * config serves another's materialized frames.
    */
  private def run(aqe: Boolean, codegen: Boolean)
                 (op: => DataFrame): (Seq[String], String) = {
    val a0 = spark.conf.get("spark.sql.adaptive.enabled")
    val c0 = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      val df = op
      val rows = df.collect().map(_.toString).sorted.toSeq
      (rows, df.queryExecution.executedPlan.toString)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", a0)
      spark.conf.set("spark.sql.codegen.wholeStage", c0)
      graft.llm.CacheRegistry.releaseAll(spark)
      spark.catalog.clearCache()
    }
  }

  private val configs =
    Seq((true, true), (true, false), (false, true), (false, false))

  /** The canary core: default-config baseline, then every other cell
    * must match rows and keep the barrier; `kernelMarkers` must not
    * appear in any Filter/Join plan line (inlined = pushed below the
    * barrier); `extraPlanCheck` hosts operator-specific pins.
    */
  private def canary(name: String, kernelMarkers: Seq[String],
                     requireBarrier: Boolean = true)
                    (op: => DataFrame): Unit = {
    val results = configs.map { case (aqe, cg) =>
      (s"aqe=$aqe codegen=$cg", run(aqe, cg)(op))
    }
    val (baseTag, (baseRows, _)) = results.head
    assert(baseRows.nonEmpty, s"[$name] fixture returned no rows")
    results.foreach { case (tag, (rows, plan)) =>
      assert(rows === baseRows,
        s"[$name][$tag] rows diverged from [$baseTag]")
      if (requireBarrier)
        assert(plan.contains("Generate explode"),
          s"[$name][$tag] explode-array barrier missing from the plan:\n$plan")
      val offenders = plan.linesIterator.filter(l =>
        (l.contains("Filter") || l.contains("Join")) &&
          kernelMarkers.exists(l.contains)).toSeq
      assert(offenders.isEmpty,
        s"[$name][$tag] guarded kernel inlined below the barrier:\n" +
          offenders.mkString("\n"))
    }
  }

  test("unigramEncode survives the AQE × codegen matrix with its barrier intact") {
    import spark.implicits._
    val vocab = Seq(("a", 1L, 10L), ("b", 1L, 20L), ("ab", 1L, 25L))
      .toDF("piece", "cnt", "cost_micro")
    val docs = Seq((1L, "ab aab ab b a ab"), (2L, "ba abab a"))
      .toDF("id", "text")
    // the DP fold may legitimately appear in a Filter only via the
    // Generate outputs (graft_e#N / graft_ps#N) — PlanSpec's offender
    // class; here the marker is the raw fold text itself
    canary("unigramEncode", Seq("aggregate(sequence(1, length")) {
      graft.llm.TextAnalysis.unigramEncode(docs, "id", "text", vocab, 4)
    }
  }

  test("unigramEncodeSampled survives the AQE × codegen matrix with its barrier intact") {
    import spark.implicits._
    // the sampled walk stacks THREE barriered stages (suffix mass
    // chain, weight table, per-occurrence walk) — same hazard class as
    // unigramEncode, plus the md5-uniform walk must stay identical
    // across configs (a re-planned walk that re-evaluates the draw
    // would still be row-stable only if deterministic end to end)
    val vocab = Seq(("a", 1L, 1000000L), ("b", 1L, 2000000L), ("ab", 1L, 1500000L))
      .toDF("piece", "cnt", "cost_micro")
    val docs = Seq((1L, "ab aab ab b a ab"), (2L, "ba abab a"))
      .toDF("id", "text")
    // the operator's barriered expression stages (mass chain + weight
    // table) execute behind an RDD boundary — the consumer-facing plan
    // ends at a Scan ExistingRDD, so the Generate pin can't be read off
    // it; row-identity across the matrix is the meaningful canary here
    // (each cell re-runs the WHOLE job, chains included, under that
    // optimizer config), and the deterministic draw makes any re-plan
    // that changes the arithmetic fail loudly as row divergence
    canary("unigramEncodeSampled", Seq("aggregate(sequence(1, length"),
        requireBarrier = false) {
      graft.llm.TextAnalysis.unigramEncodeSampled(docs, "id", "text", vocab,
        maxPiece = 4, alphaNum = 1L, alphaDen = 2L, seed = "canary")
    }
  }

  test("jaccardJoin (dense regime) survives the AQE × codegen matrix") {
    import spark.implicits._
    // small vocab + tiny corpus → the dense bitmask regime (the
    // barrier-carrying path); includes an exact-dup pair so the
    // canonical-text collapse contributes same-text rows too
    val docs = Seq(
      (1L, "apple banana cherry dates"),
      (2L, "apple banana cherry plums"),
      (3L, "apple banana cherry dates"),
      (4L, "walnut almond pecan cashew"),
      (5L, "walnut almond pecan dates"),
      (6L, "unrelated words entirely here")).toDF("id", "text")
    canary("jaccardJoin", Seq("graft_mask_inter")) {
      Dedup.jaccardJoin(docs, "id", "text", 5000L)
    }
  }

  test("weightedJaccardJoin (dense regime) survives the AQE × codegen matrix") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana cherry dates"),
      (2L, "apple banana cherry plums"),
      (3L, "apple banana cherry dates"),
      (4L, "walnut almond pecan cashew"),
      (5L, "walnut almond pecan dates"),
      (6L, "unrelated words entirely here")).toDF("id", "text")
    canary("weightedJaccardJoin", Seq("graft_wisect")) {
      Dedup.weightedJaccardJoin(docs, "id", "text", 5000L)
    }
  }
}
