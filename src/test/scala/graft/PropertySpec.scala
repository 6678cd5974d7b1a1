package graft

import graft.llm.{Curation, Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Seeded randomized properties: each distributed operator is compared
  * against an independent single-threaded reference implementation over
  * many generated cases. Cases are batched into one DataFrame per
  * property (disjoint groups / id ranges), so each property is a single
  * Spark action.
  */
class PropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-property-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("packGreedy matches a sequential fold reference on random strata") {
    import spark.implicits._
    val rnd = new Random(42)
    val rows = (0 until 40).flatMap { g =>
      val n = 1 + rnd.nextInt(30)
      (0 until n).map(i => (s"g$g", (g * 1000 + i).toLong, 1L + rnd.nextInt(900)))
    }
    val cap = 1000L
    val got = Curation.packGreedy(rows.toDF("lang", "doc_id", "toks"), "lang", "doc_id", "toks", cap)
      .select("lang", "doc_id", "bin", "fill_after")
      .as[(String, Long, Long, Long)].collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      var bin = 0L; var fill = 0L
      rs.sortBy(_._2).map { case (_, id, t) =>
        if (fill + t > cap && fill > 0L) { bin += 1; fill = t } else fill += t
        (g, id, bin, fill)
      }
    }.toSet
    assert(got == want)
  }

  test("connectedComponents matches a union-find reference on random graphs") {
    import spark.implicits._
    val rnd = new Random(7)
    // 12 disjoint random graphs, offset id ranges, one edge list
    val edges = (0 until 12).flatMap { g =>
      val base = g * 1000L
      val nodes = 2 + rnd.nextInt(28)
      val nEdges = 1 + rnd.nextInt(40)
      (0 until nEdges).map { _ =>
        (base + rnd.nextInt(nodes), base + rnd.nextInt(nodes))
      }.filter { case (a, b) => a != b }
    }
    // threshold 0 forces the distributed propagation path; the driver
    // union-find path is the reference computed below
    val got = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b", smallGraphThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    // union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    assert(got == want)
  }

  test("quantizeInt8 matches direct computation on random vectors") {
    import spark.implicits._
    val rnd = new Random(11)
    val vecs = (0 until 100).map(i => (i.toLong, Array.fill(16)((rnd.nextFloat() - 0.5f) * 4f)))
    val got = Similarity.quantizeInt8(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .select("id", "q8").as[(Long, String)].collect().toMap
    vecs.foreach { case (id, v) =>
      val scale = v.map(x => math.abs(x.toDouble)).max
      val want = v.map { x =>
        if (scale == 0.0) 0L
        else new java.math.BigDecimal(x.toDouble * 127.0 / scale)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      }.mkString(",")
      assert(got(id) == want, s"vec $id")
    }
  }

  test("repetitionStats matches a naive reference on random word lists") {
    import spark.implicits._
    val rnd = new Random(5)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (0 until 60).map { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = Curation.repetitionStats(docs.toDF("id", "text"), "id", "text")
      .select("id", "total_words", "distinct_words", "top_bigram", "top_bigram_n")
      .as[(Long, Long, Long, String, Long)].collect().map(r => r._1 -> r).toMap
    docs.foreach { case (id, text) =>
      val ws = text.split(" ").toSeq
      val bgs = ws.sliding(2).map(_.mkString(" ")).toSeq
      val counts = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (bg, n) = counts.toSeq.sortBy { case (g, c) => (-c, g) }.head
      val want = (id, ws.size.toLong, ws.distinct.size.toLong, bg, n)
      assert(got(id) == want, s"doc $id")
    }
  }

  test("TopKSmallestAgg matches sort-take under random inputs and random splits") {
    val rnd = new Random(11)
    (0 until 200).foreach { _ =>
      val k = 1 + rnd.nextInt(8)
      val agg = new graft.llm.TopKSmallestAgg(k)
      val xs = Seq.fill(rnd.nextInt(30))((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      // random tree of partial buffers merged together — simulates
      // arbitrary partitioning of the input across map tasks
      val chunks = xs.grouped(1 + rnd.nextInt(5)).toSeq
      val merged = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == xs.sorted.take(k))
    }
  }

  test("funnel matches a sequential walk reference on random event streams") {
    import spark.implicits._
    val rnd = new Random(13)
    val stages = Seq("view", "click", "purchase")
    val types = stages ++ Seq("error", "signup")
    val events = (0 until 80).flatMap { u =>
      (0 until 1 + rnd.nextInt(25)).map { _ =>
        (u.toLong, rnd.nextInt(50).toLong, types(rnd.nextInt(types.size)))
      }
    }
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val df = events.map { case (u, s, ty) => (u, ts(s * 1000000L), ty) }
      .toDF("user_id", "ts", "event_type")
    val got = graft.operators.EventAnalytics
      .funnel(df, "user_id", "ts", "event_type", stages)
      .select("user_id", "stage", "t0_us", "t1_us", "t2_us")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Seq(2, 3, 4).map(i =>
        if (r.isNullAt(i)) None else Some(r.getLong(i))))).toMap
    events.groupBy(_._1).foreach { case (u, evs) =>
      var times = Vector.empty[Long]
      evs.map { case (_, s, ty) => (s * 1000000L, ty) }.sorted.foreach { case (us, ty) =>
        val i = times.length
        if (i < stages.length && ty == stages(i) && (i == 0 || us > times(i - 1)))
          times = times :+ us
      }
      val want = (times.length.toLong,
        (0 until 3).map(i => times.lift(i)))
      assert(got(u) == want, s"user $u: got ${got(u)}, want $want")
    }
  }

  test("kmeansStep matches an exact sequential Lloyd reference on random vectors") {
    import spark.implicits._
    val rnd = new Random(19)
    val dims = 12
    val vecs = (0L until 80L).map { id =>
      (id, Array.fill(dims)((rnd.nextFloat() * 2 - 1) * 3f))
    }
    val k = 5
    val got = Similarity.kmeansStep(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // sequential reference with the IDENTICAL integer arithmetic
    def quant(x: Float): Long =
      new java.math.BigDecimal(x.toDouble * 10000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val seeds = vecs.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(k).map(_._2.map(quant))
    val assigned = vecs.map { case (_, v) =>
      val q = v.map(quant)
      val dists = seeds.map(s => s.zip(q).map { case (a, b) => (b - a) * (b - a) }.sum)
      (dists.zipWithIndex.minBy { case (d, j) => (d, j) }._2.toLong, q)
    }
    val want = assigned.groupBy(_._1).flatMap { case (c, members) =>
      (0 until dims).map { d =>
        val s = members.map(_._2(d)).sum
        val n = members.size.toLong
        // HALF_UP mean on the exact rational s/n in scaled units — the
        // same integer form the operator (and its oracle) now evaluate
        val meanScaled = s.sign * ((2L * s.abs + n) / (2L * n))
        (c, d.toLong) -> ((n, meanScaled.toDouble / 10000.0))
      }
    }
    assert(got.keySet == want.keySet, "cluster/dim key sets differ")
    got.foreach { case (key, (n, mean)) =>
      assert(want(key)._1 == n, s"$key size: got $n want ${want(key)._1}")
      assert(math.abs(want(key)._2 - mean) < 1e-9, s"$key mean: got $mean want ${want(key)._2}")
    }
  }

  test("crossGroupSegmentOverlap matches a set-intersection reference on random corpora") {
    import spark.implicits._
    val rnd = new Random(23)
    val vocab = Vector("a", "b", "c")
    val docs = (0 until 80).map { i =>
      val n = 1 + rnd.nextInt(12)
      (s"src${rnd.nextInt(6)}", (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val got = Dedup.crossGroupSegmentOverlap(docs.toDF("source", "text"), "source", "text", 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val segSets = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap(d => d._2.split(" ").grouped(2).map(_.mkString(" "))).toSet
    }
    val srcs = segSets.keys.toSeq.sorted
    val want = (for {
      ai <- srcs.indices; bi <- (ai + 1) until srcs.length
      shared = (segSets(srcs(ai)) intersect segSets(srcs(bi))).size
      if shared > 0
    } yield (srcs(ai), srcs(bi)) -> shared.toLong).toMap
    assert(got == want)
  }

  test("segmentDedup matches a sequential first-occurrence reference on random corpora") {
    import spark.implicits._
    val rnd = new Random(11)
    val vocab = Vector("a", "b", "c", "d")
    val segWords = 3
    // small vocab + short segments → heavy cross-doc segment collisions
    val docs = (0L until 60L).map { id =>
      val n = 1 + rnd.nextInt(17)
      id -> (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val got = Dedup.segmentDedup(docs.toDF("doc_id", "text"), "doc_id", "text", segWords)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.getString(3))))).toMap
    // sequential reference: walk docs in (id, position) order, keep a
    // segment iff its text was never seen before
    val seen = scala.collection.mutable.HashSet.empty[String]
    val want = docs.map { case (id, text) =>
      val segs = text.split(" ").grouped(segWords).map(_.mkString(" ")).toSeq
      val kept = segs.filter(seen.add)
      id -> ((segs.length.toLong, kept.length.toLong,
        if (kept.isEmpty) None else Some(kept.mkString(" "))))
    }.toMap
    assert(got == want)
    // global invariant: kept segments across the corpus == distinct segments
    assert(got.values.map(_._2).sum == seen.size.toLong)
  }

  test("vector kernels are bit-identical to the higher-order-function expressions they replaced") {
    import spark.implicits._
    graft.functions.VecFunctions.register(spark)
    val rnd = new Random(7)
    // random float vectors incl. negatives, tiny magnitudes, exact ints
    val vecs = (0 until 200).map { _ =>
      Array.fill(16)((rnd.nextGaussian() * math.pow(10, rnd.nextInt(4) - 2)).toFloat)
    }
    val df = vecs.map(v => Tuple1(v)).toDF("v").repartition(4)
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val planes = (0 until 12).flatMap(_ => (0 until 16).map(_ =>
      if (rnd.nextBoolean()) 1.0 else -1.0)).toArray
    val hofBucket = (0 until 12).map { j =>
      val p = typedLit(planes.slice(j * 16, (j + 1) * 16))
      when(aggregate(zip_with(col("v"), p, (x, pp) => x.cast("double") * pp),
        lit(0.0), (acc, x) => acc + x) > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
    val bad = df.select(
      // dot/norm: kernel vs HOF fold (same index order from 0.0)
      (call_function("graft_dot", col("v"), col("v")) =!= hofDot(col("v"), col("v"))).as("d"),
      (call_function("graft_norm", col("v")) =!= sqrt(hofDot(col("v"), col("v")))).as("n"),
      // scaling: kernel vs engine round expression
      (call_function("graft_scale_q", col("v"), lit(10000.0)) =!=
        transform(col("v"), x => round(x.cast("double") * 10000.0).cast("long"))).as("s"),
      // LSH bucket: kernel vs per-plane HOF projections
      (call_function("graft_lsh_bucket", col("v"), typedLit(planes)) =!= hofBucket).as("b"))
      .filter(col("d") || col("n") || col("s") || col("b")).count()
    assert(bad == 0L, s"$bad random vectors diverged between kernel and HOF forms")
  }

  test("pqCodes/sqDistTop2 match a driver-side argmin reference on random codebooks") {
    import spark.implicits._
    graft.functions.VecFunctions.register(spark)
    val rnd = new Random(11)
    val dim = 12
    val cb = Array.fill(7)(Array.fill(dim)(rnd.nextInt(2001).toLong - 1000))
    val cbFlat = cb.flatten // m=1 layout == [c][dim]
    val vecs = (0 until 300).map(i => (i.toLong, Array.fill(dim)(rnd.nextInt(2001).toLong - 1000)))
    val got = vecs.toDF("id", "sv")
      .select(col("id"),
        element_at(call_function("graft_pq_codes", col("sv"), typedLit(cbFlat), lit(1)), 1).as("code"),
        call_function("graft_sqdist_top2", col("sv"), typedLit(cbFlat),
          typedLit(cb.indices.map(_.toLong).toArray)).as("t2"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Long](2).toList))).toMap
    vecs.foreach { case (id, v) =>
      val d2 = cb.map(c => c.zip(v).map { case (a, b) => val t = b - a; t * t }.sum)
      val order = d2.zipWithIndex.sortBy { case (d, i) => (d, i) }
      val (code, t2) = got(id)
      assert(code == order(0)._2.toLong, s"vec $id argmin mismatch")
      assert(t2 == List(order(0)._2.toLong, order(0)._1, order(1)._2.toLong, order(1)._1),
        s"vec $id top2 mismatch")
    }
  }

  test("scaleQ fails a non-finite component with a typed error, like ANSI cast") {
    import spark.implicits._
    graft.functions.VecFunctions.register(spark)
    val df = Seq(Tuple1(Array(1.5f, Float.NaN))).toDF("v")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    // the expression form raises CAST_OVERFLOW under Spark 4's default
    // ANSI mode; the kernel raises its matching typed error (previously
    // a bare NumberFormatException from BigDecimal.valueOf)
    val eExpr = intercept[Exception] {
      df.select(transform(col("v"), x => round(x.cast("double") * 100.0).cast("long")))
        .collect()
    }
    assert(messages(eExpr).exists(_.contains("CAST_OVERFLOW")))
    val eKernel = intercept[Exception] {
      df.select(call_function("graft_scale_q", col("v"), lit(100.0))).collect()
    }
    assert(messages(eKernel).exists(_.contains("non-finite component")),
      s"expected the kernel's typed error, got: $eKernel")
  }

  test("sqDistTop2 rejects a 1-centroid codebook with the contract, not AIOOBE") {
    import spark.implicits._
    graft.functions.VecFunctions.register(spark)
    val e = intercept[Exception] {
      Seq((1L, Array(1L, 2L, 3L))).toDF("id", "sv")
        .select(call_function("graft_sqdist_top2", col("sv"),
          typedLit(Array(0L, 0L, 0L)), typedLit(Array(0L))))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("needs >= 2 centroids")),
      s"expected the n>=2 contract, got: $e")
  }

  test("jaccardJoin matches a brute-force reference on random corpora, both regimes") {
    import spark.implicits._
    val rnd = new Random(1307)
    // random small-vocab corpus: dup classes, empty-ish docs, skewed sizes
    val vocab = (0 until 24).map(i => s"t$i")
    val docs = (0L until 60L).map { id =>
      val n = 1 + rnd.nextInt(12)
      val toks = (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
      (id, toks.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val want = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      sa = ta.split(" ").toSet; sb = tb.split(" ").toSet
      inter = (sa & sb).size.toLong; union = (sa | sb).size.toLong
      if 10000L * inter >= 6000L * union
    } yield (a, b, inter, union, (20000 * inter + union) / (2 * union))).sorted
    def run(): Seq[(Long, Long, Long, Long, Long)] =
      Dedup.jaccardJoin(df, "doc_id", "text", 6000L)
        .orderBy("id_a", "id_b")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val dense = run()
    graft.llm.CacheRegistry.releaseAll(spark)
    spark.conf.set("graft.jaccard.denseVocabMax", "0")
    val sparse = try run() finally {
      spark.conf.unset("graft.jaccard.denseVocabMax")
      graft.llm.CacheRegistry.releaseAll(spark)
    }
    assert(want.nonEmpty && dense == want && sparse == want)
  }

  test("bandedHammingPairs (fp32) is lossless vs brute force on random fps incl. negatives") {
    import spark.implicits._
    val rnd = new Random(7331)
    // fingerprints clustered so hamming<=3 pairs actually occur; every
    // value sign-extended-from-Int half the time
    val base = Seq.fill(6)(rnd.nextLong() & 0xFFFFFFFFL)
    val fps = (0L until 48L).map { id =>
      val b = base(rnd.nextInt(base.size))
      val flips = rnd.nextInt(4)
      val v = (0 until flips).foldLeft(b)((acc, _) => acc ^ (1L << rnd.nextInt(32)))
      val signed = if (rnd.nextBoolean() && (v & 0x80000000L) != 0L)
        v | 0xFFFFFFFF00000000L else v
      (id, signed)
    }
    val got = graft.llm.Multimodal
      .fp32NearDupPairs(fps.toDF("id", "fp"), "id", "fp", maxHamming = 3)
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
    val want = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      ham = java.lang.Long.bitCount((fa & 0xFFFFFFFFL) ^ (fb & 0xFFFFFFFFL))
      if ham <= 3
    } yield (a, b, ham.toLong)).sorted
    assert(want.nonEmpty && got == want)
  }

  test("bpeTrain matches a sequential reference trainer on random corpora") {
    import graft.llm.TextAnalysis
    import spark.implicits._
    val rnd = new Random(29)
    // small alphabet + repeated structure so merges actually compete
    def word(): String =
      (0 until 2 + rnd.nextInt(6)).map(_ => "abcd".charAt(rnd.nextInt(4))).mkString
    for (trial <- 0 until 3) {
      val docs = (0 until 12).map(_ =>
        (0 until 3 + rnd.nextInt(8)).map(_ => word()).mkString(" "))
      // sequential reference: exact counts, (n desc, a asc, b asc) ties,
      // greedy left-to-right merge
      var vocab: Map[List[String], Long] = docs.flatMap(_.split(" "))
        .filter(_.length >= 2).groupBy(identity)
        .map { case (w, ws) => w.toList.map(_.toString) -> ws.length.toLong }
      val want = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
      var step = 1
      var go = true
      while (step <= 6 && go) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        vocab.foreach { case (syms, f) =>
          syms.sliding(2).filter(_.size == 2).foreach { p =>
            val k = (p(0), p(1)); counts(k) = counts.getOrElse(k, 0L) + f }
        }
        if (counts.isEmpty) go = false
        else {
          val ((a, b), n) = counts.minBy { case ((pa, pb), pn) => (-pn, pa, pb) }
          want += ((step.toLong, a, b, a + b, n))
          vocab = vocab.groupBy { case (syms, _) =>
            val out = scala.collection.mutable.ListBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += a + b; i += 2
              } else { out += syms(i); i += 1 }
            }
            out.toList
          }.map { case (syms, entries) => syms -> entries.values.sum }
          step += 1
        }
      }
      for (threshold <- Seq(0L, 100000L)) { // distributed and driver paths
        val got = TextAnalysis.bpeTrain(
            docs.toDF("text"), "text", merges = 6, smallVocabThreshold = threshold)
          .as[(Long, String, String, String, Long)].collect().toSeq
        assert(got == want.toSeq, s"trial $trial threshold $threshold")
        graft.llm.CacheRegistry.releaseAll(spark)
      }
    }
  }

  test("unigramTrainVocab matches a brute-force-enumeration EM reference on random corpora") {
    import graft.llm.TextAnalysis
    import spark.implicits._
    val rnd = new Random(47)
    def lnr(x: Long): Long =
      new java.math.BigDecimal(math.log(x.toDouble) * 1000000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    for (trial <- 0 until 3) {
      val maxPiece = 3 + (trial % 2)
      def word(): String =
        (0 until 1 + rnd.nextInt(7)).map(_ => "abc".charAt(rnd.nextInt(3))).mkString
      val words = (0 until 8 + rnd.nextInt(8)).map(_ => word()).distinct
      val docs = (0 until 10).map(_ =>
        (0 until 2 + rnd.nextInt(6)).map(_ => words(rnd.nextInt(words.length)))
          .mkString(" "))
      val (vocabSize, mult, iters) = (8, 2, 2)
      // reference E-step: enumerate EVERY segmentation, min BIGINT key,
      // tie → lexicographically smallest piece-length sequence (what
      // the operator's smallest-j greedy walk produces by construction)
      def canonicalPieces(w: String, costs: Map[String, Long]): List[String] = {
        def segs(s: String): List[List[String]] =
          if (s.isEmpty) List(Nil)
          else (1 to math.min(maxPiece, s.length)).toList.flatMap { j =>
            val p = s.substring(0, j)
            if (costs.contains(p)) segs(s.substring(j)).map(p :: _) else Nil
          }
        val all = segs(w)
        assert(all.nonEmpty, s"word $w must be coverable")
        val key = (ps: List[String]) => ps.map(costs(_) * 100000L + 1L).sum
        val best = all.map(key).min
        all.filter(key(_) == best)
          .minBy(_.map(_.length))(Ordering.Implicits.seqOrdering[List, Int])
      }
      val freqs = docs.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
      // reference seed = the (already oracle-pinned) distributed seed
      var ref = TextAnalysis.unigramSeedVocab(docs.toDF("text"), "text",
          vocabSize * mult, maxPiece)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      val nChars = ref.count(_._1.length == 1)
      implicit val utf8: Ordering[String] = graft.core.Utf8Order.stringOrdering
      for (r <- 1 to iters) {
        val costs = ref.map(v => v._1 -> v._3).toMap
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        freqs.foreach { case (w, f) =>
          canonicalPieces(w, costs).foreach(p =>
            counts(p) = counts.getOrElse(p, 0L) + f)
        }
        val cap = (vocabSize - nChars) +
          (vocabSize.toLong * (mult - 1) * (iters - r) / iters).toInt
        val counted = ref.map { case (p, _, _) => (p, counts.getOrElse(p, 0L)) }
        val kept = counted.filter(_._1.length == 1) ++
          counted.filter(_._1.length > 1)
            .sortBy { case (p, c) => (-c, p) }(Ordering.Tuple2(implicitly, utf8))
            .take(math.max(cap, 0))
        val t = kept.map { case (_, c) => math.max(c, 1L) }.sum
        ref = kept.map { case (p, c) => (p, c, lnr(t) - lnr(math.max(c, 1L))) }
      }
      val got = TextAnalysis.unigramTrainVocab(docs.toDF("text"), "text",
          vocabSize, maxPiece, iters, mult)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        .sortBy(_._1)(utf8)
      assert(got == ref.sortBy(_._1)(utf8),
        s"trial $trial maxPiece $maxPiece:\n got $got\nwant ${ref.sortBy(_._1)(utf8)}")
      graft.llm.CacheRegistry.releaseAll(spark)
    }
  }

  test("containmentJoin matches a set-intersection reference on random corpora") {
    import spark.implicits._
    val rnd = new Random(31)
    val docs = (0L until 25L).map { i =>
      (i, (0 until 3 + rnd.nextInt(15)).map(_ => s"t${rnd.nextInt(30)}")
        .distinct.mkString(" "))
    }
    val sets = docs.map { case (id, t) => id -> t.split(" ").toSet }.toMap
    val t = 7000L
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      ni = (sets(a) & sets(b)).size.toLong
      na = sets(a).size.toLong; nb = sets(b).size.toLong
      if 10000L * ni >= t * math.min(na, nb)
    } yield (a, b, ni, na, nb,
      (20000L * ni + na) / (2L * na), (20000L * ni + nb) / (2L * nb))).toSeq.sorted
    val got = Dedup.containmentJoin(docs.toDF("doc_id", "text"), "doc_id", "text", t)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(want.nonEmpty && got == want)
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("aucFromScores matches the brute-force pairwise definition on random labels") {
    import spark.implicits._
    val rnd = new Random(77)
    for (trial <- 0 until 5) {
      val rows = (0 until 40 + rnd.nextInt(60)).map { _ =>
        (rnd.nextInt(12).toLong - 4L, if (rnd.nextInt(3) == 0) 1L else 0L)
      }
      val (np, nn) = (rows.count(_._2 == 1L).toLong, rows.count(_._2 == 0L).toLong)
      val pos = rows.filter(_._2 == 1L).map(_._1)
      val neg = rows.filter(_._2 == 0L).map(_._1)
      // AUC = P(s_pos > s_neg) + P(tie)/2 over all pos×neg pairs
      val wins = (for (p <- pos; n <- neg) yield
        if (p > n) 2L else if (p == n) 1L else 0L).sum
      val wantBp =
        if (np == 0 || nn == 0) -1L
        else (2L * 10000L * wins + 2L * np * nn) / (2L * 2L * np * nn)
      val got = Curation.aucFromScores(rows.toDF("score", "label"), "score", "label")
        .as[(Long, Long, Long)].collect().head
      assert(got == ((np, nn, wantBp)), s"trial $trial: got $got want ($np,$nn,$wantBp)")
    }
  }

  test("temperatureMixture allocations always sum exactly to the budget") {
    import spark.implicits._
    val rnd = new Random(91)
    for (trial <- 0 until 4) {
      val srcs = (0 until 2 + rnd.nextInt(8)).map(i => (s"s$i", 1L + rnd.nextInt(100000)))
      val budget = 1L + rnd.nextInt(1000000)
      val got = Curation.temperatureMixture(srcs.toDF("source", "toks"),
          "source", "toks", budget)
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      assert(got.map(_._5).sum == budget, s"trial $trial: $got")
      // isqrt weights are monotone in token count
      val byToks = got.sortBy(_._2)
      assert(byToks.map(_._3) == byToks.map(_._3).sorted, s"trial $trial: $got")
      graft.llm.CacheRegistry.releaseAll(spark)
    }
  }

  test("shardChecksums agrees with shardPlan on shape and with a fold reference on sums") {
    import spark.implicits._
    val rnd = new Random(13)
    val docs = (0L until 60L).map(i =>
      (s"s${i % 3}", i, s"d$i w${rnd.nextInt(5)}", 1L + rnd.nextInt(40)))
    val df = docs.toDF("source", "doc_id", "text", "toks")
    val plan = Curation.shardPlan(df, "source", "doc_id", "toks", 100L)
      .select("source", "shard_ix", "n_docs", "shard_tokens")
      .as[(String, Long, Long, Long)].collect().toSet
    val sums = Curation.shardChecksums(df, "source", "doc_id", "toks", "text", 100L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(sums.map(r => (r._1, r._2, r._3, r._4)).toSet == plan)
    // reference: sequential per-source walk with md5-48 sums
    def h48(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(6).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
    }
    val want = docs.groupBy(_._1).toSeq.flatMap { case (src, rs) =>
      var cum = 0L
      rs.sortBy(_._2).map { case (_, _, text, toks) =>
        val shard = cum / 100L; cum += toks
        ((src, shard), h48(text))
      }
    }.groupBy(_._1).map { case ((src, shard), hs) => (src, shard, hs.map(_._2).sum) }.toSet
    assert(sums.map(r => (r._1, r._2, r._5)).toSet == want)
  }

  test("labelPropagation driver and distributed paths agree on random graphs") {
    import spark.implicits._
    val rnd = new Random(55)
    for (trial <- 0 until 3) {
      val n = 6 + rnd.nextInt(6)
      val edges = (0 until n * 2).map { _ =>
        (s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}", 1L + rnd.nextInt(5))
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("s", "d", "w")
        val driver = graft.operators.GraphOps.labelPropagation(df, "s", "d", "w", iters = 4)
          .orderBy("node").as[(String, String)].collect().toSeq
        graft.llm.CacheRegistry.releaseAll(spark)
        val dist = graft.operators.GraphOps.labelPropagation(df, "s", "d", "w", iters = 4,
            smallGraphThreshold = 0L)
          .orderBy("node").as[(String, String)].collect().toSeq
        assert(driver == dist, s"trial $trial diverged on ${edges}")
        graft.llm.CacheRegistry.releaseAll(spark)
      }
    }
  }

  test("triangleCounts matches a brute-force reference on random graphs") {
    import spark.implicits._
    val rnd = new Random(19)
    for (trial <- 0 until 3) {
      val n = 12 + rnd.nextInt(10)
      val edges = (0 until 60).map(_ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      val und = edges.filter { case (a, b) => a != b }
        .map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct.toSet
      val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
      // brute force: every unordered node triple with all three edges
      val triples = nodes.combinations(3).count { c =>
        val Seq(x, y, z) = c.sorted
        und((x, y)) && und((x, z)) && und((y, z))
      }
      val perNode = nodes.map { v =>
        val t = nodes.combinations(2).count { p =>
          val Seq(x, y) = p.sorted
          x != v && y != v &&
            und(if (x < v) (x, v) else (v, x)) &&
            und(if (y < v) (y, v) else (v, y)) && und((x, y))
        }
        v -> t.toLong
      }.toMap
      val got = graft.operators.GraphOps
        .triangleCounts(edges.toDF("s", "d"), "s", "d")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      graft.llm.CacheRegistry.releaseAll(spark)
      assert(got.map(_._3).sum == 3L * triples,
        s"trial $trial: total triangle credits ${got.map(_._3).sum} != 3*$triples")
      got.foreach { case (v, _, t) =>
        assert(t == perNode(v), s"trial $trial node $v: got $t want ${perNode(v)}")
      }
    }
  }

  test("kCore matches sequential peeling to the fixpoint on random graphs") {
    import spark.implicits._
    val rnd = new Random(23)
    for (trial <- 0 until 3) {
      val n = 14 + rnd.nextInt(8)
      val k = 2 + rnd.nextInt(2)
      val edges = (0 until 50).map(_ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      var und = edges.filter { case (a, b) => a != b }
        .map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct.toSet
      // sequential peel to fixpoint
      var changed = true
      while (changed) {
        val deg = und.toSeq.flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).map { case (v, xs) => v -> xs.size }
        val keep = deg.filter(_._2 >= k).keySet
        val nxt = und.filter { case (a, b) => keep(a) && keep(b) }
        changed = nxt != und
        und = nxt
      }
      val want = und.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
      // 16 rounds ≥ any peel chain at these sizes; both the driver
      // fast path (default cutoff) and the distributed peel (cutoff 0)
      // must match the sequential reference
      val got = graft.operators.GraphOps
        .kCore(edges.toDF("s", "d"), "s", "d", k, iters = 16)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == want, s"trial $trial (k=$k): got $got want $want")
      val dist = graft.operators.GraphOps
        .kCore(edges.toDF("s", "d"), "s", "d", k, iters = 16,
          smallGraphThreshold = 0L)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(dist == want, s"trial $trial (k=$k) distributed: got $dist want $want")
      spark.catalog.clearCache()
    }
  }

  test("kllQuantiles is exact while streams fit their level-0 buffers") {
    import spark.implicits._
    val rnd = new Random(31)
    val vals = (0L until 200L).map(i => (i, rnd.nextInt(1000000).toLong))
    val df = vals.toDF("id", "v")
    val probes = Seq(0L, 2500L, 5000L, 7500L, 10000L)
    val got = graft.llm.Sketches.kllQuantiles(df, "id", "v", probes, k = 64, parts = 4)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val sorted = vals.map(_._2).sorted
    val want = probes.map { bp =>
      val target = math.max(1L, (2L * bp * 200L + 10000L) / 20000L)
      (bp, sorted((target - 1).toInt), 200L)
    }
    assert(got == want, s"small-n sketch must be exact:\ngot  $got\nwant $want")
  }

  test("kllQuantiles is deterministic under physical re-arrangement") {
    import spark.implicits._
    val rnd = new Random(53)
    val vals = (0L until 5000L).map(i => (i, rnd.nextInt(100000).toLong))
    val probes = Seq(1000L, 5000L, 9000L)
    def run(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      graft.llm.Sketches.kllQuantiles(df, "id", "v", probes, k = 32, parts = 8)
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val a = run(vals.toDF("id", "v"))
    // reversed insertion order + different physical partitioning must
    // not move a single estimate: the sketch is content-addressed
    val b = run(vals.reverse.toDF("id", "v").repartition(13))
    assert(a == b, s"sketch depends on physical layout:\n$a\n$b")
  }

  test("kllQuantiles rank error stays within the MRL envelope on random data") {
    import spark.implicits._
    val rnd = new Random(77)
    for (trial <- 0 until 3) {
      val n = 20000 + rnd.nextInt(20000)
      val k = 128
      val parts = 8
      val vals = (0L until n.toLong).map(i => (i, rnd.nextInt(1 << 28).toLong))
      val sorted = vals.map(_._2).sorted
      val probes = Seq(500L, 2500L, 5000L, 7500L, 9500L)
      val got = graft.llm.Sketches
        .kllQuantiles(vals.toDF("id", "v"), "id", "v", probes, k, parts)
        .as[(Long, Long, Long)].collect().toSeq
      assert(got.forall(_._3 == n.toLong), s"trial $trial lost rows: $got")
      // deterministic-MRL additive rank error ~ levels·n/k; pin 2x
      // slack so scheduler-independent regressions fail loudly without
      // flaking on the bias constant
      val levels = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n.toLong / k))
      val bound = math.max(1L, 2L * levels * n.toLong / k)
      got.foreach { case (bp, est, _) =>
        val target = math.max(1L, (2L * bp * n + 10000L) / 20000L)
        // rank range of est in the exact sorted data (ties span a range)
        val lo = sorted.indexWhere(_ >= est) + 1L
        val hi = sorted.lastIndexWhere(_ <= est) + 1L
        val err =
          if (target < lo) lo - target
          else if (target > hi) target - hi
          else 0L
        assert(err <= bound,
          s"trial $trial probe $bp: est $est rank [$lo,$hi] vs target $target, err $err > bound $bound")
      }
      graft.llm.CacheRegistry.releaseAll(spark)
    }
  }

  test("trimmedMean matches a sequential reference on random groups incl. negatives") {
    import spark.implicits._
    val rnd = new Random(1097)
    val rows = (0 until 25).flatMap { g =>
      val n = 1 + rnd.nextInt(60)
      (0 until n).map(i =>
        (s"g$g", rnd.nextLong() % 100000L, (g * 1000 + i).toLong))
    }
    val trimBp = 700L
    val got = graft.llm.Profiling.trimmedMean(
        rows.toDF("g", "v", "id"), "g", "v", "id", trimBp)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
      .toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(t => (t._2, t._3)).sortBy(identity)
      val n = sorted.length.toLong
      val cut = n * trimBp / 10000L
      val kept = sorted.slice(cut.toInt, (n - cut).toInt).map(_._1)
      val sum = kept.sum
      val mean = math.signum(sum) *
        ((2000L * math.abs(sum) + kept.length) / (2L * kept.length))
      assert(got(g) === ((n, kept.length.toLong, sum, mean)), s"group $g")
    }
  }

  test("burst/CUSUM detectors match sequential references on random daily series") {
    import spark.implicits._
    val rnd = new Random(4243)
    // random sparse daily series per type: day-of-epoch → count
    val series = (0 until 12).map { t =>
      val days = (1 to 28).filter(_ => rnd.nextBoolean())
      (s"t$t", days.map(d => d -> (1 + rnd.nextInt(20))))
    }
    val events = series.flatMap { case (tp, days) =>
      days.flatMap { case (d, n) =>
        (0 until n).map(_ => (tp,
          java.sql.Timestamp.valueOf(f"2024-03-$d%02d 10:00:00")))
      }
    }.toDF("event_type", "ts")
    // burstDays reference
    val burst = graft.operators.EventAnalytics
      .burstDays(events, "event_type", "ts", trail = 7, thresholdBp = 30000L)
      .collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5), r.getBoolean(6))))
      .toMap
    series.foreach { case (tp, days) =>
      if (days.nonEmpty) {
        val ordered = days.sortBy(_._1)
        ordered.zipWithIndex.foreach { case ((d, n), i) =>
          val trail = ordered.slice(math.max(0, i - 7), i).map(_._2.toLong)
          val ts = trail.sum
          val ratio =
            if (trail.isEmpty) -1L
            else (20000L * n * trail.length + ts) / (2L * ts)
          val key = (tp, f"2024-03-$d%02d")
          assert(burst(key) === ((n.toLong, ts, trail.length.toLong, ratio,
            ratio >= 30000L && ratio >= 0L)), s"burst $key")
        }
      }
    }
    // cusumChangePoint reference
    val cp = graft.operators.EventAnalytics
      .cusumChangePoint(events, "event_type", "ts")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDate(2).toString,
        r.getLong(3), r.getLong(4))))
      .toMap
    series.foreach { case (tp, days) =>
      if (days.nonEmpty) {
        val ordered = days.sortBy(_._1)
        val dd = ordered.length.toLong
        val tot = ordered.map(_._2.toLong).sum
        var acc = 0L
        val cusums = ordered.map { case (d, n) => acc += n * dd - tot; (d, acc) }
        val best = cusums.maxBy { case (d, c) => (math.abs(c), -d) }
        assert(cp(tp) === ((dd, f"2024-03-${best._1}%02d", best._2,
          math.abs(best._2))), s"cusum $tp")
      }
    }
  }

  test("fuzzyBlockedPairs is lossless vs all-pairs on random two-token names") {
    import spark.implicits._
    val rnd = new Random(777)
    val firsts = Seq("red", "blue", "teal")
    val alphabet = "abcd"
    def word() = (0 until 1 + rnd.nextInt(9))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val names = (0 until 120).map(_ => s"${firsts(rnd.nextInt(3))} ${word()}")
    val got = graft.llm.Dedup.fuzzyBlockedPairs(names.toDF("name"), "name", maxDist = 2)
      .select("val_a", "val_b", "dist")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(identity).toSeq
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val distinct = names.distinct.sorted
    val want = (for {
      a <- distinct; b <- distinct
      if a < b && a.split(" ").head == b.split(" ").head
      d = lev(a, b) if d <= 2
    } yield (a, b, d.toLong)).sortBy(identity)
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("madOutlierReport matches a sorted-array reference on random groups") {
    import spark.implicits._
    val rnd = new Random(91)
    val rows = (0 until 30).flatMap { g =>
      val n = 1 + rnd.nextInt(40)
      (0 until n).map(_ => (s"g$g", (rnd.nextInt(200) - 50).toLong))
    }
    val got = graft.llm.Profiling
      .madOutlierReport(rows.toDF("g", "v"), "g", "v", kNum = 3L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((s.length - 1) / 2) // rank ⌈n/2⌉, 1-indexed
    }
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val vs = rs.map(_._2)
      val med = lowerMedian(vs)
      val mad = lowerMedian(vs.map(v => math.abs(v - med)))
      g -> ((vs.length.toLong, med, mad,
        vs.count(v => math.abs(v - med) > 3 * mad).toLong))
    }
    assert(got === want)
  }

  test("equiDepthHistogram boundaries equal sorted-rank reference on random data") {
    import spark.implicits._
    val rnd = new Random(92)
    val rows = (0 until 20).flatMap { g =>
      val n = 1 + rnd.nextInt(50)
      (0 until n).map(_ => (s"g$g", rnd.nextInt(30).toLong))
    }
    val B = 5
    val got = graft.llm.Profiling
      .equiDepthHistogram(rows.toDF("g", "v"), "g", "v", nBuckets = B)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        r.getAs[Long]("upper_value")).toMap
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val s = rs.map(_._2).sorted
      (1 to B).map { b =>
        val rank = (b.toLong * s.length + B - 1) / B // ⌈b·n/B⌉
        (g, b.toLong) -> s((rank - 1).toInt)
      }
    }
    assert(got === want)
  }

  test("ksStatistic matches the brute-force max CDF gap on random samples") {
    import spark.implicits._
    val rnd = new Random(93)
    val a = (0 until 80).map(_ => rnd.nextInt(25).toLong)
    val b = (0 until 60).map(_ => 5L + rnd.nextInt(25))
    val got = graft.llm.Profiling
      .ksStatistic(a.toDF("v"), b.toDF("v"), "v").collect().head
    val values = (a ++ b).distinct.sorted
    val gaps = values.map { v =>
      val fa = a.count(_ <= v).toLong * b.length
      val fb = b.count(_ <= v).toLong * a.length
      (math.abs(fa - fb), v)
    }
    val dMax = gaps.map(_._1).max
    val atV = gaps.filter(_._1 == dMax).map(_._2).min
    val den = a.length.toLong * b.length
    assert(got.getAs[Long]("ks_bp") === (20000 * dMax + den) / (2 * den))
    assert(got.getAs[Long]("at_value") === atV)
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("applyChangelog matches a last-writer-wins map fold on random logs") {
    import spark.implicits._
    val rnd = new Random(94)
    val base = (1L to 60L).map(k => (k, s"base$k"))
    // random changelog: unique (key, seq) pairs, ops weighted to upserts
    val changes = (0 until 200).map { i =>
      val k = 1L + rnd.nextInt(80) // keys beyond base → inserts
      val op = if (rnd.nextInt(4) == 0) "D" else "U"
      (k, s"p$i", i.toLong, op)
    }
    val got = graft.operators.CdcApply.applyChangelog(
        base.toDF("k", "payload"),
        changes.toDF("k", "payload", "seq", "op"), Seq("k"), "seq", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = changes.groupBy(_._1).map { case (k, cs) =>
      val last = cs.maxBy(_._3)
      k -> (if (last._4 == "D") None else Some(last._2))
    }
    val expect = (base.map { case (k, p) =>
      k -> want.getOrElse(k, Some(p))
    } ++ want.filterNot { case (k, _) => base.exists(_._1 == k) }.toSeq)
      .collect { case (k, Some(p)) => k -> p }.toMap
    assert(got === expect)
  }

  test("duplicatedSpans matches a brute-force span map on random small docs") {
    import spark.implicits._
    val rnd = new Random(57)
    val vocab = Vector("a", "b", "c", "d")
    val k = 3
    val docs = (1L to 50L).map { i =>
      val n = rnd.nextInt(10) // 0..9 tokens: includes the under-k edge
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = graft.llm.Dedup.duplicatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // reference: every k-token window as a plain string, cross-doc sets
    val spans = docs.map { case (id, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      id -> (if (ws.length >= k) ws.sliding(k).map(_.mkString(" ")).toSeq
             else Seq.empty)
    }
    val byGram = spans.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    spans.foreach { case (id, ss) =>
      val dup = ss.count(g => byGram(g) >= 2)
      assert(got(id) === ((ss.size.toLong, dup.toLong)),
        s"doc $id: got ${got(id)}, want (${ss.size}, $dup)")
    }
    graft.llm.CacheRegistry.releaseAll(spark)
  }
}
