package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The crawl frontier (fourth PersistedIndex instantiation): build /
  * probe / fenced+ledgered append / replay idempotence / crash windows
  * on both sides of the ledger line / compaction equivalence, plus the
  * streaming discovery batch that closes the crawl loop.
  */
class FrontierSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-frontier-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import graft.llm.Frontier

  private def urls(ids: Long*) = {
    import spark.implicits._
    ids.map(i => s"https://site$i.example/p/$i").toDF("url")
  }

  private def probeIds(dir: String, ids: Seq[Long]): Set[Long] =
    Frontier.probeNew(urls(ids: _*), "url", dir)
      .collect().map(_.getString(0)).map(u =>
        u.split("/").last.toLong).toSet

  test("build → probe → append → probe (membership grows by exactly the append)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-frontier").toString + "/f"
    Frontier.buildFrontier(urls(1L, 2L, 3L), "url", dir, numBuckets = 4)
    assert(Frontier.indexExists(dir))
    assert(probeIds(dir, 1L to 6L) === Set(4L, 5L, 6L))
    Frontier.appendToFrontier(urls(4L, 5L), "url", dir)
    assert(probeIds(dir, 1L to 6L) === Set(6L))
    // duplicate keys in an append are harmless to membership
    Frontier.appendToFrontier(urls(5L, 6L), "url", dir)
    assert(probeIds(dir, 1L to 8L) === Set(7L, 8L))
    // a fresh session path: compaction dedups physically and answers
    // stay identical
    Frontier.compactFrontier(spark, dir)
    assert(probeIds(dir, 1L to 8L) === Set(7L, 8L))
    val files = new java.io.File(s"$dir/keys").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files <= 4, s"compaction must leave one file per bucket, got $files")
  }

  test("ledgered append crash windows: before the line re-runs, after it skips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-frontier-cw").toString + "/f"
    Frontier.buildFrontier(urls(1L), "url", dir, numBuckets = 2)
    val ledger = new java.io.File(dir, "ledg")
    // crash BEFORE the ledger line: fence up (detectable), nothing
    // committed — the frontier refuses probes until rebuilt/cleared
    spark.conf.set("graft.test.crashPoint", "frontier_append_before_ledger")
    intercept[RuntimeException] {
      Frontier.appendToFrontier(urls(2L), "url", dir, Some((ledger, 7L)))
    }
    spark.conf.set("graft.test.crashPoint", "")
    assert(!Frontier.indexExists(dir), "fence must be up")
    intercept[IllegalArgumentException] { probeIds(dir, Seq(1L)) }
    // the fence carries the batch id but the ledger does NOT — this is
    // a genuinely incomplete append; clearCompletedAppendFence must
    // refuse (the ledger is the proof of completion, not the fence)
    // ... the caller's contract is: only clear when the LEDGER holds
    // the id. Simulate the correct recovery: re-run the append after
    // clearing the incomplete fence manually (rebuild-or-retry).
    new java.io.File(dir, "_graft_frontier_pending").delete()
    Frontier.appendToFrontier(urls(2L), "url", dir, Some((ledger, 7L)))
    assert(probeIds(dir, Seq(1L, 2L, 3L)) === Set(3L))
    // crash AFTER the ledger line: the append completed; the replay
    // proves it from the ledger and clears the stale fence
    spark.conf.set("graft.test.crashPoint", "frontier_append_after_ledger")
    intercept[RuntimeException] {
      Frontier.appendToFrontier(urls(3L), "url", dir, Some((ledger, 8L)))
    }
    spark.conf.set("graft.test.crashPoint", "")
    assert(!Frontier.indexExists(dir), "fence must be up after the crash")
    assert(Frontier.clearCompletedAppendFence(dir, 8L))
    assert(Frontier.indexExists(dir))
    assert(probeIds(dir, Seq(1L, 2L, 3L, 4L)) === Set(4L))
  }

  test("discovery batches close the loop: extract → probe → manifest → append") {
    import spark.implicits._
    import graft.streaming.IndexIngest
    val base = java.nio.file.Files.createTempDirectory("graft-disc").toString
    val (fdir, mdir) = (s"$base/frontier", s"$base/manifests")
    // seeds: the two URLs batch 0 fetched are already known
    Frontier.buildFrontier(
      Seq("https://a.example/p/0", "https://b.example/p/0").toDF("url"),
      "url", fdir, numBuckets = 2)
    def page(self: String, hrefs: String*) = (self,
      "<html><body>" + hrefs.map(h => s"""<a href="$h">x</a>""").mkString +
        "</body></html>")
    // batch 0: pages link to two new urls, one seen url, one relative,
    // one mailto, one ftp, one javascript-with-authority — only the
    // two new FETCHABLE ones count (and the fetched pages' own urls
    // are already seen)
    val b0 = Seq(
      page("https://a.example/p/0", "https://a.example/p/1",
        "https://b.example/p/0", "/rel/x", "mailto:z@q.example",
        "ftp://files.example/pub", "javascript://c%0aalert(1)"),
      page("https://b.example/p/0", "https://c.example/p/2"))
      .toDF("url", "html")
    assert(IndexIngest.processDiscoveryBatch(b0, 0L, "url", "html",
      fdir, Some(mdir)) === 2L)
    val m0 = spark.read.parquet(s"$mdir/batch_id=0")
      .collect().map(_.getString(0)).toSet
    assert(m0 === Set("https://a.example/p/1", "https://c.example/p/2"))
    // replay of batch 0 is a ledger no-op and leaves the manifest
    assert(IndexIngest.processDiscoveryBatch(b0, 0L, "url", "html",
      fdir, Some(mdir)) === -1L)
    assert(spark.read.parquet(s"$mdir/batch_id=0").count() === 2L)
    // batch 1 fetches the batch-0 manifest: its pages' own urls are
    // new-at-fetch-time but the frontier learned them in batch 0 —
    // only genuinely novel outlinks emit
    val b1 = Seq(
      page("https://a.example/p/1", "https://a.example/p/0",
        "https://d.example/p/3"))
      .toDF("url", "html")
    assert(IndexIngest.processDiscoveryBatch(b1, 1L, "url", "html",
      fdir, Some(mdir)) === 1L)
    assert(spark.read.parquet(s"$mdir/batch_id=1")
      .collect().map(_.getString(0)).toSet === Set("https://d.example/p/3"))
    // convergence: a batch that discovers nothing emits nothing but
    // still ledger-commits
    assert(IndexIngest.processDiscoveryBatch(b1, 2L, "url", "html",
      fdir, Some(mdir)) === 0L)
    // a page whose OWN url the frontier never saw (a redirect's final
    // url): it was just fetched, so it must NOT enter the manifest —
    // but the frontier learns it, so later links to it stay quiet
    val b3 = Seq(page("https://e.example/p/9")).toDF("url", "html")
    assert(IndexIngest.processDiscoveryBatch(b3, 3L, "url", "html",
      fdir, Some(mdir)) === 0L)
    assert(spark.read.parquet(s"$mdir/batch_id=3").count() === 0L)
    val b4 = Seq(page("https://a.example/p/0", "https://e.example/p/9"))
      .toDF("url", "html")
    assert(IndexIngest.processDiscoveryBatch(b4, 4L, "url", "html",
      fdir, Some(mdir)) === 0L)
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("forgetUrls: re-crawl membership flips off, re-learn cancels, compact applies") {
    val dir = java.nio.file.Files.createTempDirectory("graft-frontier-fg").toString + "/f"
    Frontier.buildFrontier(urls(1L, 2L, 3L), "url", dir, numBuckets = 2)
    // forget url 2: it probes as NEW again immediately
    assert(Frontier.forgetUrls(urls(2L), "url", dir) === 1L)
    assert(probeIds(dir, 1L to 3L) === Set(2L))
    // re-learning url 2 cancels the pending forget — otherwise it
    // would re-emit on EVERY later batch despite being present
    Frontier.appendToFrontier(urls(2L), "url", dir)
    assert(probeIds(dir, 1L to 3L) === Set.empty)
    // ALL forgets cancelled → the sidecar dir is REMOVED, not swapped
    // for an empty one (an empty-but-present sidecar would tax every
    // later append and probe forever)
    assert(!new java.io.File(s"$dir/forgotten").exists(),
      "fully-cancelled forget sidecar must be removed")
    // forget again, compact: the delete goes physical and answers
    // stay identical
    assert(Frontier.forgetUrls(urls(3L), "url", dir) === 1L)
    assert(probeIds(dir, 1L to 3L) === Set(3L))
    Frontier.compactFrontier(spark, dir)
    assert(probeIds(dir, 1L to 3L) === Set(3L))
    assert(!new java.io.File(s"$dir/forgotten").exists(),
      "compaction must clear the applied forget sidecar")
    // and a physically-forgotten url re-learns normally
    Frontier.appendToFrontier(urls(3L), "url", dir)
    assert(probeIds(dir, 1L to 3L) === Set.empty)
  }

  test("Discover CLI seeds an empty frontier, discovers, and replays as a no-op") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-disc-cli").toString
    val (pdir, fdir, mdir) = (s"$base/pages", s"$base/frontier", s"$base/out")
    Seq(
      ("https://s.example/p/0",
        """<html><body><a href="https://s.example/p/1">n</a></body></html>"""),
      ("https://t.example/p/0",
        """<html><body><a href="https://s.example/p/0">seen</a></body></html>"""))
      .toDF("url", "html").write.parquet(pdir)
    // first run: seeds the frontier from the pages' own urls, then
    // discovers exactly the one genuinely-new outlink
    assert(Discover.run(spark, pdir, "url", "html", fdir, mdir, 0L) === 1L)
    assert(spark.read.parquet(s"$mdir/batch_id=0")
      .collect().map(_.getString(0)).toSeq === Seq("https://s.example/p/1"))
    // a blind retry of the same batch id is a ledger no-op
    assert(Discover.run(spark, pdir, "url", "html", fdir, mdir, 0L) === -1L)
    // normalizeKeys seeds CANONICAL keys: a resource seeded in a
    // VARIANT form (mixed case, default port, tracking param) and
    // linked canonically from a LATER batch must not re-enter the
    // fetch queue — a raw-keyed seed would never match its canonical
    // twin, so the own-URL suppression of batch 0 cannot mask a
    // seeding gap here
    val (pdir2, fdir2, mdir2) = (s"$base/pages2", s"$base/frontier2", s"$base/out2")
    Seq(("HTTPS://V.EXAMPLE:443/a?utm_source=x", "<html>no links</html>"))
      .toDF("url", "html").write.parquet(pdir2)
    assert(Discover.run(spark, pdir2, "url", "html", fdir2, mdir2, 0L,
      normalizeKeys = true) === 0L)
    val pdir3 = s"$base/pages3"
    Seq(
      ("https://w.example/c",
        """<html><a href="https://v.example/a">seeded-variant</a>""" +
          """<a href="https://v.example/b">new</a></html>"""))
      .toDF("url", "html").write.parquet(pdir3)
    assert(Discover.run(spark, pdir3, "url", "html", fdir2, mdir2, 1L,
      normalizeKeys = true) === 1L)
    assert(spark.read.parquet(s"$mdir2/batch_id=1")
      .collect().map(_.getString(0)).toSeq === Seq("https://v.example/b"))
    // the full scheduler reaches the CLI path: robots drop + domain
    // cap + host priority + schedule columns in one run
    val (pdir4, fdir4, mdir4) = (s"$base/pages4", s"$base/frontier4", s"$base/out4")
    Seq(("https://seed.example/p",
      """<a href="https://gated.example/private/x">g</a>""" +
        """<a href="https://aa.dom.example/1">a</a>""" +
        """<a href="https://hi.dom.example/1">h</a>"""))
      .toDF("url", "html").write.parquet(pdir4)
    val robots = Seq(("gated.example",
      "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"))
      .toDF("host", "robots_txt")
    val prio = Seq(("hi.dom.example", 50L)).toDF("host", "priority")
    assert(Discover.run(spark, pdir4, "url", "html", fdir4, mdir4, 0L,
      robots = Some((robots, "host", "robots_txt")),
      perDomainCap = Some(1), scheduleDelays = Some(1.0),
      hostPriority = Some((prio, "host", "priority"))) === 1L)
    val m4 = spark.read.parquet(s"$mdir4/batch_id=0")
    assert(m4.columns.toSet === Set("url", "priority", "crawl_delay_sec",
      "fetch_slot", "fetch_after_sec"),
      s"manifest must carry priority + schedule columns: ${m4.columns.toSeq}")
    val rows4 = m4.select("url", "priority").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows4 === Seq(("https://hi.dom.example/1", 50L)),
      s"robots must drop, the cap must keep the ranked host: $rows4")
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("discovery batch honors robots and the per-domain cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-frontier-rb").toString
    val (dir, mdir) = (s"$base/f", s"$base/m")
    Frontier.buildFrontier(urls(0L), "url", dir, numBuckets = 2)
    // one fetched page linking: a disallowed URL, 4 same-domain URLs
    // (cap = 2), and one URL on an uncapped domain
    val links = Seq(
      "https://gated.example/private/secret",
      "https://bulk.example/p/1", "https://bulk.example/p/2",
      "https://bulk.example/p/3", "https://bulk.example/p/4",
      "https://open.example/p/1")
      .map(u => s"""<a href="$u">x</a>""").mkString
    val batch = Seq(("https://seed.example/start", s"<html>$links</html>"))
      .toDF("url", "html")
    val robots = Seq(("gated.example",
      "User-agent: *\nDisallow: /private/\n")).toDF("host", "robots_txt")
    val n = graft.streaming.IndexIngest.processDiscoveryBatch(
      batch, 0L, "url", "html", dir, Some(mdir),
      robots = Some((robots, "host", "robots_txt")),
      perDomainCap = Some(2))
    val manifest = spark.read.parquet(s"$mdir/batch_id=0")
      .collect().map(_.getString(0)).toSet
    // the disallowed-but-unseen URL NEVER reaches the manifest
    assert(!manifest.exists(_.contains("gated.example")),
      s"robots-disallowed URL leaked into the manifest: $manifest")
    // the per-domain cap holds: exactly 2 bulk URLs + the open one
    assert(manifest.count(_.contains("bulk.example")) === 2)
    assert(manifest.contains("https://open.example/p/1"))
    assert(n === manifest.size.toLong)
    // the disallowed URL is STICKY-seen (policy drop, re-admitted only
    // via forgetUrls); the cap-overflow URLs stay UNSEEN so a later
    // batch re-considers them
    val reprobe = Frontier.probeNew(Seq(
        "https://gated.example/private/secret",
        "https://bulk.example/p/1", "https://bulk.example/p/2",
        "https://bulk.example/p/3", "https://bulk.example/p/4")
        .toDF("url"), "url", dir)
      .collect().map(_.getString(0)).toSet
    assert(!reprobe.exists(_.contains("gated.example")),
      "disallowed URL must be frontier-seen (sticky policy drop)")
    assert(reprobe.count(_.contains("bulk.example")) === 2,
      s"exactly the 2 cap-overflow bulk URLs must stay unseen: $reprobe")
    // a second batch re-linking the overflow now manifests it
    val batch2 = Seq(("https://seed.example/next",
      """<a href="https://bulk.example/p/3">x</a>""")).toDF("url", "html")
    graft.streaming.IndexIngest.processDiscoveryBatch(
      batch2, 1L, "url", "html", dir, Some(mdir),
      robots = Some((robots, "host", "robots_txt")),
      perDomainCap = Some(2))
    val manifest2 = spark.read.parquet(s"$mdir/batch_id=1")
      .collect().map(_.getString(0)).toSet
    assert(manifest2.exists(_.contains("bulk.example/p/3")))
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("hostPriority steers the per-domain cap and rides the manifest") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-frontier-hp").toString
    val (dir, mdir) = (s"$base/f", s"$base/m")
    Frontier.buildFrontier(urls(0L), "url", dir, numBuckets = 2)
    // 3 subdomain URLs of ONE registered domain (cap = 1): the ranked
    // 'hi' host must win over the lexicographically-first 'aa' host;
    // an unranked host sorts last
    val links = Seq(
      "https://aa.dom.example/p/1",   // unranked → NULL priority
      "https://hi.dom.example/p/1",   // rank 900
      "https://lo.dom.example/p/1",   // rank 5
      "https://other.example/p/1")    // uncapped domain, rank 7
      .map(u => s"""<a href="$u">x</a>""").mkString
    val batch = Seq(("https://seed.example/start", s"<html>$links</html>"))
      .toDF("url", "html")
    val sidecar = Seq(
      ("HI.DOM.EXAMPLE", 1L),         // mixed case + dup: max-folds to 900
      ("hi.dom.example", 900L),
      ("lo.dom.example", 5L),
      ("other.example", 7L)).toDF("h", "r")
    assert(graft.streaming.IndexIngest.processDiscoveryBatch(
      batch, 0L, "url", "html", dir, Some(mdir),
      perDomainCap = Some(1),
      hostPriority = Some((sidecar, "h", "r"))) === 2L)
    val m = spark.read.parquet(s"$mdir/batch_id=0")
      .select("url", "priority")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(m.keySet === Set("https://hi.dom.example/p/1",
      "https://other.example/p/1"),
      s"the HIGHEST-priority URL must win the domain quota: $m")
    assert(m("https://hi.dom.example/p/1") === 900L)
    assert(m("https://other.example/p/1") === 7L)
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("the harvested web graph's pageRank steers the next batch's quota") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode, count, lit}
    val base = java.nio.file.Files.createTempDirectory("graft-frontier-wg").toString
    val (dir, mdir) = (s"$base/f", s"$base/m")
    Frontier.buildFrontier(urls(0L), "url", dir, numBuckets = 2)
    // batch 0: three seed pages vote with their links — x2 earns 3
    // inlinks, x1 earns 1
    def page(self: String, hrefs: String*) = (self,
      "<html>" + hrefs.map(h => s"""<a href="$h">x</a>""").mkString + "</html>")
    val b0 = Seq(
      page("https://s1.example/p", "https://x2.site.example/a"),
      page("https://s2.example/p", "https://x2.site.example/a",
        "https://x1.site.example/a"),
      page("https://s3.example/p", "https://x2.site.example/a"))
      .toDF("url", "html")
    assert(graft.streaming.IndexIngest.processDiscoveryBatch(
      b0, 0L, "url", "html", dir, Some(mdir)) === 2L)
    // the SAME harvest builds the host graph; pageRank ranks x2's
    // host above x1's (3 votes vs 1)
    val edges = b0.select(graft.llm.UrlOps.host(col("url")).as("src"),
        explode(graft.llm.UrlOps.extractLinks(col("html"))).as("href"))
      .select(col("src"), graft.llm.UrlOps.host(col("href")).as("dst"))
      .filter(col("dst").isNotNull && col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val pr = graft.operators.GraphOps.pageRank(edges, "src", "dst", "w",
      iters = 4)
    // batch 1 links one NEW url per host, same registered domain,
    // cap = 1: the rank must keep x2's url even though x1's sorts
    // first lexicographically
    val b1 = Seq(
      page("https://s1.example/q", "https://x1.site.example/new",
        "https://x2.site.example/new"))
      .toDF("url", "html")
    assert(graft.streaming.IndexIngest.processDiscoveryBatch(
      b1, 1L, "url", "html", dir, Some(mdir),
      perDomainCap = Some(1),
      hostPriority = Some((pr, "node", "rank_micro"))) === 1L)
    val m1 = spark.read.parquet(s"$mdir/batch_id=1")
      .collect().map(_.getString(0)).toSet
    assert(m1 === Set("https://x2.site.example/new"),
      s"the higher-ranked host must win the quota: $m1")
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("resolveRelative discovery turns relative hrefs into frontier URLs") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-frontier-rr").toString
    val (dir, mdir) = (s"$base/f", s"$base/m")
    Frontier.buildFrontier(
      Seq("https://a.example/d/p0").toDF("url"), "url", dir, numBuckets = 2)
    // path-relative, root-relative, protocol-relative, absolute, and
    // the still-unfetchable shapes
    // ' next1' and the newline-bearing absolute pin the href TRIM
    // (browsers strip ASCII whitespace; untrimmed, the absolute would
    // resolve path-relative into a space-bearing junk key)
    val page = ("https://a.example/d/p0",
      """<a href=" next1">n</a><a href="/top/p2">t</a>""" +
        """<a href="//cdn.example/p3">c</a>""" +
        "<a href=\"\n https://b.example/p4 \">a</a>" +
        """<a href="mailto:x@y.example">m</a>""" +
        """<a href="#frag">f</a>""")
    val n = graft.streaming.IndexIngest.processDiscoveryBatch(
      Seq(page).toDF("url", "html"), 0L, "url", "html", dir, Some(mdir),
      resolveRelative = true)
    val manifest = spark.read.parquet(s"$mdir/batch_id=0")
      .collect().map(_.getString(0)).toSet
    // '#frag' resolves to base#frag, defragments back to the page's
    // own URL, and the own-url anti-join eats it; mailto stays
    // unfetchable — so exactly 4 discoveries
    assert(manifest === Set(
      "https://a.example/d/next1", "https://a.example/top/p2",
      "https://cdn.example/p3", "https://b.example/p4"),
      s"unexpected manifest: $manifest")
    assert(n === 4L)
    // default (resolveRelative = false) keeps the verbatim-href
    // contract: every relative href drops, and even the absolute one
    // drops here because its untrimmed whitespace fails the anchored
    // scheme test — pin the contract difference
    val base2 = java.nio.file.Files.createTempDirectory("graft-frontier-rr2").toString
    Frontier.buildFrontier(
      Seq("https://a.example/d/p0").toDF("url"), "url", s"$base2/f",
      numBuckets = 2)
    graft.streaming.IndexIngest.processDiscoveryBatch(
      Seq(page).toDF("url", "html"), 0L, "url", "html", s"$base2/f",
      Some(s"$base2/m"))
    val manifest2 = spark.read.parquet(s"$base2/m/batch_id=0")
      .collect().map(_.getString(0)).toSet
    assert(manifest2 === Set.empty[String])
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("scheduled discovery manifest carries the per-host politeness plan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-frontier-sd").toString
    val (dir, mdir) = (s"$base/f", s"$base/m")
    Frontier.buildFrontier(
      Seq("https://seed.example/start").toDF("url"), "url", dir,
      numBuckets = 2)
    val links = Seq(
      "https://slow.example/p/1", "https://slow.example/p/2",
      "https://fast.example/p/1")
      .map(u => s"""<a href="$u">x</a>""").mkString
    val batch = Seq(("https://seed.example/start", s"<html>$links</html>"))
      .toDF("url", "html")
    val robots = Seq(("slow.example",
      "User-agent: *\nCrawl-delay: 4\n")).toDF("host", "robots_txt")
    val n = graft.streaming.IndexIngest.processDiscoveryBatch(
      batch, 0L, "url", "html", dir, Some(mdir),
      robots = Some((robots, "host", "robots_txt")),
      scheduleDelays = Some(0.5))
    assert(n === 3L)
    val m = spark.read.parquet(s"$mdir/batch_id=0")
      .select(col("url"), col("crawl_delay_sec"), col("fetch_slot"),
        col("fetch_after_sec"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(m === Set(
      ("https://slow.example/p/1", 4.0, 0L, 0.0),
      ("https://slow.example/p/2", 4.0, 1L, 4.0),
      ("https://fast.example/p/1", 0.5, 0L, 0.0)))
    // the frontier learned plain URL keys despite the widened manifest
    val reprobe = Frontier.probeNew(
      Seq("https://slow.example/p/2", "https://new.example/x")
        .toDF("url"), "url", dir)
      .collect().map(_.getString(0)).toSet
    assert(reprobe === Set("https://new.example/x"))
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("sitemap-aware discovery walks the sitemap tree through ordinary batches") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-frontier-sm").toString
    val (dir, mdir) = (s"$base/f", s"$base/m")
    Frontier.buildFrontier(
      Seq("https://s.example/sitemap.xml").toDF("url"), "url", dir,
      numBuckets = 2)
    // batch 0 fetched a sitemapindex: its <loc>s (nested sitemaps)
    // discover; an HTML page in the same batch harvests hrefs as usual
    val b0 = Seq(
      ("https://s.example/sitemap.xml",
        "<?xml version=\"1.0\"?><sitemapindex><sitemap>" +
          "<loc>https://s.example/sm-a.xml</loc></sitemap>" +
          "<sitemap><loc><![CDATA[https://s.example/sm-b.xml]]></loc>" +
          "</sitemap></sitemapindex>"))
      .toDF("url", "html")
    assert(graft.streaming.IndexIngest.processDiscoveryBatch(
      b0, 0L, "url", "html", dir, Some(mdir), harvestSitemaps = true) === 2L)
    val m0 = spark.read.parquet(s"$mdir/batch_id=0")
      .collect().map(_.getString(0)).toSet
    assert(m0 === Set("https://s.example/sm-a.xml",
      "https://s.example/sm-b.xml"))
    // batch 1 fetched a leaf sitemap: page locs discover; without the
    // flag the same body discovers NOTHING (locs are not hrefs)
    val b1 = Seq(
      ("https://s.example/sm-a.xml",
        "<?xml version=\"1.0\"?><urlset><url>" +
          "<loc>https://s.example/page/1</loc></url></urlset>"))
      .toDF("url", "html")
    assert(graft.streaming.IndexIngest.processDiscoveryBatch(
      b1, 1L, "url", "html", dir, Some(mdir), harvestSitemaps = true) === 1L)
    // the flag-off contrast needs a FRESH frontier: replaying b1
    // against `dir` would return 0 even if the flag leaked (batch 1
    // already marked the loc URL seen there)
    val dir2 = s"$base/f2"
    Frontier.buildFrontier(
      Seq("https://s.example/sitemap.xml").toDF("url"), "url", dir2,
      numBuckets = 2)
    assert(graft.streaming.IndexIngest.processDiscoveryBatch(
      b1, 0L, "url", "html", dir2, Some(s"$base/m2")) === 0L)
    // a page that merely EMBEDS sitemap markup mid-body is NOT a
    // sitemap: its example <loc>s must not mint crawl keys even with
    // the flag on (root-anchored detection)
    val embed = Seq(
      ("https://s.example/sm-a.xml",
        "<html><body><p>example:</p><pre>&lt;x&gt;</pre>" +
          "<urlset><url><loc>https://evil.example/j</loc></url></urlset>" +
          "</body></html>"))
      .toDF("url", "html")
    assert(graft.streaming.IndexIngest.processDiscoveryBatch(
      embed, 1L, "url", "html", dir2, Some(s"$base/m2"),
      harvestSitemaps = true) === 0L)
    // while a BOM + prolog + leading comment still count as the root
    val commented = Seq(
      ("https://s.example/sm-a.xml",
        "\uFEFF  <?xml version=\"1.0\"?>\n<!-- generator: x -->\n" +
          "<urlset><url><loc>https://s.example/page/2</loc></url></urlset>"))
      .toDF("url", "html")
    assert(graft.streaming.IndexIngest.processDiscoveryBatch(
      commented, 2L, "url", "html", dir2, Some(s"$base/m2"),
      harvestSitemaps = true) === 1L)
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("normalized frontier keys collapse URL variants onto one fetch") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-frontier-nk").toString
    val (dir, mdir) = (s"$base/f", s"$base/m")
    Frontier.buildFrontier(
      Seq("https://n.example/start").toDF("url"), "url", dir, numBuckets = 2)
    // three variants of ONE resource + its own page: one key, one fetch
    val b0 = Seq(
      ("https://n.example/start",
        """<a href="https://n.example/p?utm_source=x">1</a>""" +
          """<a href="HTTPS://N.EXAMPLE:443/p">2</a>""" +
          """<a href="https://n.example/p#frag">3</a>"""))
      .toDF("url", "html")
    assert(graft.streaming.IndexIngest.processDiscoveryBatch(
      b0, 0L, "url", "html", dir, Some(mdir), normalizeKeys = true) === 1L)
    val m0 = spark.read.parquet(s"$mdir/batch_id=0")
      .collect().map(_.getString(0)).toSet
    assert(m0 === Set("https://n.example/p"))
    // a later variant-bearing batch discovers nothing new
    val b1 = Seq(
      ("https://n.example/p",
        """<a href="https://n.example/p?utm_campaign=y">self</a>"""))
      .toDF("url", "html")
    assert(graft.streaming.IndexIngest.processDiscoveryBatch(
      b1, 1L, "url", "html", dir, Some(mdir), normalizeKeys = true) === 0L)
    graft.llm.CacheRegistry.releaseAll(spark)
  }

  test("empty seed frame builds a probeable frontier (zero-file keys dir)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-frontier-es").toString + "/f"
    // legal first state: a streaming Discover over an empty pages drop
    // seeds from zero URLs; the keys dir then holds no part-files and
    // schema inference would throw — probes must read the explicit
    // schema instead of wedging until a manual rebuild
    Frontier.buildFrontier(Seq.empty[String].toDF("url"), "url", dir,
      numBuckets = 2)
    assert(Frontier.indexExists(dir))
    assert(probeIds(dir, 1L to 3L) === Set(1L, 2L, 3L))
    Frontier.appendToFrontier(urls(1L), "url", dir)
    assert(probeIds(dir, 1L to 3L) === Set(2L, 3L))
    Frontier.compactFrontier(spark, dir)
    assert(probeIds(dir, 1L to 3L) === Set(2L, 3L))
  }

  test("bulk forget: a 1M-key sidecar rewrite stays distributed and swaps atomically") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-frontier-bf").toString + "/f"
    def bulk(n: Long) = spark.range(n)
      .select(concat(lit("https://bulk.example/p/"), col("id")).as("url"))
    Frontier.buildFrontier(bulk(1000000L), "url", dir, numBuckets = 4)
    // forget ALL 1M — the compliance-scale shape the old driver-side
    // collect could not hold
    assert(Frontier.forgetUrls(bulk(1000000L), "url", dir) === 1000000L)
    // re-learn the first half: the survivor rewrite runs as a staged
    // task-side parquet write + atomic dir swap, never a collect
    Frontier.appendToFrontier(bulk(500000L), "url", dir)
    assert(!new java.io.File(dir, "forgotten_staging").exists(),
      "staging dir must be swapped away")
    val sidecar = new java.io.File(dir, "forgotten")
    assert(sidecar.isDirectory &&
      sidecar.listFiles().exists(_.getName.endsWith(".parquet")),
      "surviving forgets must land in the swapped sidecar")
    // membership: re-learned urls are seen; still-forgotten ones are new
    val probe = Frontier.probeNew(
      Seq("https://bulk.example/p/1", "https://bulk.example/p/999999")
        .toDF("url"), "url", dir).collect().map(_.getString(0)).toSet
    assert(probe === Set("https://bulk.example/p/999999"))
  }

  test("forget-swap crash window is torn-but-detectable; rebuild recovers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-frontier-fs").toString + "/f"
    Frontier.buildFrontier(urls(1L, 2L), "url", dir, numBuckets = 2)
    assert(Frontier.forgetUrls(urls(2L), "url", dir) === 1L)
    // crash between the sidecar delete and the staging swap: the fence
    // is up, so the frontier refuses probes instead of silently losing
    // the forget
    spark.conf.set("graft.test.crashPoint", "frontier_forget_swap")
    intercept[RuntimeException] {
      Frontier.appendToFrontier(urls(2L), "url", dir)
    }
    spark.conf.set("graft.test.crashPoint", "")
    assert(!Frontier.indexExists(dir), "fence must be up after the crash")
    intercept[IllegalArgumentException] { probeIds(dir, Seq(1L)) }
    // the documented recovery: rebuild supersedes the torn mutation
    Frontier.buildFrontier(urls(1L, 2L), "url", dir, numBuckets = 2)
    assert(probeIds(dir, 1L to 3L) === Set(3L))
  }
}
