package graft

import graft.llm.{CacheRegistry, Frontier}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Crawl-discovery CLI: one batch of fetched pages (parquet with a URL
  * column and an HTML column) → outlink harvest → frontier probe → the
  * UNSEEN fetchable URLs written as the next fetch manifest, and the
  * frontier grown under the fenced/ledgered append. First run against
  * an empty frontier dir SEEDS it from the batch's own page URLs
  * before discovering. Re-running a committed batch id is a ledger
  * no-op — safe to retry blindly.
  *
  * Usage: runMain graft.Discover <pagesParquet> <urlCol> <htmlCol>
  *          <frontierDir> <outManifestDir> [batchId=0]
  * Env:   SPARK_GRAFT_CPUS (default 4)
  *        SPARK_GRAFT_RESOLVE_RELATIVE=1 resolves relative hrefs
  *        against each page's own URL before the fetchability filter.
  *        SPARK_GRAFT_HARVEST_SITEMAPS=1 lets urlset/sitemapindex
  *        bodies contribute their <loc> URLs alongside hrefs.
  *        SPARK_GRAFT_NORMALIZE_KEYS=1 keys the frontier/manifest on
  *        UrlOps.urlNormalize canonical forms.
  *        All three default OFF: each changes which KEYS a batch
  *        mints, so an existing frontier must keep the settings it
  *        was built with.
  *
  *        Compliance + scheduling (all optional, manifest-only — the
  *        frontier keys stay plain URLs either way):
  *        SPARK_GRAFT_ROBOTS=<parquet> robots corpus with `host` and
  *        `robots_txt` columns — disallowed URLs never reach the
  *        manifest (sticky frontier drop).
  *        SPARK_GRAFT_AGENT=<name> the user-agent robots groups are
  *        selected for (default '*').
  *        SPARK_GRAFT_DOMAIN_CAP=<n> at most n manifest URLs per
  *        registered domain per batch.
  *        SPARK_GRAFT_SCHEDULE_DELAYS=<sec> emit the per-host
  *        politeness schedule columns (crawl_delay_sec / fetch_slot /
  *        fetch_after_sec) with <sec> as the default delay.
  *        SPARK_GRAFT_HOST_PRIORITY=<parquet> host-rank sidecar with
  *        `host` and `priority` columns (e.g. a pageRank of the
  *        harvested host graph) — rides the manifest as `priority`
  *        and steers the domain cap toward the highest-ranked hosts.
  */
object Discover {
  def main(args: Array[String]): Unit = {
    require(args.length >= 5,
      "usage: Discover <pagesParquet> <urlCol> <htmlCol> <frontierDir> <outManifestDir> [batchId]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val n = run(spark, args(0), args(1), args(2), args(3), args(4),
        if (args.length > 5) args(5).toLong else 0L,
        resolveRelative =
          sys.env.get("SPARK_GRAFT_RESOLVE_RELATIVE").contains("1"),
        harvestSitemaps =
          sys.env.get("SPARK_GRAFT_HARVEST_SITEMAPS").contains("1"),
        normalizeKeys =
          sys.env.get("SPARK_GRAFT_NORMALIZE_KEYS").contains("1"),
        robots = sys.env.get("SPARK_GRAFT_ROBOTS")
          .map(p => (spark.read.parquet(p), "host", "robots_txt")),
        agent = sys.env.getOrElse("SPARK_GRAFT_AGENT", "*"),
        perDomainCap =
          sys.env.get("SPARK_GRAFT_DOMAIN_CAP").map(_.trim.toInt),
        scheduleDelays =
          sys.env.get("SPARK_GRAFT_SCHEDULE_DELAYS").map(_.trim.toDouble),
        hostPriority = sys.env.get("SPARK_GRAFT_HOST_PRIORITY")
          .map(p => (spark.read.parquet(p), "host", "priority")))
      println(s"[discover] new_urls=$n -> ${args(4)}")
    } finally {
      CacheRegistry.releaseAll(spark)
      spark.stop()
    }
  }

  /** Runs one discovery batch; package-visible for the spec. Returns
    * the newly discovered URL count (-1 on a ledger-replayed batch).
    * The options default off and mirror the env switches `main` reads.
    */
  def run(spark: SparkSession, pagesPath: String, urlCol: String,
          htmlCol: String, frontierDir: String, outManifestDir: String,
          batchId: Long, resolveRelative: Boolean = false,
          harvestSitemaps: Boolean = false,
          normalizeKeys: Boolean = false,
          robots: Option[(DataFrame, String, String)] = None,
          agent: String = "*",
          perDomainCap: Option[Int] = None,
          scheduleDelays: Option[Double] = None,
          hostPriority: Option[(DataFrame, String, String)] = None): Long = {
    val pages = spark.read.parquet(pagesPath)
    // gate on the MANIFEST, not bare directory existence: a
    // pre-created dir (mkdir before the first run) or a first run
    // killed between the keys write and the manifest write leaves the
    // directory present but the frontier ABSENT — seeding must re-run
    // or every later probe dies on the missing manifest, breaking the
    // blind-retry contract (buildFrontier's overwrite makes the
    // re-seed safe)
    if (!Frontier.indexExists(frontierDir)) {
      // seeds obey the SAME key contract as discovery: under
      // normalizeKeys the frontier must be born with canonical keys,
      // or a raw-variant seed (mixed case, tracking params) never
      // matches its canonical twin and that resource fetches twice
      val raw = col(urlCol).cast("string")
      val seed =
        if (normalizeKeys)
          org.apache.spark.sql.functions.coalesce(
            graft.llm.UrlOps.urlNormalize(raw), raw)
        else raw
      Frontier.buildFrontier(
        pages.select(seed.as("url")), "url", frontierDir)
    }
    graft.streaming.IndexIngest.processDiscoveryBatch(pages, batchId,
      urlCol, htmlCol, frontierDir, Some(outManifestDir),
      robots = robots, agent = agent, perDomainCap = perDomainCap,
      resolveRelative = resolveRelative,
      scheduleDelays = scheduleDelays,
      harvestSitemaps = harvestSitemaps,
      normalizeKeys = normalizeKeys,
      hostPriority = hostPriority)
  }
}
