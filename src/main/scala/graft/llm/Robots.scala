package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt protocol compliance (RFC 9309 reduced to EXACT,
  * replayable semantics) + per-host politeness for the crawl loop —
  * the two gates a fetch manifest needs before it is actionable.
  *
  * Pinned parsing/matching semantics (every choice documented so the
  * DuckDB oracle replays them verbatim):
  *
  *   - Lines split on `\r?\n` (CRLF bodies parse clean — no value
  *     ever carries a trailing '\r');
  *     `#` comments strip; `user-agent` / `allow` / `disallow` /
  *     `crawl-delay` lines (case-insensitive names) participate.
  *     crawl-delay MEMBERSHIP follows its surrounding group (it
  *     belongs to every agent the group names) but — exactly like
  *     unknown lines — it neither starts nor BREAKS a user-agent run:
  *     `User-agent: a ⏎ Crawl-delay: 5 ⏎ User-agent: b ⏎ Disallow: /x`
  *     keeps {a, b} one group sharing both directives, so every
  *     allow/disallow verdict is IDENTICAL to the parse that ignored
  *     crawl-delay entirely (the over-block-never-under-block contract
  *     survives the directive's addition). Other unknown lines
  *     (sitemap, …) neither start nor break a group, per the RFC —
  *     sitemap directives are group-independent and harvest via
  *     [[sitemapUrls]]. Politeness is [[perDomainCap]] +
  *     [[crawlDelays]]/[[scheduleManifest]].
  *   - GROUPS: a run of consecutive user-agent lines opens a group;
  *     the rules that follow (until the next user-agent run) belong to
  *     every agent named in the run.
  *   - GROUP SELECTION for agent A: if any group names A (full token,
  *     case-insensitive), exactly those groups apply; otherwise the
  *     `*` groups apply; otherwise everything is allowed.
  *   - MATCHING: the match target is the URL's path+query (fragment
  *     excluded, "/" when empty), compared case-sensitively,
  *     percent-encoding NOT normalized. Among matching rules (target
  *     startsWith rule path) the LONGEST path wins; a length tie goes
  *     to allow. No rule matches → allowed.
  *   - WILDCARDS (the conservative reduction — prefix semantics is
  *     the pinned contract): a disallow containing `*` truncates at
  *     the first `*` (and a lone/leading `*` becomes "/", blocking the
  *     host) — over-blocking, never under-blocking; a trailing `$`
  *     strips (again over-blocking). An ALLOW carrying `*` or `$` is
  *     DROPPED — an allow we cannot express exactly must not widen
  *     what a disallow blocks. Empty disallow ("allow all") drops.
  *
  * Scale shape: parsing windows partition by HOST (robots bodies are
  * ≤ 500 KiB by RFC, so a host's line set is one small group);
  * verdicts join distinct (host, target) pairs against the per-host
  * rule table — batch-bounded both sides — then broadcast back. The
  * politeness cap is a rank filter directly on a row_number window,
  * so WindowGroupLimit prunes every input partition to cap rows per
  * domain BEFORE the shuffle (the clusterProvenance mega-class rule).
  */
object Robots {

  /** Match-target regex (group 1 = path+query) — shared verbatim with
    * the SQL oracles. The authority class mirrors [[UrlOps.hostRegex]]
    * in what it skips; fragments stay out.
    */
  val targetRegex: String = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)"

  /** Path+query match target of an absolute URL ("/" when empty). A
    * captured target with no leading '/' — `http://h?page=2`, an
    * empty-path query URL real pages link constantly — gets one
    * prepended (RFC 9309 matches `/?page=2`); without it no
    * '/'-prefixed rule could ever match, so even `Disallow: /` was
    * bypassed, violating the over-block-never-under-block contract.
    */
  def matchTarget(url: Column): Column = {
    val c = regexp_extract(url, targetRegex, 1)
    when(c === "", lit("/"))
      .when(c.startsWith("/"), c)
      .otherwise(concat(lit("/"), c))
  }

  /** Parse robots.txt bodies into grouped directive lines:
    * (hostCol, graft_grp, graft_nm ∈ {user-agent, allow, disallow,
    * crawl-delay}, graft_v). The building blocks [[disallowed]] and
    * [[crawlDelays]] consume; exposed for audits over a robots corpus.
    */
  /** The shared line grammar: ONE body per host (a corpus holding
    * several fetches of the same robots.txt would interleave both
    * bodies' line numbers in the per-host group window — silently
    * wrong groups; duplicates resolve deterministically to the
    * lexicographically-largest body, callers wanting freshest-wins
    * pre-select it), then split / comment-strip / name-value parse.
    * [[robotsRules]] and [[sitemapUrls]] both consume, so a grammar
    * fix can never drift between the rule parse and the sitemap
    * harvest.
    */
  private def parsedLines(robots: DataFrame, hostCol: String,
      txtCol: String): DataFrame = {
    val one = robots.groupBy(col(hostCol))
      .agg(max(col(txtCol)).as(txtCol))
    // `\r?\n`, NOT '\n': RFC 9309 allows CRLF bodies (Windows/IIS
    // serves them) and a '\n'-only split would leave a trailing \r on
    // every value — junk sitemap keys, and Disallow paths like "/x\r"
    // that match no URL (a silent under-block)
    one
      .select(col(hostCol), posexplode(split(col(txtCol), "\r?\n")))
      .withColumnRenamed("pos", "graft_ln")
      .withColumnRenamed("col", "graft_raw")
      .withColumn("graft_line", regexp_replace(col("graft_raw"), "#.*$", ""))
      .withColumn("graft_nm",
        lower(trim(regexp_extract(col("graft_line"), "^([^:]+):", 1))))
      .withColumn("graft_v",
        trim(regexp_extract(col("graft_line"), "^[^:]+:(.*)$", 1)))
  }

  def robotsRules(robots: DataFrame, hostCol: String, txtCol: String): DataFrame = {
    val parsed = parsedLines(robots, hostCol, txtCol)
      .filter(col("graft_nm").isin("user-agent", "allow", "disallow",
        "crawl-delay"))
    val w = Window.partitionBy(col(hostCol)).orderBy(col("graft_ln"))
    // run-start detection looks at the previous line EXCLUDING
    // crawl-delay lines (last non-crawl-delay isua before this row):
    // a crawl-delay between two user-agent lines must not split the
    // run, or existing allow/disallow verdicts would silently flip to
    // allowed on such bodies — the banned under-block direction
    val prevIsua = last(
      when(col("graft_nm") =!= "crawl-delay", col("graft_isua")), true)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    parsed
      .withColumn("graft_isua", col("graft_nm") === "user-agent")
      .withColumn("graft_grp", sum(
        when(col("graft_isua") && !coalesce(prevIsua, lit(false)), 1)
          .otherwise(0)).over(w))
      .select(col(hostCol), col("graft_grp"), col("graft_nm"), col("graft_v"))
  }

  /** The directive lines of the groups GROUP SELECTION picks for
    * `agent`: (graft_rh = lowercase host, graft_nm, graft_v).
    */
  private def selectedLines(robots: DataFrame, hostCol: String,
      txtCol: String, agent: String): DataFrame = {
    val ag = agent.toLowerCase(java.util.Locale.ROOT)
    // hosts fold to lowercase — URL hosts arrive lowercased from
    // UrlOps.host, and a verbatim mixed-case robots key would silently
    // never match (under-blocking, the one direction the contract bans)
    val lines = robotsRules(robots, hostCol, txtCol)
      .withColumn("graft_rh", lower(col(hostCol))).drop(hostCol)
    val uas = lines.filter(col("graft_nm") === "user-agent")
      .select(col("graft_rh"), col("graft_grp"),
        lower(col("graft_v")).as("graft_ua"))
      .distinct()
    val specificHosts = uas.filter(col("graft_ua") === ag)
      .select(col("graft_rh")).distinct()
    val chosen = uas.filter(col("graft_ua") === ag)
      .select(col("graft_rh"), col("graft_grp"))
      .unionByName(uas.filter(col("graft_ua") === "*")
        .join(specificHosts, Seq("graft_rh"), "left_anti")
        .select(col("graft_rh"), col("graft_grp")))
      .distinct()
    lines.join(chosen, Seq("graft_rh", "graft_grp"))
      .select(col("graft_rh"), col("graft_nm"), col("graft_v"))
  }

  /** The agent-selected, wildcard-reduced rule table:
    * (graft_rh = host, graft_nm ∈ {allow, disallow}, graft_path).
    */
  private def agentRules(robots: DataFrame, hostCol: String, txtCol: String,
      agent: String): DataFrame = {
    val trunc = regexp_extract(
      regexp_replace(col("graft_v"), "\\$$", ""), "^([^*]*)", 1)
    selectedLines(robots, hostCol, txtCol, agent)
      .filter(col("graft_nm").isin("allow", "disallow"))
      .withColumn("graft_path",
        when(col("graft_nm") === "disallow" && col("graft_v") =!= "",
          when(trunc === "", lit("/")).otherwise(trunc))
          .when(col("graft_nm") === "allow" &&
            !col("graft_v").contains("*") && !col("graft_v").contains("$"),
            col("graft_v")))
      .filter(col("graft_path").isNotNull && col("graft_path") =!= "")
      .select(col("graft_rh"), col("graft_nm"), col("graft_path"))
  }

  /** Adds BOOLEAN `disallowed` to `urls`: true exactly when the host's
    * robots rules (group-selected for `agent`) disallow the URL under
    * the pinned longest-match semantics. Hosts with no robots body (or
    * none that matches) are allowed — the fetch-the-robots step is the
    * caller's (a crawl keeps its robots corpus as ordinary fetched
    * pages).
    */
  def disallowed(urls: DataFrame, urlCol: String,
      robots: DataFrame, hostCol: String, txtCol: String,
      agent: String = "*"): DataFrame = {
    val keyed = urls
      .withColumn("graft_uh", UrlOps.host(col(urlCol)))
      .withColumn("graft_t", matchTarget(col(urlCol)))
    // bound the parse to the hosts this batch actually probes: the
    // robots corpus is CRAWL-sized (every fetched robots.txt) while a
    // discovery batch is batch-sized — without the semi-join every
    // micro-batch would re-parse and re-window the whole corpus
    val batchHosts = keyed.select(col("graft_uh")).distinct()
    val relevant = robots.join(broadcast(batchHosts),
      lower(col(hostCol)) === col("graft_uh"), "left_semi")
    val rules = agentRules(relevant, hostCol, txtCol, agent)
    val targets = keyed.select(col("graft_uh"), col("graft_t")).distinct()
    // winner encoding (the single-integer lexicographic trick): rank =
    // 2·len(path) + (allow ? 1 : 0); the max rank carries both the
    // longest-match winner AND the allow-beats-disallow tiebreak, and
    // its parity IS the verdict
    val verdicts = targets
      .join(rules, col("graft_uh") === col("graft_rh") &&
        col("graft_t").startsWith(col("graft_path")))
      .groupBy(col("graft_uh"), col("graft_t"))
      .agg(max(length(col("graft_path")).cast("long") * 2 +
        when(col("graft_nm") === "allow", 1L).otherwise(0L)).as("graft_rank"))
      .select(col("graft_uh"), col("graft_t"),
        (col("graft_rank") % 2 === 0).as("graft_dis"))
    keyed.join(verdicts, Seq("graft_uh", "graft_t"), "left")
      .withColumn("disallowed", coalesce(col("graft_dis"), lit(false)))
      .drop("graft_uh", "graft_t", "graft_dis")
  }

  /** At most `cap` rows per registered domain (the per-host politeness
    * quota a batch manifest honors), deterministic by `urlCol` order —
    * or, when `priorityCol` names a numeric column on `urls`, by
    * (priority DESC NULLS LAST, url): the quota keeps the
    * HIGHEST-priority URLs per domain instead of the
    * lexicographically-first, which is what turns a politeness cap
    * into a crawl SCHEDULER once [[withHostPriority]] has attached a
    * host-rank signal. The rank filter sits directly on the
    * row_number window → WindowGroupLimit prunes every input
    * partition to cap rows per domain before the shuffle, so a
    * mega-domain batch never buffers whole.
    */
  def perDomainCap(urls: DataFrame, urlCol: String, cap: Int,
      priorityCol: Option[String] = None): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val dom = UrlOps.registeredDomain(UrlOps.host(col(urlCol)))
    val order = priorityCol match {
      case Some(pc) => Seq(desc_nulls_last(pc), col(urlCol))
      case None => Seq(col(urlCol))
    }
    val w = Window.partitionBy(dom).orderBy(order: _*)
    urls.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") <= cap)
      .drop("graft_rn")
  }

  /** Attach a per-HOST priority signal (a host-rank sidecar — e.g.
    * [[graft.operators.GraphOps.pageRank]] micro-unit ranks over the
    * harvested host graph, or plain indegree counts) to a URL batch as
    * a LONG `priority` column; hosts absent from the sidecar get NULL
    * (they sort LAST under [[perDomainCap]]'s priority order — unknown
    * beats nothing, known rank beats unknown). Duplicate sidecar rows
    * for one host fold to their MAX. Scale shape: the sidecar is
    * semi-joined to the batch's hosts FIRST (the [[disallowed]] /
    * [[scheduleManifest]] discipline), so the join is batch-bounded no
    * matter how many hosts the sidecar ranks.
    */
  def withHostPriority(urls: DataFrame, urlCol: String,
      priority: DataFrame, hostCol: String, prioCol: String): DataFrame = {
    val keyed = urls.withColumn("graft_uh", UrlOps.host(col(urlCol)))
    val batchHosts = keyed.select(col("graft_uh")).distinct()
    val relevant = priority
      .join(broadcast(batchHosts),
        lower(col(hostCol)) === col("graft_uh"), "left_semi")
      .groupBy(lower(col(hostCol)).as("graft_ph"))
      .agg(max(col(prioCol).cast("long")).as("priority"))
    keyed.join(relevant, col("graft_uh") === col("graft_ph"), "left")
      .drop("graft_uh", "graft_ph")
  }

  /** The crawl-delay value grammar (non-negative, optionally
    * fractional — "0.5" is served in the wild) — shared with the SQL
    * oracles. Anything else ("1s", negative, empty) is ignored.
    * `\z` not `$`: engine-equal end-of-text (Java's `$` would accept
    * a `"5\n"` value that RE2 rejects).
    */
  val delayRegex: String = "^[0-9]+(\\.[0-9]+)?\\z"

  /** Per-host crawl delay for `agent`: (graft_rh = lowercase host,
    * crawl_delay_sec DOUBLE). Among the selected groups' crawl-delay
    * lines the MAX valid value wins (several applicable groups → the
    * most conservative delay); hosts with no valid directive are
    * absent. Same batch-bounded scale shape as [[disallowed]] —
    * callers semi-join the robots corpus to the batch's hosts first.
    */
  def crawlDelays(robots: DataFrame, hostCol: String, txtCol: String,
      agent: String = "*"): DataFrame =
    selectedLines(robots, hostCol, txtCol, agent)
      .filter(col("graft_nm") === "crawl-delay" &&
        col("graft_v").rlike(delayRegex))
      .groupBy(col("graft_rh"))
      .agg(max(col("graft_v").cast("double")).as("crawl_delay_sec"))

  /** Turn a URL batch into a SCHEDULED fetch manifest: adds
    * `crawl_delay_sec` (the host's directive for `agent`, or
    * `defaultDelaySec`), `fetch_slot` (0-based position within the
    * host, deterministic by `urlCol` order) and `fetch_after_sec`
    * (= slot × delay) — the per-host politeness schedule a fetcher
    * honors by sleeping each URL until batch-start + fetch_after_sec.
    * Slots key by HOST (not registered domain): crawl-delay is a
    * per-server directive, and sibling subdomains are distinct
    * servers.
    *
    * Scale shape: one row_number window per host plus the
    * [[crawlDelays]] join on the batch's hosts — batch-bounded; the
    * robots corpus is semi-joined to the batch's hosts before any
    * parse, the [[disallowed]] discipline.
    */
  def scheduleManifest(urls: DataFrame, urlCol: String,
      robots: DataFrame, hostCol: String, txtCol: String,
      agent: String = "*", defaultDelaySec: Double = 1.0): DataFrame = {
    require(defaultDelaySec >= 0.0,
      s"defaultDelaySec must be non-negative, got $defaultDelaySec")
    val keyed = urls.withColumn("graft_uh", UrlOps.host(col(urlCol)))
    val batchHosts = keyed.select(col("graft_uh")).distinct()
    val relevant = robots.join(broadcast(batchHosts),
      lower(col(hostCol)) === col("graft_uh"), "left_semi")
    val delays = crawlDelays(relevant, hostCol, txtCol, agent)
    val w = Window.partitionBy(col("graft_uh")).orderBy(col(urlCol))
    keyed
      .join(delays, col("graft_uh") === col("graft_rh"), "left")
      .withColumn("crawl_delay_sec",
        coalesce(col("crawl_delay_sec"), lit(defaultDelaySec)))
      .withColumn("fetch_slot", (row_number().over(w) - 1).cast("long"))
      .withColumn("fetch_after_sec",
        col("fetch_slot") * col("crawl_delay_sec"))
      .drop("graft_uh", "graft_rh")
  }

  /** Sitemap directives of a robots corpus: (hostCol, sitemap_url).
    * Group-INDEPENDENT per RFC 9309 §2.3 (no agent selection, no
    * group membership) — a plain line harvest over the
    * one-body-per-host fold, relative values resolved against the
    * host's https root via [[UrlOps.resolveUrl]] (the directive is
    * specified absolute; resolving instead of dropping is the
    * over-harvest direction, and a fetchability filter downstream
    * still gates). Duplicate directives fold.
    */
  def sitemapUrls(robots: DataFrame, hostCol: String, txtCol: String): DataFrame = {
    parsedLines(robots, hostCol, txtCol)
      .filter(col("graft_nm") === "sitemap" && col("graft_v") =!= "")
      .select(col(hostCol), UrlOps.resolveUrl(
        concat(lit("https://"), lower(col(hostCol)), lit("/")),
        col("graft_v")).as("sitemap_url"))
      .distinct()
  }
}
