package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crawl-graph URL canonicalization — the keys a web-scale training
  * pipeline groups, dedups, and quota-mixes by:
  *
  *   - [[host]]: the lowercase authority of an http(s)/ftp URL.
  *   - [[registeredDomain]]: the "site" key (example.co.uk for
  *     www.example.co.uk) under a DOCUMENTED public-suffix subset —
  *     the last two labels, or the last three when the last two are a
  *     well-known two-level suffix ([[TwoLevelSuffixes]]). The full
  *     public-suffix list is a mutable external artifact; embedding a
  *     pinned subset keeps the operator deterministic and
  *     oracle-replayable, and callers with the full list can pass
  *     their own suffix set.
  *   - [[surtHost]]: the SURT-ordered host (org,example,www) — the
  *     sort key web archives use so a range scan clusters a domain's
  *     pages together (the same trick as the carve pipeline's
  *     locality sorts, applied to crawl keys).
  *
  * Everything is a pure `Column` chain over codegen'd regex/string
  * built-ins (ANSI-safe — no positional array access that could throw
  * on a malformed host), exactly replayable in SQL. At 100 TB these
  * are narrow per-row expressions inside whole-stage codegen; the
  * groupings they feed shuffle ONCE on the canonical key instead of
  * exploding raw URL variants.
  */
object UrlOps {

  /** The host-extraction regex (group 1 = host) — shared VERBATIM with
    * the SQL oracles so the two engines cannot drift. Skips an
    * optional `userinfo@` prefix to the LAST '@' before the path —
    * the WHATWG rule fetchers follow, and the greedy class must
    * therefore admit '@' itself: a first-'@' skip still spoofs on
    * `http://evil.com@trusted.com@victim.com/` (a fetcher retrieves
    * victim.com; keying it under trusted.com is the URL-confusion
    * attack). Stops at port/path/query/fragment. A bracketed IPv6
    * literal (`http://[2001:db8::1]:8080/x`) matches as the whole
    * `[...]` token — the WHATWG serialization, brackets kept — via the
    * first alternation arm; without it the ':'-stopping class
    * extracted the garbage key `[2001`. A '[' that never closes is NOT
    * a host (the second arm refuses a leading '[') → NULL.
    */
  val hostRegex: String =
    "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?(\\[[^\\]/?#]+\\]|[^\\[/?#:@][^/?#:@]*)"

  /** Lowercase host of a scheme://host... URL, NULL when `url` has no
    * authority (relative links, mailto:, javascript:).
    */
  def host(url: Column): Column =
    lower(nullif(regexp_extract(url, hostRegex, 1), lit("")))

  /** Lowercase scheme of an absolute URL with an authority, NULL
    * otherwise — the fetchability filter (`scheme IN (http, https)`)
    * a crawl frontier applies before queueing anything.
    */
  def scheme(url: Column): Column =
    lower(nullif(regexp_extract(url,
      "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1), lit("")))

  /** The pinned two-level public-suffix subset [[registeredDomain]]
    * recognizes (ccTLD second-level registries in wide crawl use).
    */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr",
    "co.za", "org.za", "web.za",
    "com.mx", "org.mx", "gob.mx",
    "com.ar", "com.tr", "com.tw", "com.hk", "com.sg", "com.my",
    "co.nz", "org.nz", "net.nz",
    "co.th", "or.th", "ac.th",
    "co.id", "or.id", "ac.id")

  /** Registered domain ("site") of a lowercase host, under `suffixes`
    * (default [[TwoLevelSuffixes]]). A dotless host (localhost, an IP
    * fragment) is its own site; NULL host stays NULL.
    */
  def registeredDomain(host: Column,
      suffixes: Seq[String] = TwoLevelSuffixes): Column = {
    // pure regex tail-grabs — no positional array access, so a
    // malformed host can never throw under ANSI mode. \z end anchors:
    // Java's `$` would tail-grab past a trailing \n (hostRegex's
    // classes admit one) where RE2's would not — engine drift on
    // exactly the garbage keys that need consistent folding
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)\\z", 1)
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)\\z", 1)
    when(host.isNull, lit(null))
      .when(last2 === "", host) // dotless
      .when(last3 =!= "" && last2.isin(suffixes: _*), last3)
      .otherwise(last2)
  }

  /** SURT-ordered host: labels reversed, comma-joined
    * (www.example.org → org,example,www).
    */
  def surtHost(host: Column): Column =
    array_join(reverse(split(host, "\\.")), ",")

  /** Origin regex (group 1 = `scheme://authority`) — shared VERBATIM
    * with the SQL oracles, like [[hostRegex]].
    */
  val originRegex: String = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"

  /** Base-path regex (group 1 = the path component, query/fragment
    * excluded, possibly empty) — shared with the SQL oracles.
    */
  val basePathRegex: String = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"

  /** Resolve reference `ref` against absolute base URL `base` — the
    * step that turns the relative hrefs real pages carry (the large
    * majority of outlinks on the live web) into frontier-keyable
    * absolute URLs. Pinned REDUCED RFC 3986 §5 semantics, every arm
    * replayable in SQL via the shared regex constants:
    *
    *   - `ref` carrying a scheme (`^[a-zA-Z][a-zA-Z0-9+.-]*:`) is
    *     already absolute → returned verbatim (this also parks
    *     `mailto:`/`javascript:` refs for the fetchability filter to
    *     drop downstream).
    *   - `//host/x` (protocol-relative) → base's scheme + `:` + ref.
    *   - `/x` (root-relative) → base origin + ref.
    *   - `?q` → base origin + base path + ref (query replaced).
    *   - `#f` → base minus its fragment + ref.
    *   - empty ref → base minus its fragment.
    *   - anything else (a relative path) → base origin + base
    *     directory (path truncated after its last '/', or "/" when
    *     the path has none) + ref.
    *
    * DOCUMENTED REDUCTION: dot-segments are NOT normalized —
    * `../a` resolves to `.../dir/../a` literally. The frontier keys
    * the un-normalized form, so a page reachable both ways costs one
    * extra fetch (over-fetch, never a wrong fetch). A `base` that is
    * NULL or has no authority resolves every non-absolute ref to
    * NULL.
    */
  def resolveUrl(base: Column, ref: Column): Column = {
    val origin = nullif(regexp_extract(base, originRegex, 1), lit(""))
    val baseScheme = nullif(regexp_extract(base,
      "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1), lit(""))
    val path = regexp_extract(base, basePathRegex, 1)
    val dir = when(path.contains("/"),
      regexp_extract(path, "^(.*/)", 1)).otherwise(lit("/"))
    val noFrag = regexp_extract(base, "^([^#]*)", 1)
    when(ref.isNull, lit(null))
      .when(regexp_extract(ref, "^([a-zA-Z][a-zA-Z0-9+.-]*):", 1) =!= "", ref)
      .when(origin.isNull, lit(null))
      .when(ref.startsWith("//"), concat(baseScheme, lit(":"), ref))
      .when(ref.startsWith("/"), concat(origin, ref))
      .when(ref.startsWith("?"), concat(origin, path, ref))
      .when(ref.startsWith("#"), concat(noFrag, ref))
      .when(ref === "", noFrag)
      .otherwise(concat(origin, dir, ref))
  }

  /** DuckDB replay of [[resolveUrl]] over SQL expressions `base` /
    * `ref` — shares [[originRegex]]/[[basePathRegex]] verbatim so the
    * engines cannot drift. `substr` prefix tests (not LIKE — refs
    * carry '%' from percent-encoding).
    */
  def resolveUrlSql(base: String, ref: String): String = {
    val origin = s"nullif(regexp_extract($base, ${sqlLit(originRegex)}, 1), '')"
    val scheme = s"nullif(regexp_extract($base, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1), '')"
    val path = s"regexp_extract($base, ${sqlLit(basePathRegex)}, 1)"
    val dir = s"CASE WHEN contains($path, '/') " +
      s"THEN regexp_extract($path, '^(.*/)', 1) ELSE '/' END"
    val noFrag = s"regexp_extract($base, '^([^#]*)', 1)"
    s"""CASE
       |  WHEN $ref IS NULL THEN NULL
       |  WHEN regexp_extract($ref, '^([a-zA-Z][a-zA-Z0-9+.-]*):', 1) <> '' THEN $ref
       |  WHEN $origin IS NULL THEN NULL
       |  WHEN substr($ref, 1, 2) = '//' THEN $scheme || ':' || $ref
       |  WHEN substr($ref, 1, 1) = '/' THEN $origin || $ref
       |  WHEN substr($ref, 1, 1) = '?' THEN $origin || $path || $ref
       |  WHEN substr($ref, 1, 1) = '#' THEN $noFrag || $ref
       |  WHEN $ref = '' THEN $noFrag
       |  ELSE $origin || $dir || $ref
       |END""".stripMargin
  }

  /** The tracking-parameter grammar [[urlNormalize]] strips (pinned,
    * oracle-shared): the utm_ family plus the big click-id params.
    * Matched against the full `name=value` pair (or a bare name).
    * `\z`, not `$`: Java's `$` also matches before a trailing line
    * terminator where RE2's matches only end-of-text — a harvested
    * value ending in `\n` would strip in Spark but survive the DuckDB
    * replay. `\z` means end-of-text in BOTH engines.
    */
  val trackingParamRegex: String =
    "^(utm_[^=&]*|gclid|fbclid|msclkid|mc_eid)(=.*)?\\z"

  /** Canonicalize an absolute URL into a DEDUP/FRONTIER KEY — the
    * variants real links mint for one resource collapse onto one
    * string. Pinned steps, each replayable in SQL:
    *
    *   1. fragment drops (client-side only);
    *   2. `scheme://authority` lowercases WHOLE (documented reduction:
    *      userinfo is case-sensitive per RFC 3986, but crawl keys
    *      rarely carry userinfo and a split-brain key is worse);
    *   3. a default port strips (`http://h:80/` = `http://h/`,
    *      `https://h:443/` = `https://h/`);
    *   4. tracking query params drop ([[trackingParamRegex]]) with
    *      their separators fixed up; a query left empty drops its '?';
    *   5. an empty path becomes "/" (`http://h` = `http://h/`).
    *
    * NO percent-decoding and NO dot-segment normalization (both can
    * change which resource a server serves — the over-key direction,
    * never the wrong-key one). NULL for inputs without an authority.
    */
  def urlNormalize(url: Column): Column = {
    val noFrag = regexp_extract(url, "^([^#]*)", 1)
    val origin0 = lower(nullif(regexp_extract(noFrag, originRegex, 1), lit("")))
    // \z end anchors throughout (see trackingParamRegex): engine-equal
    // end-of-text, where `$` would strip `:80\n` in Spark only
    val origin = regexp_replace(
      regexp_replace(origin0, "^(http://[^/?#]*):80\\z", "$1"),
      "^(https://[^/?#]*):443\\z", "$1")
    val rest = regexp_replace(noFrag, originRegex, "")
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(rest, "^[^?]*\\?(.*)\\z", 1)
    val kept = filter(split(query, "&"),
      p => !p.rlike(trackingParamRegex))
    val newq = array_join(kept, "&")
    // `http://` (empty authority) has a non-NULL origin but no host —
    // gate on host() too or the garbage key `http:///` mints
    when(origin.isNull || host(url).isNull, lit(null))
      .otherwise(concat(origin, path,
        when(newq === "", lit("")).otherwise(concat(lit("?"), newq))))
  }

  /** DuckDB replay of [[urlNormalize]] over SQL expression `url` —
    * shares [[originRegex]]/[[trackingParamRegex]] verbatim.
    */
  def urlNormalizeSql(url: String): String = {
    val noFrag = s"regexp_extract($url, '^([^#]*)', 1)"
    val origin0 = s"lower(nullif(regexp_extract($noFrag, ${sqlLit(originRegex)}, 1), ''))"
    val host0 = s"nullif(regexp_extract($url, ${sqlLit(hostRegex)}, 1), '')"
    val origin = s"regexp_replace(regexp_replace($origin0, " +
      raw"'^(http://[^/?#]*):80\z', '\1'), '^(https://[^/?#]*):443\z', '\1')"
    val rest = s"regexp_replace($noFrag, ${sqlLit(originRegex)}, '')"
    val path0 = s"regexp_extract($rest, '^([^?]*)', 1)"
    val path = s"CASE WHEN $path0 = '' THEN '/' ELSE $path0 END"
    val query = raw"regexp_extract($rest, '^[^?]*\?(.*)\z', 1)"
    // coalesce: DuckDB's array_to_string over an EMPTY list (every
    // param stripped) is NULL where Spark's array_join is '' — bare,
    // it would null the whole concatenation
    val newq = s"coalesce(array_to_string(list_filter(string_split($query, '&'), " +
      s"p -> NOT regexp_matches(p, ${sqlLit(trackingParamRegex)})), '&'), '')"
    s"""CASE WHEN $origin IS NULL OR $host0 IS NULL THEN NULL
       |  ELSE $origin || $path ||
       |    CASE WHEN $newq = '' THEN '' ELSE '?' || $newq END
       |END""".stripMargin
  }

  /** The two href-harvest patterns (double-quoted / single-quoted,
    * group 1 = target) — shared with the SQL oracles. `href` must sit
    * at an attribute boundary (tag start or after whitespace/quote):
    * a bare `[^>]*href` also matches `data-href`/`ng-href` and
    * harvests tracker URLs as outlinks. RE2-compatible (`\b` cannot
    * express this boundary — '-' to 'h' IS a word boundary — and RE2
    * has no lookbehind, so an optional separator-terminated prefix
    * group does it).
    */
  /** The attribute-boundary prefix ALL href-bearing harvest patterns
    * share ([[hrefDqRegex]]/[[hrefSqRegex]] here,
    * [[Html.anchorDqRegex]]/[[Html.anchorSqRegex]] for anchor text) —
    * one constant, so a boundary fix can never desynchronize the link
    * graph from the anchor-text signal.
    */
  val hrefAttrPrefix: String = "<a\\s(?:[^>]*[\\s\"'])?href\\s*=\\s*"

  val hrefDqRegex: String = "(?is)" + hrefAttrPrefix + "\"([^\"]*)\""
  val hrefSqRegex: String = "(?is)" + hrefAttrPrefix + "'([^']*)'"

  /** All href targets of `<a>` tags in an HTML column, in document
    * order double-quoted first then single-quoted (RE2-compatible
    * two-pass harvest — backreference-free, so the same two patterns
    * replay in any regex engine). Unquoted hrefs (rare, invalid
    * HTML5 for URLs with delimiters anyway) are not harvested —
    * documented extraction semantics, not a DOM walk.
    */
  def extractLinks(html: Column): Column = concat(
    regexp_extract_all(html, lit(hrefDqRegex), lit(1)),
    regexp_extract_all(html, lit(hrefSqRegex), lit(1)))

  /** A regex constant as a SQL string literal (single quotes doubled)
    * — how the oracles embed [[hostRegex]]/[[hrefDqRegex]]/
    * [[hrefSqRegex]] verbatim.
    */
  def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB replay of [[registeredDomain]] over SQL expression `host`
    * — shares [[TwoLevelSuffixes]] with the Spark side so the two can
    * never drift.
    */
  def registeredDomainSql(host: String,
      suffixes: Seq[String] = TwoLevelSuffixes): String = {
    val inList = suffixes.map(s => s"'$s'").mkString(", ")
    s"""CASE
       |  WHEN $host IS NULL THEN NULL
       |  WHEN regexp_extract($host, '([^.]+\\.[^.]+)\\z', 1) = '' THEN $host
       |  WHEN regexp_extract($host, '([^.]+\\.[^.]+\\.[^.]+)\\z', 1) <> ''
       |       AND regexp_extract($host, '([^.]+\\.[^.]+)\\z', 1) IN ($inList)
       |    THEN regexp_extract($host, '([^.]+\\.[^.]+\\.[^.]+)\\z', 1)
       |  ELSE regexp_extract($host, '([^.]+\\.[^.]+)\\z', 1)
       |END""".stripMargin
  }
}
