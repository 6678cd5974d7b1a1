package graft.queries

import graft.core.ChunkPlanner
import graft.functions.{Entropy, TimeConv}
import graft.scan.AhoCorasick
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Relational surface of the engine over the driver's synthetic tables —
  * each query exercises one SURVEY §2 operator with an exact DuckDB oracle.
  *
  * Determinism rules: every query ends in an ORDER BY over a unique key;
  * every computed integer is BIGINT on both sides; monetary doubles are
  * scaled to exact integer cents; entropies are rounded to 4 decimals.
  */
object RelationalQueries {
  import Registry.table

  /** Exact integer cents from a 2-decimal double column. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  private val scanPatterns = Seq("data", "scan", "join")

  /** DuckDB-side URL/email/phone scan patterns oracle fragment: emits all
    * (doc_id, byte_offset, pattern_id) for the fixed pattern table.
    */
  private val scanOracle =
    """WITH pos AS (SELECT doc_id, text, unnest(range(1, length(text)+1)) AS i FROM documents)
      |SELECT doc_id, CAST(i-1 AS BIGINT) AS byte_offset, pattern_id
      |FROM pos, (VALUES (0,'data'),(1,'scan'),(2,'join')) AS pats(pattern_id, pat)
      |WHERE substr(text, CAST(i AS INTEGER), length(pat)) = pat
      |ORDER BY doc_id, byte_offset, pattern_id""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    // ---- Aggregations: run counters (SURVEY §2.5; reference pipeline/mod.rs:256-264)
    "q01_run_summary" -> QueryDef(
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        li.agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          sum(cents(col("l_quantity"))).as("qty_cents"),
          sum(cents(col("l_extendedprice"))).as("price_cents"))
      },
      Some("""SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders,
             |CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_cents,
             |CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents
             |FROM lineitem""".stripMargin)),

    "q02_agg_flag_status" -> QueryDef(
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            count(lit(1)).as("n_rows"),
            sum(cents(col("l_quantity"))).as("qty_cents"),
            sum(cents(col("l_extendedprice"))).as("price_cents"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
             |CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_cents,
             |CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- Source: chunk planning (SURVEY §2.1; reference src/chunk.rs:9-35)
    "q03_chunk_plan" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val totalLen = docs.agg(sum(col("n_chars"))).as[Long].head()
        ChunkPlanner.plan(s, totalLen, 4096L, 512L)
          .select(
            col("id"), col("start"), col("length"),
            col("validLength").as("valid_length"))
          .orderBy("id")
      },
      Some("""WITH p AS (SELECT CAST(sum(n_chars) AS BIGINT) AS l FROM documents),
             |ids AS (SELECT unnest(range(0, (l + 4095)//4096)) AS i, l FROM p)
             |SELECT i AS id, i*4096 AS start,
             |least(l - i*4096, 4608) AS length,
             |least(l - i*4096, 4096) AS valid_length
             |FROM ids ORDER BY id""".stripMargin)),

    // ---- Pattern scan (SURVEY §2.2; reference src/scanner/cpu.rs:40-69)
    "q04_signature_scan" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ac = AhoCorasick.buildFromStrings(scanPatterns)
        table(s, dir, "documents")
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .flatMap { case (docId, text) =>
            val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
            ac.scan(text.getBytes("UTF-8"))((start, pat) => hits += ((docId, start.toLong, pat)))
            hits
          }
          .toDF("doc_id", "byte_offset", "pattern_id")
          .orderBy("doc_id", "byte_offset", "pattern_id")
      },
      Some(scanOracle)),

    // ---- Overlap-ownership dedup: exactly-once under chunk overlap
    // (reference pipeline/workers.rs:136-143). Scans each document through
    // an overlapped 64/16 chunk plan and must reproduce the direct scan.
    "q05_chunked_scan_dedup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ac = AhoCorasick.buildFromStrings(Seq("data"))
        table(s, dir, "documents")
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .flatMap { case (docId, text) =>
            val bytes = text.getBytes("UTF-8")
            ChunkPlanner.planLocal(bytes.length.toLong, 64L, 16L).flatMap { ch =>
              val from = ch.start.toInt
              val until = math.min(bytes.length, (ch.start + ch.length).toInt)
              val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
              ac.scan(bytes, from, until) { (start, _) =>
                val local = start - from
                if (local < ch.validLength) hits += ((docId, ch.start + local))
              }
              hits
            }
          }
          .toDF("doc_id", "byte_offset")
          .orderBy("doc_id", "byte_offset")
      },
      Some("""WITH pos AS (SELECT doc_id, text, unnest(range(1, length(text)+1)) AS i FROM documents)
             |SELECT doc_id, CAST(i-1 AS BIGINT) AS byte_offset
             |FROM pos WHERE substr(text, CAST(i AS INTEGER), 4) = 'data'
             |ORDER BY doc_id, byte_offset""".stripMargin)),

    // ---- Joins (SURVEY §2.4): visits⋈urls analog, broadcast inner join
    "q06_join_orders_customer" -> QueryDef(
      (s, dir) => {
        val o = table(s, dir, "orders")
        val c = table(s, dir, "customer")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .select(
            col("o_orderkey"), col("c_name"), col("o_orderstatus"),
            cents(col("o_totalprice")).as("price_cents"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, c_name, o_orderstatus,
             |CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    "q07_join_customer_nation_region" -> QueryDef(
      (s, dir) => {
        val c = table(s, dir, "customer")
        val n = table(s, dir, "nation")
        val r = table(s, dir, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_customers"), sum(cents(col("c_acctbal"))).as("acctbal_cents"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name, count(*) AS n_customers,
             |CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // downloads ⟕ url_chains analog: left join + COALESCE fallback chain
    // (reference src/parsers/sqlite_db.rs:464-505)
    "q08_left_join_coalesce" -> QueryDef(
      (s, dir) => {
        val o = table(s, dir, "orders")
        val li = table(s, dir, "lineitem").filter(col("l_linenumber") === 1)
        o.join(li, o("o_orderkey") === li("l_orderkey"), "left")
          .select(
            col("o_orderkey"),
            coalesce(col("l_returnflag"), col("o_orderstatus")).as("flag"),
            cents(col("l_quantity")).as("qty_cents"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |COALESCE(l_returnflag, o_orderstatus) AS flag,
             |CAST(round(l_quantity*100) AS BIGINT) AS qty_cents
             |FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_linenumber = 1) l
             |ON o_orderkey = l_orderkey ORDER BY o_orderkey""".stripMargin)),

    // ---- Dedup, first-non-null-wins (reference sqlite_pages.rs:100-123)
    "q09_first_visit_dedup" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "events")
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        e.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("first_type"), col("ts").as("first_ts"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_type AS first_type, ts AS first_ts
             |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events)
             |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // ---- Shannon entropy (SURVEY §2.5; reference src/entropy.rs:76-91)
    // via the native codegen'd Catalyst expression (no UDF in the plan)
    "q10_doc_entropy" -> QueryDef(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        table(s, dir, "documents")
          .select(col("doc_id"),
            round(call_function("shannon_entropy", col("text").cast("binary")), 4).as("entropy"))
          .orderBy("doc_id")
      },
      Some("""WITH pos AS (SELECT doc_id, length(text) AS len, text, unnest(range(1, length(text)+1)) AS i FROM documents),
             |h AS (SELECT doc_id, len, substr(text, CAST(i AS INTEGER), 1) AS ch, count(*) AS c
             |      FROM pos GROUP BY doc_id, len, ch)
             |SELECT doc_id, round(-sum((c/CAST(len AS DOUBLE))*log2(c/CAST(len AS DOUBLE))), 4) AS entropy
             |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- Entropy regions: windowed entropy + gaps-and-islands merge
    // (reference src/entropy.rs:3-91, stride == window == 64 chars here)
    "q11_entropy_islands" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .flatMap { case (docId, text) =>
            Entropy.detectRegions(0L, text.getBytes("UTF-8"), 64, 4.1)
              .map { case (start, end, maxE) => (docId, start, end, maxE) }
          }
          .toDF("doc_id", "region_start", "region_end", "max_e")
          .select(
            col("doc_id"), col("region_start"), col("region_end"),
            round(col("max_e"), 4).as("max_entropy"))
          .orderBy("doc_id", "region_start")
      },
      Some("""WITH wins AS (SELECT doc_id, text, unnest(range(0, length(text)//64)) AS w FROM documents),
             |pos AS (SELECT doc_id, w, unnest(range(1, 65)) AS i, substr(text, CAST(w*64+1 AS BIGINT), 64) AS win FROM wins),
             |h AS (SELECT doc_id, w, substr(win, CAST(i AS INTEGER), 1) AS ch, count(*) AS c FROM pos GROUP BY doc_id, w, ch),
             |ent AS (SELECT doc_id, w, -sum((c/64.0)*log2(c/64.0)) AS e FROM h GROUP BY doc_id, w),
             |hi AS (SELECT doc_id, w, e, w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS island
             |       FROM ent WHERE e >= 4.1)
             |SELECT doc_id, min(w)*64 AS region_start, max(w)*64 + 63 AS region_end,
             |round(max(e), 4) AS max_entropy
             |FROM hi GROUP BY doc_id, island ORDER BY doc_id, region_start""".stripMargin)),

    // ---- Timestamp conversions (SURVEY §2.7; reference src/parsers/time.rs)
    "q12_time_conversions" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "events")
        val wk = lit(13303449600000000L) + col("event_id") * lit(1000000L)
        e.select(
          col("event_id"),
          TimeConv.webkitMicros(wk).as("webkit_ts"),
          TimeConv.unixMicros(lit(1700000000000000L) + col("event_id")).as("unix_ts"),
          TimeConv.unixSeconds(lit(1700000000L) + col("event_id")).as("expiry_ts"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |make_timestamp(13303449600000000 + event_id*1000000 - 11644473600000000) AS webkit_ts,
             |make_timestamp(1700000000000000 + event_id) AS unix_ts,
             |make_timestamp((1700000000 + event_id) * 1000000) AS expiry_ts
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---- Transition labels (reference src/parsers/sqlite_db.rs:624-653)
    "q13_transition_labels" -> QueryDef(
      (s, dir) => {
        table(s, dir, "events")
          .select(
            col("event_id"),
            TimeConv.chromeTransitionLabel(col("event_id")).as("chrome_label"),
            TimeConv.firefoxVisitLabel(col("event_id") % 12).as("firefox_label"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |CASE (event_id & 255)
             |  WHEN 0 THEN 'link' WHEN 1 THEN 'typed' WHEN 2 THEN 'auto_bookmark'
             |  WHEN 3 THEN 'auto_subframe' WHEN 4 THEN 'manual_subframe' WHEN 5 THEN 'generated'
             |  WHEN 6 THEN 'auto_toplevel' WHEN 7 THEN 'form_submit' WHEN 8 THEN 'reload'
             |  WHEN 9 THEN 'keyword' WHEN 10 THEN 'keyword_generated' ELSE 'other' END AS chrome_label,
             |CASE (event_id % 12)
             |  WHEN 1 THEN 'link' WHEN 2 THEN 'typed' WHEN 3 THEN 'bookmark' WHEN 4 THEN 'embed'
             |  WHEN 5 THEN 'redirect_permanent' WHEN 6 THEN 'redirect_temporary'
             |  WHEN 7 THEN 'download' WHEN 8 THEN 'framed_link' ELSE 'other' END AS firefox_label
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---- Hash/hex scalar functions (SURVEY §2.7)
    "q16_hash_hex" -> QueryDef(
      (s, dir) => {
        table(s, dir, "documents")
          .select(
            col("doc_id"),
            md5(col("text")).as("md5_hex"),
            sha2(col("text"), 256).as("sha256_hex"),
            upper(hex(substring(col("text"), 1, 4))).as("head_hex"),
            length(col("text")).cast("long").as("text_len"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex,
             |upper(hex(substr(text, 1, 4))) AS head_hex,
             |CAST(length(text) AS BIGINT) AS text_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Output file naming (reference src/carve/mod.rs:151-156)
    "q17_file_naming" -> QueryDef(
      (s, dir) => {
        table(s, dir, "documents")
          .select(
            col("doc_id"),
            format_string("%s_%012X.%s", lit("jpeg"), col("doc_id") * 4096, lit("jpg")).as("file_name"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, printf('%s_%012X.%s', 'jpeg', doc_id*4096, 'jpg') AS file_name
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Top-k / limit (SURVEY §2.6; reference max_files caps)
    "q19_topk_orders" -> QueryDef(
      (s, dir) => {
        table(s, dir, "orders")
          .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
          .orderBy(col("price_cents").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
             |FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ---- Set ops: allow/deny lists (reference src/util.rs:574-696)
    "q20_set_ops" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "events")
        val all = e.filter(col("event_type").isin("click", "view", "purchase", "signup", "error"))
          .select(col("user_id"), col("event_type")).distinct()
        val err = e.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_type")).distinct()
        all.except(err).orderBy("user_id", "event_type")
      },
      Some("""SELECT DISTINCT user_id, event_type FROM events
             |WHERE event_type IN ('click','view','purchase','signup','error')
             |EXCEPT SELECT DISTINCT user_id, event_type FROM events WHERE event_type = 'error'
             |ORDER BY user_id, event_type""".stripMargin)),

    // ---- Hierarchical rollup: order totals by (status, priority) with
    // subtotals per status and a grand total. grouping() flags make the
    // subtotal rows explicit; all levels come out of ONE partial-agg
    // pass (Catalyst Expand), not one scan per level.
    "q85_rollup" -> QueryDef(
      (s, dir) => {
        table(s, dir, "orders")
          .withColumn("price_cents", cents(col("o_totalprice")))
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"), sum(col("price_cents")).as("total_cents"),
            grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_prio"))
          .select(
            coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
            coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
            col("n_orders"), col("total_cents"), col("g_status"), col("g_prio"))
          .orderBy("g_status", "g_prio", "status", "priority")
      },
      Some("""SELECT coalesce(o_orderstatus, '<all>') AS status,
             |       coalesce(o_orderpriority, '<all>') AS priority,
             |       count(*) AS n_orders,
             |       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents,
             |       CAST(CASE WHEN GROUPING(o_orderstatus) = 1 THEN 1 ELSE 0 END AS BIGINT) AS g_status,
             |       CAST(CASE WHEN GROUPING(o_orderpriority) = 1 THEN 1 ELSE 0 END AS BIGINT) AS g_prio
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY g_status, g_prio, status, priority""".stripMargin)),

    // ---- Pivot: per-user event counts spread across event-type columns
    // (the reporting shape). Spark's pivot is one partial-agg pass with
    // the pivot values fixed up front — at scale always pass the value
    // list explicitly or the planner first runs a distinct scan.
    "q86_pivot" -> QueryDef(
      (s, dir) => {
        table(s, dir, "events")
          .groupBy(col("user_id"))
          .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .select(col("user_id"), col("click").as("n_click"), col("view").as("n_view"),
            col("purchase").as("n_purchase"), col("signup").as("n_signup"),
            col("error").as("n_error"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |  CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS n_click,
             |  CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS n_view,
             |  CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS n_purchase,
             |  CAST(coalesce(sum(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS BIGINT) AS n_signup,
             |  CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END), 0) AS BIGINT) AS n_error
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- Blocked fuzzy record linkage over part names: exact-dup
    // collapse first, then an equi-key blocked join on (first token,
    // length band) — never a cartesian — with an edit-distance ≤ 3
    // filter. The band probe is LOSSLESS within a token block
    // (lev ≤ d ⇒ length diff ≤ d ⇒ adjacent bands), so the oracle is
    // the plain within-block all-pairs formulation.
    "q212_fuzzy_blocked_join" -> QueryDef(
      (s, dir) => {
        graft.llm.Dedup.fuzzyBlockedPairs(table(s, dir, "part"), "p_name",
            maxDist = 3)
          .orderBy("block_tok", "val_a", "val_b")
      },
      Some("""WITH v AS (SELECT p_name AS v, CAST(count(*) AS BIGINT) AS n
             |           FROM part WHERE p_name IS NOT NULL AND p_name <> ''
             |           GROUP BY 1),
             |t AS (SELECT v, n, string_split(v, ' ')[1] AS tok FROM v)
             |SELECT a.tok AS block_tok, a.v AS val_a, b.v AS val_b,
             |       CAST(levenshtein(a.v, b.v) AS BIGINT) AS dist,
             |       a.n AS n_a, b.n AS n_b
             |FROM t a JOIN t b ON a.tok = b.tok AND a.v < b.v
             |WHERE levenshtein(a.v, b.v) <= 3
             |ORDER BY block_tok, val_a, val_b""".stripMargin)),

    // ---- Join-size estimate WITHOUT the join: per-key histograms of
    // orders.o_custkey × customer.c_custkey meet on a distinct-keys
    // frame; exact Σ n_a·n_b plus the top contributing keys — the
    // probe you run before committing a 100-TB shuffle (and the
    // salting target list if it explodes).
    "q237_join_size_estimate" -> QueryDef(
      (s, dir) => {
        graft.llm.Profiling.joinSizeEstimate(
            Registry.table(s, dir, "orders"), "o_custkey",
            Registry.table(s, dir, "customer"), "c_custkey", topN = 15)
          .orderBy("join_key")
      },
      Some("""WITH ca AS (SELECT o_custkey AS join_key, CAST(count(*) AS BIGINT) AS n_a
             |            FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
             |cb AS (SELECT c_custkey AS join_key, CAST(count(*) AS BIGINT) AS n_b
             |       FROM customer WHERE c_custkey IS NOT NULL GROUP BY 1),
             |j AS (SELECT ca.join_key, n_a, n_b,
             |             CAST(n_a * n_b AS BIGINT) AS contrib
             |      FROM ca JOIN cb USING (join_key)),
             |t AS (SELECT CAST(coalesce(sum(contrib), 0) AS BIGINT) AS est_total FROM j),
             |top AS (SELECT j.*, t.est_total FROM j CROSS JOIN t
             |        ORDER BY contrib DESC, join_key LIMIT 15)
             |SELECT * FROM top ORDER BY join_key""".stripMargin)),

    // ---- CDC changelog apply (MERGE INTO as a transform): orders +
    // a synthetic log with double-updates (latest wins), deletes, a
    // same-seq update/delete tie (delete wins), and keyed inserts —
    // one max_by aggregation, no window sort, no join back to base.
    "q232_cdc_apply" -> QueryDef(
      (s, dir) => {
        val o = Registry.table(s, dir, "orders")
        def tag(df: org.apache.spark.sql.DataFrame, seq: Long, op: String) =
          df.withColumn("graft_seq", lit(seq)).withColumn("graft_op", lit(op))
        val k = col("o_orderkey")
        val changes = Seq(
          tag(o.filter(k % 10 === 3)
            .withColumn("o_totalprice", col("o_totalprice") + 1.0), 1L, "U"),
          tag(o.filter(k % 10 === 3)
            .withColumn("o_totalprice", col("o_totalprice") + 2.0), 3L, "U"),
          tag(o.filter(k % 17 === 0 && k % 10 =!= 3), 2L, "D"),
          tag(o.filter(k % 10 === 7)
            .withColumn("o_totalprice", col("o_totalprice") + 9.0), 5L, "U"),
          tag(o.filter(k % 10 === 7), 5L, "D"),
          tag(o.filter(k % 10 === 1)
            .withColumn("o_orderkey", -k), 1L, "I")
        ).reduce(_ unionByName _)
        graft.operators.CdcApply.applyChangelog(
            o, changes, Seq("o_orderkey"), "graft_seq", "graft_op")
          .orderBy("o_orderkey")
      },
      Some("""SELECT * FROM (
             |  SELECT o_orderkey, o_custkey, o_orderstatus,
             |         CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice + 2.0
             |              ELSE o_totalprice END AS o_totalprice,
             |         o_orderdate, o_orderpriority
             |  FROM orders
             |  WHERE NOT (o_orderkey % 17 = 0 AND o_orderkey % 10 <> 3)
             |    AND o_orderkey % 10 <> 7
             |  UNION ALL
             |  SELECT -o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |         o_orderdate, o_orderpriority
             |  FROM orders WHERE o_orderkey % 10 = 1
             |) t ORDER BY o_orderkey""".stripMargin)))
}
