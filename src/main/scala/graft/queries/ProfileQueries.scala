package graft.queries

import graft.llm.{Profiling, Sketches, TextAnalysis}
import org.apache.spark.sql.functions._

/** Corpus-profiling and membership operators over the documents table:
  * stratified sampling, per-group quantiles, grouped argmax, inverted-
  * index stats, Bloom-filter probes, end-to-end decontamination, and
  * length histograms. All md5-keyed / exact-arithmetic, so every query
  * has a bit-exact DuckDB oracle.
  */
object ProfileQueries {
  import Registry.table

  val defs: Map[String, QueryDef] = Map(
    // ---- Fixed-size stratified sample: 20 docs per language, smallest
    // md5(doc_id) first — a bounded map-side-combinable aggregate, not a
    // per-stratum window sort.
    "q73_stratified_sample" -> QueryDef(
      (s, dir) => {
        Profiling.stratifiedSample(table(s, dir, "documents"), "lang", "doc_id", 20)
          .orderBy("stratum", "id")
      },
      Some("""WITH h AS (SELECT lang AS stratum, doc_id AS id,
             |            CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS sample_hash
             |          FROM documents),
             |r AS (SELECT stratum, id, sample_hash,
             |             row_number() OVER (PARTITION BY stratum ORDER BY sample_hash, id) AS rn
             |      FROM h)
             |SELECT stratum, id, sample_hash FROM r WHERE rn <= 20
             |ORDER BY stratum, id""".stripMargin)),

    // ---- Per-language length quartiles (exact percentile_cont over the
    // integer n_chars column; every interpolation term is exactly
    // representable so the doubles match bit-for-bit).
    "q74_length_quantiles" -> QueryDef(
      (s, dir) => {
        Profiling.groupQuantiles(table(s, dir, "documents"), "lang", "n_chars",
            Seq(0.25, 0.5, 0.75))
          .orderBy("lang", "q_idx")
      },
      Some("""WITH q AS (SELECT lang, count(*) AS n,
             |                  quantile_cont(n_chars, [0.25, 0.5, 0.75]) AS qs
             |           FROM documents GROUP BY lang)
             |SELECT lang, CAST(generate_subscripts(qs, 1) - 1 AS BIGINT) AS q_idx,
             |       round(unnest(qs), 4) AS q_value, n
             |FROM q ORDER BY lang, q_idx""".stripMargin)),

    // ---- Longest document per (lang, source) via map-side-combinable
    // max_by argmax (ties -> smallest doc_id); no window sort anywhere.
    "q75_best_per_group" -> QueryDef(
      (s, dir) => {
        Profiling.argmaxPerGroup(table(s, dir, "documents"),
            Seq("lang", "source"), "n_chars", "doc_id")
          .orderBy("lang", "source")
      },
      Some("""WITH m AS (SELECT lang, source, max(n_chars) AS best_n_chars,
             |                  count(*) AS n_rows
             |           FROM documents GROUP BY 1, 2)
             |SELECT m.lang, m.source, min(d.doc_id) AS best_id, m.best_n_chars, m.n_rows
             |FROM m JOIN documents d
             |  ON d.lang = m.lang AND d.source = m.source AND d.n_chars = m.best_n_chars
             |GROUP BY m.lang, m.source, m.best_n_chars, m.n_rows
             |ORDER BY m.lang, m.source""".stripMargin)),

    // ---- Inverted-index stats: document frequency + total term
    // frequency for the 100 highest-df terms.
    "q76_doc_frequency" -> QueryDef(
      (s, dir) => {
        TextAnalysis.docFrequency(table(s, dir, "documents"), "doc_id", "text", 100)
          .orderBy("term")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2),
             |top AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
             |        FROM tf GROUP BY term
             |        ORDER BY df DESC, term LIMIT 100)
             |SELECT term, df, total_tf FROM top ORDER BY term""".stripMargin)),

    // ---- Bloom-filter membership probe: 2048-bit filter over the
    // benchmark texts (doc_id % 97 = 0), probed by every document.
    // bloom_hit has no false negatives; the false positives are
    // deterministic, so the oracle reproduces them exactly.
    "q77_bloom_probe" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val bench = docs.filter(col("doc_id") % 97 === 0).select(col("text"))
        val words = Sketches.bloomBits(bench, "text", m = 2048, kHashes = 3)
        Sketches.bloomProbe(docs, "text", words, kHashes = 3)
          .join(broadcast(bench.distinct().withColumn("mflag", lit(1L))), Seq("text"), "left")
          .select(col("doc_id"), col("bloom_hit"),
            coalesce(col("mflag"), lit(0L)).as("is_member"))
          .orderBy("doc_id")
      },
      Some("""WITH bk AS (SELECT DISTINCT text AS key FROM documents WHERE doc_id % 97 = 0),
             |rs AS (SELECT unnest(range(0, 3)) AS r),
             |pos AS (SELECT DISTINCT
             |          CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || key), 1, 12) AS BIGINT) % 2048 AS p
             |        FROM bk, rs),
             |words AS (SELECT p // 32 AS w,
             |                 bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS word
             |          FROM pos GROUP BY 1),
             |probe AS (SELECT doc_id, text, r,
             |            CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || text), 1, 12) AS BIGINT) % 2048 AS p
             |          FROM documents, rs),
             |chk AS (SELECT doc_id, text,
             |               CASE WHEN (coalesce(word, 0) >> CAST(p % 32 AS INT)) & 1 = 1
             |                    THEN 1 ELSE 0 END AS ok
             |        FROM probe LEFT JOIN words ON words.w = probe.p // 32)
             |SELECT doc_id,
             |       CAST(min(ok) AS BIGINT) AS bloom_hit,
             |       CAST(CASE WHEN max(CASE WHEN text IN (SELECT key FROM bk) THEN 1 ELSE 0 END) = 1
             |            THEN 1 ELSE 0 END AS BIGINT) AS is_member
             |FROM chk GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- End-to-end decontamination: train docs sharing >= 3 distinct
    // word trigrams with any benchmark doc (doc_id % 97 = 0) are flagged
    // and dropped; one row per train doc with the keep decision.
    "q78_decontaminate" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
        TextAnalysis.decontaminate(
            docs.filter(col("doc_id") % 97 =!= 0),
            docs.filter(col("doc_id") % 97 === 0),
            "doc_id", "text", n = 3, minShared = 3L)
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |g AS (SELECT doc_id, unnest(range(1, len(ws) - 1)) AS i, ws FROM w),
             |sh AS (SELECT doc_id, ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] || ' ' || ws[CAST(i+2 AS INT)] AS s FROM g),
             |b AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 97 = 0),
             |t AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 97 <> 0),
             |pair AS (SELECT t.doc_id AS td, b.doc_id AS bd, count(*) AS n
             |         FROM t JOIN b ON t.s = b.s GROUP BY 1, 2),
             |bad AS (SELECT DISTINCT td FROM pair WHERE n >= 3)
             |SELECT d.doc_id,
             |       CAST(CASE WHEN bad.td IS NULL THEN 0 ELSE 1 END AS BIGINT) AS contaminated,
             |       CAST(CASE WHEN bad.td IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
             |FROM documents d LEFT JOIN bad ON bad.td = d.doc_id
             |WHERE d.doc_id % 97 <> 0 ORDER BY d.doc_id""".stripMargin)),

    // ---- Per-source document cap (domain rate limiting): at most 10
    // docs kept per source, deterministically the 10 smallest
    // md5(doc_id); every doc flagged, bounded aggregate + broadcast
    // flag join — no per-key window over the corpus.
    "q83_source_cap" -> QueryDef(
      (s, dir) => {
        Profiling.capPerKey(table(s, dir, "documents"), "source", "doc_id", 10)
          .select(col("doc_id"), col("source"), col("kept"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (SELECT doc_id, source,
             |            CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS sh
             |          FROM documents),
             |r AS (SELECT doc_id, source,
             |             row_number() OVER (PARTITION BY source ORDER BY sh, doc_id) AS rn
             |      FROM h)
             |SELECT doc_id, source, CAST(CASE WHEN rn <= 10 THEN 1 ELSE 0 END AS BIGINT) AS kept
             |FROM r ORDER BY doc_id""".stripMargin)),

    // ---- Power-of-two document length histogram (bucket = bit length
    // of n_chars): the corpus length profile in one bounded groupBy.
    "q79_length_histogram" -> QueryDef(
      (s, dir) => {
        Profiling.lengthHistogram(table(s, dir, "documents"), "n_chars")
          .orderBy("bucket")
      },
      Some("""SELECT CAST(CASE WHEN n_chars <= 0 THEN 0 ELSE length(bin(n_chars)) END AS BIGINT) AS bucket,
             |       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ---- Token frequency spectrum (Zipf / frequency-of-frequencies):
    // how many distinct tokens occur exactly c times. Two map-side-
    // combinable groupBys, post-partial-agg volume = distinct tokens
    // then distinct counts.
    "q90_frequency_spectrum" -> QueryDef(
      (s, dir) => {
        Profiling.frequencySpectrum(table(s, dir, "documents"), "text")
          .orderBy("occurrences")
      },
      Some("""WITH tc AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
             |c AS (SELECT tok, count(*) AS occurrences FROM tc WHERE tok <> '' GROUP BY tok)
             |SELECT occurrences, count(*) AS n_tokens FROM c
             |GROUP BY occurrences ORDER BY occurrences""".stripMargin)),

    // ---- Cross-source duplication matrix: distinct 10-word segments
    // shared by each source pair. One segment-keyed groupBy collecting
    // the bounded per-segment source set; pairs expand in-row — the
    // corpus never self-joins.
    "q91_source_overlap" -> QueryDef(
      (s, dir) => {
        graft.llm.Dedup.crossGroupSegmentOverlap(
            table(s, dir, "documents"), "source", "text", 10)
          .orderBy("src_a", "src_b")
      },
      Some("""WITH d AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
             |segs AS (SELECT source, CAST(unnest(range((len(ws) + 9) // 10)) AS BIGINT) AS seg_no, ws
             |         FROM d),
             |seg2 AS (SELECT DISTINCT source,
             |                array_to_string(ws[seg_no * 10 + 1 : seg_no * 10 + 10], ' ') AS seg
             |         FROM segs),
             |p AS (SELECT a.source AS src_a, b.source AS src_b
             |      FROM seg2 a JOIN seg2 b ON a.seg = b.seg AND a.source < b.source)
             |SELECT src_a, src_b, count(*) AS n_shared_segments
             |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- k-anonymity audit: customers bucketed by the quasi
    // identifiers (nation, segment, banded balance); every equivalence
    // class smaller than 5 re-identifies its members — the suppression
    // work list a privacy release review starts from.
    "q215_k_anonymity" -> QueryDef(
      (s, dir) => {
        val c = Registry.table(s, dir, "customer")
          .withColumn("bal_band",
            floor(col("c_acctbal") / 1000).cast("long"))
        graft.llm.Profiling.kAnonymity(c, k = 5,
            Seq("c_nationkey", "c_mktsegment", "bal_band"))
          .orderBy("c_nationkey", "c_mktsegment", "bal_band")
      },
      Some("""WITH g AS (SELECT c_nationkey, c_mktsegment,
             |                  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             |                  CAST(count(*) AS BIGINT) AS class_size
             |           FROM customer GROUP BY 1, 2, 3)
             |SELECT c_nationkey, c_mktsegment, bal_band, class_size
             |FROM g WHERE class_size < 5
             |ORDER BY c_nationkey, c_mktsegment, bal_band""".stripMargin)),

    // ---- Functional-dependency profile over candidate column pairs on
    // events: event_id→user_id holds (keys determine everything),
    // user_id→event_type and event_type→user_id fail with measured
    // fan-outs. One two-level aggregation per pair, no count-distinct
    // shuffle of raw rows.
    "q224_fd_profile" -> QueryDef(
      (s, dir) => {
        Profiling.fdProfile(Registry.table(s, dir, "events"),
            Seq(("event_id", "user_id"), ("event_type", "user_id"),
              ("user_id", "event_type")))
          .orderBy("det_col", "dep_col")
      },
      Some {
        def branch(det: String, dep: String) =
          s"""SELECT '$det' AS det_col, '$dep' AS dep_col,
             |       CAST(count(*) AS BIGINT) AS n_dets,
             |       CAST(coalesce(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violating,
             |       CAST(coalesce(max(nb), 0) AS BIGINT) AS max_branch,
             |       CAST(CASE WHEN coalesce(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END), 0) = 0
             |            THEN 1 ELSE 0 END AS BIGINT) AS holds
             |FROM (SELECT $det, CAST(count(DISTINCT $dep) AS BIGINT) AS nb
             |      FROM events WHERE $det IS NOT NULL GROUP BY 1) q""".stripMargin
        Seq(branch("event_id", "user_id"), branch("event_type", "user_id"),
          branch("user_id", "event_type"))
          .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
            "\n) u ORDER BY det_col, dep_col")
      }),

    // ---- Equi-depth (equal-population) histogram boundaries of
    // document lengths per language — the optimizer statistic; exact
    // ⌈b·n/B⌉-rank boundaries from the value-compressed histogram.
    "q236_equidepth_histogram" -> QueryDef(
      (s, dir) => {
        Profiling.equiDepthHistogram(Registry.table(s, dir, "documents"),
            "lang", "n_chars", nBuckets = 4)
          .orderBy("lang", "bucket")
      },
      Some("""WITH h AS (SELECT lang, CAST(n_chars AS BIGINT) AS v,
             |                  CAST(count(*) AS BIGINT) AS n
             |           FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
             |c AS (SELECT h.*, CAST(sum(n) OVER (PARTITION BY lang ORDER BY v
             |                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM h),
             |t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_rows FROM h GROUP BY 1),
             |b AS (SELECT unnest(range(1, 5)) AS bucket),
             |g AS (SELECT t.lang, CAST(b.bucket AS BIGINT) AS bucket, t.n_rows,
             |             CAST((b.bucket * t.n_rows + 3) // 4 AS BIGINT) AS target_rank
             |      FROM t CROSS JOIN b)
             |SELECT g.lang, g.bucket, min(c.v) AS upper_value,
             |       min(g.target_rank) AS target_rank, min(g.n_rows) AS n_rows
             |FROM g JOIN c ON c.lang = g.lang AND c.cum >= g.target_rank
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- Declarative constraint suite on events (Deequ-shaped):
    // completeness, key uniqueness, categorical domain, numeric range —
    // violation COUNTS, each check one narrow aggregation. The in_set
    // check deliberately omits 'error' so the report shows a real
    // failure alongside passes.
    "q233_constraint_report" -> QueryDef(
      (s, dir) => {
        import graft.llm.Checks
        val ev = Registry.table(s, dir, "events")
          .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
        Checks.run(ev, Seq(
            Checks.NotNull("user_id"),
            Checks.Unique(Seq("event_id")),
            Checks.InSet("event_type",
              Seq("click", "purchase", "signup", "view")),
            Checks.InRange("cents", 0L, 20000L)))
          .orderBy("check_name")
      },
      Some("""SELECT check_name, n_violations,
             |       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
             |FROM (
             |  SELECT 'not_null(user_id)' AS check_name,
             |         CAST(coalesce(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations
             |  FROM events
             |  UNION ALL
             |  SELECT 'unique(event_id)',
             |         CAST(coalesce((SELECT sum(n - 1) FROM
             |           (SELECT count(*) AS n FROM events GROUP BY event_id) g
             |           WHERE n > 1), 0) AS BIGINT)
             |  UNION ALL
             |  SELECT 'in_set(event_type)',
             |         CAST(coalesce(sum(CASE WHEN event_type IS NOT NULL AND event_type
             |           NOT IN ('click', 'purchase', 'signup', 'view') THEN 1 ELSE 0 END), 0) AS BIGINT)
             |  FROM events
             |  UNION ALL
             |  SELECT 'in_range(cents,0,20000)',
             |         CAST(coalesce(sum(CASE WHEN c IS NOT NULL AND (c < 0 OR c > 20000)
             |           THEN 1 ELSE 0 END), 0) AS BIGINT)
             |  FROM (SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events)
             |) t ORDER BY check_name""".stripMargin)),

    // ---- Per-column completeness/cardinality profile of events — the
    // schema-registry snapshot summary; one narrow scan per column.
    "q234_column_profile" -> QueryDef(
      (s, dir) => {
        graft.llm.Checks.columnProfile(Registry.table(s, dir, "events"),
            Seq("event_id", "user_id", "event_type", "value", "props"))
          .orderBy("column_name")
      },
      Some {
        def branch(c: String) =
          s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(coalesce(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_null,
             |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
             |FROM events""".stripMargin
        Seq("event_id", "user_id", "event_type", "value", "props")
          .map(branch)
          .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
            "\n) t ORDER BY column_name")
      }),

    // ---- Dense global row ids in (n_chars, doc_id) order via
    // range-repartition + zipWithIndex — the sample-id assignment that
    // does NOT funnel the corpus through a single-partition
    // row_number() window (the oracle's formulation, correct only at
    // oracle scale).
    "q231_global_ids" -> QueryDef(
      (s, dir) => {
        graft.operators.GlobalIds.withGlobalIds(
            Registry.table(s, dir, "documents")
              .select("doc_id", "n_chars"),
            Seq("n_chars", "doc_id"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_chars,
             |       CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS BIGINT) AS row_id
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- 2-D skyline of documents on (length, vocabulary size): the
    // Pareto frontier of "long AND lexically rich" — the classic
    // best-tradeoff operator, swept on the value-compressed length
    // table.
    "q261_skyline" -> QueryDef(
      (s, dir) => {
        val b = Registry.table(s, dir, "documents")
          .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
            size(array_distinct(filter(split(col("text"), " "),
              t => t =!= lit("")))).cast("long").as("n_types"))
        graft.llm.Profiling.skyline2D(b, "n_chars", "n_types")
          .select("doc_id", "n_chars", "n_types")
          .orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             |                  CAST(len(list_distinct(list_filter(
             |                    string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS n_types
             |           FROM documents),
             |mx AS (SELECT n_chars, max(n_types) AS my FROM b GROUP BY 1),
             |f AS (SELECT mx.*, max(my) OVER (ORDER BY n_chars DESC
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
             |      FROM mx),
             |k AS (SELECT n_chars, my FROM f WHERE prev IS NULL OR my > prev)
             |SELECT b.doc_id, b.n_chars, b.n_types
             |FROM b JOIN k ON b.n_chars = k.n_chars AND b.n_types = k.my
             |ORDER BY doc_id""".stripMargin)),

    // ---- Hill tail-index of document lengths per language (top-20
    // order statistics, once-rounded micro-nat logs): the power-law
    // heaviness gauge — 1/Hill ≈ Pareto α, the "how bad does the
    // biggest shard get" number.
    "q244_hill_tail" -> QueryDef(
      (s, dir) => {
        Profiling.hillTailIndex(Registry.table(s, dir, "documents"),
            "lang", "n_chars", "doc_id", k = 20)
          .orderBy("lang")
      },
      Some("""WITH v AS (SELECT lang, n_chars, doc_id,
             |                  row_number() OVER (PARTITION BY lang
             |                    ORDER BY n_chars DESC, doc_id) AS rk
             |           FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
             |t AS (SELECT lang, rk,
             |             CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1000000.0) AS BIGINT) AS lnv
             |      FROM v WHERE rk <= 21),
             |a AS (SELECT lang,
             |             CAST(sum(CASE WHEN rk <= 20 THEN lnv ELSE 0 END) AS BIGINT) AS top,
             |             CAST(sum(CASE WHEN rk = 21 THEN lnv ELSE 0 END) AS BIGINT) AS ref,
             |             max(rk) AS mx
             |      FROM t GROUP BY 1)
             |SELECT lang, CAST(20 AS BIGINT) AS k,
             |       CAST((2 * (top - 20 * ref) + 20) // 40 AS BIGINT) AS hill_micro
             |FROM a WHERE mx = 21 ORDER BY lang""".stripMargin)),

    // ---- l-diversity audit on customer: quasi-identifier classes
    // (nation, segment) whose members span fewer than 9 distinct
    // account-balance bands — the k-anonymity companion (a uniform
    // class leaks the sensitive value even when large).
    "q228_l_diversity" -> QueryDef(
      (s, dir) => {
        val c = Registry.table(s, dir, "customer")
          .withColumn("bal_band",
            floor(col("c_acctbal") / 1000).cast("long"))
        graft.llm.Profiling.lDiversity(c, l = 9,
            Seq("c_nationkey", "c_mktsegment"), "bal_band")
          .orderBy("c_nationkey", "c_mktsegment")
      },
      Some("""WITH g AS (SELECT c_nationkey, c_mktsegment,
             |                  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
             |           FROM customer),
             |c AS (SELECT c_nationkey, c_mktsegment,
             |             CAST(count(*) AS BIGINT) AS class_size,
             |             CAST(count(DISTINCT bal_band) AS BIGINT) AS n_sensitive
             |      FROM g GROUP BY 1, 2)
             |SELECT c_nationkey, c_mktsegment, class_size, n_sensitive
             |FROM c WHERE n_sensitive < 9
             |ORDER BY c_nationkey, c_mktsegment""".stripMargin)))
}
