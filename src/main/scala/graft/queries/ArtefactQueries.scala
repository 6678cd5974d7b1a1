package graft.queries

import graft.artefacts.Artefacts
import graft.scan.StringScan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}

/** String-artefact pipeline queries: extraction regexes + normalization
  * parity, URL-part splitting, path sanitization, printable-span scanning.
  * Each builds deterministic synthetic text from the documents table in
  * BOTH engines identically, then runs the real engine code on the Spark
  * side and a SQL re-derivation of the reference semantics on the DuckDB
  * side (semantics: reference src/strings/mod.rs, src/metadata/parquet.rs,
  * src/carve/mod.rs:166-190).
  */
object ArtefactQueries {
  import Registry.table

  /** Synthetic artefact-bearing message, per document. Must stay textually
    * identical to the SQL `msgSql` below.
    */
  private def msgCol: Column = concat(
    lit("visit https://"), col("source"), col("doc_id").cast("string"),
    lit(".example.com/a/b?x=1#frag or www."), col("lang"), col("doc_id").cast("string"),
    lit(".org. mail "), col("source"), lit(".user@mail"), col("doc_id").cast("string"),
    lit(".example.org, call +1 415 555 "), lpad(col("doc_id").cast("string"), 4, "0"),
    lit(" not 1111111111 or http://nohost end"))

  private val msgSql =
    """'visit https://' || source || CAST(doc_id AS VARCHAR) ||
      |'.example.com/a/b?x=1#frag or www.' || lang || CAST(doc_id AS VARCHAR) ||
      |'.org. mail ' || source || '.user@mail' || CAST(doc_id AS VARCHAR) ||
      |'.example.org, call +1 415 555 ' || lpad(CAST(doc_id AS VARCHAR), 4, '0') ||
      |' not 1111111111 or http://nohost end'""".stripMargin.replace("\n", " ")

  /** DuckDB trailing-punct trim — same set as Artefacts.trimTrailingPunct. */
  private def sqlTrim(e: String): String = s"""rtrim($e, '.,;:)]}"''><')"""

  val defs: Map[String, QueryDef] = Map(
    // ---- URL/email/phone extraction + normalization (reference
    // src/strings/mod.rs:117-123 regexes, :261-322 normalizers)
    "q14_artefact_extract" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        table(s, dir, "documents")
          .select(col("doc_id"), msgCol.as("msg"))
          .as[(Long, String)]
          .flatMap { case (docId, msg) =>
            Artefacts.extractAll(msg).map(f => (docId, f.kind, f.content))
          }
          .toDF("doc_id", "kind", "content")
          .orderBy("doc_id", "kind", "content")
      },
      Some(s"""WITH m AS (SELECT doc_id, $msgSql AS msg FROM documents),
              |urls_raw AS (
              |  SELECT doc_id, unnest(regexp_extract_all(msg, '(?i)\\b(?:https?://|www\\.)[^\\s"''<>]+')) AS v FROM m),
              |urls_t AS (SELECT doc_id, ${sqlTrim("v")} AS t FROM urls_raw),
              |urls AS (
              |  SELECT doc_id, 'Url' AS kind, t AS content FROM (
              |    SELECT doc_id, t,
              |      CASE WHEN lower(t) LIKE 'http://%' THEN substr(t, 8)
              |           WHEN lower(t) LIKE 'https://%' THEN substr(t, 9)
              |           WHEN lower(t) LIKE 'www.%' THEN substr(t, 5)
              |           ELSE NULL END AS rest
              |    FROM urls_t WHERE length(t) BETWEEN 8 AND 2048)
              |  , LATERAL (SELECT CASE WHEN instr(rest, '/') > 0 THEN substr(rest, 1, instr(rest, '/')-1) ELSE rest END AS host_port) hp
              |  , LATERAL (SELECT CASE WHEN instr(host_port, ':') > 0 THEN substr(host_port, 1, instr(host_port, ':')-1) ELSE host_port END AS host) h
              |  WHERE rest IS NOT NULL AND host <> '' AND length(host) <= 253
              |    AND contains(host, '.') AND NOT host LIKE '.%' AND NOT host LIKE '%.'
              |    AND NOT contains(host, '..') AND NOT regexp_matches(host, '[^.]{64}')),
              |emails_raw AS (
              |  SELECT doc_id, unnest(regexp_extract_all(msg, '(?i)\\b[A-Z0-9._%+-]+@[A-Z0-9.-]+\\.[A-Z]{2,}\\b')) AS v FROM m),
              |emails_t AS (SELECT doc_id, ${sqlTrim("v")} AS t FROM emails_raw),
              |emails AS (
              |  SELECT doc_id, 'Email' AS kind, t AS content FROM (
              |    SELECT doc_id, t, substr(t, 1, instr(t, '@')-1) AS loc, substr(t, instr(t, '@')+1) AS dom
              |    FROM emails_t WHERE length(t) BETWEEN 6 AND 254 AND instr(t, '@') > 0)
              |  WHERE loc <> '' AND length(loc) <= 64 AND length(dom) <= 253
              |    AND contains(dom, '.') AND regexp_matches(dom, '[A-Za-z]')
              |    AND NOT dom LIKE '.%' AND NOT dom LIKE '%.' AND NOT contains(dom, '..')
              |    AND NOT regexp_matches(dom, '[^.]{64}')),
              |phones_raw AS (
              |  SELECT doc_id, unnest(regexp_extract_all(msg, '\\b\\+?\\d[\\d\\s().-]{6,}\\d\\b')) AS v FROM m),
              |phones AS (
              |  SELECT doc_id, 'Phone' AS kind, v AS content FROM (
              |    SELECT doc_id, v, regexp_replace(v, '[^0-9]', '', 'g') AS digits FROM phones_raw)
              |  WHERE length(digits) BETWEEN 10 AND 15 AND
              |    (CAST(contains(digits,'0') AS INT) + CAST(contains(digits,'1') AS INT) +
              |     CAST(contains(digits,'2') AS INT) + CAST(contains(digits,'3') AS INT) +
              |     CAST(contains(digits,'4') AS INT) + CAST(contains(digits,'5') AS INT) +
              |     CAST(contains(digits,'6') AS INT) + CAST(contains(digits,'7') AS INT) +
              |     CAST(contains(digits,'8') AS INT) + CAST(contains(digits,'9') AS INT)) >= 4)
              |SELECT doc_id, kind, content FROM (
              |  SELECT * FROM urls UNION ALL SELECT * FROM emails UNION ALL SELECT * FROM phones)
              |ORDER BY doc_id, kind, content""".stripMargin)),

    // ---- URL part splitting (reference src/metadata/parquet.rs:1635-1689)
    "q15_url_parts" -> QueryDef(
      (s, dir) => {
        val partsUdf = udf((u: String) => Artefacts.parseUrlParts(u))
        val urlCol = concat(
          when(col("doc_id") % 5 === 0, concat(lit("https://h"), col("doc_id").cast("string"), lit(".example.com:8080/p/q?x=1&y=2#frag")))
            .when(col("doc_id") % 5 === 1, concat(lit("www.plain"), col("doc_id").cast("string"), lit(".org")))
            .when(col("doc_id") % 5 === 2, concat(lit("http://a"), col("doc_id").cast("string"), lit(".b.co/")))
            .when(col("doc_id") % 5 === 3, concat(lit("https://x"), col("doc_id").cast("string"), lit(".y.io#frag2")))
            .otherwise(concat(lit("https://q"), col("doc_id").cast("string"), lit(".z.net?only=q"))))
        table(s, dir, "documents")
          .select(col("doc_id"), urlCol.as("url"))
          .withColumn("p", partsUdf(col("url")))
          .select(
            col("doc_id"), col("url"),
            col("p.scheme").as("scheme"), col("p.host").as("host"),
            col("p.port").as("port"), col("p.path").as("path"),
            col("p.query").as("query"), col("p.fragment").as("fragment"))
          .orderBy("doc_id")
      },
      Some("""WITH u AS (SELECT doc_id,
             |  CASE WHEN doc_id % 5 = 0 THEN 'https://h' || CAST(doc_id AS VARCHAR) || '.example.com:8080/p/q?x=1&y=2#frag'
             |       WHEN doc_id % 5 = 1 THEN 'www.plain' || CAST(doc_id AS VARCHAR) || '.org'
             |       WHEN doc_id % 5 = 2 THEN 'http://a' || CAST(doc_id AS VARCHAR) || '.b.co/'
             |       WHEN doc_id % 5 = 3 THEN 'https://x' || CAST(doc_id AS VARCHAR) || '.y.io#frag2'
             |       ELSE 'https://q' || CAST(doc_id AS VARCHAR) || '.z.net?only=q' END AS url
             |  FROM documents),
             |s1 AS (SELECT doc_id, url,
             |  CASE WHEN url LIKE 'http://%' THEN 'http'
             |       WHEN url LIKE 'https://%' THEN 'https'
             |       WHEN url LIKE 'www.%' THEN 'http' ELSE '' END AS scheme,
             |  CASE WHEN url LIKE 'http://%' THEN substr(url, 8)
             |       WHEN url LIKE 'https://%' THEN substr(url, 9)
             |       ELSE url END AS rest FROM u),
             |s2 AS (SELECT *, CASE WHEN instr(rest, '#') > 0 THEN substr(rest, instr(rest, '#')+1) END AS fragment,
             |       CASE WHEN instr(rest, '#') > 0 THEN substr(rest, 1, instr(rest, '#')-1) ELSE rest END AS b1 FROM s1),
             |s3 AS (SELECT *, CASE WHEN instr(b1, '?') > 0 THEN substr(b1, instr(b1, '?')+1) END AS query,
             |       CASE WHEN instr(b1, '?') > 0 THEN substr(b1, 1, instr(b1, '?')-1) ELSE b1 END AS b2 FROM s2),
             |s4 AS (SELECT *, CASE WHEN instr(b2, '/') > 0 THEN substr(b2, instr(b2, '/')) END AS path,
             |       CASE WHEN instr(b2, '/') > 0 THEN substr(b2, 1, instr(b2, '/')-1) ELSE b2 END AS base FROM s3),
             |s5 AS (SELECT *, regexp_extract(base, '^(.*):([0-9]+)$', 2) AS cand FROM s4)
             |SELECT doc_id, url, scheme,
             |  CASE WHEN cand <> '' THEN regexp_extract(base, '^(.*):([0-9]+)$', 1) ELSE base END AS host,
             |  CASE WHEN cand <> '' THEN CAST(cand AS INTEGER) END AS port,
             |  path, query, fragment
             |FROM s5 ORDER BY doc_id""".stripMargin)),

    // ---- Path sanitization (reference src/carve/mod.rs:166-190)
    "q18_sanitize_path" -> QueryDef(
      (s, dir) => {
        val sanitizeUdf = udf((s: String) => graft.carve.Naming.sanitizeComponent(s))
        val dirty = concat(
          lit("a/b\\c:"), col("source"), lit(".."),
          col("doc_id").cast("string"), lit("?*.bin"))
        table(s, dir, "documents")
          .select(col("doc_id"), sanitizeUdf(dirty).as("safe_name"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |trim(replace(regexp_replace('a/b\c:' || source || '..' || CAST(doc_id AS VARCHAR) || '?*.bin',
             |  '[^A-Za-z0-9._-]', '_', 'g'), '..', '_'), '.') AS safe_name
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Printable-span scanning (reference src/strings/cpu.rs:42-80)
    "q21_string_spans" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val scanner = StringScan.default
        table(s, dir, "documents")
          .select(
            col("doc_id"),
            concat(
              substring(col("text"), 1, 40), lit("\u0000"),
              substring(col("text"), 41, 12), lit("\u0007"), lit("tiny")).as("msg"))
          .as[(Long, String)]
          .flatMap { case (docId, msg) =>
            val bytes = msg.getBytes("ISO-8859-1")
            scanner.scanChunk(0L, bytes)
              .filter(sp => (sp.flags & (graft.core.StringFlags.Utf16Le | graft.core.StringFlags.Utf16Be | graft.core.StringFlags.Utf8)) == 0)
              .map(sp => (docId, new String(bytes, sp.localStart.toInt, sp.length, "ISO-8859-1"), sp.length.toLong))
          }
          .toDF("doc_id", "content", "span_len")
          .orderBy("doc_id", "content")
      },
      Some("""WITH m AS (SELECT doc_id,
             |  substr(text, 1, 40) || chr(0) || substr(text, 41, 12) || chr(7) || 'tiny' AS msg
             |  FROM documents),
             |sp AS (SELECT doc_id, unnest(string_split_regex(msg, '[^\t -~]')) AS content FROM m)
             |SELECT doc_id, content, CAST(length(content) AS BIGINT) AS span_len
             |FROM sp WHERE length(content) >= 6 ORDER BY doc_id, content""".stripMargin)))
}
