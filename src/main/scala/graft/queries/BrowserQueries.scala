package graft.queries

import graft.carve.EngineConfig
import graft.evidence.StridedSamplesRef
import graft.pipeline.CarvePipeline
import graft.sqlite.SqliteArtefacts
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Browser-history extraction end-to-end: the fixture profile DBs (real
  * SQLite files with formula-deterministic contents) are planted into an
  * evidence byte space, recovered by the scan→carve pipeline, then parsed
  * by the pure-Scala SQLite reader — and the expected output is derived
  * arithmetically in the DuckDB oracle. Exercises the reference's three
  * joins, column fallbacks, and all three timestamp conversions.
  */
object BrowserQueries {

  private def fixtureBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"fixture $name missing")
    try in.readAllBytes() finally in.close()
  }

  /** Evidence with all browser-profile DBs planted at 64 KiB strides,
    * synthesized at read time (nothing ships beyond the DB bytes).
    */
  private def extractAll(s: SparkSession) = {
    val names = IndexedSeq("chrome_history.sqlite", "chrome_cookies.sqlite",
      "firefox_places.sqlite", "firefox_cookies.sqlite", "firefox_downloads.sqlite")
    val ref = StridedSamplesRef(names.map(fixtureBytes), 65536L, names.length.toLong)
    val (cfg0, _) = EngineConfig.filterFileTypes(
      EngineConfig(chunkSize = 128 * 1024, overlap = 8192), Some(Seq("sqlite")), disableZip = false)
    val cfg = cfg0.copy(fileTypes = cfg0.fileTypes.map(_.copy(minSize = 0)))
    val carved = CarvePipeline.run(s, ref, cfg, "browser-run",
      enableStrings = false, enableEntropy = false).carvedFiles
    (ref, carved)
  }

  val defs: Map[String, QueryDef] = Map(
    "q44_browser_history" -> QueryDef(
      (s, dir) => {
        val (ref, carved) = extractAll(s)
        SqliteArtefacts.history(s, ref, carved, "browser-run").toDF()
          .select(col("browser"), col("url"), col("title"),
            col("visitTime").as("visit_time"), col("transition"))
          .orderBy("browser", "url")
      },
      Some("""WITH idx AS (SELECT unnest(range(0, 20)) AS i)
             |SELECT browser, url, title, visit_time, transition FROM (
             |  SELECT 'chrome' AS browser,
             |    'https://site' || i || '.example.com/' AS url,
             |    'Title ' || i AS title,
             |    make_timestamp(13303449600000000 + i*2000000 - 11644473600000000) AS visit_time,
             |    CASE CAST(i % 12 AS INT) WHEN 0 THEN 'link' WHEN 1 THEN 'typed'
             |      WHEN 2 THEN 'auto_bookmark' WHEN 3 THEN 'auto_subframe' WHEN 4 THEN 'manual_subframe'
             |      WHEN 5 THEN 'generated' WHEN 6 THEN 'auto_toplevel' WHEN 7 THEN 'form_submit'
             |      WHEN 8 THEN 'reload' WHEN 9 THEN 'keyword' WHEN 10 THEN 'keyword_generated'
             |      ELSE 'other' END AS transition
             |  FROM idx
             |  UNION ALL
             |  SELECT 'firefox', 'https://ff' || i || '.example.org/', 'FF Title ' || i,
             |    make_timestamp(1700000000000000 + i*2000000),
             |    CASE CAST((i % 9) + 1 AS INT) WHEN 1 THEN 'link' WHEN 2 THEN 'typed'
             |      WHEN 3 THEN 'bookmark' WHEN 4 THEN 'embed' WHEN 5 THEN 'redirect_permanent'
             |      WHEN 6 THEN 'redirect_temporary' WHEN 7 THEN 'download' WHEN 8 THEN 'framed_link'
             |      ELSE 'other' END
             |  FROM idx)
             |ORDER BY browser, url""".stripMargin)),

    "q45_browser_cookies" -> QueryDef(
      (s, dir) => {
        val (ref, carved) = extractAll(s)
        SqliteArtefacts.cookies(s, ref, carved, "browser-run").toDF()
          .select(col("browser"), col("host"), col("name"), col("value"),
            col("expiresUtc").as("expires_utc"), col("secure"), col("httpOnly").as("http_only"))
          .orderBy("browser", "name")
      },
      Some("""WITH idx AS (SELECT unnest(range(0, 20)) AS i)
             |SELECT browser, host, name, value, expires_utc, secure, http_only FROM (
             |  SELECT 'chrome' AS browser, '.site' || i || '.example.com' AS host,
             |    'cookie' || i AS name, 'value' || i AS value,
             |    make_timestamp(13303449600000000 + (i+100)*1000000 - 11644473600000000) AS expires_utc,
             |    (i % 2 = 1) AS secure, ((i+1) % 2 = 1) AS http_only
             |  FROM idx
             |  UNION ALL
             |  SELECT 'firefox', '.ff' || i || '.example.org', 'ffcookie' || i, 'ffvalue' || i,
             |    make_timestamp((1700000000 + i*3600) * 1000000),
             |    (i % 2 = 1), ((i+1) % 2 = 1)
             |  FROM idx)
             |ORDER BY browser, name""".stripMargin)),

    "q46_browser_downloads" -> QueryDef(
      (s, dir) => {
        val (ref, carved) = extractAll(s)
        SqliteArtefacts.downloads(s, ref, carved, "browser-run").toDF()
          .select(col("browser"), col("url"), col("targetPath").as("target_path"),
            col("startTime").as("start_time"), col("totalBytes").as("total_bytes"), col("state"))
          .orderBy("browser", "target_path")
      },
      Some("""WITH idx AS (SELECT unnest(range(0, 10)) AS i)
             |SELECT browser, url, target_path, start_time, total_bytes, state FROM (
             |  SELECT 'chrome' AS browser,
             |    CASE WHEN i % 2 = 0 THEN 'https://chain' || i || '.example.com/get'
             |         WHEN i % 3 = 0 THEN 'https://tab' || i || '.example.com/'
             |         ELSE NULL END AS url,
             |    '/home/u/dl/file' || i || '.bin' AS target_path,
             |    make_timestamp(13303449600000000 + i*3000000 - 11644473600000000) AS start_time,
             |    CAST(1000 + i AS BIGINT) AS total_bytes,
             |    CAST(i % 4 AS VARCHAR) AS state
             |  FROM idx
             |  UNION ALL
             |  SELECT 'firefox', 'https://dl' || i || '.example.org/f.zip', '/tmp/f' || i || '.zip',
             |    make_timestamp(1700000000000000 + i*1000000), CAST(2000 + i AS BIGINT),
             |    CAST(i % 3 AS VARCHAR)
             |  FROM idx)
             |ORDER BY browser, target_path""".stripMargin)),

    // ---- Unified forensic timeline: visits + download starts + cookie
    // creations from every recovered profile DB, one time-ordered stream.
    "q93_browser_timeline" -> QueryDef(
      (s, dir) => {
        val (ref, carved) = extractAll(s)
        SqliteArtefacts.timeline(s, ref, carved, "browser-run")
          .orderBy("event_time", "kind", "browser", "detail")
      },
      Some("""WITH idx AS (SELECT unnest(range(0, 20)) AS i),
             |dlx AS (SELECT unnest(range(0, 10)) AS i),
             |ev AS (
             |  SELECT make_timestamp(13303449600000000 + i*2000000 - 11644473600000000) AS event_time,
             |         'visit' AS kind, 'chrome' AS browser,
             |         'https://site' || i || '.example.com/' AS detail FROM idx
             |  UNION ALL
             |  SELECT make_timestamp(1700000000000000 + i*2000000), 'visit', 'firefox',
             |         'https://ff' || i || '.example.org/' FROM idx
             |  UNION ALL
             |  SELECT make_timestamp(13303449600000000 + i*3000000 - 11644473600000000), 'download', 'chrome',
             |         CASE WHEN i % 2 = 0 THEN 'https://chain' || i || '.example.com/get'
             |              WHEN i % 3 = 0 THEN 'https://tab' || i || '.example.com/'
             |              ELSE '/home/u/dl/file' || i || '.bin' END FROM dlx
             |  UNION ALL
             |  SELECT make_timestamp(1700000000000000 + i*1000000), 'download', 'firefox',
             |         'https://dl' || i || '.example.org/f.zip' FROM dlx
             |  UNION ALL
             |  SELECT make_timestamp(13303449600000000 + i*1000000 - 11644473600000000), 'cookie_created', 'chrome',
             |         '.site' || i || '.example.com|cookie' || i FROM idx
             |  UNION ALL
             |  SELECT make_timestamp(1700000000000000 + i*500000), 'cookie_created', 'firefox',
             |         '.ff' || i || '.example.org|ffcookie' || i FROM idx)
             |SELECT event_time, kind, browser, detail FROM ev
             |ORDER BY event_time, kind, browser, detail""".stripMargin)))
}
