package graft.sqlite

import graft.core.{BrowserCookieRecord, BrowserDownloadRecord, BrowserHistoryRecord, CarvedFile}
import graft.evidence.EvidenceRef
import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed browser-artefact stage: for every carved SQLite file,
  * re-read its byte range from the evidence and run the pure-Scala
  * extractor (reference pipeline stage: workers.rs:269-279 + 300-368).
  * The carved-sqlite set is tiny relative to the evidence, so three
  * narrow passes (history/cookies/downloads) are cheap; each task opens
  * its own evidence handle.
  */
object SqliteArtefacts {

  private def loadDb(ref: EvidenceRef, c: CarvedFile): Option[SqliteFile] = {
    val reader = ref.open()
    try {
      val bytes = reader.readExactAt(c.globalStart, c.size.toInt)
      bytes.flatMap { b =>
        try Some(new SqliteFile(b))
        catch { case _: Exception => None }
      }
    } finally reader.close()
  }

  def history(spark: SparkSession, evidenceRef: EvidenceRef, carved: Dataset[CarvedFile], runId: String): Dataset[BrowserHistoryRecord] = {
    import spark.implicits._
    carved.filter(_.fileType == "sqlite").flatMap { c =>
      loadDb(evidenceRef, c).toSeq.flatMap(db =>
        try BrowserExtract.history(db, runId, c.path) catch { case _: Exception => Seq.empty })
    }
  }

  def cookies(spark: SparkSession, evidenceRef: EvidenceRef, carved: Dataset[CarvedFile], runId: String): Dataset[BrowserCookieRecord] = {
    import spark.implicits._
    carved.filter(_.fileType == "sqlite").flatMap { c =>
      loadDb(evidenceRef, c).toSeq.flatMap(db =>
        try BrowserExtract.cookies(db, runId, c.path) catch { case _: Exception => Seq.empty })
    }
  }

  def downloads(spark: SparkSession, evidenceRef: EvidenceRef, carved: Dataset[CarvedFile], runId: String): Dataset[BrowserDownloadRecord] = {
    import spark.implicits._
    carved.filter(_.fileType == "sqlite").flatMap { c =>
      loadDb(evidenceRef, c).toSeq.flatMap(db =>
        try BrowserExtract.downloads(db, runId, c.path) catch { case _: Exception => Seq.empty })
    }
  }
}
