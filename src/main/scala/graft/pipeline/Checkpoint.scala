package graft.pipeline

import graft.core.CheckpointState
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Batch-mode resume state (reference src/checkpoint.rs + validation in
  * pipeline/mod.rs:190-225): a tiny JSON file with the chunking
  * parameters and the next offset to process. `validate` reproduces the
  * reference's three error conditions; the planning filter
  * `chunk.start >= nextOffset` does the skip.
  */
object Checkpoint {

  def save(path: String, state: CheckpointState): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val json =
      s"""{"version":${state.version},"run_id":${q(state.runId)},"chunk_size":${state.chunkSize},
         |"overlap":${state.overlap},"next_offset":${state.nextOffset},
         |"evidence_len":${state.evidenceLen},"created_at":${q(state.createdAt)}}"""
        .stripMargin.replace("\n", "")
    Files.write(Paths.get(path), json.getBytes(StandardCharsets.UTF_8))
  }

  def load(path: String): CheckpointState = {
    val json = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    def num(key: String): Long =
      s""""$key"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(json)
        .map(_.group(1).toLong).getOrElse(throw new IllegalArgumentException(s"missing $key"))
    def str(key: String): String =
      s""""$key"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""".r.findFirstMatchIn(json)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).getOrElse("")
    CheckpointState(num("version").toInt, str("run_id"), num("chunk_size"), num("overlap"),
      num("next_offset"), num("evidence_len"), str("created_at"))
  }

  /** The reference's resume validation: chunking params and evidence
    * length must match, offset must be inside the evidence.
    */
  def validate(state: CheckpointState, chunkSize: Long, overlap: Long, evidenceLen: Long): Either[String, Long] = {
    if (state.chunkSize != chunkSize) Left("checkpoint chunk_size mismatch")
    else if (state.overlap != overlap) Left("checkpoint overlap mismatch")
    else if (state.evidenceLen != evidenceLen) Left("checkpoint evidence length mismatch")
    else if (state.nextOffset >= evidenceLen) Left("checkpoint offset beyond evidence")
    else Right(state.nextOffset)
  }
}
