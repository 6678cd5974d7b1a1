package graft.scan

import graft.carve.{EngineConfig, FileTypeConfig}
import graft.core.{Hit, NormalizedHit, ScanChunk}

/** Multi-pattern signature scanning over chunk bytes.
  *
  * The pattern table (pattern index → (patternId, fileTypeId, bytes)) is
  * built once from the enabled file types — pattern-set pruning by
  * `--types` happens BEFORE the automaton is built, the analog of
  * partition pruning (reference mutates config before scanner build,
  * src/util.rs:574-685 + src/scanner/cpu.rs:19-38).
  *
  * One Aho–Corasick pass finds all patterns of all types in O(chunk)
  * regardless of pattern count — strictly better than the reference's
  * per-pattern memchr loop, and the property that keeps the 100 TB scan
  * pass bandwidth-bound instead of pattern-count-bound.
  */
final class SignatureScan(fileTypes: Seq[FileTypeConfig]) extends Serializable {

  final case class PatternDef(patternId: String, fileTypeId: String, bytes: Array[Byte])

  val patterns: IndexedSeq[PatternDef] = fileTypes.flatMap { ft =>
    ft.headerPatterns.map(p => PatternDef(p.id, ft.id, p.bytes))
  }.toIndexedSeq

  @transient private lazy val automaton = AhoCorasick.build(patterns.map(_.bytes))

  /** All hits within data[0, limit) as chunk-local offsets. */
  def scanChunk(chunk: ScanChunk, data: Array[Byte], limit: Int): Seq[Hit] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Hit]
    automaton.scan(data, 0, limit) { (start, patIdx) =>
      out += Hit(chunk.id, start.toLong, patIdx, patIdx)
    }
    out.toSeq
  }

  /** Overlap-ownership filter + rebase to global offsets — the engine's
    * exactly-once rule: a hit is kept iff `localOffset < validLength`
    * (reference pipeline/workers.rs:136-143).
    */
  def normalize(chunk: ScanChunk, hits: Seq[Hit]): Seq[NormalizedHit] =
    hits.collect {
      case h if h.localOffset < chunk.validLength =>
        NormalizedHit(chunk.start + h.localOffset, h.patternId, h.patternId)
    }

  def patternOf(idx: Int): PatternDef = patterns(idx)
}

object SignatureScan {
  def apply(cfg: EngineConfig): SignatureScan = new SignatureScan(cfg.fileTypes)
}
