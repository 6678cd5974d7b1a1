package graft.scan

import scala.collection.mutable

/** Multi-pattern fixed-byte matcher (Aho–Corasick automaton over bytes).
  *
  * Replaces the reference's per-pattern memchr+compare loop
  * (src/scanner/cpu.rs:40-69) with a single O(n) pass over the chunk for
  * ALL patterns — strictly better at 100 TB where the scan pass dominates.
  * Built once on the driver from the (small) pattern table and broadcast;
  * the automaton is immutable and thread-safe after `build`.
  */
final class AhoCorasick private (
    flatGoto: Array[Int], // state*256 + byte -> next state, sign bit set when the next state emits
    rootMiss: Array[Boolean], // byte -> true when the root has NO transition (stay at root)
    selfSkip: Array[Int], // state -> the byte that self-loops without output, or -1
    outputs: Array[Array[Int]], // state -> pattern indices ending here
    val patterns: Array[Array[Byte]]) extends Serializable {

  /** Find all matches; f(startOffset, patternIndex) per match.
    *
    * Two loop-level tricks keep this near memory bandwidth: (a) the
    * has-output flag lives in the transition's sign bit, so the common
    * byte costs one array load + one branch instead of a second
    * dependent load of the outputs table; (b) at the root state — where
    * the scan spends almost all its time on real data — a tight skip
    * loop advances over bytes with no root transition without touching
    * the transition table at all.
    */
  def scan(data: Array[Byte], from: Int, until: Int)(f: (Int, Int) => Unit): Unit = {
    val g = flatGoto
    val miss = rootMiss
    var s = 0
    var i = from
    while (i < until) {
      // at the root: skip bytes with no root transition (no table access)
      while (i < until && miss(data(i) & 0xff)) i += 1
      if (i >= until) return
      // in the automaton: chase states until back at the root. A run of
      // the state's self-loop byte (e.g. 0x00 inside a 00-prefix chain
      // over a zero-filled region) advances without touching the table.
      var cont = true
      var skipB = selfSkip(s)
      while (cont) {
        if ((data(i) & 0xff) == skipB) {
          i += 1
          cont = i < until
        } else {
          val v = g((s << 8) | (data(i) & 0xff))
          i += 1
          if (v < 0) {
            s = v & 0x7fffffff
            val out = outputs(s)
            var j = 0
            while (j < out.length) {
              val p = out(j)
              f(i - patterns(p).length, p)
              j += 1
            }
          } else s = v
          skipB = selfSkip(s)
          cont = i < until && s != 0
        }
      }
    }
  }

  def scan(data: Array[Byte])(f: (Int, Int) => Unit): Unit = scan(data, 0, data.length)(f)

  /** Collect matches as (start, patternIndex) pairs. */
  def findAll(data: Array[Byte]): Seq[(Int, Int)] = {
    val buf = mutable.ArrayBuffer.empty[(Int, Int)]
    scan(data)((s, p) => buf += ((s, p)))
    buf.toSeq
  }
}

object AhoCorasick {
  def build(patterns: Seq[Array[Byte]]): AhoCorasick = {
    require(patterns.forall(_.nonEmpty), "empty pattern")
    // Trie construction
    val children = mutable.ArrayBuffer(mutable.Map.empty[Int, Int])
    val out = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (pat, pi) =>
      var s = 0
      pat.foreach { b =>
        val c = b & 0xff
        s = children(s).getOrElseUpdate(c, {
          children += mutable.Map.empty[Int, Int]
          out += mutable.ArrayBuffer.empty[Int]
          children.length - 1
        })
      }
      out(s) += pi
    }
    val n = children.length
    val fail = new Array[Int](n)
    val goto_ = Array.ofDim[Int](n, 256)
    // BFS to compute failure links and densify goto
    val queue = mutable.Queue.empty[Int]
    for (c <- 0 until 256) {
      children(0).get(c) match {
        case Some(s) => goto_(0)(c) = s; fail(s) = 0; queue += s
        case None => goto_(0)(c) = 0
      }
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) ++= out(fail(s))
      for (c <- 0 until 256) {
        children(s).get(c) match {
          case Some(t) => fail(t) = goto_(fail(s))(c); goto_(s)(c) = t; queue += t
          case None => goto_(s)(c) = goto_(fail(s))(c)
        }
      }
    }
    val flat = new Array[Int](n * 256)
    var s = 0
    while (s < n) {
      var c = 0
      while (c < 256) {
        val t = goto_(s)(c)
        flat((s << 8) | c) = if (out(t).nonEmpty) t | Int.MinValue else t
        c += 1
      }
      s += 1
    }
    val rootMiss = Array.tabulate(256)(c => goto_(0)(c) == 0)
    // the (at most one) byte b with goto(s)(b) == s: consuming it changes
    // nothing and emits nothing — skippable. Output states are excluded so
    // overlapping matches of single-repeated-byte patterns still emit.
    val selfSkip = Array.tabulate(n) { st =>
      if (st == 0 || out(st).nonEmpty) -1
      else (0 until 256).find(c => goto_(st)(c) == st).getOrElse(-1)
    }
    new AhoCorasick(flat, rootMiss, selfSkip, out.map(_.toArray.sorted).toArray, patterns.map(_.clone).toArray)
  }

  def buildFromStrings(patterns: Seq[String]): AhoCorasick =
    build(patterns.map(_.getBytes("ISO-8859-1")))
}
