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
    flatGoto: Array[Int], // state*256 + byte -> state (flat for cache/codegen)
    outputs: Array[Array[Int]], // state -> pattern indices ending here
    val patterns: Array[Array[Byte]]) extends Serializable {

  /** Find all matches; f(startOffset, patternIndex) per match. */
  def scan(data: Array[Byte], from: Int, until: Int)(f: (Int, Int) => Unit): Unit = {
    val g = flatGoto
    var s = 0
    var i = from
    while (i < until) {
      s = g((s << 8) | (data(i) & 0xff))
      val out = outputs(s)
      if (out.length > 0) {
        var j = 0
        while (j < out.length) {
          val p = out(j)
          f(i - patterns(p).length + 1, p)
          j += 1
        }
      }
      i += 1
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
      System.arraycopy(goto_(s), 0, flat, s << 8, 256)
      s += 1
    }
    new AhoCorasick(flat, out.map(_.toArray.sorted).toArray, patterns.map(_.clone).toArray)
  }

  def buildFromStrings(patterns: Seq[String]): AhoCorasick =
    build(patterns.map(_.getBytes("ISO-8859-1")))
}
