package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData

/** Static vector kernels behind the [[VecExpressions]] Catalyst
  * expressions — tight primitive-array loops invoked as ONE static call
  * from generated code.
  *
  * WHY: the scalar `element_at` unroll of a PQ codebook distance (m·ksub
  * ·dsub terms ≈ 1000+ expression nodes per row) exceeds the JVM's 64 KB
  * method limit when whole-stage codegen compiles it; Spark then falls
  * back to INTERPRETED evaluation for the entire stage (observed:
  * `InternalCompilerException: Code grows beyond 64 KB`, ~1.7 ms/row).
  * Higher-order functions (`aggregate(zip_with(...))`) are CodegenFallback
  * by construction and measure ~1.3 ms/row. A loop in a static method is
  * the shape the JIT wants: the generated code stays tiny (one call), the
  * stage stays in whole-stage codegen, and the kernel runs as compiled
  * long/double arithmetic with no per-element lambda dispatch or boxing.
  *
  * PARITY: every accumulation here replicates the exact IEEE operation
  * order of the expression form it replaces (and of the DuckDB oracles):
  * doubles fold left-to-right from 0.0 in index order; integer sums are
  * order-free; scaling reproduces Spark's `round(double)` semantics
  * (BigDecimal HALF_UP, then double→long truncating cast). ScaleSpec
  * asserts kernel-vs-expression equality row-by-row on the real corpus.
  */
object VecKernels {

  /** `round(x·scale)` per element as BIGINT — bit-identical to the
    * expression `round(cast(x as double) * scale).cast("long")`: Spark's
    * Round(double) is `BigDecimal.valueOf(d).setScale(0, HALF_UP)
    * .doubleValue()` and the long cast truncates. NaN/Infinity follow
    * the same expression semantics too: under Spark 4's default ANSI
    * mode the long cast raises CAST_OVERFLOW, so the kernel raises the
    * matching typed ArithmeticException (the naked BigDecimal.valueOf
    * NumberFormatException it used to throw named neither the kernel
    * nor the offending value).
    */
  @inline private def roundToLong(d: Double): Long =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
      throw new ArithmeticException(
        s"graft_scale_q: non-finite component $d cannot scale to BIGINT " +
          "(matches ANSI CAST_OVERFLOW); clean the vector column first")
    else java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  def scaleQ(v: ArrayData, scale: Double): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = roundToLong(v.getFloat(i).toDouble * scale)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Same scaling on a driver-side float matrix (codebook prep) — the
    * one code path both the per-row expression and the plan-build
    * literals flow through, so they cannot diverge.
    */
  def scaleQLocal(rows: Array[Array[Float]], scale: Double): Array[Array[Long]] =
    rows.map(_.map(f => roundToLong(f.toDouble * scale)))

  /** PQ codes: for each subspace s, the index of the codebook entry with
    * minimal integer squared L2 to the row's subvector (ties → lowest
    * code). `cb` is the scaled codebook flattened [s][c][dsub];
    * ksub = cb.length / sv.length.
    */
  def pqCodes(sv: ArrayData, cb: Array[Long], m: Int): ArrayData = {
    val v = sv.toLongArray()
    // a row whose dimension disagrees with the codebook layout would
    // index wrong-but-in-bounds cells and emit silent garbage codes
    require(v.length > 0 && v.length % m == 0 && cb.length % v.length == 0,
      s"pq: vector dim ${v.length} incompatible with codebook (${cb.length} cells, m=$m)")
    val dsub = v.length / m
    val ksub = cb.length / v.length
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      var bestC = 0L
      var bestD = Long.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        var d = 0L
        var i = 0
        while (i < dsub) {
          val t = v(s * dsub + i) - cb(base + i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ADC distance table: dist(s, c) for every (subspace, code) pair,
    * flattened [s][c] — the per-query table whose lookups replace all
    * corpus-side vector math.
    */
  def pqDistTable(sv: ArrayData, cb: Array[Long], m: Int): ArrayData = {
    val v = sv.toLongArray()
    val dsub = v.length / m
    val ksub = cb.length / v.length
    val out = new Array[Long](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        var d = 0L
        var i = 0
        while (i < dsub) {
          val t = v(s * dsub + i) - cb(base + i)
          d += t * t
          i += 1
        }
        out(s * ksub + c) = d
        c += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ADC score: Σ_s dt[s·ksub + codes[s]] — m table lookups per
    * candidate, the entire per-pair cost of PQ search.
    */
  def adcDist(dt: ArrayData, codes: ArrayData, m: Int): Long = {
    val ksub = dt.numElements() / m
    var acc = 0L
    var s = 0
    while (s < m) {
      acc += dt.getLong(s * ksub + codes.getLong(s).toInt)
      s += 1
    }
    acc
  }

  /** Exact integer squared L2 between two scaled vectors. */
  def sqDistLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = a.getLong(i) - b.getLong(i)
      acc += t * t
      i += 1
    }
    acc
  }

  /** Nearest and second-nearest centroid under exact integer squared L2
    * (ties → lowest id): returns [cid₁, d²₁, cid₂, d²₂]. `cb` is the
    * scaled centroid matrix flattened row-major in `cids` order — the
    * silhouette a²/b² pass as one kernel call.
    */
  def sqDistTop2(sv: ArrayData, cb: Array[Long], cids: Array[Long]): ArrayData = {
    val v = sv.toLongArray()
    val dim = v.length
    val n = cids.length
    // top-2 is undefined over a 1-centroid codebook — fail with the
    // contract, not an ArrayIndexOutOfBounds on cids(-1) below
    require(n >= 2, s"graft_sqdist_top2 needs >= 2 centroids, got $n")
    var d1 = Long.MaxValue; var c1 = -1
    var d2 = Long.MaxValue; var c2 = -1
    var c = 0
    while (c < n) {
      var d = 0L
      var i = 0
      val base = c * dim
      while (i < dim) {
        val t = v(i) - cb(base + i)
        d += t * t
        i += 1
      }
      // strict < keeps the earliest (lowest-cid) entry on exact ties,
      // matching array_sort over (d2, cid) structs
      if (d < d1) { d2 = d1; c2 = c1; d1 = d; c1 = c }
      else if (d < d2) { d2 = d; c2 = c }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(cids(c1), d1, cids(c2), d2))
  }

  /** 60-bit SimHash signature from token hashes: bit j set when the
    * +1/−1 votes of bit j across all token hashes sum strictly
    * positive. Votes are order-free integer sums, so the loop is
    * bit-identical to any fold order.
    */
  def simhash60(hvs: ArrayData): Long = {
    val n = hvs.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = hvs.getLong(i)
      var j = 0
      while (j < 60) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) sig += (1L << j)
      j += 1
    }
    sig
  }

  /** Double dot product of two float vectors, accumulated left-to-right
    * from 0.0 in index order — bit-identical to
    * `aggregate(zip_with(a, b, x·y), 0.0, +)` and the oracles'
    * sum-over-unnest.
    */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** sqrt of the self-dot — the L2 norm with the same fold order. */
  def normF(a: ArrayData): Double = java.lang.Math.sqrt(dotF(a, a))

  /** Sign-random-projection bucket key: bit j set iff the projection of
    * `v` onto plane j (doubles, index-order fold from 0.0) is strictly
    * positive. `planes` is the nPlanes×dim ±1 matrix flattened row-major.
    */
  def lshBucketK(v: ArrayData, planes: Array[Double]): Long = {
    val dim = v.numElements()
    // a vector whose dimension disagrees with the plane matrix would
    // derive a wrong nPlanes (0 for dim > planes, folded bits past 60)
    // and bucket everything together — fail loudly instead
    require(dim > 0 && planes.length % dim == 0 && planes.length / dim <= 60,
      s"lsh_bucket: vector dim $dim incompatible with ${planes.length}-entry plane matrix")
    val nPlanes = planes.length / dim
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      var acc = 0.0
      var i = 0
      while (i < dim) {
        acc += v.getFloat(i).toDouble * planes(j * dim + i)
        i += 1
      }
      if (acc > 0) bucket += (1L << j)
      j += 1
    }
    bucket
  }

  /** Centroid ids ranked by cosine similarity to `v`, descending, ties →
    * lowest id. `cents` is the float centroid matrix flattened in
    * ascending-id order; `cids` the matching ids. Cosine = dot/(|v|·|c|)
    * with every double accumulation folded left-to-right from 0.0 in
    * index order — bit-identical to the `foldLeft(lit(0.0))(_ + _)`
    * expression chain and the oracles' sum-over-unnest.
    */
  def cosRank(v: ArrayData, cents: Array[Float], cids: Array[Long]): ArrayData = {
    val n = cids.length
    val dim = v.numElements()
    var acc = 0.0
    var i = 0
    while (i < dim) {
      val x = v.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    val vn = java.lang.Math.sqrt(acc)
    val cos = new Array[Double](n)
    var c = 0
    while (c < n) {
      var dot = 0.0
      var cn = 0.0
      var j = 0
      while (j < dim) {
        val cv = cents(c * dim + j).toDouble
        dot += v.getFloat(j).toDouble * cv
        cn += cv * cv
        j += 1
      }
      cos(c) = dot / (vn * java.lang.Math.sqrt(cn))
      c += 1
    }
    // insertion argsort: cos desc, index (= ascending cid) on ties —
    // n is the coarse-list count, small by construction
    val idx = new Array[Int](n)
    var k = 0
    while (k < n) {
      var p = k
      while (p > 0 && (cos(idx(p - 1)) < cos(k) ||
          (cos(idx(p - 1)) == cos(k) && idx(p - 1) > k))) {
        idx(p) = idx(p - 1); p -= 1
      }
      idx(p) = k
      k += 1
    }
    val out = new Array[Long](n)
    var o = 0
    while (o < n) { out(o) = cids(idx(o)); o += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Weighted set-intersection sum: Σ aWs[i] over positions where
    * aToks[i] occurs in bToks, both token arrays SORTED in UTF8String
    * binary order (what `sort_array` / struct sort_array produce) —
    * one O(|A|+|B|) merge walk with no per-element lambda dispatch.
    * Replaces the `aggregate(... element_at(map_from_entries(...)))`
    * form, whose CodegenFallback knocked the whole verification stage
    * out of whole-stage codegen (measured ~10× on the sf0.1 pair set).
    * Weights are a global function of the token, so summing the a-side
    * weight at each match is exact.
    */
  def wisect(aToks: ArrayData, aWs: ArrayData, bToks: ArrayData): Long = {
    val na = aToks.numElements()
    val nb = bToks.numElements()
    var i = 0
    var j = 0
    var s = 0L
    while (i < na && j < nb) {
      val c = aToks.getUTF8String(i).compareTo(bToks.getUTF8String(j))
      if (c == 0) { s += aWs.getLong(i); i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    s
  }

  /** Bit-index list → fixed-width bitmask (`width` 64-bit words). The
    * dense-vocabulary set representation: with every corpus token mapped
    * to a bit < width·64, a document's distinct-token set becomes a flat
    * long array and set algebra becomes word-wise bit ops. Order-free
    * (ORs commute), so an unordered `collect_list` of bit indices is a
    * sound producer. Out-of-range bits fail loudly — a silent mask drop
    * would undercount every intersection the token participates in.
    */
  def bitsToMask(bits: ArrayData, width: Int): ArrayData = {
    val n = bits.numElements()
    val out = new Array[Long](width)
    var i = 0
    while (i < n) {
      val b = bits.getLong(i)
      if (b < 0L || b >= width.toLong * 64L)
        throw new IllegalArgumentException(
          s"graft_bits_mask: bit index $b outside [0, ${width * 64})")
      out((b >> 6).toInt) |= 1L << (b & 63L)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** |A ∩ B| of two same-width bitmasks: Σ popcount(a & b). One branch-
    * free word loop per candidate pair — the verification kernel of the
    * dense-vocabulary exact-Jaccard path, where the pair volume is the
    * dominant cost and any per-element lambda dispatch would swamp it.
    */
  def maskIntersect(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    require(na == b.numElements(),
      s"graft_mask_inter: mask widths differ ($na vs ${b.numElements()})")
    var s = 0L
    var i = 0
    while (i < na) {
      s += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    s
  }

  /** Text → vocabulary bitmask in ONE in-row call: split on single
    * spaces (java regex split, limit −1 — identical piece list to
    * Spark's `split(text, " ")`) and set each token's vocabulary bit.
    * Replaces the explode(array_distinct(split)) → vocab join →
    * groupBy(collect_list) → bits_mask assembly of the dense-regime doc
    * masks with a narrow scan — the distinct is free (set bits are
    * idempotent) and the per-text shuffle disappears. The vocabulary is
    * complete by construction (built from these texts' tokens), so a
    * miss is a caller bug and throws.
    */
  def tokMask(text: org.apache.spark.unsafe.types.UTF8String,
      bits: java.util.HashMap[String, Integer], width: Int): ArrayData = {
    val out = new Array[Long](width)
    val parts = text.toString.split(" ", -1)
    var i = 0
    while (i < parts.length) {
      val b = bits.get(parts(i))
      if (b == null) throw new IllegalArgumentException(
        s"graft_tok_mask: token '${parts(i)}' missing from the vocabulary literal")
      out(b.intValue() >> 6) |= 1L << (b.intValue() & 63)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Weighted |A ∩ B| of two same-width bitmasks: Σ w(bit) over the set
    * bits of a & b, with `w` the vocabulary-bit weight table (vocab-
    * bounded literal — the codebook pattern). The weighted analogue of
    * [[maskIntersect]]: long addition is order-free, so the sum equals
    * the token-sorted merge walk ([[wisect]]) exactly — bit order IS
    * vocabulary sort order. Replaces carrying two token-string arrays
    * plus a weight array per candidate pair through the dense all-pairs
    * join with one mask word-walk per pair.
    */
  def wMaskIntersect(a: ArrayData, b: ArrayData, w: Array[Long]): Long = {
    val na = a.numElements()
    require(na == b.numElements(),
      s"graft_wmask_inter: mask widths differ ($na vs ${b.numElements()})")
    var s = 0L
    var i = 0
    while (i < na) {
      var bits = a.getLong(i) & b.getLong(i)
      val base = i << 6
      while (bits != 0L) {
        s += w(base + java.lang.Long.numberOfTrailingZeros(bits))
        bits &= bits - 1L
      }
      i += 1
    }
    s
  }
}
