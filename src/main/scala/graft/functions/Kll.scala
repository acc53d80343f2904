package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

/** KLL-style mergeable quantile sketch (Karnin–Lang–Liberty, FOCS 2016)
  * over BIGINT values — the streaming/100 TB percentile answer next to
  * [[KmvDistinct]]'s distinct-count sketch: per-partition state is
  * O(k) values organized in weighted levels (level h holds items of
  * weight 2^h), partials merge level-wise in any order or grouping
  * (partition layout, AQE re-splits, and retry re-execution stay inside
  * the sketch's rank-error bound), and a quantile estimate is always an
  * actual data element whose true rank is within ±ε·n of the target.
  *
  * Deviation from the paper, on purpose: compaction keeps the
  * odd/even-indexed half by a DETERMINISTIC alternating parity instead
  * of a random bit. The random bit buys unbiasedness of the EXPECTED
  * rank; the worst-case rank-error bound (what the oracle checks — a
  * two-sided rank-window boolean, the q_agg_approx_pct pattern) is the
  * compaction-count bound either way, and determinism means a replayed
  * update stream reproduces the sketch bit-for-bit. Estimates still
  * depend on merge ORDER (like any mergeable sketch), so queries
  * surface the bounded-rank boolean, which is layout-invariant.
  *
  * Rank-error: each compaction at level h shifts any rank by at most
  * 2^h; with geometric capacities cap(h) = max(8, k·(2/3)^(H−1−h)) the
  * total is O(n/k) — KllSpec measures it empirically across adversarial
  * input orders and partitionings and pins a 1.5 % envelope at k = 256
  * (observed < 0.7 %).
  */
object Kll {

  final val MinCap = 8

  /** Mutable sketch state (the TypedImperativeAggregate buffer). */
  final class Sketch(val k: Int) {
    require(k >= MinCap, s"kll k must be >= $MinCap, got $k")
    var n: Long = 0L
    var parity: Long = 0L
    val levels: ArrayBuffer[ArrayBuffer[Long]] =
      ArrayBuffer(ArrayBuffer.empty[Long])

    private def cap(h: Int): Int = {
      val depth = levels.length - 1 - h
      math.max(MinCap, math.ceil(k * math.pow(2.0 / 3.0, depth)).toInt)
    }

    def update(v: Long): Unit = {
      levels(0) += v
      n += 1
      if (levels(0).length >= cap(0)) compactCascade()
    }

    private def compactCascade(): Unit = {
      var h = 0
      while (h < levels.length) {
        if (levels(h).length >= cap(h)) compact(h)
        h += 1
      }
    }

    /** Sort level h, keep every other item of the even-length prefix at
      * DOUBLE weight one level up (alternating start parity), leave the
      * odd leftover in place. Total weight is conserved exactly.
      */
    private def compact(h: Int): Unit = {
      val buf = levels(h)
      if (buf.length < 2) return
      val arr = buf.toArray
      java.util.Arrays.sort(arr)
      val even = arr.length - (arr.length % 2)
      val offset = (parity % 2).toInt
      parity += 1
      if (h + 1 >= levels.length) levels += ArrayBuffer.empty[Long]
      val up = levels(h + 1)
      var i = offset
      while (i < even) { up += arr(i); i += 2 }
      buf.clear()
      if (even < arr.length) buf += arr(even) // odd leftover keeps weight 2^h
    }

    def merge(other: Sketch): Unit = {
      require(other.k == k, s"kll merge k mismatch: $k vs ${other.k}")
      n += other.n
      parity += other.parity
      var h = 0
      while (h < other.levels.length) {
        if (h >= levels.length) levels += ArrayBuffer.empty[Long]
        levels(h) ++= other.levels(h)
        h += 1
      }
      compactCascade()
    }

    /** The retained (value, weight) pairs sorted by value; Σweight = n. */
    def weighted: Array[(Long, Long)] = {
      val out = ArrayBuffer.empty[(Long, Long)]
      var h = 0
      while (h < levels.length) {
        val w = 1L << h
        levels(h).foreach(v => out += ((v, w)))
        h += 1
      }
      out.sortBy(_._1).toArray
    }

    /** Estimate of the q-quantile (q in ppm): the first retained value
      * whose cumulative weight reaches ceil(q·n ⁄ 10⁶), clamped to
      * [1, n]. Returns None on an empty sketch.
      */
    def quantile(qPpm: Long): Option[Long] = {
      if (n == 0) return None
      // BigInt for the rank target: qPpm * n overflows Long once
      // n > ~9.2e12 — in range for the 100 TB row counts this sketch
      // exists for. One BigInt op per quantile CALL (not per row).
      val target = math.max(1L, math.min(n,
        ((BigInt(qPpm) * n + 999999L) / 1000000L).toLong))
      var cum = 0L
      val ws = weighted
      var i = 0
      while (i < ws.length) {
        cum += ws(i)._2
        if (cum >= target) return Some(ws(i)._1)
        i += 1
      }
      Some(ws.last._1) // unreachable when weights sum to n; safe anyway
    }

    def serialize: Array[Byte] = {
      val bytes = new ByteArrayOutputStream(32 + levels.map(_.length).sum * 8)
      val out = new DataOutputStream(bytes)
      out.writeInt(k)
      out.writeLong(n)
      out.writeLong(parity)
      out.writeInt(levels.length)
      levels.foreach { lv =>
        out.writeInt(lv.length)
        lv.foreach(out.writeLong)
      }
      out.flush()
      bytes.toByteArray
    }
  }

  def deserialize(storage: Array[Byte]): Sketch = {
    val in = ByteBuffer.wrap(storage)
    val sk = new Sketch(in.getInt)
    sk.n = in.getLong
    sk.parity = in.getLong
    val nLevels = in.getInt
    var h = 0
    while (h < nLevels) {
      if (h >= sk.levels.length) sk.levels += ArrayBuffer.empty[Long]
      val sz = in.getInt
      var i = 0
      while (i < sz) { sk.levels(h) += in.getLong; i += 1 }
      h += 1
    }
    sk
  }
}
