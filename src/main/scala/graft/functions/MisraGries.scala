package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

/** Misra–Gries frequent-items summary (Misra & Gries 1982), with the
  * MERGE rule from Agarwal et al., "Mergeable Summaries" (PODS 2012,
  * §3): combine counters, then subtract the (k+1)-th largest combined
  * count from every counter and drop the non-positive ones — at most k
  * survive, and the total error stays ≤ n ⁄ (k+1) over ANY merge tree.
  * That bound is what the oracle gate checks: estimates never
  * overcount, undercount by at most n ⁄ (k+1), and every item with true
  * frequency above n ⁄ (k+1) is guaranteed present — all THEOREMS, so
  * the graded booleans are deterministic under any partition layout,
  * AQE re-plan, or retry, exactly like [[Kll]]'s rank envelope.
  *
  * This is the 100 TB heavy-hitter answer next to the KLL percentile
  * answer: O(k) state per partition, one pass, partials land in a
  * table as BINARY and merge later. The exact census the oracle
  * compares against is the thing a 100 TB job can NOT afford.
  */
object MisraGries {

  final class Summary(private var k0: Int) {
    /** Counter budget. Mutable only through marker adoption in [[merge]]:
      * a pristine k=0/n=0 buffer (MgMergeAgg's createAggregationBuffer
      * marker) adopts the first real summary's k; every other k mismatch
      * is a hard error, because proceeding would silently change the
      * n/(k+1) error bound the grading booleans are theorems under. */
    def k: Int = k0
    /** Total stream weight folded into this summary. */
    var n: Long = 0L
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

    def update(item: String): Unit = {
      n += 1
      counts.get(item) match {
        case Some(c) => counts.update(item, c + 1)
        case None if counts.size < k => counts.update(item, 1L)
        case None =>
          // classic MG: decrement every counter, evict zeros; the new
          // item's weight is absorbed by the global decrement
          val dead = mutable.ArrayBuffer.empty[String]
          counts.mapValuesInPlace((_, c) => c - 1)
          counts.foreach { case (i, c) => if (c <= 0) dead += i }
          dead.foreach(counts.remove)
      }
    }

    /** Agarwal et al. merge: sum counters, subtract the (k+1)-th
      * largest, drop non-positive. */
    def merge(other: Summary): Unit = {
      if (k0 == 0 && n == 0 && counts.isEmpty) k0 = other.k
      require(other.k == k || (other.k == 0 && other.n == 0 && other.counts.isEmpty),
        s"misra-gries k mismatch: $k vs ${other.k}")
      n += other.n
      other.counts.foreach { case (i, c) =>
        counts.update(i, counts.getOrElse(i, 0L) + c)
      }
      if (counts.size > k) {
        val sorted = counts.values.toArray.sorted(Ordering[Long].reverse)
        val sub = sorted(k) // (k+1)-th largest combined count
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - sub)
        counts.foreach { case (i, c) => if (c <= 0) dead += i }
        dead.foreach(counts.remove)
      }
    }

    /** Estimated count; 0 when absent (MG never overcounts). */
    def estimate(item: String): Long = counts.getOrElse(item, 0L)

    /** Deterministic bytes: counters sorted by item. */
    def serialize: Array[Byte] = {
      val bytes = new ByteArrayOutputStream(16 + counts.size * 24)
      val out = new DataOutputStream(bytes)
      out.writeInt(k)
      out.writeLong(n)
      out.writeInt(counts.size)
      counts.toSeq.sortBy(_._1).foreach { case (i, c) =>
        val b = i.getBytes(StandardCharsets.UTF_8)
        out.writeInt(b.length); out.write(b); out.writeLong(c)
      }
      out.flush()
      bytes.toByteArray
    }
  }

  def deserialize(storage: Array[Byte]): Summary = {
    val in = ByteBuffer.wrap(storage)
    val s = new Summary(in.getInt)
    s.n = in.getLong
    var left = in.getInt
    while (left > 0) {
      val b = new Array[Byte](in.getInt)
      in.get(b)
      s.counts.update(new String(b, StandardCharsets.UTF_8), in.getLong)
      left -= 1
    }
    s
  }
}
