package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-state SAMPLING sketches as typed Aggregators — the
  * streaming-twin backbone for the sampling family (what [[Kmv]] is to
  * distinct counts): each keeps a fixed-k record set per group, is a
  * commutative monoid under merge (merge-sort, truncate to k), and so
  * runs identically as a batch aggregate with map-side partials or as
  * a single streaming `groupBy` with k·recordBytes of state per group
  * however long the stream runs.
  *
  *  - [[WeightedTopKAggregator]]: top-k by (es_key DESC, id ASC) — the
  *    Efraimidis–Spirakis weighted-sample prune ([[Sampling]]) as
  *    mergeable state; the s19 streaming result equals batch t29
  *    because the keying is scan-local-deterministic and top-k-by-a-
  *    total-order is arrival-order-free.
  *  - [[BottomKSampleAggregator]]: bottom-k by (hash ASC, value ASC) —
  *    a deterministic uniform sample (the KMV idea, keeping the VALUE
  *    alongside the hash) whose exact interpolated quantiles become an
  *    order-independent bounded-state streaming quantile sketch (s20).
  *
  * Buffers pack records into a sorted byte array (BINARY has a
  * first-class encoder; k ≤ a few hundred makes the O(k) insert
  * noise). Both comparators are total orders, so any arrival or merge
  * order yields the same k records — the property the streaming twins'
  * oracles rely on. */
object SampleAggregators {

  /** Top-k records by (es_key desc, id asc); record = 24 bytes. */
  class WeightedTopKAggregator(k: Int)
      extends Aggregator[(Double, Long, Long), Array[Byte], Seq[(Double, Long, Long)]] {
    require(k >= 1, "k must be positive")

    private def unpack(buf: Array[Byte]): Array[(Double, Long, Long)] = {
      val bb = java.nio.ByteBuffer.wrap(buf)
      Array.fill(buf.length / 24)((bb.getDouble, bb.getLong, bb.getLong))
    }
    private def pack(xs: Array[(Double, Long, Long)]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(xs.length * 24)
      xs.foreach { case (e, i, w) => bb.putDouble(e); bb.putLong(i); bb.putLong(w) }
      bb.array()
    }
    // es_key DESC (largest = best draw), id ASC
    private def better(a: (Double, Long, Long), b: (Double, Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: Array[Byte] = Array.emptyByteArray

    override def reduce(buf: Array[Byte], x: (Double, Long, Long)): Array[Byte] = {
      val xs = unpack(buf)
      if (xs.length == k && !better(x, xs.last)) return buf
      val out = (xs :+ x).sortWith(better).take(k)
      pack(out)
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      pack((unpack(a) ++ unpack(b)).sortWith(better).take(k))
    }

    override def finish(buf: Array[Byte]): Seq[(Double, Long, Long)] =
      unpack(buf).toSeq

    override def bufferEncoder: Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder: Encoder[Seq[(Double, Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Long)]]()
  }

  /** `weighted_topk(es_key, id, weight)` as a Column — batch and
    * streaming alike; explode the result for (es_key, id, weight)
    * rows in sample order (element 1 = first drawn). */
  def weightedTopKAgg(esKey: Column, id: Column, weight: Column, k: Int): Column =
    udaf(new WeightedTopKAggregator(k)).apply(esKey, id, weight)

  /** Bottom-k records by (hash asc, value asc); record = 16 bytes. */
  class BottomKSampleAggregator(k: Int)
      extends Aggregator[(Long, Long), Array[Byte], Seq[(Long, Long)]] {
    require(k >= 1, "k must be positive")

    private def unpack(buf: Array[Byte]): Array[(Long, Long)] = {
      val bb = java.nio.ByteBuffer.wrap(buf)
      Array.fill(buf.length / 16)((bb.getLong, bb.getLong))
    }
    private def pack(xs: Array[(Long, Long)]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(xs.length * 16)
      xs.foreach { case (h, v) => bb.putLong(h); bb.putLong(v) }
      bb.array()
    }
    private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: Array[Byte] = Array.emptyByteArray

    override def reduce(buf: Array[Byte], x: (Long, Long)): Array[Byte] = {
      val xs = unpack(buf)
      if (xs.length == k && !lt(x, xs.last)) return buf
      pack((xs :+ x).sortWith(lt).take(k))
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      pack((unpack(a) ++ unpack(b)).sortWith(lt).take(k))
    }

    override def finish(buf: Array[Byte]): Seq[(Long, Long)] = unpack(buf).toSeq

    override def bufferEncoder: Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** `bottomk_sample(hash, value)` as a Column. */
  def bottomKSampleAgg(hash: Column, value: Column, k: Int): Column =
    udaf(new BottomKSampleAggregator(k)).apply(hash, value)
}
