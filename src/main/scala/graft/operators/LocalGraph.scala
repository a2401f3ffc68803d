package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Primitive-array toolkit for the guarded LOCAL graph regimes
  * (PageRank / BFS / k-core / connected components / HITS) — the
  * Triangles packed-long template ([[Triangles]]'s CSR probe) promoted
  * to a shared helper (r10 advice: the local regimes collected
  * `Array[Row]` — ~100 B per boxed edge, ≈1 GB at the 10M-edge guard,
  * held across k iterations — where 8 B/edge primitives suffice).
  *
  * Driver byte budget, derived not vibed: one packed long per edge is
  * exactly 8 B — the 10M-edge default guard collects 80 MB, plus one
  * transient 8 B/edge index-packed copy while building a CSR (160 MB
  * peak, freed before iteration), plus |V|-bounded primitive vectors
  * (8 B ids + 4 B offsets + 8 B scores ≈ 20 B/node, 20 MB at the
  * 1M-node guard). Total ≤ ~180 MB transient / ~100 MB held — safe at
  * Spark's default 1g driver heap, comfortable at bench's 128 GiB.
  *
  * Packing rule (the Triangles id bound, r9 review): keys are
  * src·2³² + dst, so ids must sit in [0, 2³¹) — the largest packable
  * key is then (2³¹−1)·2³² + 2³²−1 = Long.Max and every key stays in
  * signed range. Callers verify the bound from the same stats
  * aggregate that counts edges and nulls; ids outside it simply keep
  * the distributed plan (the local regime is an optimization, never a
  * semantics change).
  */
object LocalGraph {

  val Pack = 4294967296L // 2^32
  val MaxId: Long = Pack / 2 - 1 // 2^31 − 1, see packing rule above

  def src(p: Long): Long = p >>> 32
  def dst(p: Long): Long = p & (Pack - 1)

  /** Collect (srcCol, dstCol) as ONE packed primitive long array via a
    * typed Dataset — no boxed Row ever reaches the driver. Caller must
    * have verified the [0, 2³¹) id bound and null-freeness first. */
  def collectPacked(df: DataFrame, srcCol: String, dstCol: String): Array[Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select((col(srcCol) * Pack + col(dstCol)).as("p")).as[Long].collect()
  }

  /** Sorted distinct node ids over BOTH endpoints — primitive
    * throughout (transient peak: one 2m-long array, dedup in place). */
  def nodeIds(packed: Array[Long]): Array[Long] = {
    val all = new Array[Long](packed.length * 2)
    var i = 0
    while (i < packed.length) {
      all(2 * i) = src(packed(i)); all(2 * i + 1) = dst(packed(i)); i += 1
    }
    java.util.Arrays.sort(all)
    var n = 0
    var j = 0
    while (j < all.length) {
      if (n == 0 || all(j) != all(n - 1)) { all(n) = all(j); n += 1 }
      j += 1
    }
    java.util.Arrays.copyOf(all, n)
  }

  /** Dense index of `id` in the sorted dictionary (−insert−1 when
    * absent, the binarySearch contract). */
  def idx(ids: Array[Long], id: Long): Int =
    java.util.Arrays.binarySearch(ids, id)

  /** CSR over node INDICES: for i in [0, |V|), targets(k) for k in
    * [offsets(i), offsets(i+1)) are the dst indices of ids(i)'s
    * out-edges. Duplicate edges are PRESERVED (degree = edge-row
    * multiplicity, matching the distributed count aggregates); the
    * out-lists are ascending (index-packed sort). Transient peak: one
    * extra 8 B/edge index-packed array, dead on return. */
  def csr(packed: Array[Long], ids: Array[Long]): (Array[Int], Array[Int]) = {
    val m = packed.length
    val byIdx = new Array[Long](m)
    var i = 0
    while (i < m) {
      byIdx(i) = idx(ids, src(packed(i))).toLong * Pack +
        idx(ids, dst(packed(i)))
      i += 1
    }
    java.util.Arrays.sort(byIdx)
    val offsets = new Array[Int](ids.length + 1)
    val targets = new Array[Int](m)
    i = 0
    while (i < m) {
      targets(i) = (byIdx(i) & (Pack - 1)).toInt
      offsets((byIdx(i) >>> 32).toInt + 1) += 1
      i += 1
    }
    i = 0
    while (i < ids.length) { offsets(i + 1) += offsets(i); i += 1 }
    (offsets, targets)
  }
}
