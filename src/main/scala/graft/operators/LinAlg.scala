package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed linear algebra over embedding columns: the Gram matrix
  * (one aggregation, d²-bounded output) and PCA built on it (driver-side
  * Jacobi eigensolver on the d×d matrix — d² is a constant, corpus data
  * never reaches the driver — then a scan-local projection through the
  * broadcast eigenvectors, the a12 shape).
  *
  * Engine-exactness of the Gram pass: inputs quantize to 2⁻²⁰ units,
  * products and sums are pure integer arithmetic (DECIMAL(38,0) partials
  * — a 100 TB corpus overflows i64 sums), and the de-scale divides by
  * 2⁴⁰; the only rounding is the final correctly-rounded decimal→double
  * conversion, identical in both engines. */
object LinAlg {

  /** ×2²⁰ integer quantization with the null-element guard built in:
    * a null ELEMENT inside a non-null vector would otherwise flow on as
    * a null cell — an opaque unboxing NPE on the typed path, a silently
    * null output on the SQL path. coalesce short-circuits, so the
    * assert only evaluates on an actually-null element; every consumer
    * (gram/moments/projection) fails loudly and identically. */
  private def quantized(vecCol: String): Column =
    expr(s"""transform($vecCol, (x, i) -> coalesce(
            |  cast(round(cast(x as double) * 1048576, 0) as bigint),
            |  cast(assert_true(false, concat('LinAlg: null element at index ',
            |    cast(i as string), ' of vector — null-clean the embedding column first')) as bigint)))"""
      .stripMargin)

  /** One-scan partial accumulation of the Gram upper triangle AND the
    * column sums AND the row count: tight per-partition accumulator
    * loops (genuine per-partition imperative logic — the mapPartitions
    * carve-out), flushed as (kind, d1, d2, lo, hi) rows every 2²⁰
    * input rows, then exactly decimal-summed across flushes. The
    * original explode form materialized d(d+1)/2 ≈ 2080 rows PER
    * VECTOR before the aggregate — the whole a13/a14 scan cost was
    * that row stream, not the arithmetic. Emitted partial volume is
    * |partitions+flushes|·(d²/2+d+1) rows — corpus-size-independent
    * per partition, the true map-side-combine shape.
    *
    * Cells accumulate in SIGNED 128-bit (hi, lo) pairs —
    * `Math.multiplyHigh` + carry-propagated unsigned low adds — so
    * large-magnitude inputs (|v| up to 2⁵³, i.e. |x| up to ~2³³ at the
    * 2²⁰ quantization) cannot wrap the way a bare long product would
    * (the r3 review's i64-wrap regression, preserved by
    * ReviewRegressionSpec). Each emitted value is hi·2⁶⁴ + u(lo),
    * reconstructed in DECIMAL(38,0) by [[partialSum]].
    *
    * kind: 0 = gram cell (d1 ≤ d2), 1 = column sum (d1), 2 = count. */
  private def modelPartials(vectors: DataFrame, vecCol: String,
                            dim: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors.filter(col(vecCol).isNotNull)
      // quantized() carries the null-element guard, so a corrupt vector
      // fails loudly here instead of NPE-ing in the Seq[Long] decoder
      .select(quantized(vecCol).as("vq")).as[Seq[Long]]
      .mapPartitions { it =>
        val tri = dim * (dim + 1) / 2
        val gLo = Array.ofDim[Long](tri); val gHi = Array.ofDim[Long](tri)
        val sLo = Array.ofDim[Long](dim); val sHi = Array.ofDim[Long](dim)
        var n = 0L
        val out = scala.collection.mutable.ArrayBuffer[(Int, Int, Int, Long, Long)]()
        def flush(): Unit = if (n > 0) {
          var idx = 0; var i = 0
          while (i < dim) {
            out += ((1, i + 1, 0, sLo(i), sHi(i))); sLo(i) = 0; sHi(i) = 0
            var j = i
            while (j < dim) {
              out += ((0, i + 1, j + 1, gLo(idx), gHi(idx)))
              gLo(idx) = 0; gHi(idx) = 0
              idx += 1; j += 1
            }
            i += 1
          }
          out += ((2, 0, 0, n, 0L)); n = 0
        }
        // 128-bit += : carry from the unsigned low add, high side signed
        @inline def add128(lo: Array[Long], hi: Array[Long], k: Int,
                           pLo: Long, pHi: Long): Unit = {
          val l0 = lo(k)
          val nl = l0 + pLo
          val carry = ((l0 & pLo) | ((l0 | pLo) & ~nl)) >>> 63
          lo(k) = nl
          hi(k) += pHi + carry
        }
        while (it.hasNext) {
          val a = it.next().toArray
          if (a.length != dim)
            throw new IllegalArgumentException(
              s"gram: vector of length ${a.length}, expected $dim")
          var idx = 0; var i = 0
          while (i < dim) {
            val vi = a(i)
            add128(sLo, sHi, i, vi, vi >> 63)
            var j = i
            while (j < dim) {
              add128(gLo, gHi, idx, vi * a(j), Math.multiplyHigh(vi, a(j)))
              idx += 1; j += 1
            }
            i += 1
          }
          n += 1
          if (n == (1 << 20)) flush()
        }
        flush()
        out.iterator
      }.toDF("kind", "d1", "d2", "lo", "hi")
  }

  /** Exact DECIMAL(38,0) total of 128-bit (hi, lo) partials:
    * Σ hi·2⁶⁴ + Σ u(lo), every term exact. */
  private def partialSum: Column = {
    val two64 = expr("cast('18446744073709551616' as decimal(38,0))")
    val uLo = when(col("lo") < 0,
      col("lo").cast(DecimalType(38, 0)) + two64)
      .otherwise(col("lo").cast(DecimalType(38, 0)))
    sum(col("hi").cast(DecimalType(38, 0)) * two64 + uLo)
  }

  /** Exactly-summed model statistics from ONE corpus scan:
    * (column sums S_d as exact longs, row count n, dense symmetric
    * G = XᵀX in de-scaled doubles). */
  private def modelStats(vectors: DataFrame, vecCol: String,
                         dim: Int): (Array[Long], Long, Array[Array[Double]]) = {
    val rows = modelPartials(vectors, vecCol, dim)
      .groupBy(col("kind"), col("d1"), col("d2"))
      .agg(partialSum.as("s"))
      .collect()
    val sums = Array.ofDim[Long](dim)
    val g = Array.ofDim[Double](dim, dim)
    var n = 0L
    rows.foreach { r =>
      val kind = r.getInt(0); val s = r.getDecimal(3)
      kind match {
        case 0 =>
          val d1 = r.getInt(1) - 1; val d2 = r.getInt(2) - 1
          val v = s.doubleValue() / 1099511627776.0
          g(d1)(d2) = v; g(d2)(d1) = v
        case 1 => sums(r.getInt(1) - 1) = s.longValueExact()
        case 2 => n = s.longValueExact()
      }
    }
    (sums, n, g)
  }

  /** Upper-triangle Gram matrix G = XᵀX in long format (d1 ≤ d2, g).
    * One corpus scan via [[modelPartials]]; the exchange carries
    * d²-bounded partial rows per partition regardless of corpus size. */
  def gramMatrix(vectors: DataFrame, vecCol: String, dim: Int): DataFrame =
    modelPartials(vectors, vecCol, dim)
      .filter(col("kind") === 0)
      .groupBy(col("d1"), col("d2"))
      .agg(partialSum.as("s"))
      .select(col("d1").cast("long").as("d1"), col("d2").cast("long").as("d2"),
        (col("s").cast("double") / 1099511627776.0).as("g"))

  /** Cyclic Jacobi eigensolver for a symmetric matrix — deterministic
    * sweep order, converges quadratically; d is O(100), so this is
    * microseconds on the driver. Returns (eigenvalues, eigenvectors as
    * columns) sorted by eigenvalue descending. */
  private[operators] def jacobiEigen(a0: Array[Array[Double]])
  : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 50 && off > 1e-12) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            off = math.max(off, math.abs(a(p)(q)))
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // theta == 0 means tan(2φ) = ∞ → t = 1 (signum(0) would
            // produce the identity rotation and never converge)
            val t = if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map(i => (0 until d).map(r => v(r)(i)).toArray).toArray
    // sign convention: largest-|component| entry positive, so the basis
    // is deterministic (eigenvectors are defined up to sign)
    evecs.foreach { e =>
      val m = e.indices.maxBy(i => (math.abs(e(i)), -i))
      if (e(m) < 0) e.indices.foreach(i => e(i) = -e(i))
    }
    (evals, evecs)
  }

  /** PCA: covariance from the Gram pass + centering moments, driver-side
    * Jacobi on the d×d matrix, then a scan-local projection of the
    * CENTERED vectors through the top-k eigenvector literals. TWO
    * corpus scans total (fused moments+gram model pass, projection),
    * zero corpus shuffles beyond the d²-bound partial aggregation.
    * Null-vector rows are excluded throughout.
    *
    * Output: (id, pc 1..k, y) long format. Use [[pca]] when the
    * explained variances are needed too — calling [[pcaEigenvalues]]
    * separately would recompute the covariance (another model scan). */
  def pcaProject(vectors: DataFrame, idCol: String, vecCol: String,
                 dim: Int, k: Int): DataFrame =
    pca(vectors, idCol, vecCol, dim, k)._1

  /** [[pcaProject]] plus the explained variance per component
    * (eigenvalues of the sample covariance, descending) from the same
    * single covariance computation. */
  def pca(vectors: DataFrame, idCol: String, vecCol: String,
          dim: Int, k: Int): (DataFrame, Array[Double]) = {
    require(k >= 1 && k <= dim, "need 1 <= k <= dim")
    val (cov, means) = covariance(vectors, vecCol, dim)
    val (evals, evecs) = jacobiEigen(cov)
    val projections = (1 to k).map { j =>
      val e = evecs(j - 1)
      val arr = e.mkString("array(", "D,", "D)")
      val mArr = means.mkString("array(", "D,", "D)")
      expr(s"""aggregate(sequence(1, $dim), 0D, (acc, d) ->
             |  acc + (cast(element_at($vecCol, d) as double) -
             |    element_at($mArr, d)) * element_at($arr, d))""".stripMargin)
    }
    val projected = vectors.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"),
        posexplode(array(projections: _*)).as(Seq("pos", "y")))
      .select(col("id"), (col("pos") + 1).cast("long").as("pc"), col("y"))
    (projected, evals.take(k))
  }

  /** ENGINE-EXACT fixed-point PCA projection — the a14 oracle form.
    * Inputs quantize to X_d = round(x_d·2²⁰) (exact: float32 is exact
    * in double), the driver-side Jacobi eigenvectors quantize to
    * E_d = round(e_d·2¹⁴) plan literals, and the centered projection is
    * emitted as the exact integer
    *
    *   y_scaled = Σ_d (n·X_d − S_d)·E_d      (= n·2³⁴·⟨x − mean, e⟩)
    *
    * with S_d the exact corpus column sums. Every step after the driver
    * eigensolve is order-free 64-bit integer arithmetic, so a SQL
    * engine handed the same (n, S, E) literals reproduces y_scaled
    * bit-for-bit — the a12/a13 quantization principle extended to PCA.
    * Magnitude: |y_scaled| ≤ n·2·2²⁰·2¹⁴·d ≈ 2⁵⁶ at n = 10⁵, d = 64 —
    * inside int64; [[pca]] remains the double-precision 100 TB surface.
    *
    * Returns the projection (id, pc 1..k, y_scaled) plus the literals
    * an oracle needs: (n, S, quantized eigenvectors). */
  def pcaProjectExact(vectors: DataFrame, idCol: String, vecCol: String,
                      dim: Int, k: Int)
  : (DataFrame, (Long, Array[Long], Array[Array[Long]])) = {
    require(k >= 1 && k <= dim, "need 1 <= k <= dim")
    // the WHOLE model (sums, count, Gram) from one corpus scan
    val (sums, n, g) = modelStats(vectors, vecCol, dim)
    require(n >= 2, "covariance needs at least 2 rows")
    val means = sums.map(_ / 1048576.0 / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      (g(i)(j) - n * means(i) * means(j)) / (n - 1.0))
    val (_, evecs) = jacobiEigen(cov)
    val evecsQ = evecs.take(k).map(_.map(e => math.round(e * 16384.0)))
    val sArr = sums.mkString("array(", "L,", "L)")
    val projections = evecsQ.map { eq =>
      val eArr = eq.mkString("array(", "L,", "L)")
      expr(s"""aggregate(sequence(1, $dim), 0L, (acc, d) ->
             |  acc + (${n}L * element_at(vq, d) - element_at($sArr, d)) *
             |    element_at($eArr, d))""".stripMargin)
    }
    val projected = vectors.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), quantized(vecCol).as("vq"))
      .select(col("id"), posexplode(array(projections.toIndexedSeq: _*)).as(Seq("pos", "y_scaled")))
      .select(col("id"), (col("pos") + 1).cast("long").as("pc"), col("y_scaled"))
    (projected, (n, sums, evecsQ))
  }

  /** Sample covariance matrix (dense, driver-side d×d) and the mean
    * vector — ONE corpus scan via [[modelStats]]. */
  private[operators] def covariance(vectors: DataFrame, vecCol: String,
                                    dim: Int): (Array[Array[Double]], Array[Double]) = {
    val (sums, n, g) = modelStats(vectors, vecCol, dim)
    require(n >= 2, "covariance needs at least 2 rows")
    val means = sums.map(_ / 1048576.0 / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      (g(i)(j) - n * means(i) * means(j)) / (n - 1.0))
    (cov, means)
  }

  /** Eigenvalues of the sample covariance (explained variance per
    * component, descending). Standalone — recomputes the covariance
    * (one model scan); when a projection is also needed, use [[pca]]
    * to pay for the covariance once. */
  def pcaEigenvalues(vectors: DataFrame, vecCol: String, dim: Int): Array[Double] =
    jacobiEigen(covariance(vectors, vecCol, dim)._1)._1
}
