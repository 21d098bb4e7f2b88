package graft.functions

import org.apache.spark.ml.linalg.{DenseVector, SparseVector, Vector, Vectors}

/** Dense/sparse vector kernels (reference capability:
  * /root/reference/mllib/src/main/scala/linalg/implicits.scala:21-152).
  * Plain JVM loops — fast enough inside codegen'd UDF calls and
  * `mapPartitions`; usable on both `ml.linalg.Vector` columns and raw
  * `Array[Float]` embedding columns (the `embeddings` table's layout).
  */
object VectorKernels extends Serializable {

  def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  def dotF(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))
  def normF(a: Array[Float]): Double = math.sqrt(dotF(a, a))

  /** Dim threshold above which the *Fast kernels route to netlib BLAS
    * (`dev.ludovic.netlib`, bundled with Spark 4). Netlib's unrolled
    * accumulation is NOT bit-identical to the sequential scalar loop
    * (~1e-7 relative), so every oracle-parity path must stay on plain
    * [[dotF]]/[[normF]] — which happens automatically: all hash-gated
    * fixtures are 64-dim, far under the threshold. Measured on this
    * container's Java11BLAS fallback: ~1.5-2x over the scalar loop at
    * dim 1024 (a native or Vector-API netlib on a real cluster widens
    * that); below ~512 dims call overhead eats the gain. */
  val blasDimThreshold = 512

  // lazy per-JVM: executors initialize their own instance; any loader
  // failure (exotic JVM, missing jar) degrades to the scalar path
  @transient private lazy val netlib: dev.ludovic.netlib.blas.BLAS =
    try dev.ludovic.netlib.blas.BLAS.getInstance()
    catch { case _: Throwable => null }

  /** [[dotF]] with a netlib fast path at dim >= [[blasDimThreshold]] —
    * for score/threshold/argmax consumers (ANN rerank, near-dup kernel,
    * IVF assignment), NOT for hash-gated comparisons. */
  def dotFFast(a: Array[Float], b: Array[Float]): Double =
    if (netlib != null && a.length >= blasDimThreshold)
      netlib.sdot(a.length, a, 1, b, 1).toDouble
    else dotF(a, b)

  /** [[normF]] with the same fast-path contract as [[dotFFast]]. */
  def normFFast(a: Array[Float]): Double = math.sqrt(dotFFast(a, a))

  /** Unit-normalize (zero vectors pass through unchanged). */
  def unitF(a: Array[Float]): Array[Float] = {
    val n = normF(a)
    if (n == 0) a else { val out = new Array[Float](a.length)
      var i = 0; while (i < a.length) { out(i) = (a(i) / n).toFloat; i += 1 }
      out }
  }

  /** Index of the centroid with the largest dot product (ties → lowest
    * index, so results are deterministic). Routes through [[dotFFast]]:
    * an argmax consumer tolerates the fast path's last-ulp wobble (only
    * an exact tie between centroids could flip, and its callers are
    * recall-gated, not hash-gated). */
  def argmaxDotF(v: Array[Float], centroids: Array[Array[Float]]): Int = {
    var best = 0; var bestDot = Double.NegativeInfinity; var c = 0
    while (c < centroids.length) {
      val d = dotFFast(v, centroids(c))
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  def cosine(a: Array[Double], b: Array[Double]): Double = {
    val d = norm(a) * norm(b)
    if (d == 0) 0.0 else dot(a, b) / d
  }

  def cosineF(a: Array[Float], b: Array[Float]): Double = {
    val d = normF(a) * normF(b)
    if (d == 0) 0.0 else dotF(a, b) / d
  }

  /** (cos + 1) / 2, NaN -> 0 — the reference's `similarityScore`. */
  def similarityScore(a: Vector, b: Vector): Double = {
    val c = cosine(a, b)
    if (c.isNaN) 0.0 else (c + 1.0) / 2.0
  }

  def cosine(a: Vector, b: Vector): Double = (a, b) match {
    case (x: DenseVector, y: DenseVector) => cosine(x.values, y.values)
    case _ =>
      val d = math.sqrt(sparseDot(a, a)) * math.sqrt(sparseDot(b, b))
      if (d == 0) 0.0 else sparseDot(a, b) / d
  }

  private def sparseDot(a: Vector, b: Vector): Double = (a, b) match {
    case (x: SparseVector, y: SparseVector) =>
      var s = 0.0; var i = 0; var j = 0
      while (i < x.indices.length && j < y.indices.length) {
        if (x.indices(i) == y.indices(j)) { s += x.values(i) * y.values(j); i += 1; j += 1 }
        else if (x.indices(i) < y.indices(j)) i += 1
        else j += 1
      }
      s
    case _ => dot(a.toArray, b.toArray)
  }

  def add(a: Vector, b: Vector): Vector = {
    val out = a.toArray.clone()
    val bb = b.toArray
    var i = 0
    while (i < out.length) { out(i) += bb(i); i += 1 }
    Vectors.dense(out)
  }

  def subtract(a: Vector, b: Vector): Vector = {
    val out = a.toArray.clone()
    val bb = b.toArray
    var i = 0
    while (i < out.length) { out(i) -= bb(i); i += 1 }
    Vectors.dense(out)
  }

  def scale(a: Vector, f: Double): Vector =
    Vectors.dense(a.toArray.map(_ * f))

  /** Random unit hyperplanes for sign-LSH, seeded deterministic. */
  def hyperplanes(dim: Int, n: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign signature of `v` against hyperplanes, packed into a Long bitset
    * (n <= 64). Vectors with small cosine distance agree on most bits. */
  def signSignature(v: Array[Float], planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      var s = 0.0; var i = 0
      val pl = planes(p)
      while (i < v.length) { s += v(i) * pl(i); i += 1 }
      if (s >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** ENGINE-PORTABLE sign signature: plane components are Rademacher ±1
    * signs drawn from the bits of `mix64(seed + table·1000003 + b)` — one
    * mixed long per (table, bit-plane), component d using bit (d mod 64).
    * Rademacher planes satisfy the sign-LSH hyperplane property like
    * Gaussians do (standard practice), and every step — the mix, the bit
    * test, the ascending-order double accumulation of float components —
    * is replayable in plain SQL, so LSH bucketing itself can be
    * oracle-gated (see the ann02 oracle). Dims beyond 64 draw from further
    * mixed longs (one per 64-dim chunk; chunk 0 is the base value, so
    * 64-dim signatures — and the ann02 oracle — are unchanged), keeping
    * every component sign independent at any dimensionality. */
  def rademacherSignature(v: Array[Float], seed: Long, nBits: Int, table: Int): Long = {
    var sig = 0L
    var b = 0
    while (b < nBits) {
      if (rademacherDot(v, seed + table * 1000003L + b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** ENGINE-PORTABLE fixed-centroid score: dot of `v` against the
    * Rademacher ±1 pseudo-centroid for `cell` — signs from
    * `mix64(seed + cell·1000003)`, same per-64-dim chunk redraw as
    * [[rademacherSignature]]. Every cell's centroid has identical norm
    * √dim, so `argmax` over this raw dot equals `argmax` over cosine
    * WITHOUT any normalization step — which is exactly what makes IVF
    * cell assignment replayable in plain SQL (see the ann04 oracle). */
  def rademacherCellScore(v: Array[Float], seed: Long, cell: Int): Double =
    rademacherDot(v, seed + cell * 1000003L)

  // shared ±1-sign dot: double accumulation ascending-d over widened
  // floats, one mixed long per 64-dim chunk (chunk 0 = mix64(base))
  private def rademacherDot(v: Array[Float], base: Long): Double = {
    var h = TextKernels.mix64(base)
    var s = 0.0
    var d = 0
    while (d < v.length) {
      if (d > 0 && (d & 63) == 0)
        h = TextKernels.mix64(base + 2654435761L * (d >>> 6))
      if (((h >>> (d & 63)) & 1L) == 1L) s += v(d) else s -= v(d)
      d += 1
    }
    s
  }
}
