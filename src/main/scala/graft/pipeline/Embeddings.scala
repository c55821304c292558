package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Embedding-matrix decomposition: distributed PCA / whitening for
  * dimension reduction of an embedding column — the standard
  * preprocessing before large-scale ANN (fewer dims → smaller index,
  * faster distance kernels) and for decorrelating features before
  * quantization (`Ann.int8Codes` compresses better on whitened axes).
  *
  * Scale shape: ONE pass over the data aggregates (n, Σx, Σxxᵀ) —
  * d×d partial Gram matrices combine associatively, so the tree
  * aggregation ships O(d²) doubles per partition, never rows. The d×d
  * eigendecomposition runs on the driver (d = embedding dim, 64 here —
  * microseconds; the driver never sees data, only moments). Projection
  * is a pure map stage with the component matrix in the closure. This
  * is the canonical RowMatrix.computeCovariance shape — the one place
  * an RDD treeAggregate is the right tool (a per-partition imperative
  * accumulator over primitive arrays).
  */
object Embeddings {

  /** PCA model: column means, k orthonormal components (k×d,
    * row-major), and per-component explained variance (descending).
    * Component signs are canonicalized (largest-|coefficient| entry
    * positive) so the model is reproducible up to float-sum jitter. */
  final case class PcaModel(mean: Array[Double],
      components: Array[Array[Double]], explained: Array[Double],
      totalVariance: Double) {
    def d: Int = mean.length
    def k: Int = components.length
    def explainedRatio: Double =
      if (totalVariance == 0) 0.0 else explained.sum / totalVariance
  }

  /** Fit PCA with `k` components on an `Array[Float]` embedding column.
    * One treeAggregate pass (moments only), driver-side eigSym of the
    * d×d covariance. */
  def fitPca(df: DataFrame, vec: Column, k: Int): PcaModel = {
    val rows = df.select(vec.cast("array<double>")).na.drop()
      .rdd.map(_.getSeq[Double](0).toArray)
    val d = rows.first().length
    require(k >= 1 && k <= d, s"k must be in [1, $d]")
    // (n, sum, gram upper-triangular packed)
    val zero = (0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
    val (n, s, g) = rows.treeAggregate(zero)(
      seqOp = { case ((n0, s0, g0), x) =>
        var i = 0
        var off = 0
        while (i < d) {
          s0(i) += x(i)
          var j = i
          while (j < d) { g0(off + j - i) += x(i) * x(j); j += 1 }
          off += d - i
          i += 1
        }
        (n0 + 1, s0, g0)
      },
      combOp = { case ((n1, s1, g1), (n2, s2, g2)) =>
        var i = 0
        while (i < d) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < g1.length) { g1(i) += g2(i); i += 1 }
        (n1 + n2, s1, g1)
      })
    require(n > 1, "need at least 2 vectors")
    val mean = s.map(_ / n)
    // covariance = E[xxT] - mean meanT (population)
    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    var off = 0
    for (i <- 0 until d) {
      for (j <- i until d) {
        val c = g(off + j - i) / n - mean(i) * mean(j)
        cov(i, j) = c
        cov(j, i) = c
      }
      off += d - i
    }
    val es = breeze.linalg.eigSym(cov)
    // eigSym returns ascending eigenvalues; take top-k descending
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).take(k)
    val comps = order.map { case (_, idx) =>
      val v = (0 until d).map(r => es.eigenvectors(r, idx)).toArray
      // canonical sign: the largest-|coefficient| entry is positive
      val m = v.indices.maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v.map(-_) else v
    }
    PcaModel(mean, comps, order.map(_._1), es.eigenvalues.toArray.sum)
  }

  /** Project embeddings onto the model's components — pure map stage;
    * appends `pc` (Array[Double], length k). Pass `whiten = true` to
    * scale each axis by 1/√λ (unit variance per component — the
    * standard preconditioning before product quantization). */
  def project(df: DataFrame, vec: Column, model: PcaModel,
      whiten: Boolean = false): DataFrame = {
    val mean = model.mean
    val comps = model.components
    val scale = if (whiten)
      model.explained.map(l => if (l > 1e-12) 1.0 / math.sqrt(l) else 0.0)
    else Array.fill(model.k)(1.0)
    // null guard mirrors fitPca's na.drop: one null embedding row must
    // project to null, not NPE the whole job
    val proj = udf((x: Seq[Double]) =>
      if (x == null) null.asInstanceOf[Array[Double]]
      else {
        val out = new Array[Double](comps.length)
        var c = 0
        while (c < comps.length) {
          var acc = 0.0
          var i = 0
          val comp = comps(c)
          while (i < comp.length) {
            acc += (x(i) - mean(i)) * comp(i); i += 1
          }
          out(c) = acc * scale(c)
          c += 1
        }
        out
      })
    df.withColumn("pc", proj(vec.cast("array<double>")))
  }

  /** Exact quantized second-order moments — the sufficient statistics
    * of PCA as INTEGERS, so batches fold associatively with no float
    * drift: `pcaFromMoments(fold(m1, m2))` is bit-identical to the
    * one-shot fit for ANY batch split or fold order (the k-means
    * round-fold pattern applied to covariance). Coordinates quantize to
    * `round(x · 2^scaleBits)`; sums and the packed upper-triangular
    * Gram accumulate per-partition in overflow-checked longs
    * (`Math.addExact` — at scaleBits=16 and |x| ≤ 8 a partition holds
    * >10⁷ rows before the guard can trip) and cross partitions/batches
    * in BigInt, exact at any corpus size. */
  final case class QMoments(n: Long, sum: Array[BigInt],
      gram: Array[BigInt], d: Int, scaleBits: Int) {
    def fold(other: QMoments): QMoments = {
      require(d == other.d && scaleBits == other.scaleBits,
        "incompatible moment shapes")
      QMoments(n + other.n,
        sum.zip(other.sum).map(p => p._1 + p._2),
        gram.zip(other.gram).map(p => p._1 + p._2), d, scaleBits)
    }
  }

  /** One pass over a batch → its [[QMoments]]. Per-partition long
    * accumulation (one primitive array pass per row), one BigInt
    * triple per partition shipped to the tree reduce — the driver sees
    * O(d²) numbers regardless of batch size. */
  def momentsOf(df: DataFrame, vec: Column, scaleBits: Int = 16)
      : QMoments = {
    require(scaleBits >= 1 && scaleBits <= 24, "scaleBits in [1,24]")
    val scale = (1L << scaleBits).toDouble
    val rows = df.select(vec.cast("array<double>")).na.drop()
      .rdd.map(_.getSeq[Double](0).toArray)
    val d = rows.first().length
    val tri = d * (d + 1) / 2
    val partials = rows.mapPartitions { it =>
      var n = 0L
      val s = new Array[Long](d)
      val g = new Array[Long](tri)
      it.foreach { x =>
        require(x.length == d, s"ragged embedding: ${x.length} != $d")
        val q = new Array[Long](d)
        var i = 0
        while (i < d) { q(i) = math.round(x(i) * scale); i += 1 }
        i = 0
        var off = 0
        while (i < d) {
          s(i) = Math.addExact(s(i), q(i))
          var j = i
          while (j < d) {
            g(off + j - i) = Math.addExact(g(off + j - i), q(i) * q(j))
            j += 1
          }
          off += d - i
          i += 1
        }
        n += 1
      }
      Iterator.single(QMoments(n, s.map(BigInt(_)), g.map(BigInt(_)),
        d, scaleBits))
    }
    partials.treeReduce((a, b) => a.fold(b))
  }

  /** Deterministic PCA model from exact integer moments: identical
    * BigInt totals → identical doubles → identical eigSym → identical
    * model, for any batching. Same covariance/eigen/canonical-sign
    * convention as [[fitPca]] (which this generalizes — fitPca is the
    * single-batch float path; this is the mergeable exact path). */
  def pcaFromMoments(m: QMoments, k: Int): PcaModel = {
    require(m.n > 1, "need at least 2 vectors")
    require(k >= 1 && k <= m.d, s"k must be in [1, ${m.d}]")
    val d = m.d
    val scale = (1L << m.scaleBits).toDouble
    val nD = m.n.toDouble
    val mean = m.sum.map(_.toDouble / scale / nD)
    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    var off = 0
    for (i <- 0 until d) {
      for (j <- i until d) {
        val e = m.gram(off + j - i).toDouble / (scale * scale) / nD
        val c = e - mean(i) * mean(j)
        cov(i, j) = c
        cov(j, i) = c
      }
      off += d - i
    }
    val es = breeze.linalg.eigSym(cov)
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).take(k)
    val comps = order.map { case (_, idx) =>
      val v = (0 until d).map(r => es.eigenvectors(r, idx)).toArray
      val mx = v.indices.maxBy(i => math.abs(v(i)))
      if (v(mx) < 0) v.map(-_) else v
    }
    PcaModel(mean, comps, order.map(_._1), es.eigenvalues.toArray.sum)
  }

  /** One 64-bit signed-random-projection signature: the packed long
    * (bit b = plane b, `1L << b`) and the engine-portable '0'/'1'
    * bitstring (char b = plane b) — the [[Multimodal.ImagePHash]]
    * dual-representation convention. */
  final case class SrpSig(vec_id: Long, sig: Long, sig_bits: String)

  /** Deterministic ±1 projection coefficients: h(b, d) = +1 iff the
    * first 32 md5 bits of "srp:b:d" are even — a convention any engine
    * with md5 can replay (the DuckDB oracle recomputes the table in
    * SQL). */
  private[pipeline] def srpCoefs(planes: Int, dim: Int)
      : Array[Array[Double]] =
    Array.tabulate(planes) { b =>
      Array.tabulate(dim) { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"srp:$b:$d".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (java.lang.Long.parseLong(hex.take(8), 16) % 2 == 0) 1.0
        else -1.0
      }
    }

  /** Signed-random-projection bit signatures (64-bit SimHash for
    * embeddings): bit b = [Σ_d v[d]·h(b,d) ≥ 0] with the md5-derived
    * ±1 coefficients of [[srpCoefs]]. Two vectors' expected Hamming
    * distance is 64·θ/π (θ = their angle), so Hamming banding over the
    * signatures is the binary ANN/near-dup path: 64 bits per vector
    * instead of 64 floats — 32× less state to shuffle, and candidate
    * generation reuses the one banded-Hamming machinery
    * ([[Dedup.hammingDuplicates64]]).
    *
    * Determinism across engines: the dot products fold LEFT-TO-RIGHT
    * over the dimension index (a sequential loop here, `list_sum ∘
    * list_transform` in the oracle — the emb_norms precedent), so the
    * IEEE sums and therefore every sign bit agree bit-for-bit. Pure
    * map stage; the planes×dim coefficient table rides the closure. */
  def srpSignatures(df: DataFrame, idCol: Column, vecCol: Column,
      dim: Int, planes: Int = 64): Dataset[SrpSig] = {
    require(planes >= 1 && planes <= 64, s"planes in 1..64, got $planes")
    val coefs = srpCoefs(planes, dim)
    val spark = df.sparkSession
    import spark.implicits._
    // Array[Double] decodes through the primitive-array encoder — no
    // per-element boxing on the deserialization path of this hot map
    df.select(idCol.cast("long"), vecCol.cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        var sig = 0L
        val bits = new java.lang.StringBuilder(planes)
        var b = 0
        while (b < planes) {
          val h = coefs(b)
          var s = 0.0
          var d = 0
          val n = math.min(v.length, h.length)
          while (d < n) { s += v(d) * h(d); d += 1 }
          if (s >= 0.0) { sig |= 1L << b; bits.append('1') }
          else bits.append('0')
          b += 1
        }
        SrpSig(id, sig, bits.toString)
      }
  }

  /** Pairwise-cosine histogram of a (bounded) vector sample — the
    * threshold-calibration readout run before any near-dup/ANN job:
    * where does the organic similarity mass sit, and how far below a
    * candidate threshold? The CALLER bounds the sample (pass a
    * deterministic slice); the operator is all-pairs by design, so its
    * cost is sample² regardless of corpus scale — a fixed-size
    * calibration probe, not a corpus scan. One broadcast of the sample
    * against itself, one map-side-combined bin count. */
  def cosineHistogram(df: DataFrame, idCol: Column, vecCol: Column,
      binDecimals: Int = 2): DataFrame = {
    val base = df.select(idCol.as("id"),
      vecCol.cast("array<double>").as("vec"))
    val a = base.toDF("id_a", "vec_a")
    val b = base.toDF("id_b", "vec_b")
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(round(Ann.cosine(col("vec_a"), col("vec_b")),
        binDecimals).as("sim_bin"))
      .groupBy("sim_bin").agg(count(lit(1)).as("n_pairs"))
  }

  /** SemDeDup-style semantic deduplication: k-means clusters as
    * similarity blocks, exact cosine within each block, connected
    * components over the ≥-threshold pairs, keep = the smallest id of
    * each component. Output: (vec_id, rep, keep) for EVERY input row —
    * `rep` is the component representative (itself when unmatched).
    *
    * Scale shape: clustering replaces the all-pairs O(n²) comparison
    * with O(Σ cᵢ²) — choose k ∝ n so per-cluster membership stays
    * bounded and the pairwise stage costs O(n²/k) spread over
    * cluster-keyed shuffle partitions. The fixed-point integer k-means
    * ([[Clustering.fitQuantizedKMeans]]) keeps assignment
    * engine-exact, so an oracle can replay the whole chain. Caveat the
    * caller owns: a degenerate embedding distribution can collapse
    * into one giant cluster and re-create the quadratic blowup —
    * watch [[Clustering.clusterStats]] and raise k (or recurse into
    * oversized clusters) when the largest cluster exceeds budget. */
  def semDeDup(df: DataFrame, idCol: Column, vecCol: Column, k: Int,
      iterations: Int, threshold: Double, scale: Double = 1e6)
      : DataFrame = {
    val base = df.select(idCol.as("id"), vecCol.as("vec"))
    val assigned = Clustering.kMeansAssign(base, k, iterations, scale)
      .select(col("id"), col("cluster"))
    val m = assigned.join(base, "id")
      .select(col("id"), col("cluster"), col("vec"))
    val pairs = m.toDF("id_a", "cluster", "vec_a")
      .join(m.toDF("id_b", "cluster", "vec_b"), Seq("cluster"))
      .where(col("id_a") < col("id_b"))
      .where(Ann.cosine(col("vec_a").cast("array<double>"),
        col("vec_b").cast("array<double>")) >= threshold)
      .select(col("id_a"), col("id_b"))
    val comps = Dedup.connectedComponents(pairs)
    base.select(col("id").as("vec_id"))
      .join(comps.select(col("id").as("vec_id"), col("lbl")),
        Seq("vec_id"), "left_outer")
      .select(col("vec_id"),
        coalesce(col("lbl"), col("vec_id")).as("rep"),
        (coalesce(col("lbl"), col("vec_id")) === col("vec_id"))
          .as("keep"))
  }
}
