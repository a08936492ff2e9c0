package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component extraction over an embedding column.
  *
  * The reference engine stores raw vectors and never analyzes their
  * joint distribution (pkg/storage/memory.go holds them as opaque
  * float slices); at training-corpus scale the top principal
  * component IS a first-class audit — it exposes a dominant nuisance
  * direction (a "rogue dimension" from a bad encoder, length leakage,
  * one-hot contamination) before anyone trains on the embeddings.
  *
  * Architecture, sized for 100 TB:
  *
  *  - The only n-scaling work is the Gram accumulation: one
  *    `mapPartitions` pass that folds every vector into a local
  *    `dim x dim` long array (exact integer math, see below), so the
  *    shuffle moving to the reduce side is `numPartitions * dim^2`
  *    rows — independent of corpus size. This is the standard
  *    outer-product-accumulate shape (same contract as
  *    [[graft.functions.Embedder]]'s per-partition batching).
  *  - The eigensolve runs on the driver over the collected `dim^2`
  *    Gram frame — model-sized (64x64 here, 384x384 at the
  *    reference's MiniLM width), the same deliberately-tiny collect
  *    as the PQ codebook load (Pq.scala) — NOT a data-sized collect.
  *
  * Determinism (what makes this oracle-able cross-engine): floating
  * sums are order-dependent, and a distributed Gram cannot pin its
  * addition order. So the kernel never sums floats at all:
  *
  *  1. each coordinate is quantized once: q = round(x * 1e4) as long
  *     (float->double is exact; both engines round half-away-from-
  *     zero on the identical double, so q is identical);
  *  2. covariance numerators are EXACT integers via the algebraic
  *     identity  cn_ij = n * sum(q_i q_j) - sum(q_i) * sum(q_j)
  *     — integer sums are order-independent, so any partitioning
  *     yields bit-identical cn;
  *  3. power iteration runs on cn directly (eigenvectors are
  *     invariant under the positive scale n^2 * 1e8), with the
  *     iterate renormalized to integers each step:
  *     v' = round(w / max|w| * 1e6). The only non-integer ops are
  *     one IEEE division and one half-up round per entry per step —
  *     identical on both engines given identical integer inputs.
  *
  * The result is a pinned 8-step trajectory the DuckDB oracle replays
  * as an unrolled CTE chain (the kmeans/ann_ivf oracle idiom), with
  * zero float-order sensitivity anywhere.
  */
object Pca {

  /** Quantize an array<float> column to exact integer coordinates:
    * round(x * 1e4) as long. 1e-4 resolution is below float32 noise
    * for unit-scale embeddings; the covariance spec is DEFINED on the
    * quantized grid so both engines compute on identical integers.
    */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 10000).cast("long"))

  /** Exact-integer Gram partials: one pass, `dim*dim` longs per
    * partition. Per-partition products fit a long comfortably
    * (|q| <= ~1e4-ish for unit-scale embeddings => q_i*q_j <= ~1e8,
    * times <= ~1e6 rows/partition = ~1e14 << 2^63); the cross-
    * partition reduce runs in decimal(38,0) so a 100 TB total cannot
    * overflow either.
    */
  def gramPartials(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(quantize(col(vecCol)).as("q")).as[Array[Long]]
      .mapPartitions { it =>
        val acc = new Array[Long](dim * dim)
        var any = false
        while (it.hasNext) {
          val a = it.next()
          require(a.length == dim, s"expected dim=$dim, got ${a.length}")
          any = true
          var i = 0
          while (i < dim) {
            val ai = a(i)
            var j = 0
            while (j < dim) { acc(i * dim + j) += ai * a(j); j += 1 }
            i += 1
          }
        }
        if (!any) Iterator.empty
        else Iterator.tabulate(dim * dim)(k => (k / dim, k % dim, acc(k)))
      }
      .toDF("i", "j", "s")
      .groupBy(col("i"), col("j"))
      .agg(sum(col("s").cast("decimal(38,0)")).as("sqq"))
  }

  private def round0(x: Double): Long =
    new JBigDecimal(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def round4(x: Double): Double =
    new JBigDecimal(x).setScale(4, RoundingMode.HALF_UP).doubleValue()

  /** Shared trainer core: exact-integer covariance numerators +
    * pinned power iteration. Returns (v, cn, n) — the final integer
    * iterate, the covariance numerator matrix and the row count.
    */
  private def powerIterate(df: DataFrame, vecCol: String, dim: Int,
      iters: Int): (Array[BigInt], Array[Array[BigInt]], Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = df.select(quantize(col(vecCol)).as("q"))

    val n = q.count()
    require(n > 0, "powerIterate on an empty frame")

    // per-dim exact sums: `dim` rows to the driver (model-sized)
    val sqRows = q.select(posexplode(col("q")).as(Seq("i", "qi")))
      .groupBy(col("i"))
      .agg(sum(col("qi").cast("decimal(38,0)")).as("s"))
      .collect()
    val sq = new Array[BigInt](dim)
    sqRows.foreach(r => sq(r.getInt(0)) = BigInt(r.getDecimal(1).toBigInteger))

    // dim^2 exact Gram rows to the driver (model-sized, like the PQ
    // codebook collect) — the n-scaling accumulation already happened
    // distributed inside gramPartials
    val cn = Array.ofDim[BigInt](dim, dim)
    gramPartials(df, vecCol, dim).collect().foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      cn(i)(j) = BigInt(n) * BigInt(r.getDecimal(2).toBigInteger) - sq(i) * sq(j)
    }

    // pinned power iteration on exact integers; per step the only
    // float ops are one division + one half-up round per entry
    var v = Array.fill(dim)(BigInt(1000000))
    var step = 0
    while (step < iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = BigInt(0)
        var j = 0
        while (j < dim) { acc += cn(i)(j) * v(j); j += 1 }
        acc
      }
      val mx = w.map(_.abs).max
      v =
        if (mx == 0) v // degenerate (zero matrix): keep the iterate
        else w.map(wi => BigInt(round0(wi.toDouble / mx.toDouble * 1e6)))
      step += 1
    }
    (v, cn, n)
  }

  /** Top principal component by `iters` pinned power-iteration steps.
    * Returns one row per dimension: (dim, loading, eigval) where
    * loading = v_dim / 1e6 for the final integer iterate v (so
    * max|loading| == 1.0 by construction) and eigval is the Rayleigh
    * quotient mapped back to covariance units, rounded to 4 dp.
    */
  def topComponent(df: DataFrame, vecCol: String, dim: Int,
      iters: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val (v, cn, n) = powerIterate(df, vecCol, dim, iters)

    var num = BigInt(0); var den = BigInt(0)
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) { num += v(i) * cn(i)(j) * v(j); j += 1 }
      den += v(i) * v(i)
      i += 1
    }
    val scale = n.toDouble * n.toDouble * 1e8
    val eig = round4(num.toDouble / den.toDouble / scale)

    spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until dim).map(d => org.apache.spark.sql.Row(d, v(d).toDouble / 1e6, eig)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("dim", org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("loading", org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("eigval", org.apache.spark.sql.types.DoubleType, nullable = false))))
      .orderBy(col("dim"))
  }

  /** The APPLY side of the trainer: project every vector onto the
    * learned component and histogram the projections — the
    * anisotropy-shape readout (a bimodal or heavy-tailed projection
    * histogram is the "two corpora glued together" signature). The
    * projection is an exact integer dot product (quantized coords ×
    * the integer iterate, broadcast as a literal), map-only at any
    * corpus size; buckets are floor(proj / width) with the division
    * done in doubles (projections < 2^53, so exact) to get identical
    * floor semantics on both engines.
    */
  def projectHistogram(df: DataFrame, vecCol: String, dim: Int,
      iters: Int = 8, bucketWidth: Long = 500000000L): DataFrame = {
    val (v, _, _) = powerIterate(df, vecCol, dim, iters)
    val vLong = v.map(_.bigInteger.longValueExact)
    val proj = aggregate(
      zip_with(quantize(col(vecCol)), typedLit(vLong.toSeq), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    df.select(proj.as("proj"))
      .select(floor(col("proj").cast("double") / lit(bucketWidth.toDouble))
        .cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  /** Shared WITH-body prefix replaying [[powerIterate]] through the
    * final iterate CTE `v{iters}`. Every CTE is MATERIALIZED:
    * DuckDB's default CTE inlining re-expands the upstream chain at
    * every reference, which is exponential in the iteration count
    * (measured ~5x per step — 54 s for 8 steps vs 0.4 s
    * materialized).
    */
  private def chainSql(tbl: String, vecCol: String, idCol: String,
      dim: Int, iters: Int): String = {
    val d1 = dim + 1
    val its = (1 to iters).map { k =>
      val pv = if (k == 1) "v0" else s"v${k - 1}"
      s"""w$k AS MATERIALIZED (SELECT c.i AS i, sum(c.cn * $pv.v) AS w FROM c JOIN $pv ON c.j = $pv.i GROUP BY c.i),
         |m$k AS MATERIALIZED (SELECT max(abs(w)) AS mx FROM w$k),
         |v$k AS MATERIALIZED (SELECT i, CAST(round(CAST(w AS DOUBLE) / CAST(mx AS DOUBLE) * 1000000) AS HUGEINT) AS v FROM w$k, m$k)"""
        .stripMargin
    }.mkString(",\n")
    s"""q AS MATERIALIZED (SELECT $idCol AS rid, list_transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q FROM $tbl),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM q),
       |s1 AS MATERIALIZED (SELECT i, sum(q[i]) AS s FROM q, range(1, $d1) _(i) GROUP BY i),
       |s2 AS MATERIALIZED (SELECT i, j, sum(q[i] * q[j]) AS sqq FROM q, range(1, $d1) a(i), range(1, $d1) b(j) GROUP BY i, j),
       |c AS MATERIALIZED (SELECT s2.i AS i, s2.j AS j, nn.n * s2.sqq - sa.s * sb.s AS cn
       |  FROM s2 CROSS JOIN nn JOIN s1 sa ON s2.i = sa.i JOIN s1 sb ON s2.j = sb.i),
       |v0 AS MATERIALIZED (SELECT i, CAST(1000000 AS HUGEINT) AS v FROM range(1, $d1) _(i)),
       |$its""".stripMargin
  }

  /** DuckDB replay of [[topComponent]] as an unrolled CTE chain —
    * assembled here (next to the Scala it mirrors) so the two sides
    * cannot drift. `tbl` must expose `vecCol` as a float list.
    */
  def oracleSql(tbl: String, vecCol: String, idCol: String, dim: Int,
      iters: Int = 8): String =
    s"""WITH ${chainSql(tbl, vecCol, idCol, dim, iters)},
       |num AS (SELECT sum(c.cn * va.v * vb.v) AS t FROM c JOIN v$iters va ON c.i = va.i JOIN v$iters vb ON c.j = vb.i),
       |den AS (SELECT sum(v * v) AS d FROM v$iters)
       |SELECT CAST(i - 1 AS INTEGER) AS dim, CAST(v AS DOUBLE) / 1000000 AS loading,
       | round(CAST(num.t AS DOUBLE) / CAST(den.d AS DOUBLE)
       |   / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE) * 100000000.0), 4) AS eigval
       |FROM v$iters, num, den, nn ORDER BY dim""".stripMargin.replaceAll("\n", " ")

  /** DuckDB replay of [[projectHistogram]]: same chain, then the
    * exact-integer projection per row and the double-floor bucket.
    */
  def histOracleSql(tbl: String, vecCol: String, idCol: String, dim: Int,
      iters: Int = 8, bucketWidth: Long = 500000000L): String = {
    val d1 = dim + 1
    s"""WITH ${chainSql(tbl, vecCol, idCol, dim, iters)},
       |pr AS (SELECT rid, sum(q.q[_.i] * v.v) AS proj
       |  FROM q, range(1, $d1) _(i) JOIN v$iters v ON v.i = _.i
       |  GROUP BY rid)
       |SELECT CAST(floor(CAST(proj AS DOUBLE) / $bucketWidth.0) AS BIGINT) AS bucket,
       | CAST(count(*) AS BIGINT) AS n
       |FROM pr GROUP BY bucket ORDER BY bucket""".stripMargin.replaceAll("\n", " ")
  }
}
