package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over candidate-pair edge lists (the dup graph the
  * near-dup pipeline already produces — see [[Dedup.minhashPairs]]).
  *
  * PageRank here is *exact-integer* fixed-point: ranks live in 1e-12
  * units (SCALE), every step is integer div/sum, so the trajectory is
  * bit-portable across engines — the DuckDB oracle replays the same
  * iterations as an unrolled MATERIALIZED CTE chain and matches
  * hash-exact. (Float PageRank sums neighbor contributions in
  * engine-dependent order; the integer form removes that exposure the
  * same way embed_pca's integer power iteration does.)
  *
  * Scale shape: each iteration is ONE equi-join shuffle of the rank
  * frame (|nodes| rows) against the edge list plus a map-side-combined
  * sum — the standard distributed PageRank layout. The graph is the
  * candidate-pair SUBGRAPH (same contract as Dedup.connectedComponents),
  * never the corpus; localCheckpoint per iteration keeps the plan
  * bounded, exactly like Ann.kmeans' Lloyd loop.
  */
object Graph {

  val Scale = 1000000000000L

  /** Integer PageRank with damping 85/100 over an undirected pair
    * list (columns doc_a, doc_b). Returns (doc, deg, rank_e12).
    * Nodes are pair members, so deg >= 1 and there are no dangling
    * nodes; all quantities are non-negative, so Spark's `div`
    * (truncation) and DuckDB's `//` (floor) agree.
    */
  def pagerank(pairs: DataFrame, iters: Int = 5): DataFrame = {
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(eager = false)
    val deg = edges.groupBy(col("src").as("doc")).agg(count(lit(1)).as("deg"))
    val n = deg.agg(count(lit(1)).as("n"))
    var ranks = deg.crossJoin(broadcast(n))
      .withColumn("r", expr(s"$Scale div n"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      val contrib = ranks
        .select(col("doc"), expr("r div deg").as("c"))
        .join(edges, col("doc") === col("src"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      ranks = ranks.drop("r")
        .join(contrib.withColumnRenamed("dst", "doc"), Seq("doc"), "left")
        .withColumn("r", expr(
          s"(15 * ($Scale div n)) div 100 + (85 * coalesce(in_sum, 0)) div 100"))
        .drop("in_sum")
        .localCheckpoint(eager = false)
    }
    ranks.select(col("doc"), col("deg"), col("r").as("rank_e12"))
  }

  /** Synchronous label propagation over an undirected pair list
    * (columns doc_a, doc_b): every node starts labeled with its own
    * id; each round a node adopts the label that is most frequent
    * among its neighbors, ties broken (count DESC, label ASC) — so
    * with a FIXED round count the trajectory is fully deterministic
    * and integer-only (labels are node ids), replayable in DuckDB as
    * an unrolled CTE chain like [[pagerank]]. Near-dup communities
    * come out finer than connected components: a chain A~B~C where
    * A!~C splits once propagation pressure from each end meets,
    * which is exactly the mirror-cluster boundary CC smears over.
    *
    * Scale shape: per round ONE equi-join shuffle of the label frame
    * (|nodes| rows) against the edge list keyed by dst, then a
    * map-side-combined (node, label) count and a max_by fold — O(E)
    * work per round, edge SUBGRAPH only, localCheckpoint per round.
    * Returns (node, lbl) after `iters` rounds.
    */
  def labelProp(pairs: DataFrame, iters: Int): DataFrame = {
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(eager = false)
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to iters) {
      labels = edges
        .join(labels.select(col("node").as("dst"), col("lbl")), Seq("dst"))
        .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("src"))
        .agg(max_by(col("lbl"), struct(col("c"), (-col("lbl")).as("nl")))
          .as("lbl"))
        .withColumnRenamed("src", "node")
        .localCheckpoint(eager = false)
    }
    labels
  }

  /** DuckDB oracle for [[labelProp]] + the top-communities cut the
    * `graph_label_prop` query ships: unrolled rounds, argmax via
    * row_number (count DESC, label ASC) — the same tie order max_by's
    * (c, -lbl) struct encodes.
    */
  def labelPropOracleSql(pairsCtes: String, iters: Int, limit: Int): String =
    s"""${labelPropCtes(pairsCtes, iters)}
       |SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members
       |FROM l$iters GROUP BY lbl
       |ORDER BY n_members DESC, community LIMIT $limit"""
      .stripMargin.replaceAll("\n", " ")

  /** Just the WITH chain (pairs → e → l0..l{iters}) — for oracles
    * that consume the final labels (e.g. LP-community modularity).
    */
  def labelPropCtes(pairsCtes: String, iters: Int): String = {
    val chain = (1 to iters).map { i =>
      s"""l$i AS MATERIALIZED (SELECT node, lbl FROM (
         |  SELECT e.src AS node, p.lbl,
         |    row_number() OVER (PARTITION BY e.src
         |      ORDER BY count(*) DESC, p.lbl) AS rn
         |  FROM e JOIN l${i - 1} p ON e.dst = p.node
         |  GROUP BY e.src, p.lbl) _l$i WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""$pairsCtes,
       |e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM e),
       |$chain""".stripMargin
  }

  /** Sentinel: derive the round count from the node count. */
  val Adaptive: Int = -1

  /** Count-derived h-index round budget: clamp(⌈log₂ n⌉, 2, `cap`) —
    * one extra round per graph doubling (the KnnGraph.adaptiveIters
    * discipline), capped because the oracle unrolls to `cap` gated
    * CTE rounds. The per-round sum(c) checksums the graph_coreness
    * query ships make the plateau (true fixpoint) visible in the
    * gated output itself.
    */
  def corenessIters(n: Long, cap: Int = 8): Int =
    math.min(cap, math.max(2, KnnGraph.ceilLog2(n)))

  /** A coreness computation: the value frame (node, c) after every
    * round (element 0 = the degree init), the node count and the
    * symmetrized checkpointed edge frame — exposed so the consuming
    * query audits without re-scanning (the build.n discipline).
    */
  final case class Coreness(rounds: Seq[DataFrame], nNodes: Long,
      edges: DataFrame)

  /** Coreness (k-core number) of every node of an undirected pair
    * list via the h-index iteration (Lü et al., "The H-index of a
    * network node and its relation to degree and coreness", Nature
    * Communications 7:10168, 2016): c₀ = degree; each round
    * c_{r+1}(v) = H{c_r(u) : u ~ v} — the largest h such that at
    * least h neighbors currently hold value ≥ h. The sequence is
    * monotone non-increasing and converges to exact coreness; every
    * value is an integer RANK statistic of a multiset (independent
    * of neighbor enumeration order), so with the count-derived round
    * budget ([[corenessIters]]) the whole trajectory is
    * deterministic and unrolled-CTE-replayable like
    * [[pagerank]]/[[labelProp]] ([[corenessCtes]] is the replay).
    *
    * Scale shape: per round ONE equi-join shuffle of the value frame
    * (|nodes| rows) against the edge list keyed by dst, then a
    * per-src sorted-rank fold (window partitioned by src — O(E·log
    * deg) local work on the edge SUBGRAPH, the labelProp frame
    * bound) and a map-side-combinable max; localCheckpoint per
    * round. The k-core of the dup graph (nodes with coreness ≥ k)
    * is the "deeply mirrored" set a dedup triage treats differently
    * from pendant near-dups.
    */
  def corenessRounds(pairs: DataFrame, iters: Int = Adaptive): Coreness = {
    require(iters >= 0 || iters == Adaptive,
      s"iters must be >= 0 or Graph.Adaptive, got $iters")
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(eager = false)
    var c = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val n = c.count()
    val nRounds = if (iters == Adaptive) corenessIters(n) else iters
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("c").desc, col("dst"))
    val out = Seq.newBuilder[DataFrame]
    out += c
    for (_ <- 1 to nRounds) {
      c = edges
        .join(c.select(col("node").as("dst"), col("c")), Seq("dst"))
        .withColumn("rn", row_number().over(w))
        .select(col("src"), least(col("rn").cast("long"), col("c")).as("m"))
        .groupBy(col("src")).agg(max(col("m")).as("c"))
        .withColumnRenamed("src", "node")
        .localCheckpoint(eager = false)
      out += c
    }
    Coreness(out.result(), n, edges)
  }

  /** DuckDB replay of [[corenessRounds]]: the WITH chain
    * pairs → e → nnod → rv (count-derived round budget) → c0..c`cap`
    * where every round past the derived count is a gated
    * passthrough (the knnGraphChainSql discipline — inactive rounds
    * never join or sort). H-index per round via the same
    * row_number-over-(c DESC, dst) rank fold.
    */
  def corenessCtes(pairsCtes: String, cap: Int = 8): String = {
    val chain = (1 to cap).map { i =>
      s"""c$i AS MATERIALIZED (
         |  SELECT node, c FROM c${i - 1} WHERE (SELECT r FROM rv) < $i
         |  UNION ALL
         |  SELECT src AS node, max(least(rn, c)) AS c FROM (
         |    SELECT e.src, p.c, row_number() OVER (PARTITION BY e.src
         |      ORDER BY p.c DESC, e.dst) AS rn
         |    FROM e JOIN c${i - 1} p ON e.dst = p.node
         |    WHERE (SELECT r FROM rv) >= $i) _h$i
         |  GROUP BY src)""".stripMargin
    }.mkString(",\n")
    s"""$pairsCtes,
       |e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nnod AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS n FROM e),
       |rv AS (SELECT least($cap, greatest(2,
       |  CAST(ceil(log2(CAST(n AS DOUBLE))) AS BIGINT))) AS r FROM nnod),
       |c0 AS MATERIALIZED (SELECT src AS node, CAST(count(*) AS BIGINT) AS c
       |  FROM e GROUP BY src),
       |$chain""".stripMargin
  }

  /** DuckDB oracle: the same integer iterations as an unrolled CTE
    * chain over a caller-supplied edge CTE (must expose `pairs` with
    * doc_a/doc_b). MATERIALIZED on every stage — default inlining
    * grows ~5x per iteration (the Bpe/Pca finding, docs/PERF.md).
    */
  def oracleSql(pairsCtes: String, iters: Int, limit: Int): String = {
    val chain = (1 to iters).map { i =>
      s"""r$i AS MATERIALIZED (SELECT d.doc, d.deg,
         |  CAST((15 * ($Scale // n.n)) // 100
         |   + (85 * coalesce(s.in_sum, 0)) // 100 AS BIGINT) AS r
         |  FROM deg d CROSS JOIN n
         |  LEFT JOIN (SELECT e.dst AS doc, sum(p.r // p.deg) AS in_sum
         |    FROM r${i - 1} p JOIN e ON p.doc = e.src GROUP BY e.dst) s
         |  USING (doc))""".stripMargin
    }.mkString(",\n")
    s"""$pairsCtes,
       |e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |deg AS MATERIALIZED (SELECT src AS doc, CAST(count(*) AS BIGINT) AS deg
       |  FROM e GROUP BY src),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
       |r0 AS MATERIALIZED (SELECT doc, deg,
       |  CAST($Scale // n.n AS BIGINT) AS r FROM deg CROSS JOIN n),
       |$chain
       |SELECT doc, deg, r AS rank_e12 FROM r$iters
       |ORDER BY rank_e12 DESC, doc LIMIT $limit""".stripMargin.replaceAll("\n", " ")
  }
}
