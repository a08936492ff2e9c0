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
      .localCheckpoint(eager = true)
    val deg = edges.groupBy(col("src").as("doc")).agg(count(lit(1)).as("deg"))
    val n = deg.agg(count(lit(1)).as("n"))
    var ranks = deg.crossJoin(broadcast(n))
      .withColumn("r", expr(s"$Scale div n"))
      .localCheckpoint(eager = true)
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
        .localCheckpoint(eager = true)
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
      .localCheckpoint(eager = true)
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
        .localCheckpoint(eager = true)
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
