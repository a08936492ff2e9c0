package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Knn

/** Driver contract — see SURVEY.md §2 (inventory) and §7 (plan).
  *
  * Conventions shared by every query and its DuckDB oracle:
  *  - deterministic ORDER BY (ties broken by an id column) so row
  *    order matches across engines;
  *  - floating-point outputs rounded (4 decimals for per-row math,
  *    2 for large-sum aggregates) in BOTH engines;
  *  - integer aggregates cast so Spark/DuckDB types line up
  *    (count -> BIGINT, row_number -> INT, length -> INT).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_cosine")(spark, "/root/testdata/sf0.001")

  // ---- shared fragments -------------------------------------------------

  /** Single-row DataFrame holding the corpus vector with the given id. */
  private def queryVec(s: SparkSession, dir: String, id: Long): DataFrame =
    t(s, dir, "embeddings").where(col("vec_id") === id)
      .select(col("embedding").as("qvec"))

  private def knnQuery(metric: String, qid: Long = 0L, k: Int = 10)(
      s: SparkSession, dir: String): DataFrame =
    Knn.topK(t(s, dir, "embeddings"), queryVec(s, dir, qid),
      "vec_id", "embedding", metric, k)

  /** DuckDB-side distance expression over e.embedding vs q.qvec. */
  private def sqlDist(metric: String): String = metric match {
    case "euclidean" =>
      "round(sqrt(list_sum(list_transform(e.embedding, (x, i) -> " +
        "(CAST(x AS DOUBLE) - CAST(q.qvec[i] AS DOUBLE)) * " +
        "(CAST(x AS DOUBLE) - CAST(q.qvec[i] AS DOUBLE))))), 4)"
    case "manhattan" =>
      "round(list_sum(list_transform(e.embedding, (x, i) -> " +
        "abs(CAST(x AS DOUBLE) - CAST(q.qvec[i] AS DOUBLE)))), 4)"
    case "dotproduct" =>
      "round(-list_sum(list_transform(e.embedding, (x, i) -> " +
        "CAST(x AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE))), 4)"
    case "cosine" =>
      """round(CASE WHEN
        | list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) = 0 OR
        | list_sum(list_transform(q.qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) = 0
        |THEN 1.0 ELSE 1.0 - greatest(-1.0, least(1.0,
        | list_sum(list_transform(e.embedding, (x, i) -> CAST(x AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE))) /
        | (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
        |  sqrt(list_sum(list_transform(q.qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))) END, 4)"""
        .stripMargin.replaceAll("\n", " ")
  }

  private def knnOracle(metric: String, qid: Long = 0L, k: Int = 10,
      where: String = "TRUE"): String =
    s"""SELECT e.vec_id AS vec_id, ${sqlDist(metric)} AS dist
       |FROM embeddings e,
       |  (SELECT embedding AS qvec FROM embeddings WHERE vec_id = $qid) q
       |WHERE $where
       |ORDER BY dist, vec_id LIMIT $k""".stripMargin.replaceAll("\n", " ")

  // ---- query registry ---------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- flat kNN, one per reference metric (distance.go:55-150) --
    "knn_euclidean" -> ((s, dir) => knnQuery("euclidean")(s, dir)),
    "knn_cosine"    -> ((s, dir) => knnQuery("cosine")(s, dir)),
    "knn_dot"       -> ((s, dir) => knnQuery("dotproduct")(s, dir)),
    "knn_manhattan" -> ((s, dir) => knnQuery("manhattan")(s, dir)),

    // -- WHERE + NEAREST TO (filtered search, planner.go VECTOR_SEARCH) --
    "knn_filtered" -> ((s, dir) =>
      Knn.topK(
        t(s, dir, "embeddings").where(col("label") === 3),
        queryVec(s, dir, 0), "vec_id", "embedding", "cosine", 10)),

    // -- NEAREST TO (subquery) (parser.go:228-240) --
    "knn_subquery" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val maxId = e.select(max(col("vec_id")).as("m"))
      val q = e.join(maxId, col("vec_id") === col("m"))
        .select(col("embedding").as("qvec"))
      Knn.topK(e, q, "vec_id", "embedding", "euclidean", 10)
    }),

    // -- batch kNN join: 5 query vectors, top-5 each, self excluded --
    "knn_join" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Knn.knnJoin(e, q, "vec_id", "embedding", "qid", "qvec",
        "euclidean", 5)
    }),

    // -- scan / lookup / count (storage.go, executor.go:371-377) --
    "vector_scan" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).as("dimension"), col("label"))
        .orderBy(col("vec_id"))),

    "vector_get" -> ((s, dir) =>
      t(s, dir, "embeddings").where(col("vec_id") === 42)
        .select(col("vec_id"), col("label"),
          size(col("embedding")).as("dimension"))),

    "vector_count" -> ((s, dir) =>
      t(s, dir, "embeddings").agg(count(lit(1)).as("n"))),

    // -- L2 normalize (vector.go Normalize): first component scaled --
    "vector_normalize" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val norm = sqrt(-VectorFunctions.vec_dot(col("embedding"), col("embedding")))
      e.select(col("vec_id"),
          round(element_at(col("embedding"), 1).cast("double") / norm, 4).as("x0"))
        .orderBy(col("vec_id")).limit(100)
    }),

    // -- LIKE + != filters (executor.go:685-760) --
    "filter_like" -> ((s, dir) =>
      t(s, dir, "documents")
        .where(col("source").like("src1%") && col("lang") =!= "en")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))),

    // -- metadata =/OR/AND filters (executor.go:659-720) --
    "meta_filter" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .where((col("label") === 2 || col("label") === 7) &&
          col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))),

    // -- relational analytics core --
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    "q3_join" -> ((s, dir) => {
      val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(20)
    }),

    "q5_join" -> ((s, dir) => {
      val r = t(s, dir, "region").where(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "top_users" -> ((s, dir) =>
      t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("total_value").desc, col("user_id"))
        .limit(20)),

    // -- tumbling 1h window over the event stream (batch form);
    //    ts is long nanos (see Tables.load) -> exact integer bucketing --
    "events_window" -> ((s, dir) =>
      t(s, dir, "events")
        .select(
          expr("ts div 1000000000 div 3600").as("hour_bucket"),
          col("event_type"), col("value"))
        .groupBy(col("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy(col("hour_bucket"), col("event_type")))
  )

  // ---- oracle SQL (DuckDB 1.0, bare table names per driver) ------------

  def oracleSql: Map[String, String] = Map(
    "knn_euclidean" -> knnOracle("euclidean"),
    "knn_cosine"    -> knnOracle("cosine"),
    "knn_dot"       -> knnOracle("dotproduct"),
    "knn_manhattan" -> knnOracle("manhattan"),
    "knn_filtered"  -> knnOracle("cosine", where = "e.label = 3"),
    "knn_subquery"  ->
      ("SELECT e.vec_id AS vec_id, " + sqlDist("euclidean") + " AS dist " +
        "FROM embeddings e, (SELECT embedding AS qvec FROM embeddings " +
        "WHERE vec_id = (SELECT max(vec_id) FROM embeddings)) q " +
        "ORDER BY dist, vec_id LIMIT 10"),
    "knn_join" ->
      """WITH pairs AS (
        |  SELECT q.vec_id AS qid, e.vec_id AS vec_id,
        |    round(sqrt(list_sum(list_transform(e.embedding, (x, i) ->
        |      (CAST(x AS DOUBLE) - CAST(q.embedding[i] AS DOUBLE)) *
        |      (CAST(x AS DOUBLE) - CAST(q.embedding[i] AS DOUBLE))))), 4) AS dist
        |  FROM embeddings e, embeddings q
        |  WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id),
        |ranked AS (
        |  SELECT qid, vec_id, dist,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS INTEGER) AS rank
        |  FROM pairs)
        |SELECT qid, vec_id, dist, rank FROM ranked WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin.replaceAll("\n", " "),
    "vector_scan" ->
      ("SELECT vec_id, CAST(length(embedding) AS INTEGER) AS dimension, label " +
        "FROM embeddings ORDER BY vec_id"),
    "vector_get" ->
      ("SELECT vec_id, label, CAST(length(embedding) AS INTEGER) AS dimension " +
        "FROM embeddings WHERE vec_id = 42"),
    "vector_count" -> "SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings",
    "vector_normalize" ->
      ("SELECT vec_id, round(CAST(embedding[1] AS DOUBLE) / " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS x0 " +
        "FROM embeddings ORDER BY vec_id LIMIT 100"),
    "filter_like" ->
      ("SELECT doc_id, lang, source FROM documents " +
        "WHERE source LIKE 'src1%' AND lang <> 'en' ORDER BY doc_id"),
    "meta_filter" ->
      ("SELECT vec_id, label FROM embeddings " +
        "WHERE (label = 2 OR label = 7) AND vec_id % 2 = 0 ORDER BY vec_id"),
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin.replaceAll("\n", " "),
    "q3_join" ->
      """SELECT o_orderkey,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey
        |LIMIT 20""".stripMargin.replaceAll("\n", " "),
    "q5_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin.replaceAll("\n", " "),
    "top_users" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        | round(sum(value), 2) AS total_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY total_value DESC, user_id
        |LIMIT 20""".stripMargin.replaceAll("\n", " "),
    "events_window" ->
      """SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
        | event_type, CAST(count(*) AS BIGINT) AS n,
        | round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replaceAll("\n", " ")
  )
}
