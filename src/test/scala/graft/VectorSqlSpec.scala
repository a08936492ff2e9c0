package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sql.VectorSql

/** Drives the reference dialect end-to-end: every statement form the
  * reference README documents, against a live catalog.
  */
class VectorSqlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshCat(): VectorSql.Catalog = {
    val cat = new VectorSql.Catalog(spark)
    VectorSql.execute(cat, "CREATE COLLECTION vectors")
    VectorSql.execute(cat,
      "INSERT INTO vectors (id, vector, metadata.category) VALUES ('v1', [1.0, 0.0, 0.0], 'image')")
    VectorSql.execute(cat,
      "INSERT INTO vectors (id, vector, metadata.category) VALUES ('v2', [0.0, 1.0, 0.0], 'text')")
    VectorSql.execute(cat,
      "INSERT INTO vectors (id, vector, metadata.category) VALUES ('v3', [0.9, 0.1, 0.0], 'image')")
    VectorSql.execute(cat,
      "INSERT INTO vectors (id, vector) VALUES ('test1', [0.0, 0.0, 1.0])")
    cat
  }

  test("SELECT id, dimension FROM vectors") {
    val r = VectorSql.execute(freshCat(),
      "SELECT id, dimension FROM vectors").collect()
    assert(r.length == 4)
    assert(r.forall(_.getInt(1) == 3))
  }

  test("COUNT(*)") {
    val r = VectorSql.execute(freshCat(),
      "SELECT COUNT(*) FROM vectors").head()
    assert(r.getLong(0) == 4L)
  }

  test("NEAREST TO with LIMIT and metrics") {
    val cat = freshCat()
    val near = VectorSql.execute(cat,
      "SELECT id, distance FROM vectors NEAREST TO [1.0, 0.0, 0.0] LIMIT 2").collect()
    assert(near.map(_.getString(0)).toSeq == Seq("v1", "v3"))
    assert(near.head.getDouble(1) == 0.0)
    val cos = VectorSql.execute(cat,
      "SELECT id, distance FROM vectors NEAREST TO [0.9, 0.1, 0.0] USING cosine LIMIT 1").head()
    assert(cos.getString(0) == "v3")
    // parser.go:254-262 also accepts the metric as a string literal
    val quoted = VectorSql.execute(cat,
      "SELECT id FROM vectors NEAREST TO [0.9, 0.1, 0.0] USING 'cosine' LIMIT 1").head()
    assert(quoted.getString(0) == "v3")
  }

  test("WHERE id LIKE and metadata filters, AND/OR") {
    val cat = freshCat()
    val like = VectorSql.execute(cat,
      "SELECT id FROM vectors WHERE id LIKE 'test%'").collect()
    assert(like.map(_.getString(0)).toSeq == Seq("test1"))
    val meta = VectorSql.execute(cat,
      "SELECT id FROM vectors WHERE metadata.category = 'image'").collect()
    assert(meta.map(_.getString(0)).sorted.toSeq == Seq("v1", "v3"))
    val or = VectorSql.execute(cat,
      "SELECT id FROM vectors WHERE metadata.category = 'text' OR id = 'v1'").collect()
    assert(or.map(_.getString(0)).sorted.toSeq == Seq("v1", "v2"))
    val neq = VectorSql.execute(cat,
      "SELECT id FROM vectors WHERE metadata.category != 'image' AND id LIKE 'v%'").collect()
    assert(neq.map(_.getString(0)).toSeq == Seq("v2"))
  }

  test("WHERE + NEAREST TO combined (filtered vector search)") {
    val r = VectorSql.execute(freshCat(),
      "SELECT id, distance FROM vectors NEAREST TO [1.0, 0.0, 0.0] " +
        "WHERE metadata.category = 'image' LIMIT 5").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("v1", "v3"))
  }

  test("WHERE distance < r under NEAREST TO (radius-bounded top-k)") {
    // v1 at 0.0, v3 at ~0.1414, v2/test1 at ~1.414 from the query
    val r = VectorSql.execute(freshCat(),
      "SELECT id, distance FROM vectors NEAREST TO [1.0, 0.0, 0.0] " +
        "WHERE distance < 0.5 LIMIT 5").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("v1", "v3"))
    // threshold composes with metadata filters (AND of both)
    val both = VectorSql.execute(freshCat(),
      "SELECT id FROM vectors NEAREST TO [1.0, 0.0, 0.0] " +
        "WHERE distance < 0.5 AND metadata.category = 'image' LIMIT 5")
      .collect()
    assert(both.map(_.getString(0)).toSeq == Seq("v1", "v3"))
    // the threshold bounds BEFORE the limit: limit 1 keeps the nearest
    val one = VectorSql.execute(freshCat(),
      "SELECT id FROM vectors NEAREST TO [1.0, 0.0, 0.0] " +
        "WHERE distance > 0.1 LIMIT 1").collect()
    assert(one.map(_.getString(0)).toSeq == Seq("v3"))
    // COUNT(*) within a radius
    val n = VectorSql.execute(freshCat(),
      "SELECT COUNT(*) FROM vectors NEAREST TO [1.0, 0.0, 0.0] " +
        "WHERE distance < 0.5").head()
    assert(n.getLong(0) == 2L)
  }

  test("NEAREST TO (subquery)") {
    val r = VectorSql.execute(freshCat(),
      "SELECT id, distance FROM vectors NEAREST TO " +
        "(SELECT vector FROM vectors WHERE id = 'v2') LIMIT 1").head()
    assert(r.getString(0) == "v2" && r.getDouble(1) == 0.0)
  }

  test("DELETE / UPDATE / DROP mutate the catalog") {
    val cat = freshCat()
    VectorSql.execute(cat, "DELETE FROM vectors WHERE id = 'test1'")
    assert(VectorSql.execute(cat, "SELECT COUNT(*) FROM vectors").head().getLong(0) == 3L)
    VectorSql.execute(cat,
      "UPDATE vectors SET metadata.category = 'archived' WHERE id = 'v1'")
    val m = VectorSql.execute(cat,
      "SELECT metadata.category FROM vectors WHERE id = 'v1'").head()
    assert(m.getString(0) == "archived")
    // unmatched rows keep their metadata
    val m2 = VectorSql.execute(cat,
      "SELECT metadata.category FROM vectors WHERE id = 'v2'").head()
    assert(m2.getString(0) == "text")
    VectorSql.execute(cat, "DROP COLLECTION vectors")
    intercept[IllegalArgumentException] {
      VectorSql.execute(cat, "SELECT id FROM vectors")
    }
  }

  test("SELECT * includes distance under NEAREST TO") {
    val df = VectorSql.execute(freshCat(),
      "SELECT * FROM vectors NEAREST TO [0.0, 0.0, 1.0] LIMIT 1")
    assert(df.columns.contains("distance"))
    assert(df.head().getAs[String]("id") == "test1")
  }

  test("explain (reference -verbose) prints the physical plan") {
    val plan = VectorSql.explain(freshCat(),
      "SELECT id, distance FROM vectors NEAREST TO [1.0, 0.0, 0.0] LIMIT 2")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("range comparisons < > <= >= (reference parser.go:716-748 surface)") {
    val cat = freshCat()
    VectorSql.execute(cat,
      "INSERT INTO vectors (id, vector, metadata.score) VALUES ('s1', [0.0, 0.0, 0.0], '5')")
    VectorSql.execute(cat,
      "INSERT INTO vectors (id, vector, metadata.score) VALUES ('s2', [0.0, 0.0, 0.0], '7')")
    VectorSql.execute(cat,
      "INSERT INTO vectors (id, vector, metadata.score) VALUES ('s3', [0.0, 0.0, 0.0], '9')")
    def ids(sql: String): Seq[String] =
      VectorSql.execute(cat, sql).collect().map(_.getString(0)).sorted.toSeq
    assert(ids("SELECT id FROM vectors WHERE metadata.score > 5") == Seq("s2", "s3"))
    assert(ids("SELECT id FROM vectors WHERE metadata.score >= 7") == Seq("s2", "s3"))
    assert(ids("SELECT id FROM vectors WHERE metadata.score < 7") == Seq("s1"))
    assert(ids("SELECT id FROM vectors WHERE metadata.score <= 7") == Seq("s1", "s2"))
    assert(ids("SELECT id FROM vectors WHERE metadata.score >= 5 AND metadata.score < 9")
      == Seq("s1", "s2"))
    // id (string) range compare also parses + evaluates
    assert(ids("SELECT id FROM vectors WHERE id >= 's2' AND id <= 's3'") == Seq("s2", "s3"))
  }

  test("arithmetic in WHERE (reference parseTerm/parseFactor surface)") {
    val cat = freshCat()
    VectorSql.execute(cat,
      "INSERT INTO vectors (id, vector, metadata.score) VALUES ('s1', [0.0, 0.0, 0.0], '5')")
    VectorSql.execute(cat,
      "INSERT INTO vectors (id, vector, metadata.score) VALUES ('s2', [0.0, 0.0, 0.0], '7')")
    VectorSql.execute(cat,
      "INSERT INTO vectors (id, vector, metadata.score) VALUES ('s3', [0.0, 0.0, 0.0], '9')")
    def ids(sql: String): Seq[String] =
      VectorSql.execute(cat, sql).collect().map(_.getString(0)).sorted.toSeq
    // literal arithmetic on the comparison RHS
    assert(ids("SELECT id FROM vectors WHERE metadata.score > 3 + 2") == Seq("s2", "s3"))
    assert(ids("SELECT id FROM vectors WHERE metadata.score >= 2 * 3 + 1") == Seq("s2", "s3"))
    // field arithmetic on the LHS, precedence * over +
    assert(ids("SELECT id FROM vectors WHERE metadata.score * 2 > 15") == Seq("s3"))
    assert(ids("SELECT id FROM vectors WHERE metadata.score + 1 = 8") == Seq("s2"))
    assert(ids("SELECT id FROM vectors WHERE metadata.score % 2 = 1 AND metadata.score / 2 < 4")
      == Seq("s1", "s2"))
    // parenthesized arithmetic group where a condition group could start
    assert(ids("SELECT id FROM vectors WHERE (metadata.score + 1) * 2 = 16") == Seq("s2"))
    // unary minus
    assert(ids("SELECT id FROM vectors WHERE metadata.score > -1 * -7") == Seq("s3"))
  }

  test("NOT / ! negation (reference parseUnary surface)") {
    val cat = freshCat()
    def ids(sql: String): Seq[String] =
      VectorSql.execute(cat, sql).collect().map(_.getString(0)).sorted.toSeq
    assert(ids("SELECT id FROM vectors WHERE NOT metadata.category = 'image'")
      == Seq("v2")) // null metadata rows drop, like the != form
    assert(ids("SELECT id FROM vectors WHERE ! metadata.category = 'image'")
      == Seq("v2"))
    assert(ids("SELECT id FROM vectors WHERE NOT (id = 'v1' OR id = 'v2')")
      == Seq("test1", "v3"))
    // NOT binds tighter than AND: NOT a=1 AND b=2 == (NOT a=1) AND b=2
    assert(ids("SELECT id FROM vectors WHERE NOT id = 'v1' AND metadata.category = 'image'")
      == Seq("v3"))
    assert(ids("SELECT id FROM vectors WHERE NOT NOT id = 'v1'") == Seq("v1"))
  }

  test("arithmetic/NOT error paths are explicit") {
    intercept[IllegalArgumentException] {
      VectorSql.parse("SELECT id FROM vectors WHERE metadata.score + > 3")
    }
    intercept[IllegalArgumentException] {
      VectorSql.parse("SELECT id FROM vectors WHERE NOT")
    }
    intercept[IllegalArgumentException] {
      VectorSql.parse("SELECT id FROM vectors WHERE id LIKE 5")
    }
    intercept[IllegalArgumentException] {
      VectorSql.parse("SELECT id FROM vectors WHERE (id = 'v1'") // unclosed
    }
  }

  test("ORDER BY field ASC/DESC, multi-key, overrides implicit orders") {
    val cat = freshCat()
    def ids(sql: String): Seq[String] =
      VectorSql.execute(cat, sql).collect().map(_.getString(0)).toSeq
    // explicit DESC on id overrides the deterministic-LIMIT default
    assert(ids("SELECT id FROM vectors ORDER BY id DESC LIMIT 2")
      == Seq("v3", "v2"))
    // metadata key ordering, ties broken by trailing implicit id
    assert(ids("SELECT id FROM vectors ORDER BY metadata.category ASC, id ASC")
      == Seq("test1", "v1", "v3", "v2")) // Spark ASC: nulls first, then image x2 (id tie), text
    // ORDER BY distance under NEAREST TO == the implicit order
    val near = VectorSql.execute(cat,
      "SELECT id, distance FROM vectors NEAREST TO [1.0, 0.0, 0.0] LIMIT 2")
      .collect().map(_.getString(0)).toSeq
    val explicit = ids("SELECT id FROM vectors NEAREST TO [1.0, 0.0, 0.0] " +
      "ORDER BY distance ASC LIMIT 2")
    assert(explicit == near)
    // DESC distance = farthest-first: v2 and test1 tie at sqrt(2),
    // the trailing implicit id ASC breaks it deterministically
    val far = ids("SELECT id FROM vectors NEAREST TO [1.0, 0.0, 0.0] " +
      "ORDER BY distance DESC LIMIT 1")
    assert(far == Seq("test1"))
    // dimension is orderable like in projections
    assert(ids("SELECT id FROM vectors ORDER BY dimension, id LIMIT 1")
      == Seq("test1"))
  }

  test("IN / NOT IN lists, including expression elements") {
    val cat = freshCat()
    def ids(sql: String): Seq[String] =
      VectorSql.execute(cat, sql).collect().map(_.getString(0)).sorted.toSeq
    assert(ids("SELECT id FROM vectors WHERE id IN ('v1', 'v3')")
      == Seq("v1", "v3"))
    assert(ids("SELECT id FROM vectors WHERE metadata.category IN ('text')")
      == Seq("v2"))
    // NOT IN drops null-metadata rows too (SQL three-valued logic)
    assert(ids("SELECT id FROM vectors WHERE metadata.category NOT IN ('text')")
      == Seq("v1", "v3"))
    // arithmetic inside the list
    VectorSql.execute(cat,
      "INSERT INTO vectors (id, vector, metadata.score) VALUES ('s5', [0.0, 0.0, 0.0], '5')")
    assert(ids("SELECT id FROM vectors WHERE metadata.score IN (2 + 3, 9)")
      == Seq("s5"))
    intercept[IllegalArgumentException] {
      VectorSql.parse("SELECT id FROM vectors WHERE id IN ()")
    }
  }

  test("SELECT DISTINCT projects then dedupes, ORDER BY output column") {
    val cat = freshCat()
    val langs = VectorSql.execute(cat,
      "SELECT DISTINCT metadata.category AS cat FROM vectors " +
        "WHERE id LIKE 'v%' ORDER BY cat").collect().map(_.getString(0)).toSeq
    assert(langs == Seq("image", "text")) // v1/v3 collapse to one row
    // LIMIT without ORDER BY still deterministic (sorted by outputs)
    val runs = (1 to 3).map(_ => VectorSql.execute(cat,
      "SELECT DISTINCT metadata.category FROM vectors LIMIT 2")
      .collect().map(_.getString(0)).toSeq)
    assert(runs.distinct.length == 1)
  }

  test("binary minus works unspaced; negative literals still parse") {
    val cat = freshCat()
    VectorSql.execute(cat,
      "INSERT INTO vectors (id, vector, metadata.score) VALUES ('s7', [0.0, 0.0, 0.0], '7')")
    def ids(sql: String): Seq[String] =
      VectorSql.execute(cat, sql).collect().map(_.getString(0)).sorted.toSeq
    // `7-2` must lex as Num(7) Sym(-) Num(2), not Num("7-2")
    assert(ids("SELECT id FROM vectors WHERE metadata.score = 9-2") == Seq("s7"))
    assert(ids("SELECT id FROM vectors WHERE metadata.score = 10 -3") == Seq("s7"))
    // negative vector components and SET values keep their sign
    VectorSql.execute(cat,
      "INSERT INTO vectors (id, vector, metadata.neg) VALUES ('sn', [-1.0, 0.0, 0.0], -5)")
    assert(ids("SELECT id FROM vectors WHERE metadata.neg = -5") == Seq("sn"))
    val v = VectorSql.execute(cat,
      "SELECT id, distance FROM vectors NEAREST TO [-1.0, 0.0, 0.0] LIMIT 1").head()
    assert(v.getString(0) == "sn" && v.getDouble(1) == 0.0)
    // scientific notation survives the stricter number lexer
    assert(ids("SELECT id FROM vectors WHERE metadata.score > 6.9e0 AND id = 's7'")
      == Seq("s7"))
  }

  test("ORDER BY resolves select-list aliases (non-DISTINCT path)") {
    val cat = freshCat()
    val r = VectorSql.execute(cat,
      "SELECT id, metadata.category AS cat FROM vectors " +
        "WHERE id LIKE 'v%' ORDER BY cat DESC, id LIMIT 3")
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("v2", "v1", "v3")) // text, image (id ties asc)
  }

  test("non-NEAREST LIMIT is deterministic (ORDER BY id default)") {
    val cat = freshCat()
    val runs = (1 to 3).map(_ =>
      VectorSql.execute(cat, "SELECT id FROM vectors LIMIT 2")
        .collect().map(_.getString(0)).toSeq)
    assert(runs.distinct.length == 1)
    assert(runs.head == Seq("test1", "v1")) // string order, first 2 ids
  }

  test("parse errors are explicit") {
    intercept[IllegalArgumentException] {
      VectorSql.parse("SELECT id FROM")
    }
    intercept[IllegalArgumentException] {
      VectorSql.parse("NONSENSE QUERY")
    }
  }

  test("dimension-mismatched NEAREST TO literal fails with a clear error") {
    val e = intercept[Exception] {
      VectorSql.execute(freshCat(),
        "SELECT id, distance FROM vectors NEAREST TO [1.0, 0.0] LIMIT 1").collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("dimension") || e.getCause != null))
  }

  test("NEAREST TO plan is TakeOrderedAndProject (no global sort)") {
    val df = VectorSql.execute(freshCat(),
      "SELECT id, distance FROM vectors NEAREST TO [1.0, 0.0, 0.0] LIMIT 2")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("GROUP BY metadata key with COUNT/MIN/MAX") {
    val r = VectorSql.execute(freshCat(),
      "SELECT metadata.category AS cat, COUNT(*) AS n, MIN(id) AS lo, " +
        "MAX(id) AS hi FROM vectors GROUP BY metadata.category ORDER BY cat")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2), x.getString(3)))
    // null category groups last under ASC NULLS FIRST? Spark default asc = nulls first
    assert(r.contains(("image", 2L, "v1", "v3")))
    assert(r.contains(("text", 1L, "v2", "v2")))
    // the metadata-less row groups under null
    assert(r.exists(t => t._1 == null && t._2 == 1L && t._3 == "test1"))
  }

  test("GROUP BY WHERE + aggregate alias defaults + LIMIT determinism") {
    val r = VectorSql.execute(freshCat(),
      "SELECT metadata.category, COUNT(*), SUM(dimension) FROM vectors " +
        "WHERE metadata.category = 'image' OR metadata.category = 'text' " +
        "GROUP BY metadata.category LIMIT 1")
      .collect()
    assert(r.length == 1)
    // default order: grouping key asc -> 'image' first
    assert(r(0).getString(0) == "image")
    assert(r(0).getLong(1) == 2L && r(0).getDouble(2) == 6.0)
  }

  test("GROUP BY rejects non-grouped projections, NEAREST, zero aggregates") {
    intercept[Exception] {
      VectorSql.execute(freshCat(),
        "SELECT id, COUNT(*) FROM vectors GROUP BY metadata.category").collect()
    }
    intercept[Exception] {
      VectorSql.execute(freshCat(),
        "SELECT metadata.category, COUNT(*) FROM vectors " +
          "NEAREST TO [1.0, 0.0, 0.0] GROUP BY metadata.category").collect()
    }
    intercept[Exception] {
      VectorSql.execute(freshCat(),
        "SELECT metadata.category FROM vectors GROUP BY metadata.category").collect()
    }
  }

  test("COUNT(field) skips null metadata values") {
    // no plain projection -> grouping keys are still emitted (leading)
    val r = VectorSql.execute(freshCat(),
      "SELECT COUNT(metadata.category) AS with_cat, COUNT(*) AS all_rows " +
        "FROM vectors GROUP BY dimension").head()
    assert(r.getInt(0) == 3)                          // dimension key
    assert(r.getLong(1) == 3L && r.getLong(2) == 4L)  // with_cat, all_rows
  }

  test("deterministicLimit=false plans a bare LIMIT as early-exit CollectLimit") {
    val det = VectorSql.execute(freshCat(), "SELECT id FROM vectors LIMIT 2")
    assert(det.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val fast = VectorSql.execute(freshCat(), "SELECT id FROM vectors LIMIT 2",
      deterministicLimit = false)
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("CollectLimit"), plan.take(1500))
    assert(fast.collect().length == 2)
  }

  test("global aggregates without GROUP BY") {
    val df = VectorSql.execute(freshCat(),
      "SELECT COUNT(*) AS n, SUM(dimension) AS dims, MIN(id) AS lo, " +
        "AVG(dimension) AS avg_dim FROM vectors")
    assert(df.columns.toSeq == Seq("n", "dims", "lo", "avg_dim"))
    val r = df.head()
    assert(r.getLong(0) == 4L && r.getDouble(1) == 12.0)
    assert(r.getString(2) == "test1" && r.getDouble(3) == 3.0)
  }

  test("global aggregate respects WHERE") {
    val r = VectorSql.execute(freshCat(),
      "SELECT COUNT(*) AS n FROM vectors WHERE metadata.category = 'image'").head()
    assert(r.getLong(0) == 2L)
  }

  test("HAVING on aggregate alias and on aggregate-call syntax") {
    val byAlias = VectorSql.execute(freshCat(),
      "SELECT metadata.category AS cat, COUNT(*) AS n FROM vectors " +
        "GROUP BY metadata.category HAVING n > 1 ORDER BY cat").collect()
    assert(byAlias.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("image", 2L)))
    val byCall = VectorSql.execute(freshCat(),
      "SELECT metadata.category AS cat, COUNT(*) AS n FROM vectors " +
        "GROUP BY metadata.category HAVING COUNT(*) > 1 ORDER BY cat").collect()
    assert(byCall.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("image", 2L)))
  }

  test("HAVING-only aggregate stays hidden from the output") {
    val df = VectorSql.execute(freshCat(),
      "SELECT metadata.category AS cat FROM vectors " +
        "GROUP BY metadata.category HAVING COUNT(*) > 1 AND MIN(id) = 'v1'")
    assert(df.columns.toSeq == Seq("cat"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("image"))
  }

  test("HAVING with arithmetic over aggregates; aggregates rejected in WHERE") {
    val r = VectorSql.execute(freshCat(),
      "SELECT metadata.category AS cat, COUNT(*) AS n FROM vectors " +
        "GROUP BY metadata.category HAVING n * 2 >= 4").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("image"))
    intercept[Exception] {
      VectorSql.execute(freshCat(),
        "SELECT id FROM vectors WHERE COUNT(*) > 1").collect()
    }
  }

  test("BETWEEN / NOT BETWEEN desugar to the range conjunction") {
    val cat = freshCat()
    val r = VectorSql.execute(cat,
      "SELECT id FROM vectors WHERE id BETWEEN 'v1' AND 'v3'").collect()
    assert(r.map(_.getString(0)).sorted.toSeq == Seq("v1", "v2", "v3"))
    val n = VectorSql.execute(cat,
      "SELECT id FROM vectors WHERE id NOT BETWEEN 'v1' AND 'v3'").collect()
    assert(n.map(_.getString(0)).toSeq == Seq("test1"))
    // BETWEEN's AND binds to the range, outer AND still parses
    val both = VectorSql.execute(cat,
      "SELECT id FROM vectors WHERE id BETWEEN 'v1' AND 'v3' " +
        "AND metadata.category = 'image'").collect()
    assert(both.map(_.getString(0)).sorted.toSeq == Seq("v1", "v3"))
  }

  test("LIMIT/OFFSET paginate the deterministic order") {
    val cat = freshCat()
    val all = VectorSql.execute(cat,
      "SELECT id FROM vectors LIMIT 10").collect().map(_.getString(0)).toSeq
    val page2 = VectorSql.execute(cat,
      "SELECT id FROM vectors LIMIT 2 OFFSET 2").collect().map(_.getString(0)).toSeq
    assert(page2 == all.slice(2, 4))
    // NEAREST TO pagination: offset skips the closest hits
    val top = VectorSql.execute(cat,
      "SELECT id FROM vectors NEAREST TO [1.0, 0.0, 0.0] LIMIT 2").collect()
    val page = VectorSql.execute(cat,
      "SELECT id FROM vectors NEAREST TO [1.0, 0.0, 0.0] LIMIT 2 OFFSET 2").collect()
    assert((top.map(_.getString(0)) ++ page.map(_.getString(0))).distinct.length == 4)
  }

  test("UNION ALL concatenates; UNION dedupes; columns must match") {
    val cat = freshCat()
    val all = VectorSql.execute(cat,
      "SELECT id FROM vectors WHERE id = 'v1' " +
        "UNION ALL SELECT id FROM vectors WHERE id = 'v1'").collect()
    assert(all.length == 2)
    val dedup = VectorSql.execute(cat,
      "SELECT id FROM vectors WHERE id = 'v1' " +
        "UNION SELECT id FROM vectors WHERE id = 'v1'").collect()
    assert(dedup.length == 1)
    // three-branch left-deep chain, mixed ALL
    val chain = VectorSql.execute(cat,
      "SELECT id FROM vectors WHERE id = 'v1' " +
        "UNION SELECT id FROM vectors WHERE id = 'v1' " +
        "UNION ALL SELECT id FROM vectors WHERE id = 'v2'").collect()
    assert(chain.map(_.getString(0)).sorted.toSeq == Seq("v1", "v2"))
    // NEAREST branches fuse
    val fused = VectorSql.execute(cat,
      "SELECT id, distance FROM vectors NEAREST TO [1.0, 0.0, 0.0] LIMIT 2 " +
        "UNION ALL SELECT id, distance FROM vectors " +
        "NEAREST TO [0.0, 1.0, 0.0] LIMIT 2").collect()
    assert(fused.length == 4)
    val err = intercept[IllegalArgumentException] {
      VectorSql.execute(cat,
        "SELECT id FROM vectors UNION ALL SELECT id, distance FROM vectors " +
          "NEAREST TO [1.0, 0.0, 0.0] LIMIT 2").collect()
    }
    assert(err.getMessage.contains("UNION column mismatch"))
  }

  test("checkpoint bounds DML plan growth and restores at-rest pushdown") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sql_ckpt").toString
    try {
      val cat = freshCat()
      // a DML stream stacks one plan node per statement — the
      // unbounded-plan mode a long-lived catalog hits
      for (i <- 0 until 20)
        VectorSql.execute(cat,
          s"UPDATE vectors SET metadata.rev = 'r$i' WHERE id = 'v1'")
      val before = VectorSql.execute(cat, "SELECT id FROM vectors")
        .collect().map(_.getString(0)).sorted.toSeq
      val deep = cat.get("vectors").queryExecution.analyzed
        .treeString.linesIterator.size
      cat.checkpoint("vectors", dir)
      // the compacted plan is ONE parquet scan again
      val shallow = cat.get("vectors").queryExecution.analyzed
        .treeString.linesIterator.size
      assert(shallow < deep / 4, s"deep=$deep shallow=$shallow")
      // content-preserving: rows and the last UPDATE's value survive
      val after = VectorSql.execute(cat, "SELECT id FROM vectors")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(after === before)
      val rev = VectorSql.execute(cat,
          "SELECT metadata.rev AS rev FROM vectors WHERE id = 'v1'")
        .head().getString(0)
      assert(rev === "r19")
      // and the MATERIALIZED native id column now pushes to the scan
      // (the ID_LOOKUP at-rest contract): row-group pruning off id
      // stats instead of an in-memory union/projection chain
      val plan = VectorSql.explain(cat,
        "SELECT id FROM vectors WHERE id = 'v1'")
      assert(plan.startsWith("plan: ID_LOOKUP"), plan.linesIterator.next())
      assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,v1)]") ||
        plan.contains("EqualTo(id,v1)"), plan)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }
}
