package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextEmbed, TextExprs, TextFuncs}

/** The HOF compositions in TextFuncs/TextEmbed are the executable
  * spec (they mirror the DuckDB oracles); the native kernels must be
  * value-identical on real corpus data.
  */
class TextExprsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs =
    Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(50)

  test("shingle_strings kernel == ngrams HOF on adversarial whitespace/unicode") {
    val rows = Seq(
      "",                       // empty
      "   ",                    // whitespace-only
      "one",                    // below k
      "  a\tb c  d  ",     // tabs; NBSP is NOT \s-split in either impl
      "café naïve 😀 x", // accents + non-BMP emoji
      null,                     // null text -> null (both sides)
      "a b c d e f").toDF("text")
    val diff = rows.select(
        TextExprs.shingle_strings(col("text"), 2).as("k"),
        graft.operators.Corpus.ngrams(TextFuncs.tokens(col("text")), 2).as("h"))
      .where(not(col("k") <=> col("h"))).count()
    assert(diff == 0)
  }

  test("bigram_pair_hashes kernel == packed HOF token-hash pairs") {
    val p = TextFuncs.P
    // HOF spec: hash each token, pack adjacent pairs h1*P + h2
    val hofPack = {
      val hs = transform(TextFuncs.tokens(col("text")),
        t => TextFuncs.charFold(t))
      filter(
        zip_with(hs, slice(hs, lit(2), size(hs)),
          (a, b) => when(b.isNotNull, a * lit(p) + b)),
        x => x.isNotNull)
    }
    val edge = Seq("", "   ", "one", "a b", "café naïve 😀 x",
      "a b c d e").toDF("text")
    for (df <- Seq(docs.select(col("text")), edge)) {
      val diff = df.select(
          TextExprs.bigram_pair_hashes(col("text")).as("k"),
          hofPack.as("h"))
        .where(not(col("k") <=> col("h")))
      assert(diff.count() === 0)
    }
  }

  test("bigram pack round-trips: pk div P / pk mod P recover the token hashes") {
    val rnd = new scala.util.Random(42)
    val words = Array("the", "a", "café", "x1", "zqw", "😀", "b2b")
    for (_ <- 1 to 200) {
      val s = Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.length)))
        .mkString(" ")
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val hs = graft.functions.TextKernels.tokenHashes(u)
      val pk = graft.functions.TextKernels.bigramPairHashes(u)
      assert(pk.length === math.max(0, hs.length - 1))
      for (i <- pk.indices) {
        assert(pk(i) / TextFuncs.P === hs(i), s"context of $s @$i")
        assert(pk(i) % TextFuncs.P === hs(i + 1), s"next of $s @$i")
      }
    }
  }

  test("char_fold kernel == HOF charFold") {
    val diff = docs.select(
        TextExprs.char_fold(col("text")).as("k"),
        TextFuncs.charFold(col("text")).as("h"))
      .where(col("k") =!= col("h")).count()
    assert(diff == 0)
  }

  test("simhash32 kernel == HOF simhash32") {
    val hofHashes = transform(TextFuncs.tokens(col("text")),
      t => TextFuncs.charFold(t))
    val diff = docs.select(
        TextExprs.simhash32(col("text")).as("k"),
        TextFuncs.simhash32(hofHashes).as("h"))
      .where(col("k") =!= col("h")).count()
    assert(diff == 0)
  }

  test("minhash_sig kernel == HOF minhashSig") {
    val toks = TextFuncs.tokens(col("text"))
    val hofSig = TextFuncs.minhashSig(
      transform(TextFuncs.shingles(toks, 3), s => TextFuncs.charFold(s)), 8)
    val diff = docs.where(size(toks) >= 3)
      .select(TextExprs.minhash_sig(col("text"), 3, 8).as("k"), hofSig.as("h"))
      .where(col("k") =!= col("h")).count()
    assert(diff == 0)
  }

  test("text_embed kernel == HOF embed (1e-12 elementwise)") {
    val rows = docs.select(
        TextExprs.text_embed(col("text")).as("k"),
        TextEmbed.embed(col("text")).as("h"))
      .collect()
    rows.foreach { r =>
      val k = r.getSeq[Double](0); val h = r.getSeq[Double](1)
      assert(k.length == 64 && h.length == 64)
      k.zip(h).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    }
  }

  test("token_stats kernel == HOF pieces") {
    val toks = TextFuncs.tokens(col("text"))
    val diff = docs.select(
        TextExprs.token_stats(col("text"), Seq("the", "a")).as("st"),
        size(toks).as("n"),
        aggregate(transform(toks, w => length(w).cast("long")), lit(0L),
          (a, x) => a + x).as("sl"),
        size(array_distinct(toks)).as("nd"),
        size(filter(toks, w => w === "the")).as("nthe"),
        size(filter(toks, w => w === "a")).as("na"))
      .where(col("st.n_tokens") =!= col("n") ||
        col("st.sum_len") =!= col("sl") ||
        col("st.n_distinct") =!= col("nd") ||
        col("st.marker_counts")(0) =!= col("nthe") ||
        col("st.marker_counts")(1) =!= col("na"))
      .count()
    assert(diff == 0)
  }

  test("whitespace edge cases: kernel == HOF on padded/empty/multi-space text") {
    // leading/trailing/duplicated whitespace and whitespace-only text
    // are where a bare split('\s+') and the trim+drop-empties kernel
    // diverge; all three sides (kernel, HOF, DuckDB snippet) now share
    // trim + split + drop-empties semantics (ADVICE r1)
    val edge = Seq("  padded start", "padded end  ", " both  sides ",
      "a  b\t c", "   ", "", "\t\n", "single", " the a the ")
      .toDF("text")
    val toks = TextFuncs.tokens(col("text"))
    val rows = edge.select(
        TextExprs.token_stats(col("text"), Seq("the", "a")).as("st"),
        size(toks).as("n"),
        TextExprs.char_fold(col("text")).as("cfk"),
        TextFuncs.charFold(col("text")).as("cfh"),
        TextExprs.simhash32(col("text")).as("shk"),
        TextFuncs.simhash32(transform(toks, t => TextFuncs.charFold(t))).as("shh"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[org.apache.spark.sql.Row]("st").getAs[Int]("n_tokens") == r.getAs[Int]("n"))
      assert(r.getAs[Long]("cfk") == r.getAs[Long]("cfh"))
      assert(r.getAs[Long]("shk") == r.getAs[Long]("shh"))
    }
    // guard + kernel agree: whitespace-padded 3-token text passes the
    // minhash guard AND gets a non-null signature
    val g = Seq(" one two three ").toDF("text")
      .where(size(TextFuncs.tokens(col("text"))) >= 3)
      .select(TextExprs.minhash_sig(col("text"), 3, 8).as("sig"))
      .collect()
    assert(g.length == 1 && g(0).get(0) != null)
  }

  test("char_fold folds CODE POINTS: kernel == HOF on non-ASCII / non-BMP text") {
    // the HOF spec (split('')/ascii) and DuckDB (string_split/ascii)
    // walk Unicode code points; a kernel iterating UTF-16 units would
    // fold a surrogate pair as two bogus values. Rows: accented BMP,
    // CJK, and non-BMP (musical symbol U+1D11E, emoji U+1F600) —
    // the non-BMP rows are the ones that catch unit-vs-codepoint drift.
    val rows = Seq("café crème", "你好 world",
      "g-clef 𝄞 here", "mix 😀 é𝄞")
      .toDF("text")
      .select(
        TextExprs.char_fold(col("text")).as("k"),
        TextFuncs.charFold(col("text")).as("h"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // pin one value so BOTH sides drifting together would still fail:
    // fold("aé") = (97*31 + 233) mod P = 3240
    assert(graft.functions.TextKernels.charFold("aé") == 3240L)
    // non-BMP pin: fold(U+1D11E) = 0x1D11E = 119070
    assert(graft.functions.TextKernels.charFold("𝄞") == 119070L)
  }

  test("kernels registered for SQL") {
    TextExprs.register(spark)
    val r = spark.sql(
      "SELECT char_fold('hello world') AS f, simhash32('a b c') AS s").head()
    assert(r.getLong(0) == 204910434L) // cross-checked vs DuckDB in SURVEY §6
    assert(r.getLong(1) != 0L)
  }

  test("normalize_text: NFC + lower + ws-collapse, pinned cases") {
    val rows = Seq(
      "  Hello\t\n  WORLD  ",
      "café CAFÉ",   // combining acute NFC-folds into é
      "",
      "   ",
      null,
      "already normal").toDF("text")
    val got = rows.select(TextExprs.normalize_text(col("text")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq(
      "hello world",
      "café café",
      "", "", null,
      "already normal"))
    // codegen and interpreted paths agree (null-safe eval covers the
    // non-codegen path; this pins the generated one on corpus text)
    val docs2 = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val n = docs2.select(TextExprs.normalize_text(col("text")).as("n"))
      .where(col("n").rlike("\\s\\s") || col("n").startsWith(" ") ||
        col("n").endsWith(" "))
      .count()
    assert(n == 0)
  }
}
