package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels behind the native text expressions.
  *
  * Semantics are EXACTLY TextFuncs' higher-order-function forms (and
  * therefore the DuckDB oracles): whitespace tokens, polynomial char
  * fold mod P, seeded minhash, 32-bit simhash votes, hash-projection
  * embedding. The HOF forms are the executable spec; these exist
  * because Catalyst evaluates HOF lambdas interpreted per element —
  * fine for one fold, quadratic death for nested folds (the embed
  * norm recomputed its 64-aggregate subtree per output element).
  * Spec-tested for equality against the HOF forms.
  */
object TextKernels {
  val P: Long = TextFuncs.P
  val M: Long = TextEmbed.M

  def tokenize(s: UTF8String): Array[String] =
    s.toString.trim.split("\\s+").filterNot(_.isEmpty)

  /** fold(acc*31 + codepoint) mod P over the CODE POINTS of s —
    * matching the HOF spec (Spark split("")/ascii walks code points)
    * and DuckDB `ascii(c)` (Unicode code point). Iterating UTF-16
    * units instead would silently diverge on non-BMP text (surrogate
    * pairs fold as two bogus values); equality is spec-pinned with a
    * non-ASCII row in TextKernelSpec.
    */
  def charFold(s: String): Long = {
    var acc = 0L; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  def tokenHashes(s: UTF8String): Array[Long] = tokenize(s).map(charFold)

  /** Adjacent token-hash pairs packed as h1*P + h2 (P² < 2^63, so
    * the pack is collision-free over the hash space and the CONTEXT
    * hash is recoverable as `pk div P`) — bigram identity AND its
    * conditioning unigram in one long, so conditional-entropy
    * aggregations shuffle longs instead of "w1 w2" strings.
    */
  def bigramPairHashes(s: UTF8String): Array[Long] = {
    val hs = tokenHashes(s)
    if (hs.length < 2) return Array.empty
    Array.tabulate(hs.length - 1)(i => hs(i) * P + hs(i + 1))
  }

  /** Word k-shingle hashes (fold over the joined "w1 w2 w3" string). */
  def shingleHashes(s: UTF8String, k: Int): Array[Long] = {
    val toks = tokenize(s)
    if (toks.length < k) return Array.empty
    Array.tabulate(toks.length - k + 1) { i =>
      charFold(toks.slice(i, i + k).mkString(" "))
    }
  }

  /** Word k-shingles as strings — one tokenize pass, no per-element
    * interpreted lambda (the HOF Corpus.ngrams form is the spec). */
  def shingleStrings(s: UTF8String, k: Int): Array[UTF8String] = {
    val toks = tokenize(s)
    if (toks.length < k) return Array.empty
    Array.tabulate(toks.length - k + 1) { i =>
      UTF8String.fromString(toks.slice(i, i + k).mkString(" "))
    }
  }

  def minhashSig(bases: Array[Long], numSeeds: Int): Array[Long] =
    Array.tabulate(numSeeds) { s =>
      var mn = Long.MaxValue; var i = 0
      while (i < bases.length) {
        val h = (bases(i) * (2 * s + 1) + (131 * s + 7)) % P
        if (h < mn) mn = h
        i += 1
      }
      mn
    }

  def simhash32(hashes: Array[Long]): Long = {
    var out = 0L; var j = 0
    while (j < 32) {
      var vote = 0L; var i = 0
      while (i < hashes.length) {
        // floor(h / 2^j) % 2 — matches the portable SQL bit extract
        if ((hashes(i) >>> j) % 2 == 1) vote += 1 else vote -= 1
        i += 1
      }
      if (vote > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Sorted distinct token hashes (TokenHashSet's kernel). */
  def tokenHashSet(s: UTF8String): Array[Long] = {
    val hs = tokenHashes(s).distinct
    java.util.Arrays.sort(hs)
    hs
  }

  /** token_stats in one pass; returns the InternalRow for the struct
    * (Java-callable from generated code).
    */
  def tokenStatsRow(s: UTF8String, markers: Array[String]): InternalRow = {
    val toks = tokenize(s)
    var sumLen = 0L
    val seen = new java.util.HashSet[String]()
    val mc = new Array[Int](markers.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      sumLen += t.length
      seen.add(t)
      var m = 0
      while (m < markers.length) {
        if (t == markers(m)) mc(m) += 1
        m += 1
      }
      i += 1
    }
    InternalRow(toks.length, sumLen, seen.size, new GenericArrayData(mc))
  }

  /** Canonical text form for normalization-aware dedup: Unicode NFC,
    * then lowercase, then whitespace runs collapsed to one space and
    * ends trimmed. Order is pinned (NFC BEFORE lower) and mirrored by
    * the DuckDB oracle snippet
    * `trim(regexp_replace(lower(nfc_normalize(t)), '\s+', ' ', 'g'))`.
    *
    * Lowercasing is codepoint-wise SIMPLE case mapping
    * (Character.toLowerCase on code points), NOT String.toLowerCase's
    * full mapping: DuckDB's lower() is utf8proc's simple one-to-one
    * mapping, while full mapping is length-changing on code points
    * like U+0130 (İ → i + combining dot) — cross-engine digests would
    * diverge exactly on those. Residual risk is limited to Unicode
    * table-version skew between the JDK and utf8proc, not mapping
    * strategy.
    */
  def normalizeText(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString.replaceAll("\\s+", " ").trim)
  }

  /** L2-normalized hash-projection embedding (TextEmbed formula). */
  def embed(s: UTF8String, dim: Int): Array[Double] = {
    val hashes = tokenHashes(s)
    if (hashes.isEmpty) return Array.fill(dim)(0.0)
    val raw = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      var acc = 0L; var i = 0
      while (i < hashes.length) { acc += (hashes(i) * (j + 1) + j * 37) % M; i += 1 }
      raw(j) = acc.toDouble / (hashes.length * M)
      j += 1
    }
    var norm = 0.0; j = 0
    while (j < dim) { norm += raw(j) * raw(j); j += 1 }
    norm = math.sqrt(norm)
    j = 0
    while (j < dim) { raw(j) = raw(j) / norm; j += 1 }
    raw
  }
}

/** Base for the string -> scalar/array kernel expressions. Each
  * generates a single static call into TextKernels (see `kernelCall`),
  * so the expressions stay inside whole-stage codegen while the work
  * happens in one tight JVM loop per row.
  */
abstract class TextKernelExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.catalogString}")
  }

  /** Java source for the value given the input UTF8String variable. */
  protected def kernelCall(ctx: CodegenContext, input: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => kernelCall(ctx, c))
}

/** Native CharFold — codegen'd inline (it's the innermost hot loop). */
case class CharFold(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "char_fold"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_fold expects string, got ${t.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    TextKernels.charFold(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.charFold($c.toString())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class TextEmbedExpr(child: Expression, dim: Int) extends TextKernelExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "text_embed"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TextKernels.embed(v.asInstanceOf[UTF8String], dim))
  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"graft.functions.TextKernels.embed($c, $dim))"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SimHash32Expr(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"
  override def nullSafeEval(v: Any): Any =
    TextKernels.simhash32(TextKernels.tokenHashes(v.asInstanceOf[UTF8String]))
  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.functions.TextKernels.simhash32(" +
      s"graft.functions.TextKernels.tokenHashes($c))"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MinHashSigExpr(child: Expression, shingleK: Int, numSeeds: Int)
    extends TextKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty shingle set -> null
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(v: Any): Any = {
    val bases = TextKernels.shingleHashes(v.asInstanceOf[UTF8String], shingleK)
    if (bases.isEmpty) null
    else new GenericArrayData(TextKernels.minhashSig(bases, numSeeds))
  }
  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    throw new UnsupportedOperationException("uses custom doGenCode")
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bases = ctx.freshName("bases")
      s"""long[] $bases = graft.functions.TextKernels.shingleHashes($c, $shingleK);
         |if ($bases.length == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    graft.functions.TextKernels.minhashSig($bases, $numSeeds));
         |}""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** shingle_hashes(text, k): the k-token shingle base hashes — the
  * minhash kernel's candidate stream exposed directly. Feeds
  * n-gram-overlap operators (benchmark decontamination: explode +
  * equi join on the hash). Empty array for docs with < k tokens
  * (such docs have no n-grams to collide on).
  */
case class ShingleHashesExpr(child: Expression, shingleK: Int)
    extends TextKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TextKernels.shingleHashes(v.asInstanceOf[UTF8String], shingleK))
  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"graft.functions.TextKernels.shingleHashes($c, $shingleK))"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** bigram_pair_hashes(text): adjacent token-hash pairs packed as
  * h1*P + h2 — see TextKernels.bigramPairHashes. Empty array for
  * docs with < 2 tokens.
  */
case class BigramPairHashesExpr(child: Expression)
    extends TextKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bigram_pair_hashes"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TextKernels.bigramPairHashes(v.asInstanceOf[UTF8String]))
  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"graft.functions.TextKernels.bigramPairHashes($c))"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** shingle_strings(text, k): k-token shingles as strings — the
  * n-gram stream for vocab/phrase-table builds where the STRING is
  * the output (use shingle_hashes when only identity matters; longs
  * shuffle far cheaper than strings).
  */
case class ShingleStringsExpr(child: Expression, shingleK: Int)
    extends TextKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TextKernels.shingleStrings(v.asInstanceOf[UTF8String], shingleK)
        .asInstanceOf[Array[Any]])
  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"(Object[]) graft.functions.TextKernels.shingleStrings($c, $shingleK))"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** token_stats(text, markers...): one tokenization pass producing
  * struct(n_tokens, sum_len, n_distinct, marker_counts) — feeds
  * text_stats / quality_score / lang_id without three interpreted
  * HOF walks over the same token array.
  */
case class TokenStatsExpr(child: Expression, markers: Seq[String])
    extends TextKernelExpression {
  import org.apache.spark.sql.catalyst.InternalRow

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("marker_counts", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "token_stats"

  private lazy val markersArr: Array[String] = markers.toArray

  override def nullSafeEval(v: Any): Any =
    TextKernels.tokenStatsRow(v.asInstanceOf[UTF8String], markersArr)

  override protected def kernelCall(ctx: CodegenContext, c: String): String = {
    val ref = ctx.addReferenceObj("markers", markersArr, "java.lang.String[]")
    s"graft.functions.TextKernels.tokenStatsRow($c, $ref)"
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** normalize_text(text): NFC + lowercase + whitespace collapse — the
  * canonical form behind normalization-aware dedup. A single codegen'd
  * kernel call per row (the interpreted alternative is three regex
  * `Column` ops, each materializing an intermediate UTF8String).
  */
case class NormalizeTextExpr(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"
  override def nullSafeEval(v: Any): Any =
    TextKernels.normalizeText(v.asInstanceOf[UTF8String])
  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.functions.TextKernels.normalizeText($c)"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Column API + SQL registration for the native text kernels. */
object TextExprs {
  def char_fold(c: Column): Column = Shims.column(CharFold(Shims.expression(c)))
  def text_embed(c: Column, dim: Int = TextEmbed.Dim): Column =
    Shims.column(TextEmbedExpr(Shims.expression(c), dim))
  def simhash32(c: Column): Column = Shims.column(SimHash32Expr(Shims.expression(c)))
  def minhash_sig(c: Column, shingleK: Int = 3, numSeeds: Int = 8): Column =
    Shims.column(MinHashSigExpr(Shims.expression(c), shingleK, numSeeds))
  def shingle_hashes(c: Column, shingleK: Int = 3): Column =
    Shims.column(ShingleHashesExpr(Shims.expression(c), shingleK))
  def shingle_strings(c: Column, shingleK: Int): Column =
    Shims.column(ShingleStringsExpr(Shims.expression(c), shingleK))
  def bigram_pair_hashes(c: Column): Column =
    Shims.column(BigramPairHashesExpr(Shims.expression(c)))
  def token_stats(c: Column, markers: Seq[String]): Column =
    Shims.column(TokenStatsExpr(Shims.expression(c), markers))
  def normalize_text(c: Column): Column =
    Shims.column(NormalizeTextExpr(Shims.expression(c)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = Shims.functionRegistry(spark)
    reg.createOrReplaceTempFunction("char_fold", es => CharFold(es.head), "built-in")
    reg.createOrReplaceTempFunction("text_embed", es => TextEmbedExpr(es.head, TextEmbed.Dim), "built-in")
    reg.createOrReplaceTempFunction("simhash32", es => SimHash32Expr(es.head), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig", es => MinHashSigExpr(es.head, 3, 8), "built-in")
  }
}
