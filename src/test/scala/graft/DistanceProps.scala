package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.functions.{TextKernels, TopKBuffer, VectorDistance}

/** Algebraic properties the engine's correctness rests on, checked
  * over random inputs (expression eval directly — no session needed).
  */
object DistanceProps extends Properties("graft") {

  private val vecGen: Gen[Array[Float]] =
    Gen.chooseNum(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100f, 100f)).map(_.toArray))

  private val pairGen: Gen[(Array[Float], Array[Float])] = for {
    n <- Gen.chooseNum(1, 16)
    a <- Gen.listOfN(n, Gen.chooseNum(-100f, 100f))
    b <- Gen.listOfN(n, Gen.chooseNum(-100f, 100f))
  } yield (a.toArray, b.toArray)

  private def d(m: String)(a: Array[Float], b: Array[Float]): Double =
    VectorDistance(
      Literal(ArrayData.toArrayData(a), ArrayType(FloatType, false)),
      Literal(ArrayData.toArrayData(b), ArrayType(FloatType, false)),
      m).eval(null).asInstanceOf[Double]

  property("l2/l1/cosine symmetric") = forAll(pairGen) { case (a, b) =>
    d("l2")(a, b) == d("l2")(b, a) &&
      d("l1")(a, b) == d("l1")(b, a) &&
      math.abs(d("cosine")(a, b) - d("cosine")(b, a)) < 1e-12
  }

  property("l2/l1 nonnegative, self-distance 0") = forAll(vecGen) { a =>
    d("l2")(a, a) == 0.0 && d("l1")(a, a) == 0.0 &&
      d("l2")(a, a.map(_ + 1f)) > 0.0
  }

  property("cosine in [0, 2]") = forAll(pairGen) { case (a, b) =>
    val c = d("cosine")(a, b); c >= 0.0 && c <= 2.0
  }

  property("dot antisymmetric under negation") = forAll(pairGen) { case (a, b) =>
    math.abs(d("dot")(a, b) + d("dot")(a.map(-_), b)) < 1e-6
  }

  property("l2 triangle inequality") = forAll(for {
    n <- Gen.chooseNum(1, 12)
    a <- Gen.listOfN(n, Gen.chooseNum(-50f, 50f))
    b <- Gen.listOfN(n, Gen.chooseNum(-50f, 50f))
    c <- Gen.listOfN(n, Gen.chooseNum(-50f, 50f))
  } yield (a.toArray, b.toArray, c.toArray)) { case (a, b, c) =>
    d("l2")(a, c) <= d("l2")(a, b) + d("l2")(b, c) + 1e-9
  }

  property("charFold stable and in [0, P)") = forAll(Gen.asciiPrintableStr) { s =>
    val h = TextKernels.charFold(s)
    h == TextKernels.charFold(s) && h >= 0 && h < TextKernels.P
  }

  property("tokenHashSet sorted, distinct, subset-stable") =
    forAll(Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dd", "e"))) { words =>
      val s = org.apache.spark.unsafe.types.UTF8String.fromString(words.mkString(" "))
      val hs = TextKernels.tokenHashSet(s)
      hs.sorted.sameElements(hs) && hs.distinct.length == hs.length &&
        hs.toSet == words.filter(_.nonEmpty).map(TextKernels.charFold).toSet
    }

  property("embed is unit-norm for nonempty text") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "d"))) { words =>
      val s = org.apache.spark.unsafe.types.UTF8String.fromString(words.mkString(" "))
      val v = TextKernels.embed(s, 16)
      math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9
    }

  property("minhash component never increases when shingles are added") =
    forAll(for {
      base <- Gen.nonEmptyListOf(Gen.chooseNum(0L, TextKernels.P - 1))
      extra <- Gen.nonEmptyListOf(Gen.chooseNum(0L, TextKernels.P - 1))
    } yield (base.toArray, extra.toArray)) { case (base, extra) =>
      val s1 = TextKernels.minhashSig(base, 4)
      val s2 = TextKernels.minhashSig(base ++ extra, 4)
      s1.zip(s2).forall { case (a, b) => b <= a }
    }

  // the invariant partial aggregation rests on: any partitioning of
  // the input, merged in any order, equals global-sort-take-k
  private val metaGen: Gen[Map[String, String]] = Gen.mapOf(Gen.zip(
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('=', ';', '\\', ' ')))
      .map(_.mkString),
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('=', ';', '\\', ' ')))
      .map(_.mkString)))

  property("VectorWire decode(encode) == identity incl. hostile metadata") =
    forAll(for {
      id <- Gen.identifier
      vec <- vecGen
      meta <- metaGen
    } yield (id, vec, meta)) { case (id, vec, meta) =>
      // backslash itself is NOT escaped by the reference format, so a
      // key/value ending in '\' or containing '\=' is ambiguous on the
      // wire by design; restrict to the representable set
      val clean = meta.filterNot { case (k, v) =>
        k.contains('\\') || v.contains('\\') }
      val r = graft.sources.VectorWire.decode(
        graft.sources.VectorWire.encode(id, vec, clean))
      Prop(r.id == id && r.vector.toSeq == vec.toSeq && r.metadata == clean) :|
        s"got ${r.metadata} expected $clean"
    }

  property("TopKBuffer merge == global top-k for any partitioning") =
    forAll(for {
      xs <- Gen.listOf(Gen.zip(Gen.chooseNum(0.0, 10.0), Gen.chooseNum(0L, 50L)))
      k <- Gen.chooseNum(1, 8)
      cut <- Gen.chooseNum(0, math.max(xs.length, 1))
    } yield (xs, k, math.min(cut, xs.length))) {
      case (xs, k, cut) =>
        // the buffer contract is top-k of DISTINCT ids, each at its
        // best (smallest) dist — duplicated arrivals of an id (the
        // graph pipelines' multi-path candidates) occupy one slot
        val expected = xs.groupBy(_._2).values.map(_.min).toList
          .sorted.take(k)
        val (l, r) = xs.splitAt(cut)
        val bl = new TopKBuffer(k); val br = new TopKBuffer(k)
        l.foreach { case (dd, i) => bl.add(dd, i) }
        r.foreach { case (dd, i) => br.add(dd, i) }
        bl.merge(br)
        val got = bl.sorted.toList
        Prop(got == expected) :| s"got=$got expected=$expected"
    }

  property("TopKBuffer dedups ids: duplicated adds == distinct adds") =
    forAll(for {
      xs <- Gen.nonEmptyListOf(
        Gen.zip(Gen.chooseNum(0.0, 10.0), Gen.chooseNum(0L, 20L)))
      k <- Gen.chooseNum(1, 8)
      dup <- Gen.listOf(Gen.chooseNum(0, 1000))
    } yield (xs, k, dup.map(i => xs(i % xs.length)))) {
      case (xs, k, dups) =>
        // re-adding existing (dist, id) pairs in any order and any
        // multiplicity never changes the result — the property that
        // lets candidate frames skip their pre-aggregate .distinct()
        val b1 = new TopKBuffer(k); val b2 = new TopKBuffer(k)
        xs.foreach { case (dd, i) => b1.add(dd, i) }
        (dups ++ xs ++ dups).foreach { case (dd, i) => b2.add(dd, i) }
        Prop(b1.sorted.toList == b2.sorted.toList) :|
          s"clean=${b1.sorted.toList} dup=${b2.sorted.toList}"
    }
}
