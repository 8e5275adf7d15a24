package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.nlp._

/** Property tests for the span-algebra / offset invariants (SURVEY §5's
  * engine test plan: filter_spans idempotence, alignment symmetry,
  * offset-realignment inverse, tokenizer partition property).
  * Deterministic: generators sampled from a fixed seed.
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 150)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    while (produced < n) {
      g.apply(Gen.Parameters.default, seed).foreach { v =>
        f(v); produced += 1
      }
      seed = seed.next
    }
  }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 100)(
      f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }

  private val genSpan: Gen[Ent] = for {
    b <- Gen.choose(0, 200)
    len <- Gen.choose(1, 30)
    label <- Gen.oneOf("a", "b", "c")
  } yield Ent(b, b + len, label, "")

  private val genSpans: Gen[List[Ent]] = Gen.listOfN(25, genSpan)

  test("filter_spans output is overlap-free and idempotent") {
    forAll(genSpans) { spans =>
      val kept = SpanAlgebra.filterSpans(spans)
      kept.combinations(2).foreach { case Seq(x, y) =>
        assert(x.end <= y.begin || y.end <= x.begin,
          s"overlap between $x and $y")
      }
      assert(SpanAlgebra.filterSpans(kept) === kept)
    }
  }

  test("filter_spans keeps a maximal set: every dropped span overlaps a kept one") {
    forAll(genSpans) { spans =>
      val kept = SpanAlgebra.filterSpans(spans)
      spans.foreach { s =>
        val overlapsKept =
          kept.exists(k => s.begin < k.end && s.end > k.begin)
        assert(overlapsKept, s"dropped $s overlaps nothing kept")
      }
    }
  }

  test("align_spans finds exactly the overlapping sources (vs brute force)") {
    forAll2(genSpans, genSpans) { (sources, targets) =>
      val aligned = SpanAlgebra.alignSpans(sources, targets)
      targets.zip(aligned).foreach { case (t, got) =>
        val expected = sources.filter(s => s.begin < t.end && s.end > t.begin)
        assert(got.toSet === expected.toSet)
      }
    }
  }

  private val genText: Gen[String] = Gen.listOf(Gen.frequency(
    (8, Gen.alphaNumChar), (2, Gen.const(' ')), (1, Gen.const('\n')),
    (1, Gen.oneOf('.', ',', '!', '?', '(', ')', 'é', 'à', '\'')),
    (1, Gen.choose('0', '9')))).map(_.mkString)

  private val genClinicalText: Gen[String] = {
    val frag = Gen.oneOf(
      "vu le 03/01", "en 11/2017", "le 23/08/2021 à 14h30",
      "depuis la semaine dernière", "ce jour", "il y a trois mois",
      "du 5 juin au 6 juillet", "pendant quinze jours", "pdt 1 mois",
      "dose 5 mg/l", "plaquettes 250 10^9/l", "IMC 23.7", "CRP 5.2",
      "attente 90 secondes", "entre 1 et 2m", "x 4 500 /mm3",
      "consultation", "fracture du radius", "1/3", "tel 01 23 45 67 89")
    Gen.listOfN(6, frag).map(_.mkString(" ")).flatMap(base =>
      genText.map(noise => s"$base $noise"))
  }

  test("extraction spans always index their text exactly (widened banks)") {
    // offset-invariant across the round-2 date/quantity pattern banks:
    // every emitted entity must slice its source text to its own `text`
    // and stay in bounds — the property regex-bank growth most easily
    // breaks
    forAll(genClinicalText, n = 120) { text =>
      val all = graft.pipes.Dates.extract(text) ++
        graft.pipes.Quantities.extract(text) ++
        graft.pipes.Quantities.extractFromTables(text)
      all.foreach { e =>
        assert(0 <= e.begin && e.begin < e.end && e.end <= text.length,
          s"bad span $e in '$text'")
        assert(text.substring(e.begin, e.end) == e.text,
          s"span text drift: $e in '$text'")
      }
      // periods stay in bounds too
      val (ds, ps) = graft.pipes.Dates.extractWithPeriods(text)
      ps.foreach { p =>
        assert(0 <= p.begin && p.begin < p.end && p.end <= text.length)
        assert(text.substring(p.begin, p.end) == p.text)
      }
      assert(ds.forall(d => d.end <= text.length))
    }
  }

  test("tokenizer partitions any text: contiguous offsets, exact slices") {
    forAll(genText) { text =>
      val toks = Tokenizer.tokenize(text)
      if (text.nonEmpty) {
        assert(toks.head.begin === 0)
        assert(toks.last.end === text.length)
        toks.sliding(2).foreach {
          case Array(a, b) => assert(a.end === b.begin)
          case _ =>
        }
      }
      toks.foreach(t =>
        assert(t.text === text.substring(t.begin, t.end)))
    }
  }

  test("clean-text offsets are an inverse map (clean char == raw char)") {
    forAll(genText) { text =>
      val toks = Normalizer.normalize(text, Tokenizer.tokenize(text),
        Normalizer.Options(lowercase = false, accents = false,
          quotes = false))
      val (clean, offsets) = Normalizer.cleanTextWithOffsets(toks,
        useNorm = false)
      clean.zipWithIndex.foreach { case (c, i) =>
        if (c != ' ') // inserted separators map to the gap position
          assert(text(offsets(i)) === c, s"pos $i of '$clean' in '$text'")
      }
    }
  }

  test("normalization never changes token lengths") {
    forAll(genText) { text =>
      Normalizer.normalize(text, Tokenizer.tokenize(text)).foreach { t =>
        assert(t.norm.length === t.end - t.begin)
      }
    }
  }

  test("interval join equals brute force on randomized instances") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    // random windows, keys, and timestamps spanning the epoch on both
    // sides — clustered time ranges so matches actually occur
    val gen = for {
      w <- Gen.choose(1L, 500L)
      lefts <- Gen.listOfN(40,
        Gen.zip(Gen.choose(0, 4), Gen.choose(-2000L, 2000L)))
      rights <- Gen.listOfN(40,
        Gen.zip(Gen.choose(0, 4), Gen.choose(-2000L, 2000L)))
    } yield (w, lefts, rights)
    forAll(gen, n = 6) { case (w, lefts, rights) =>
      val lRows = lefts.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, s"k$k", t) }
      val rRows = rights.zipWithIndex.map { case ((k, t), i) =>
        (1000L + i, s"k$k", t) }
      val l = lRows.toDF("id", "k", "tl")
        .select($"id", $"k", timestamp_micros($"tl").as("t"))
      val r = rRows.toDF("rid", "rk", "rtl")
        .select($"rid", $"rk", timestamp_micros($"rtl").as("rt"))
      val got = graft.operators.IntervalJoin
        .pairs(l, r, "k", "rk", "t", "rt", w)
        .select(col("id"), col("rid")).as[(Long, Long)].collect().toSet
      val brute = (for {
        (id, k, t) <- lRows
        (rid, rk, rt) <- rRows
        if k == rk && rt >= t - w && rt <= t
      } yield (id, rid)).toSet
      assert(got === brute, s"window $w")
    }
  }
}
