package graft.core

import graft.parsing.NQuadsParser

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based roundtrips (SURVEY.md §5.2): term wire-format
  * serialization and N-Quads line emission must be inverses of
  * normalization/parsing for arbitrary content. (Raw ScalaCheck
  * generators with deterministic seeded sampling — the scalatest
  * bridge artifact is not in the offline cache.) */
class RoundtripPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 10) {
      gen.apply(params, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > 0, "generator produced no samples")
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit)
      : Unit = forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private val plainString: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', ',', '!',
      '"', '\\', '\'', 'ü', '中', '\t'))).map(_.mkString)

  private val iriGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https")
    host <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    path <- Gen.listOf(Gen.alphaNumChar).map(_.mkString)
  } yield s"$scheme://$host.org/$path"

  private val numericGen: Gen[String] = Gen.oneOf(
    Gen.choose(-1000000L, 1000000L).map(_.toString),
    Gen.choose(-1e6, 1e6).map(d => f"$d%.4f"))

  test("format → normalize is the identity for IRIs") {
    forAll(iriGen) { iri =>
      assert(Terms.normalize(Terms.format(iri)) === iri)
    }
  }

  test("format → normalize is the identity for numeric lexicals") {
    forAll(numericGen) { n =>
      assert(Terms.normalize(Terms.format(n)) === n)
    }
  }

  test("format → normalize is the identity for arbitrary plain literals") {
    forAll(plainString) { s =>
      if (!Terms.isIri(s) && !Terms.isNumeric(s))
        assert(Terms.normalize(Terms.format(s)) === s)
    }
  }

  test("escape → unescape is the identity") {
    forAll(plainString) { s =>
      assert(Terms.unescape(Terms.escape(s)) === s)
    }
  }

  test("emitted N-Quads lines parse back to the same event") {
    val objGen: Gen[String] = Gen.oneOf(iriGen, numericGen,
      Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar,
        Gen.oneOf(' ', ',', '!'))).map(_.mkString))
    forAll(Gen.zip(Gen.choose(0L, 2000000000000L), iriGen, iriGen, objGen,
      Gen.oneOf(iriGen, Gen.const("")))) { case (ts, s, p, o, g) =>
      val objTerm =
        if (Terms.isIri(o)) s"<$o>" else "\"" + Terms.escape(o) + "\""
      val graphTerm = if (g.isEmpty) "" else s"<$g> "
      val line = s"$ts <$s> <$p> $objTerm $graphTerm."
      val parsed = NQuadsParser.parseLine(line, () => 0L)
      assert(parsed.isRight, s"failed to parse: $line")
      val ev = parsed.toOption.get
      assert(ev.timestamp === ts)
      assert(ev.subject === s)
      assert(ev.predicate === p)
      // parser keeps raw (escaped) lexical; unescape to compare
      assert(Terms.unescape(ev.objectValue) === o)
      assert(ev.graph === g)
    }
  }
}
