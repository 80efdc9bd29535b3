package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.domain.IngestionConfigRule
import graft.rules.RuleMatcher
import graft.parsers.{ExcelParser, ParserDispatch}

/** Property-based invariants for the pure control-plane logic. ScalaCheck
  * generators with deterministic seeded sampling (the scalatest bridge
  * artifact isn't in the offline cache, so sampling is driven manually). */
class PropertySpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val keyGen: Gen[String] = for {
    dir <- Gen.oneOf("data", "logs", "reports", "archive")
    name <- Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(12))
    ext <- Gen.oneOf("csv", "json", "txt", "xml", "xlsx", "pdf", "bin")
  } yield s"$dir/$name.$ext"

  test("rule matching: best match is always a matching rule of maximal pattern length") {
    val matcher = new RuleMatcher(RuleMatcher.seedRules)
    samples(keyGen).foreach { key =>
      val all = matcher.matching(key)
      matcher.findBestMatch(key) match {
        case Some(best) =>
          assert(all.contains(best), key)
          assert(all.forall(_.pattern.length <= best.pattern.length), key)
        case None => assert(all.isEmpty, key)
      }
    }
  }

  test("rule matching: adding a never-matching rule changes nothing") {
    val base = new RuleMatcher(RuleMatcher.seedRules)
    val extended = new RuleMatcher(
      RuleMatcher.seedRules :+ IngestionConfigRule("^\\$never-matches\\$$", "nowhere"))
    samples(keyGen).foreach { key =>
      assert(base.findBestMatch(key) == extended.findBestMatch(key), key)
    }
  }

  test("extension extraction: lowercased, last dot, stable under path prefixes") {
    samples(Gen.zip(keyGen, Gen.oneOf("", "a/", "b/c/"))).foreach { case (key, prefix) =>
      val ext = ParserDispatch.extractFileType(key)
      assert(ext == ext.toLowerCase, key)
      assert(ParserDispatch.extractFileType(prefix + key) == ext, key)
      assert(ParserDispatch.extractFileType(key.toUpperCase) == ext, key)
    }
  }

  test("excel column refs: index is monotone in column letters") {
    val refGen = for {
      n <- Gen.choose(1, 3)
      letters <- Gen.listOfN(n, Gen.choose('A', 'Z')).map(_.mkString)
      row <- Gen.choose(1, 999)
    } yield (letters, row)
    samples(refGen).foreach { case (letters, row) =>
      val idx = ExcelParser.columnIndex(s"$letters$row")
      assert(idx >= 0, letters)
      // appending a letter always yields a larger index (base-26 positional)
      assert(ExcelParser.columnIndex(s"${letters}A$row") > idx, letters)
    }
  }
}
