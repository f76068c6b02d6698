package graft.functions

import java.util.regex.Pattern

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[PiiKernels.bpeTokenStats]] to the regex alternation it
  * replaces: `'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+`
  * extracted token-by-token with java.util.regex (the same pattern the
  * DuckDB oracle runs through RE2). The generator leans on apostrophes
  * next to contraction-suffix letters, punctuation runs that absorb
  * apostrophes, and non-ASCII chars in punctuation runs.
  */
class BpeTokenStatsSpec extends AnyFunSuite {

  private val pat = Pattern.compile(
    "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+")

  private def ref(s: String): (Long, Long, Long, Long) = {
    val m = pat.matcher(s)
    var nTok = 0L; var nAlpha = 0L; var nNum = 0L; var nContr = 0L
    while (m.find()) {
      val t = m.group()
      nTok += 1
      val c = t.charAt(0)
      if (c == '\'' && t.length > 1 &&
          "s|t|re|ve|m|ll|d".split('|').contains(t.substring(1))) nContr += 1
      else if (c.isLetter && c < 128) nAlpha += 1
      else if (c >= '0' && c <= '9') nNum += 1
    }
    (nTok, nAlpha, nNum, nContr)
  }

  private def kernel(s: String): (Long, Long, Long, Long) = {
    val r = PiiKernels.bpeTokenStats(UTF8String.fromString(s))
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  private val cases = Seq(
    "", " ", "'", "x'", "'s", "'sx", "''s", "?'s", "'re 'r 'll 'l 'véry",
    "don't it's we're I'll you've he'd o'clock",
    "v1.2, (mixed-Case) #tag100 --- a1b2c3",
    "naïve café — em—dash … '…'s",
    "it's v3.7 #t42 don't stop-2024")

  test("kernel equals the regex alternation on curated edges") {
    for (s <- cases) assert(kernel(s) === ref(s), s"input: '$s'")
  }

  private val alphabet: Gen[Char] = Gen.frequency(
    6 -> Gen.oneOf('a', 's', 't', 'r', 'e', 'v', 'm', 'l', 'd', 'X'),
    3 -> Gen.oneOf('0', '7'),
    5 -> Gen.oneOf('\'', '.', '-', '#', ',', '!'),
    3 -> Gen.const(' '),
    1 -> Gen.oneOf('é', '…'))

  test("kernel equals the regex alternation on random strings") {
    val strs = Gen.chooseNum(0, 60).flatMap(n => Gen.stringOfN(n, alphabet))
    val params = Gen.Parameters.default
    (1 to 4000).foreach { trial =>
      val s = strs.pureApply(params, Seed(trial.toLong * 15485863L))
      assert(kernel(s) === ref(s), s"input: '$s' (trial $trial)")
    }
  }
}
