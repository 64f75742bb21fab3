package graft.text

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the reference tokenizer semantics
  * (`examples/wordcount/wordcount.c:56-92`, SURVEY.md §2.2 P3) —
  * pure-JVM, no Spark session needed, so these run as fast random
  * fuzz over the char-class edge cases (apostrophes, digits,
  * non-ASCII, empty, boundaries).
  */
object TokenizerProps extends Properties("RefTokenizer") {

  private val inputGen: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaChar,
    2 -> Gen.const('\''),
    2 -> Gen.numChar,
    3 -> Gen.oneOf(' ', '.', ',', '-', '_', '!'),
    1 -> Gen.oneOf('é', 'ü', '中', 'ß'))).map(_.mkString)

  property("every token matches [A-Z][A-Z']*") =
    forAll(inputGen) { s =>
      RefTokenizer.tokenize(s).forall(_.matches("[A-Z][A-Z']*"))
    }

  property("token characters never exceed input length") =
    forAll(inputGen) { s =>
      RefTokenizer.tokenize(s).map(_.length).sum <= s.length
    }

  property("tokenization is idempotent over space-joined tokens") =
    forAll(inputGen) { s =>
      val toks = RefTokenizer.tokenize(s).toList
      RefTokenizer.tokenize(toks.mkString(" ")).toList == toks
    }

  property("case-insensitive: tokenize(s) == tokenize(s.toLowerCase)") =
    forAll(inputGen) { s =>
      // ASCII-only fold: the reference's strtoupper is ASCII
      // (`wordcount.c:17-22`), and non-ASCII chars are separators
      // either way.
      val lower = s.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      RefTokenizer.tokenize(s).toList == RefTokenizer.tokenize(lower).toList
    }

  property("all separator characters are interchangeable") =
    forAll(inputGen) { s =>
      // '.' and '7' are both separators under the reference classes,
      // so swapping them for spaces must not change the token stream.
      RefTokenizer.tokenize(s.replace('.', ' ').replace('7', ' '))
        .toList == RefTokenizer.tokenize(s).toList
    }
}
