package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the pure parsing helpers (the reference's two
  * unit-tested scalar functions, HandlerTest.java:35-46, generalized).
  */
object ParsingProps extends Properties("Parsing") {

  private val genName: Gen[String] = Gen.identifier

  property("streamNameFromArn extracts the name from well-formed ARNs") =
    forAll(genName, genName, Gen.choose(0L, 999999999999L)) { (stream, consumer, acct) =>
      val arn = s"arn:aws:kinesis:us-east-1:$acct:stream/$stream/consumer/$consumer:84356"
      Parsing.streamNameFromArn(arn).contains(stream)
    }

  property("streamNameFromArn is total (no throw) on arbitrary strings") =
    forAll { (s: String) =>
      Parsing.streamNameFromArn(s)
      true
    }

  property("sequenceOrderKey orders numeric strings like their values") =
    forAll(Gen.choose(0L, Long.MaxValue), Gen.choose(0L, Long.MaxValue)) { (a, b) =>
      val (ka, kb) = (Parsing.sequenceOrderKey(a.toString), Parsing.sequenceOrderKey(b.toString))
      Ordering[(Int, String)].compare(ka, kb).sign == a.compare(b).sign
    }

  property("rollingHashes: every window hash equals polyHash of that substring") =
    forAll(Gen.alphaNumStr, Gen.choose(1, 12)) { (s, w) =>
      val hs = TextHash.rollingHashes(s, w)
      (s.length < w && hs.isEmpty) ||
        (hs.length == s.length - w + 1 &&
          hs.zipWithIndex.forall { case (h, i) => h == TextHash.polyHash(s.substring(i, i + w)) })
    }

  property("jaccard ∈ [0,1], symmetric, 1 on identical sets") =
    forAll { (a: Set[Int], b: Set[Int]) =>
      val j = Parsing.jaccard(a, b)
      j >= 0.0 && j <= 1.0 && j == Parsing.jaccard(b, a) && Parsing.jaccard(a, a) == 1.0
    }
}
