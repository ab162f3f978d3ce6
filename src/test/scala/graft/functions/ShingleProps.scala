package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the shingle/minhash kernels (pure JVM — no Spark
  * session needed).
  */
object ShingleProps extends Properties("ShingleOps") {

  private val word: Gen[String] = Gen.choose(1, 6)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val text: Gen[String] = Gen.choose(0, 30)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  private def shingleSeq(s: String, n: Int): Seq[String] = {
    val arr = ShingleOps.shingles(UTF8String.fromString(s), n)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  property("count = distinct of (tokens - n + 1) windows") = forAll(text) { s =>
    val toks = s.split(" ", -1)
    val expected = if (toks.length < 4) Seq.empty
      else (0 to toks.length - 4).map(i => toks.slice(i, i + 4).mkString(" ")).distinct
    shingleSeq(s, 4) == expected
  }

  property("every shingle has exactly n tokens") = forAll(text) { s =>
    shingleSeq(s, 3).forall(_.split(" ", -1).length == 3)
  }

  property("minhash sigs are 8 lowercase-hex chars and permutation-invariant") =
    forAll(Gen.nonEmptyListOf(word)) { ws =>
      def sigsOf(xs: Seq[String]): Seq[String] = {
        val arr = ShingleOps.minhashSigs(ArrayData.toArrayData(
          xs.map(UTF8String.fromString).toArray))
        (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
      }
      val a = sigsOf(ws)
      val b = sigsOf(scala.util.Random.shuffle(ws))
      a == b && a.length == 8 && a.forall(_.matches("[0-9a-f]{8}"))
    }

  property("minhash of a superset is elementwise <= (min monotonicity)") =
    forAll(Gen.nonEmptyListOf(word), Gen.nonEmptyListOf(word)) { (xs, ys) =>
      def sigsOf(zs: Seq[String]): Seq[String] = {
        val arr = ShingleOps.minhashSigs(ArrayData.toArrayData(
          zs.map(UTF8String.fromString).toArray))
        (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
      }
      sigsOf(xs ++ ys).zip(sigsOf(xs)).forall { case (sup, sub) => sup <= sub }
    }
}
