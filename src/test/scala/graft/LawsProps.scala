package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.ops.Ingest
import graft.ext.MinHash

/** ScalaCheck properties for the pure (non-Spark) kernels —
  * SURVEY §5.2 item 4.
  */
object LawsProps extends Properties("graft.laws") {

  private val header: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '/', '_', '-')))
      .map(_.mkString)

  property("normalizeName is idempotent") = forAll(header) { s =>
    val once = Ingest.normalizeName(s)
    Ingest.normalizeName(once) == once
  }

  property("normalizeName output has no spaces, slashes, or uppercase") =
    forAll(header) { s =>
      val n = Ingest.normalizeName(s)
      !n.contains(' ') && !n.contains('/') && n == n.toLowerCase
    }

  property("minhash affine constants stay in (0, P) for any index") =
    forAll(Gen.chooseNum(0, 10000)) { i =>
      val a = MinHash.aConst(i)
      val b = MinHash.bConst(i)
      a > 0 && a < MinHash.P && b >= 0 && b < MinHash.P
    }

  property("affine permutation maps [0,P) into [0,P) without overflow") =
    forAll(Gen.chooseNum(0L, MinHash.P - 1), Gen.chooseNum(0, MinHash.NumHashes - 1)) {
      (m, i) =>
        val v = (MinHash.aConst(i) * m + MinHash.bConst(i)) % MinHash.P
        v >= 0 && v < MinHash.P
    }
}
