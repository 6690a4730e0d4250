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

  // ---- Misra–Gries heavy-hitter sketch laws --------------------------------
  // The recall guarantee a18_heavy_hitters depends on: after any
  // partition split and any merge tree, every key with true frequency
  // > n/(k+1) survives the sketch. The generator mixes a skewed head
  // (few hot keys, geometric weights) with a uniform tail so the
  // decrement and merge-truncation branches actually fire.
  private val skewedStream: Gen[List[Long]] = for {
    nHot <- Gen.chooseNum(1, 4)
    hotReps <- Gen.listOfN(nHot, Gen.chooseNum(20, 60))
    tail <- Gen.listOf(Gen.chooseNum(100L, 200L))
  } yield {
    val hot = hotReps.zipWithIndex.flatMap { case (r, k) => List.fill(r)(k.toLong) }
    // deterministic interleave (sort by a hash of position) so hot keys
    // aren't all contiguous — adversarial for the decrement branch
    (hot ++ tail).zipWithIndex
      .sortBy { case (v, i) => (i * 2654435761L + v) % 1000003L }
      .map(_._1)
  }

  private def mgCandidates(k: Int, stream: List[Long], splitAt: Int): Seq[Long] = {
    val mg = new graft.functions.MisraGries(k)
    val parts = List(stream.take(splitAt), stream.drop(splitAt))
    val merged = parts
      .map(p => p.foldLeft(mg.zero)(mg.reduce))
      .reduce(mg.merge)
    mg.finish(merged)
  }

  property("misra-gries keeps every key above n/(k+1) across any split") =
    forAll(skewedStream, Gen.chooseNum(2, 16), Gen.chooseNum(0, 1000)) {
      (stream, k, split) =>
        val n = stream.size
        val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
        val heavy = exact.filter(_._2 > n.toLong / (k + 1)).keySet.toSet
        val cand = mgCandidates(k, stream, split % (n + 1)).toSet
        Prop(heavy.subsetOf(cand)) :| s"lost ${heavy -- cand} (n=$n k=$k)"
    }

  property("misra-gries summary never exceeds k counters") =
    forAll(skewedStream, Gen.chooseNum(2, 16), Gen.chooseNum(0, 1000)) {
      (stream, k, split) =>
        mgCandidates(k, stream, split % (stream.size + 1)).size <= k
    }
}
