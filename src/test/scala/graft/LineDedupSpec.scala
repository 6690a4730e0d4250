package graft

import org.apache.spark.sql.functions._

import graft.ext.TextOps

/** Laws for repeated-line removal (RefinedWeb-style line-wise
  * filtering): first-occurrence semantics against a brute force,
  * idempotence, and the page-wrap fixture's exact drop count.
  */
class LineDedupSpec extends SparkSpec {

  import spark.implicits._

  private def run(pages: Seq[String]): Seq[(Long, Long, String)] =
    pages.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "page")
      .select(col("id"), TextOps.dedupLines(col("page")).as("dd"))
      .orderBy(col("id"))
      .select(col("dd.n_lines"), col("dd.n_dupes"), col("dd.clean"))
      .as[(Long, Long, String)].collect().toSeq

  private def brute(page: String): String = {
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    page.split("\n", -1).foreach(seen += _)
    seen.mkString("\n")
  }

  test("dedupLines ≡ brute-force keep-first on seeded random multi-line pages") {
    val rnd = new scala.util.Random(7)
    val vocabLines = Seq("alpha beta", "gamma", "delta eps", "zeta", "eta theta")
    val pages = (0 until 40).map { _ =>
      (0 until 3 + rnd.nextInt(12))
        .map(_ => vocabLines(rnd.nextInt(vocabLines.size))).mkString("\n")
    }
    val got = run(pages)
    pages.zip(got).foreach { case (p, (nLines, nDupes, clean)) =>
      assert(clean == brute(p), s"page '$p'")
      assert(nLines == p.split("\n", -1).length.toLong)
      assert(nDupes == nLines - clean.split("\n", -1).length.toLong)
    }
    assert(got.exists(_._2 > 0), "law not vacuous: some page had repeats")
  }

  test("dedupLines is idempotent and order-preserving") {
    val page = "b\na\nb\nc\na\nd"
    val Seq((_, _, once)) = run(Seq(page))
    assert(once == "b\na\nc\nd") // first occurrences, original order
    val Seq((_, dupes2, twice)) = run(Seq(once))
    assert(twice == once && dupes2 == 0L)
  }

  test("page wrap drops exactly the boilerplate repeats (nav ×3, footer ×2)") {
    // unique content words per line position so no content line can
    // collide with another or with the boilerplate
    val docs = Seq((7L, (1 to 20).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = docs.select(
      TextOps.dedupLines(TextOps.pageWrapLines(col("doc_id"), col("text"))).as("dd"))
      .select(col("dd.n_lines"), col("dd.n_dupes"), col("dd.clean"))
      .as[(Long, Long, String)].head()
    // 20 tokens -> 3 content lines; page = [nav, hdr] ++ 3 ++ [nav, ftr, nav, ftr]
    assert(out._1 == 9L)
    assert(out._2 == 3L, s"nav repeats x2 + footer repeat x1: $out")
    val lines = out._3.split("\n").toSeq
    assert(lines.head == "home | tags | about | feed")
    assert(lines(1) == "doc 7 - reader view")
    assert(lines.last == "copyright example corp")
    assert(lines.size == 6)
  }
}
