package graft

import org.apache.spark.sql.functions._

import graft.ext.TextOps

/** Laws for the HTML main-content extraction operator (the corpus
  * chain's front stage): the wrap/extract round trip, the density
  * filter on real boilerplate shapes, and the entity decode order.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h")
      .select(TextOps.htmlMainContent(col("h")).as("c"))
      .as[String].collect().head

  test("extraction ∘ wrap recovers the decoded tagline + body, nothing else") {
    val body = "some plain markup free document body with enough text"
    val wrapped = Seq((7L, body)).toDF("doc_id", "text")
      .select(TextOps.htmlWrap(col("doc_id"), col("text")).as("h"))
      .as[String].collect().head
    // the chrome is really there pre-extraction …
    assert(wrapped.contains("<nav>") && wrapped.contains("<script>") &&
      wrapped.contains("<footer>"), wrapped)
    // … and gone after: exactly the decoded tagline + the body
    assert(extract(wrapped) == "doc \"d7\" & its body: " + body)
  }

  test("extraction is identity (mod whitespace collapse) on markup-free text") {
    val t = "plain   text with\n no  markup at all"
    assert(extract(t) == "plain text with no markup at all")
  }

  test("density filter drops link lists and keeps prose with inline tags") {
    val page =
      "<body><ul><li><a href=\"/a\">alpha</a></li><li><a href=\"/b\">beta</a></li></ul>" +
        "<p>This paragraph keeps its <b>bold</b> and <a href=\"/x\">linked</a> words " +
        "because text dominates the markup by a wide margin here.</p></body>"
    assert(extract(page) ==
      "This paragraph keeps its bold and linked words " +
        "because text dominates the markup by a wide margin here.")
  }

  test("script, style, head, and comments are dropped even when text-dense") {
    val page = "<html><head><title>very texty title words</title></head><body>" +
      "<script>entirely textual looking script body with many words</script>" +
      "<style>.c{color:red}</style><!-- a very wordy comment indeed -->" +
      "<p>kept</p></body></html>"
    assert(extract(page) == "kept")
  }

  test("entities decode in spec order (&amp; last, no double-decode)") {
    // &amp;lt; must become the literal text "&lt;", NOT "<"
    val page = "<p>a &lt;tag&gt; &quot;q&quot; it&#39;s x&nbsp;y &amp;lt; &amp; done</p>"
    assert(extract(page) == "a <tag> \"q\" it's x y &lt; & done")
  }

  test("blank and markup-only blocks vanish") {
    assert(extract("<div>   </div><p></p><br/><div><img src=\"x\"/></div>") == "")
  }
}
