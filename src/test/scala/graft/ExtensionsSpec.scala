package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The native functions must be reachable from pure SQL when the
  * extension is installed (SQL-first users; the DataFrame API never
  * needs it).
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // live-session route (getOrCreate ignores withExtensions once a
    // session exists, so the registrar is the reliable path)
    val s = TestSpark.spark
    GraftExtensions.register(s)
    s
  }

  test("graft_dot and graft_simhash32 are callable from SQL") {
    val dot = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").collect().head.getDouble(0)
    assert(dot == 11.0)
    val sh = spark.sql(
      "SELECT graft_simhash32(array(CAST(5 AS BIGINT))) AS s").collect().head.getLong(0)
    assert(sh == 5L) // single token: its low bits vote directly
  }

  test("graft_nfc_normalize composes decomposed accents from SQL") {
    val r = spark.sql(
      "SELECT graft_nfc_normalize('cafe\\u0301') AS n, length(graft_nfc_normalize('cafe\\u0301')) AS l")
      .collect().head
    assert(r.getString(0) == "caf\u00e9" && r.getInt(1) == 4)
  }

  test("graft_synth_gray_png + graft_image_stats round-trip from SQL") {
    val r = spark.sql(
      "SELECT graft_image_stats(graft_synth_gray_png(CAST(7 AS BIGINT), 8, 8)) AS st")
      .selectExpr("st.img_w", "st.img_h", "st.px_sum").collect().head
    val px = (0 until 64).map(i => graft.functions.ImageCodec.pixel(7L, i.toLong).toLong)
    assert(r.getLong(0) == 8L && r.getLong(1) == 8L && r.getLong(2) == px.sum)
    // corrupt payload -> null struct, not an error
    val bad = spark.sql("SELECT graft_image_stats(CAST('nope' AS BINARY)) AS st").collect().head
    assert(bad.isNullAt(0))
  }

  test("audio and video codec functions round-trip from SQL") {
    val wav = spark.sql(
      "SELECT graft_wav_stats(graft_synth_pcm_wav(CAST(9 AS BIGINT), 16)) AS st")
      .selectExpr("st.n_samples", "st.amp_sum").collect().head
    val samples = (0 until 16).map(i => graft.functions.AudioCodec.sample(9L, i.toLong).toLong)
    assert(wav.getLong(0) == 16L && wav.getLong(1) == samples.sum)
    val gif = spark.sql(
      "SELECT graft_gif_frame_stats(graft_synth_gif_anim(CAST(9 AS BIGINT), 4, 4, 3)) AS st")
      .selectExpr("st.n_frames", "st.frame_idx", "st.px_sum").collect().head
    val mid = (0 until 16).map(i => graft.functions.VideoCodec.pixel(9L, 1, i.toLong).toLong)
    assert(gif.getLong(0) == 3L && gif.getLong(1) == 1L && gif.getLong(2) == mid.sum)
  }

  test("graft_minhash_sig returns H minima consistent with the Scala constants") {
    val row = spark.sql(
      "SELECT graft_minhash_sig(array(CAST(7 AS BIGINT), CAST(11 AS BIGINT))) AS sig")
      .collect().head.getSeq[Long](0)
    import graft.ext.MinHash._
    val expected = (0 until NumHashes).map { i =>
      Seq(7L, 11L).map(m => (aConst(i) * m + bConst(i)) % P).min
    }
    assert(row == expected)
  }
}
