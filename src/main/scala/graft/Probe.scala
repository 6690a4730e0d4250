package graft

// TEMPORARY instrumentation main for optimization round 20 — not part
// of the product surface; deleted before round close.
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream

object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm up JVM/parquet
    Tables.documents(spark, sfDir).write.format("noop").mode("overwrite").save()

    (1 to 2).foreach { pass =>
      System.err.println(s"[probe] ===== pass $pass =====")
      val s = spark
      val docs = t("docs select")(Tables.documents(s, sfDir).select(col("doc_id"), col("text")))
      val modelDir = graft.ops.Sink.scratchDir(s"probe_model_$pass")
      val words = t("wordFreqs cache")(graft.ops.Sink.cachedEager(
        graft.ext.Bpe.wordFreqs(Tables.documents(s, sfDir), "text")))
      t("trainVocab+writeModel") {
        graft.ext.Unigram.writeModel(s,
          graft.ext.Unigram.trainVocab(words, ExtQueries.UnigramRounds,
            ExtQueries.UnigramPieceLen, ExtQueries.UnigramBudget), modelDir)
      }
      words.unpersist(blocking = false)
      val model = t("readModel")(graft.ext.Unigram.readModel(s, modelDir))
      val in = graft.ops.Sink.scratchDir(s"probe_in_$pass")
      val out = graft.ops.Sink.scratchDir(s"probe_out_$pass")
      val ck = graft.ops.Sink.scratchDir(s"probe_ck_$pass")
      t("stage docs")(docs.coalesce(4).write.mode("overwrite").parquet(in))
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = t("start") {
        stream
          .select(col("doc_id"),
            graft.ext.Unigram.tokenizeCounts(
              col("text"), model, ExtQueries.UnigramPieceLen).as("tc"))
          .select(col("doc_id"), col("tc.n_tokens").as("n_tokens"),
            col("tc.n_pieces").as("n_pieces"))
          .filter(col("n_tokens") > 0)
          .writeStream
          .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
            EventStream.writeBatchIdempotent(b, id, out))
          .option("checkpointLocation", ck)
          .outputMode(OutputMode.Append)
          .start()
      }
      t("processAllAvailable")(q.processAllAvailable())
      q.recentProgress.foreach { p =>
        System.err.println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
      }
      t("stop")(q.stop())
      t("readback")(s.read.parquet(out).select(col("doc_id"), col("n_tokens"),
        col("n_pieces")).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
