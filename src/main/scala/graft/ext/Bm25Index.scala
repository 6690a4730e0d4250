package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Aggregates

/** Saved inverted-index lifecycle for BM25 retrieval — the retrieval
  * family's member of the standing-artifact pattern (`AnnIndex` for
  * IVF/SQ8/PQ, `MinHash.writeBands` for LSH, `Similarity
  * .writeKnnGraph` for the mutual-kNN graph): tokenize the corpus
  * ONCE at build time, score against the saved postings many times.
  *
  * The index is exactly TWO append-only tables of mergeable rows:
  *
  *   - `postings/`: one (word, doc_id, tf) row per distinct
  *     (word, doc) — the classic posting list;
  *   - `doclen/`: one (doc_id, dl) row per document.
  *
  * Every BM25 statistic derives from these by aggregation — df(word)
  * is a postings count, N and avgdl are doclen aggregates — so an
  * APPEND is a bare parquet append of the delta's rows: no rewrite,
  * no read-modify-write, O(|delta|) work, and append ≡ rebuild
  * bit-for-bit because the scoring stats are recomputed from the
  * merged tables at probe time (BM25 scores of EXISTING docs change
  * when N/df/avgdl grow — any design that freezes scores at build
  * time cannot be exact under append; deriving stats at probe makes
  * exactness structural). ExtSpec pins the append law; the registered
  * probes share `e5_bm25`'s DuckDB oracle verbatim.
  *
  * At 100 TB: the probe never touches document text — the tokenize +
  * explode pass (the corpus-scan cost) is paid once at build. Probe
  * cost is word-cardinality-sized aggregates plus a postings scan
  * semi-reduced by the broadcast query-term list; a deployment
  * bucket-lays postings by word (s18) to make that scan partition-
  * prunable. Scoring arithmetic is [[Retrieval.bm25FromTf]]'s chain
  * unchanged, so saved-vs-in-query parity is by construction.
  */
object Bm25Index {

  private def postingsPath(ix: String) = s"$ix/postings"
  private def doclenPath(ix: String) = s"$ix/doclen"

  private def derive(docs: DataFrame, idCol: String, textCol: String) = {
    val tf = Retrieval.tokenFrequencies(docs, idCol, textCol)
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    (tf, dl)
  }

  /** Build the index from scratch (overwrite). */
  def write(docs: DataFrame, idCol: String, textCol: String, ix: String): Unit = {
    val (tf, dl) = derive(docs, idCol, textCol)
    tf.write.mode("overwrite").parquet(postingsPath(ix))
    dl.write.mode("overwrite").parquet(doclenPath(ix))
  }

  /** Append a delta corpus: the delta's postings and doc lengths land
    * as new parquet files beside the existing segments. Callers own
    * the key contract (a doc_id appears in at most one append —
    * re-sending a document would double its postings, as in any
    * log-structured index; upsert needs a compaction pass).
    */
  def append(docs: DataFrame, idCol: String, textCol: String, ix: String): Unit = {
    val (tf, dl) = derive(docs, idCol, textCol)
    tf.write.mode("append").parquet(postingsPath(ix))
    dl.write.mode("append").parquet(doclenPath(ix))
  }

  /** Score the corpus against the saved index for the top
    * `nTerms` highest-df non-stopword terms (the e5_bm25 query-term
    * rule), returning the global top `k` docs. Touches ONLY the index
    * tables — no document text, no tokenization.
    */
  def probe(
      spark: SparkSession,
      ix: String,
      stopWords: Seq[String],
      nTerms: Int,
      k: Int): DataFrame = {
    val tf = spark.read.parquet(postingsPath(ix))
    val dl = spark.read.parquet(doclenPath(ix))
    val dfW = tf.groupBy(col("word")).agg(count(lit(1)).as("dfq"))
      .filter(!col("word").isin(stopWords: _*))
    val qt = Retrieval.rankTopK(dfW, "word", "dfq", nTerms)
    Retrieval.rankTopK(
      Retrieval.bm25FromTfWithDl(tf, dl, "doc_id", qt), "doc_id", "score", k)
  }
}
