package graft.ops

import org.apache.spark.sql.SparkSession

/** Concurrent submission of INDEPENDENT Spark actions — the
  * multi-tenant job-submission path (Spark's scheduler interleaves
  * jobs arriving from separate threads; nothing is shared but
  * immutable parent frames). Used where one operator fans out m
  * independent builds (PQ subspace trainings, the span index's three
  * table writes) that would otherwise serialize m fixed per-job
  * overheads through the single caller thread.
  *
  * Deliberately NOT `ExecutionContext.Implicits.global` (r19 ADVICE):
  * blocking on Spark actions inside the shared fork-join pool can
  * starve every other global-EC user in the JVM if operators nest or
  * run beside one another. Each call gets its own short-lived fixed
  * pool of daemon threads, sized to the job count (capped), torn down
  * in a finally.
  *
  * Failure containment: all jobs of one call run under a shared
  * Spark JOB GROUP; the first failure cancels the group, so sibling
  * jobs stop consuming cluster resources while the error propagates
  * to the caller (previously siblings ran to completion under a
  * caller that had already unwound). The await is BOUNDED — a hung
  * executor surfaces as a loud timeout instead of a silent forever-
  * wait — at a ceiling far above any legitimate job in this engine.
  */
object Jobs {

  private val MaxThreads = 8
  private val AwaitMinutes = 120L

  /** Run `jobs` concurrently, returning results in input order.
    * Rethrows the first failure after cancelling the group's
    * still-running siblings.
    */
  def runConcurrently[A](spark: SparkSession, jobs: Seq[() => A]): Seq[A] = {
    if (jobs.isEmpty) return Seq.empty
    if (jobs.size == 1) return Seq(jobs.head())
    val sc = spark.sparkContext
    val group = s"graft-concurrent-${java.util.UUID.randomUUID().toString.take(8)}"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(jobs.size, MaxThreads),
      (r: Runnable) => { val t = new Thread(r, group); t.setDaemon(true); t })
    implicit val ec: scala.concurrent.ExecutionContextExecutorService =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val futs = jobs.map { j =>
        scala.concurrent.Future {
          // job-group membership is thread-local: set it per task (pool
          // threads are reused across futures), clear on the way out
          sc.setJobGroup(group, "graft concurrent build", interruptOnCancel = true)
          try scala.concurrent.blocking { j() }
          catch { case e: Throwable => sc.cancelJobGroup(group); throw e }
          finally sc.clearJobGroup()
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration(AwaitMinutes, "min"))
    } finally {
      pool.shutdownNow()
      ()
    }
  }
}
