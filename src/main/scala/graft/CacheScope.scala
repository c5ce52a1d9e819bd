package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Pipeline-scoped cache registry.
  *
  * Query builders in this engine sometimes persist() an intermediate
  * that several downstream joins reference, or cut lineage with an
  * eager localCheckpoint. Both leave executor blocks alive after the
  * query's terminal action: `spark.catalog.clearCache()` evicts SQL
  * InMemoryRelations but NOT RDD-level checkpoint blocks, and a
  * builder cannot unpersist its own intermediate because the plan it
  * returns (lazily) still references it.
  *
  * The contract here: builders register every persist/checkpoint via
  * [[persisted]] / [[checkpointed]] / [[trackRddsOf]]; harness code
  * (Verify, Bench, specs) calls [[releaseAll]] AFTER consuming a
  * query's result. Releasing is safe at that point because nothing
  * re-reads the plan; releasing a block an unconsumed plan still needs
  * would force recomputation (persist) or fail (checkpoint), so the
  * call sites are strictly post-terminal-action.
  *
  * Thread-safety: the queue is concurrent, but release is meant to
  * run between queries on the harness thread, not concurrently with
  * an executing query.
  */
object CacheScope {

  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** persist() MEMORY_AND_DISK + register the handle for release. */
  def persisted(df: DataFrame): DataFrame = {
    val p = df.persist()
    tracked.add(() => { p.unpersist(false); () })
    p
  }

  /** Eager localCheckpoint + register its RDD blocks for release.
    * (On a multi-node cluster prefer reliable checkpoint(dir) at the
    * same seams — localCheckpoint blocks die with their executor.) */
  def checkpointed(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint(true)
    trackRddsOf(c)
    c
  }

  /** Register the checkpoint RDDs referenced by an already-built
    * DataFrame (e.g. the final round of an iterative loop). */
  def trackRddsOf(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }
      .foreach { r => tracked.add(() => { r.unpersist(false); () }) }

  /** Unpersist every registered cache/checkpoint block. Call after the
    * consuming action; idempotent; never throws. */
  def releaseAll(): Unit = {
    var f = tracked.poll()
    while (f != null) {
      try f() catch { case _: Throwable => () }
      f = tracked.poll()
    }
  }
}
