package graft.operators

import org.apache.spark.sql.DataFrame

/** Cache discipline shared by operators whose plans fan a frame into
  * several branches (self-joins, candidate+verify phases).
  */
private[graft] object CacheOps {

  /** Persist a shared frame and materialize it SYNCHRONOUSLY, before
    * any dependent branch is built. When two consumer stages of one job
    * race to fill the same un-materialized cache (e.g. both sides of a
    * self-join), tasks convoy on the per-partition block locks — the
    * same query measured 2.8 s or 16 s per JVM depending on which
    * stage-submission order the scheduler picked. One up-front pass
    * makes the cache warm and the plan deterministic; callers release
    * through materializeAndRelease. */
  def shared(df: DataFrame): DataFrame = {
    val p = df.persist()
    p.count()
    p
  }

  /** Materialize the (small) result eagerly, then release the persisted
    * inputs. Without this the cached frames outlive the call and a
    * long-lived session (REPL, repeated pipeline runs) accumulates
    * cache until memory pressure. localCheckpoint keeps the
    * materialized blocks owned by the ContextCleaner, so they free when
    * the returned frame is GC'd. Unpersist is blocking: async cleanup
    * would race the caller's next job and bill this operator's cleanup
    * to whatever runs next. */
  def materializeAndRelease(result: DataFrame, cached: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(true)
    cached.foreach(_.unpersist(true))
    out
  }
}
