package graft

import org.apache.spark.sql.SparkSession

/** Registry of every in-memory artifact cache (the stamp-keyed maps in
  * LlmOps/Clusters/Relational — see the ARTIFACT-CACHE CONTRACT at
  * LlmOps.sigCache). Exists for one reason: deterministic COLD-START
  * planning. A warm, materialized cache legitimately plans with fewer
  * exchanges than a cold one (InMemoryTableScan exposes its build-side
  * partitioning only once built), so anything that pins plan shapes —
  * PlanSnapshot generation and PlanSnapshotSpec — must first restore
  * the cold state or its signatures depend on which suites ran before
  * it in the JVM. */
object ArtifactCaches {

  private val maps =
    scala.collection.mutable.ListBuffer[java.util.Map[_, _]]()

  /** Called once per cache at class-init (thread-safe). */
  def register[M <: java.util.Map[_, _]](m: M): M = {
    maps.synchronized { maps += m }
    m
  }

  /** Drop every registered in-memory artifact and unpersist all cached
    * plans — cold-start planning state. Artifacts rebuild lazily on
    * next use; correctness is unaffected (they are pure derivations). */
  def reset(s: SparkSession): Unit = {
    maps.synchronized { maps.foreach(_.clear()) }
    s.sharedState.cacheManager.clearCache()
  }
}
