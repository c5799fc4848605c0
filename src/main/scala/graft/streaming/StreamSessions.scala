package graft.streaming

import org.apache.spark.sql.SparkSession

/** Child-session factory for the streaming faces that size their
  * state-store partition count (`spark.sql.shuffle.partitions`) to the
  * state, not to the session's batch shuffle width.
  *
  * A streaming query snapshots SQL conf from ITS DataFrame's session at
  * `start()` (StreamExecution clones that session), so building the whole
  * stream pipeline on a child session makes the sizing a property of the
  * query instead of a temporary mutation of the shared session — the old
  * set/finally-restore pattern left a window where any query planned
  * concurrently on the same session saw the streaming value. The child
  * shares the SparkContext (and therefore builder-time conf: UTC session
  * TZ, openCostInBytes, the graft extensions are re-applied per session);
  * runtime conf set on the PARENT after startup is not inherited, so
  * per-site knobs (e.g. nanosAsLong) are set on the child explicitly.
  */
private[streaming] object StreamSessions {

  /** A fresh session on the same context with its own shuffle-partition
    * setting; the parent's conf is never touched. */
  def withShuffle(spark: SparkSession, partitions: Int): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    ss
  }
}
