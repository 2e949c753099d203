package graft.streaming

import org.apache.spark.SparkContext

/** Memo for the replay harnesses' collected fixture slices. Every
  * replay query derives a BOUNDED, deterministic change log from the
  * fixture tables and collects it to feed a MemoryStream; without a
  * memo each bench pass re-runs that collect as a driver job on the
  * busy shared pool — pure fixture plumbing, not the operator under
  * measurement. Keyed by (context, query:dir) like the state-table
  * memos; entries are the already-bounded slices (q177's recipe), so
  * the cache holds kilobytes. */
private[streaming] object SliceCache {
  private val m = new java.util.concurrent.ConcurrentHashMap[
    (SparkContext, String), Seq[_]]()
  def memo[T](sc: SparkContext, key: String)(f: => Seq[T]): Seq[T] =
    m.computeIfAbsent((sc, key), _ => f).asInstanceOf[Seq[T]]
}
