package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared persist-point cache machinery: every materialized pipeline
  * stage (dedup LSH candidates, tf frames) is cached per corpus so
  * sibling operators share ONE build — but bounded, identity-stamped
  * and explicitly invalidatable, because a long-lived session iterating
  * over many corpora/thresholds must not pin checkpointed blocks
  * forever, and an in-place overwrite of the same file NAMES must not
  * serve a stale frame.
  */
private[graft] object Caching {

  /** LRU-bounded cache (access-ordered). By default evicted values
    * are simply dropped: localCheckpoint blocks are reclaimed by
    * Spark's ContextCleaner once the last DataFrame reference is
    * unreachable, so eviction == eventual executor-storage release
    * without an explicit unpersist (which would race in-flight
    * readers). Values holding NON-GC-tracked resources (an on-disk
    * index dir) pass `onEvict` to reclaim them — with the stated
    * caveat that an in-flight reader of a just-evicted value loses it
    * (same hazard class as unpersist; acceptable for dev-harness
    * caches, the production analogue is a storage-layer TTL).
    *
    * The value builder runs OUTSIDE the map lock, so a multi-second
    * build (eager Spark jobs) never blocks hits on other keys; two
    * racing builders of the SAME key both build and the loser's value
    * is discarded (evicted) — wasted work, never a wrong result.
    */
  final class BoundedCache[K, V](maxEntries: Int, onEvict: V => Unit = (_: V) => ()) {
    private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
        if (size() > maxEntries) { onEvict(e.getValue); true } else false
    }
    def getOrElseUpdate(k: K)(v: => V): V = {
      map.synchronized {
        val hit = map.get(k)
        if (hit != null) return hit
      }
      val built = v
      map.synchronized {
        val winner = map.get(k)
        if (winner != null) { onEvict(built); winner }
        else { map.put(k, built); built }
      }
    }
    def clear(): Unit = map.synchronized {
      map.values.forEach(v => onEvict(v))
      map.clear()
    }
    def size: Int = map.synchronized(map.size())
  }

  /** Content identity of a bare-scan frame: every input file with its
    * length and mtime — so rewriting a corpus IN PLACE (same names,
    * new bytes) changes the stamp and misses the cache instead of
    * serving a checkpoint of the old bytes. Empty when the frame has
    * no input files (synthetic/in-memory — uncacheable). One driver-side
    * stat per input file: bare table scans have few files per corpus,
    * and the stat cost is nanoseconds against a pipeline build.
    */
  def stamp(df: DataFrame): String = {
    val files = df.inputFiles.sorted
    if (files.isEmpty) ""
    else {
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val st = p.getFileSystem(conf).getFileStatus(p)
        s"$f:${st.getLen}:${st.getModificationTime}"
      }.mkString(",")
    }
  }

  /** True when `df` is a bare table scan (leaf plan) — the only shape
    * with a stable identity worth caching; filtered/synthetic frames
    * get fresh un-shared builds rather than wrong cache hits. */
  def bareScan(df: DataFrame): Boolean =
    df.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LeafNode]

  /** Cache stamp for a DETERMINISTIC derived frame (projection/filter
    * over a scan — e.g. Tables.events' ts-type normalization, which
    * is not a LeafNode so [[bareScan]] rejects it): the input-file
    * stamp PLUS the canonicalized analyzed plan's semantic hash, so
    * two different derivations over the same files never share a key.
    * Callers assert determinism (a frame with rand()/uuid() would
    * wrongly hit). Empty when the frame has no input files
    * (synthetic/in-memory — uncacheable). */
  def planStamp(df: DataFrame): String = {
    val s = stamp(df)
    if (s.isEmpty) ""
    else s + "#" + df.queryExecution.analyzed.canonicalized.semanticHash()
  }
}
