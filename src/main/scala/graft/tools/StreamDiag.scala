package graft.tools

import java.lang.management.ManagementFactory

/** JVM-level diagnostics for the streaming-harness bimodality hunt
  * (VERDICT r10 item 2): a whole Bench JVM occasionally lands in a slow
  * mode for ONE stream query (events_enriched_stream min-of-3 27.0 s vs
  * 3.7-4.4 s across fresh JVMs) while batch controls in the same run stay
  * flat, and isolated/paired probes never reproduce it. The suspects are
  * all JVM-lifetime accumulation effects, so this helper snapshots the
  * three candidate mechanisms around every bench query:
  *
  *   - loaded HDFSBackedStateStoreProvider count (each keeps its full
  *     version map on heap until maintenance unloads it — ~22 sequential
  *     stream queries x 32 partitions x >=1 stateful operator can strand
  *     hundreds of providers between queries),
  *   - the state-store maintenance task/thread-pool state,
  *   - driver GC time and heap occupancy (a bloated old gen turns the
  *     micro-batch-per-rep driver hot path into a full-GC treadmill —
  *     streaming pays disproportionately because each micro-batch
  *     re-plans on the driver),
  *   - stranded temp checkpoint directories under java.io.tmpdir.
  *
  * The provider map and maintenance internals are private[sql]/private in
  * Spark, so reads go through reflection against the StateStore singleton
  * — read-only except [[unloadProviders]], which calls the public-bytecode
  * `unloadAll()` (the same call executors make on deactivation); between
  * bench queries no stream is active, so unloading is always safe and the
  * next query reloads lazily.
  */
object StreamDiag {

  private val stateStoreModule: Option[AnyRef] =
    try {
      val cls = Class.forName(
        "org.apache.spark.sql.execution.streaming.state.StateStore$")
      Some(cls.getField("MODULE$").get(null))
    } catch { case _: Throwable => None }

  /** Count of state-store providers currently held by this JVM's
    * StateStore singleton (each pins its state versions on heap). */
  def loadedProviderCount: Int =
    stateStoreModule.flatMap { m =>
      try {
        val f = m.getClass.getDeclaredField("loadedProviders")
        f.setAccessible(true)
        val map = f.get(m).asInstanceOf[scala.collection.mutable.HashMap[_, _]]
        // diagnostic read: Spark guards this map with `loadedProviders
        // .synchronized`, so lock the map itself for a consistent size
        Some(map.synchronized(map.size))
      } catch { case _: Throwable => None }
    }.getOrElse(-1)

  /** Whether the state-store maintenance task thread is alive. */
  def maintenanceRunning: Boolean =
    stateStoreModule.exists { m =>
      try m.getClass.getMethod("isMaintenanceRunning").invoke(m)
        .asInstanceOf[Boolean]
      catch { case _: Throwable => false }
    }

  /** Live threads whose name marks them as state-store maintenance. */
  def maintenanceThreadCount: Int = {
    val root = {
      var g = Thread.currentThread().getThreadGroup
      while (g.getParent != null) g = g.getParent
      g
    }
    val buf = new Array[Thread](root.activeCount() + 64)
    val n = root.enumerate(buf, true)
    buf.take(n).count(t => t != null &&
      t.getName.toLowerCase.contains("state-store-maintenance"))
  }

  /** Cumulative GC wall millis across all collectors since JVM start. */
  def gcMillis: Long =
    ManagementFactory.getGarbageCollectorMXBeans
      .toArray.map(_.asInstanceOf[java.lang.management.GarbageCollectorMXBean]
        .getCollectionTime.max(0L)).sum

  /** Used heap in MB. */
  def heapUsedMb: Long =
    ManagementFactory.getMemoryMXBean.getHeapMemoryUsage.getUsed >> 20

  /** Temp streaming-checkpoint dirs stranded under java.io.tmpdir
    * (StreamingQueryManager names them "temporary-<uuid>"; a clean stop
    * deletes them, so growth here means stop-path cleanup is failing). */
  def tempCheckpointDirs: Int =
    try {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir", "/tmp"))
      val ls = tmp.listFiles()
      if (ls == null) -1
      else ls.count(f => f.isDirectory && f.getName.startsWith("temporary-"))
    } catch { case _: Throwable => -1 }

  /** Unload every cached state-store provider (reflective call to
    * StateStore.unloadAll()). Safe whenever no stream query is active;
    * returns the number of providers that were loaded beforehand. */
  def unloadProviders(): Int = {
    val before = loadedProviderCount
    if (before > 0) stateStoreModule.foreach { m =>
      try m.getClass.getMethod("unloadAll").invoke(m)
      catch { case _: Throwable => () }
    }
    before
  }

  /** One compact key=value diagnostics line (no JSON — bench stdout must
    * stay reserved for the driver-parsed summary; this goes to stderr). */
  def snapshotLine(tag: String, extra: String = ""): String = {
    val sb = new StringBuilder("[diag] ")
    sb.append(tag)
      .append(" providers=").append(loadedProviderCount)
      .append(" maint=").append(if (maintenanceRunning) 1 else 0)
      .append(" maintThreads=").append(maintenanceThreadCount)
      .append(" gcMs=").append(gcMillis)
      .append(" heapMb=").append(heapUsedMb)
      .append(" tmpCkpt=").append(tempCheckpointDirs)
    if (extra.nonEmpty) sb.append(' ').append(extra)
    sb.toString
  }
}
