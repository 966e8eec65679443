package graft.config

import graft.operators.Mavg

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

/** File-backed hot-reloadable value — the engine's config hot-reload
  * (reference: SIGHUP sets a reload flag, xenoeye.c:61-72; the mavg
  * thread re-reads limit files into the standby bank and swaps,
  * monit-objects-mavg.c:756-774 mavg_limits_update).
  *
  * Spark shape: no signals — a small serializable handle whose `get()`
  * re-parses the file when its mtime changes, checked at most every
  * `checkIntervalMs`. Referenced from a stateful processor or a
  * foreachBatch body it gives every micro-batch the current table
  * without restarting the query — the bank-swap becomes an atomic
  * replace in a per-JVM cache (executors share one entry per file, so
  * N tasks don't mean N parses). The file must be visible wherever the
  * consumer runs (driver for foreachBatch, shared storage for
  * executor-side use — same requirement the reference's limfile has).
  *
  * A missing file yields `default` (and starts yielding parsed content
  * if the file appears later).
  */
final class Reloadable[T](val path: String, tag: String,
                          checkIntervalMs: Long, parse: String => T,
                          default: () => T) extends Serializable {
  def get(): T =
    Reloadable.cached(path, tag, checkIntervalMs, parse, default)
      .asInstanceOf[T]
}

object Reloadable {

  private final case class Entry(nextCheckMs: Long, mtimeMs: Long,
                                 sizeB: Long, value: Any)
  private val cache = new ConcurrentHashMap[String, Entry]()

  /** Visible for tests: drop all cached entries. */
  def clearCache(): Unit = cache.clear()

  private def cached(path: String, tag: String, checkIntervalMs: Long,
                     parse: String => Any, default: () => Any): Any = {
    val key = s"$path#$tag"
    val now = System.currentTimeMillis()
    val cur = cache.get(key)
    if (cur != null && now < cur.nextCheckMs) return cur.value
    // one loader at a time per file; losers use the winner's result
    cache.compute(key, (_, old) => {
      if (old != null && now < old.nextCheckMs) old
      else {
        val p = Paths.get(path)
        // (mtime, size) pair: two writes inside filesystem timestamp
        // granularity still flip size almost always; a same-mtime
        // same-size rewrite is indistinguishable and tolerated
        val (mtime, size) =
          try {
            if (Files.exists(p))
              (Files.getLastModifiedTime(p).toMillis, Files.size(p))
            else (-1L, -1L)
          } catch { case _: java.io.IOException => (-1L, -1L) }
        if (old != null && mtime == old.mtimeMs && size == old.sizeB)
          old.copy(nextCheckMs = now + checkIntervalMs)
        else {
          // a malformed or torn-mid-write file must not kill the
          // consumer (streaming task): keep serving the previous value
          // — the reference's mavg_limits_file_load logs and keeps the
          // standby bank on any load error
          val v =
            if (mtime < 0) default()
            else
              try parse(new String(Files.readAllBytes(p),
                StandardCharsets.UTF_8))
              catch {
                case e: Exception =>
                  System.err.println(
                    s"[reloadable] $path: ${e.getMessage}; " +
                      "keeping previous value")
                  if (old != null) old.value else default()
              }
          Entry(now + checkIntervalMs, mtime, size, v)
        }
      }
    }).value
  }

  /** Per-key mavg limits CSV (reference CONFIG.md:438-469): keys are
    * the '|'-joined group-key fields, matching MavgStream's key
    * encoding. */
  def limitsCsv(path: String, nKeys: Int,
                checkIntervalMs: Long = 1000L)
      : Reloadable[Map[String, Seq[Double]]] =
    new Reloadable(path, s"limits$nKeys", checkIntervalMs,
      text => Mavg.parseLimitsCsv(text, nKeys)
        .map { case (k, v) => k.mkString("|") -> v },
      () => Map.empty[String, Seq[Double]])
}
