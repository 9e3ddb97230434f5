package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe partition-directory rewrites for path-based ledgers — the
  * [[Publish]] manifest discipline generalized: a caller stages
  * rewritten partition dirs under `.swap-tmp/<rel>`, then [[commit]]
  * writes a `_swapping` marker recording, per affected dir, whether it
  * SWAPs (staged data exists) or DROPs (every row deleted — a
  * partitioned write stages no dir for an empty partition, and
  * recording the distinction up front is what keeps recovery
  * unambiguous about a missing staged dir), and rolls the swap forward.
  * A kill at ANY point either leaves the old tree live (marker absent —
  * stale tmp deleted by [[recover]]) or is rolled FORWARD by
  * [[recover]], which every mutator runs first.
  *
  * `rel` paths are RELATIVE to `root` and may be nested
  * (`fp/ingest=x/fpb=3`); parents are created for parking as needed.
  * Used by [[graft.operators.DedupLedger.delete]] and
  * [[graft.operators.WinnowLedger.delete]]; the same shape as
  * [[graft.operators.AnnIndex]]'s delete commit. */
object PartitionSwap {

  private[graft] def tmpRoot(root: Path) = new Path(root, ".swap-tmp")
  private[graft] def oldRoot(root: Path) = new Path(root, ".swap-old")
  private[graft] def marker(root: Path) = new Path(root, "_swapping")

  /** Decode the URI percent-escapes `input_file_name()` applies on top
    * of the ON-DISK name (a space reads back as `%20`, and a
    * Hive-escaped dir like `ingest=GSE0%3AVCF` double-encodes to
    * `ingest=GSE0%253AVCF`) — one decode recovers the exact directory
    * name. NOT `URLDecoder.decode`: that would also turn a literal `+`
    * into a space, which file URIs never encode. Multi-byte UTF-8
    * escape runs decode as one character. */
  private[graft] def percentDecode(s: String): String = {
    def hex(c: Char) = Character.digit(c, 16)
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hex(s.charAt(i + 1)) >= 0 && hex(s.charAt(i + 2)) >= 0) {
        out.write(hex(s.charAt(i + 1)) * 16 + hex(s.charAt(i + 2)))
        i += 3
      } else {
        val bytes = String.valueOf(c).getBytes("UTF-8")
        out.write(bytes, 0, bytes.length)
        i += 1
      }
    }
    new String(out.toByteArray, "UTF-8")
  }

  /** Test hook: throw after N filesystem mutations of the commit path
    * (the [[graft.operators.DedupLedger.testFailAfterSwapOps]]
    * pattern). Counter reset by [[commit]]. */
  private[graft] var testFailAfterOps: Option[Int] = None
  private val opCounter = new java.util.concurrent.atomic.AtomicInteger(0)
  private def step(): Unit = testFailAfterOps.foreach { nOps =>
    if (opCounter.incrementAndGet() > nOps)
      throw new IllegalStateException(s"test kill after $nOps swap ops")
  }

  /** Commit staged rewrites of `rels` under `root`. The caller must
    * have finished ALL staging (the writes under `.swap-tmp/`) first. */
  def commit(fs: FileSystem, root: Path, rels: Seq[String]): Unit = {
    require(rels.nonEmpty, "nothing to commit")
    val lines = rels.map { r =>
      (if (fs.exists(new Path(tmpRoot(root), r))) "swap:" else "drop:") + r
    }
    opCounter.set(0)
    step()
    val out = fs.create(marker(root), true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    rollForward(fs, root)
  }

  /** Finish an interrupted [[commit]] (idempotent, cheap when clean).
    * Returns true when an unfinished swap was completed. */
  def recover(fs: FileSystem, root: Path): Boolean = {
    if (!fs.exists(marker(root))) {
      // crash during staging: live tree untouched, tmp/old are garbage
      fs.delete(tmpRoot(root), true)
      fs.delete(oldRoot(root), true)
      false
    } else { rollForward(fs, root); true }
  }

  /** Is an unfinished swap pending? Readers use this to refuse a
    * half-swapped tree loudly instead of reading it silently wrong. */
  def pending(fs: FileSystem, root: Path): Boolean = fs.exists(marker(root))

  private def rollForward(fs: FileSystem, root: Path): Unit = {
    val in = fs.open(marker(root))
    val lines =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8").split("\n").filter(_.nonEmpty).toSeq
      finally in.close()
    lines.foreach { ln =>
      val Array(kind, rel) = ln.split(":", 2)
      val live = new Path(root, rel)
      val tmp = new Path(tmpRoot(root), rel)
      val old = new Path(oldRoot(root), rel)
      kind match {
        case "swap" =>
          if (fs.exists(tmp)) {
            if (fs.exists(live)) {
              step(); fs.delete(old, true)
              step(); fs.mkdirs(old.getParent)
              step(); fs.rename(live, old)
            }
            step(); fs.rename(tmp, live)
          }
        // tmp absent: this dir already swapped in a previous attempt
        case "drop" =>
          step(); fs.delete(live, true)
      }
    }
    step(); fs.delete(oldRoot(root), true)
    step(); fs.delete(tmpRoot(root), true)
    step(); fs.delete(marker(root), false)
  }
}
