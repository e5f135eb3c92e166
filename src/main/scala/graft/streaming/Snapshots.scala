package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** The hardened per-batch snapshot protocol shared by the streaming
  * driver-state holders ([[StreamingSketch]], [[BloomIngest]]):
  * versioned `snapshot-<batchId>` files written as .tmp then renamed,
  * restore = highest id, older ids deleted only AFTER the new file is
  * verified on disk. HDFS rename onto an existing destination returns
  * FALSE (not POSIX), so a replayed batch deletes its stale own-id
  * snapshot first; any rename that still fails FAILS THE BATCH loudly
  * — a silently dropped snapshot followed by the deletes would reopen
  * the state-loss window this protocol exists to close. From the
  * first committed batch onward at least one complete snapshot always
  * exists on disk. */
private[streaming] final class Snapshots(dirPath: String, conf: Configuration) {
  private val dir = new Path(dirPath)
  private val fs = dir.getFileSystem(conf)

  private def committed(): Seq[(Long, Path)] = {
    val st = fs.globStatus(new Path(dir, "snapshot-*"))
    if (st == null) Seq.empty
    else st.toSeq
      .filterNot(_.getPath.getName.endsWith(".tmp"))
      .map(s => s.getPath.getName.stripPrefix("snapshot-").toLong -> s.getPath)
  }

  /** Restores the highest committed snapshot via `read`, if any. */
  def restore[A](read: java.io.InputStream => A): Option[A] =
    committed().sortBy(_._1).lastOption.map { case (_, p) =>
      val in = fs.open(p)
      try read(in) finally in.close()
    }

  /** Commits batch `batchId`'s state via `write`, then prunes older
    * snapshots. Throws on any failure to land the new snapshot. */
  def commit(batchId: Long)(write: java.io.OutputStream => Unit): Unit = {
    val tmp = new Path(dir, s"snapshot-$batchId.tmp")
    val out = fs.create(tmp, true)
    try write(out) finally out.close()
    val dst = new Path(dir, s"snapshot-$batchId")
    if (fs.exists(dst) && !fs.delete(dst, false))
      throw new java.io.IOException(s"snapshots: cannot replace stale $dst")
    if (!fs.rename(tmp, dst) || !fs.exists(dst))
      throw new java.io.IOException(s"snapshots: commit rename $tmp -> $dst failed")
    committed().filter(_._1 < batchId)
      .foreach { case (_, p) => fs.delete(p, false); () }
  }
}
