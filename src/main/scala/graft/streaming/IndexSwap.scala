package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path

/** Crash-safe directory replacement shared by the accumulated-index
  * maintenance helpers ([[NearDupStream.compactIndex]],
  * [[CurateStream.compactFpIndex]], [[IvfStream.reassign]]): the
  * caller writes the replacement content under a `.compact` temp dir,
  * then `swap` renames live → `.old` → installs tmp → deletes `.old`.
  * A crash between the renames leaves `.old` intact and the next
  * `restoreIfInterrupted` (every index reader calls it) installs it
  * back — the index is never observable in a half-written state.
  * Everything goes through the Hadoop FileSystem API so an HDFS/S3
  * index directory behaves the same as a local one. */
private[streaming] object IndexSwap {

  def swap(spark: SparkSession, liveDir: String, tmpDir: String): Unit = {
    val live = new Path(liveDir)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val tmpP = new Path(tmpDir)
    val oldP = new Path(liveDir + ".old")
    if (fs.exists(oldP)) { fs.delete(oldP, true); () }
    require(fs.rename(live, oldP),
      s"IndexSwap: rename $liveDir -> $oldP failed")
    require(fs.rename(tmpP, live),
      s"IndexSwap: rename $tmpDir -> $liveDir failed")
    fs.delete(oldP, true)
    ()
  }

  /** Self-heal a maintenance run that crashed after renaming the live
    * index away but before installing the replacement — the `.old`
    * copy is complete by construction. */
  def restoreIfInterrupted(spark: SparkSession, liveDir: String): Unit = {
    val live = new Path(liveDir)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val oldP = new Path(liveDir + ".old")
    if (!fs.exists(live) && fs.exists(oldP)) {
      require(fs.rename(oldP, live),
        s"IndexSwap: could not restore $oldP -> $liveDir")
    }
  }
}
