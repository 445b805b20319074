package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame

/** Shared filesystem helpers. Three near-identical walk-and-delete
  * implementations (and two write-one-parquet-file helpers) had grown
  * across StreamingOps / EmailOps / ScaleGen with subtly different
  * error handling — consolidated here (round-10 review) so fixes like
  * symlink handling propagate everywhere at once. */
object Fs {

  /** Best-effort recursive delete: children before parents, symlinks
    * removed as links (Files.walk does not follow them), every
    * per-file failure and the walk itself swallowed — callers use this
    * in finally blocks where a leaked temp dir is preferable to a
    * masked primary exception. */
  def deleteTree(root: Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      if (Files.exists(root)) {
        val all = Files.walk(root).iterator().asScala.toSeq
        all.reverseIterator.foreach(p =>
          try { Files.deleteIfExists(p); () } catch { case _: Exception => () })
      }
    } catch { case _: Exception => () }

  def deleteTree(root: String): Unit = deleteTree(Paths.get(root))

  /** Write `df` as ONE parquet file at exactly `target` (the driver's
    * single-file-per-table layout): coalesce(1) into a scratch dir,
    * move the part file to `target`, drop the scratch. Fails loudly if
    * the writer emitted no part file (an empty frame still emits one;
    * absence means the write itself went wrong). */
  def writeSingleParquet(df: DataFrame, target: Path): Path = {
    val tmp = Files.createTempDirectory("graft-onefile")
    try {
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = {
        val s = Files.list(tmp)
        try s.filter(_.getFileName.toString.startsWith("part-"))
          .findFirst()
        finally s.close()
      }
      require(part.isPresent, s"no part file written for $target")
      Files.createDirectories(target.getParent)
      Files.move(part.get(), target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      target
    } finally deleteTree(tmp)
  }
}
