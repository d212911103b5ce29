package graft.tools

/** Local-filesystem helpers for gate/bench scaffolding (stores, scratch
  * index trees) — NOT used by distributed operators, which go through
  * the Hadoop FS API. */
object LocalFs {
  /** Recursive delete; missing path is a no-op. */
  def deleteRec(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
}
