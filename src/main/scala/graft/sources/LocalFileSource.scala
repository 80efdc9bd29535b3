package graft.sources

import java.nio.file.{Files, Paths}
import graft.domain.FileToProcess
import graft.domain.IngestionError.SourceError
import graft.ports.FileSource

/** Resolves FileToProcess to a readable URI. In production this is
  * `s3a://bucket/key` (Spark's S3 committer streams + splits the object —
  * replacing the reference's whole-file GetObject buffering,
  * s3_adapter.rs:19-50); for local runs/tests the "bucket" is a base
  * directory on disk.
  */
final class LocalFileSource(baseDir: String) extends FileSource {
  override def resolve(file: FileToProcess): String = {
    val p = Paths.get(baseDir, file.bucket, file.key)
    if (!Files.exists(p))
      throw SourceError(s"object not found: ${file.fileName} (looked at $p)")
    "file:" + p.toAbsolutePath
  }
}

/** Production-shaped resolver: bucket/key -> s3a URI. No I/O here; Spark's
  * FileScan does the (splittable, partitioned) reading. */
object S3aFileSource extends FileSource {
  override def resolve(file: FileToProcess): String = s"s3a://${file.bucket}/${file.key}"
}
