package graft.io

import java.io.{BufferedInputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream

/** S2: zip expansion (`federal_fec_ingest_unzip_gcs/index.js:20-56`) —
  * the reference streams entries out of a .zip in object storage; for
  * the engine this is a driver-side utility that extracts a bulk
  * archive so `spark.read` can scan the entries. Streams entry-by-entry
  * (no whole-archive buffering); rejects path-traversal entry names.
  */
object ZipUtil {

  /** Extract `zipPath` under `destDir`; returns the extracted paths. */
  def unzip(zipPath: String, destDir: String): Seq[Path] = {
    val dest = Paths.get(destDir).toAbsolutePath.normalize
    Files.createDirectories(dest)
    val in = new ZipInputStream(
      new BufferedInputStream(new FileInputStream(zipPath)))
    val out = Seq.newBuilder[Path]
    try {
      var entry = in.getNextEntry
      while (entry != null) {
        val target = dest.resolve(entry.getName).normalize
        require(target.startsWith(dest),
          s"zip entry escapes destination: ${entry.getName}")
        if (entry.isDirectory) Files.createDirectories(target)
        else {
          Files.createDirectories(target.getParent)
          val os = new FileOutputStream(target.toFile)
          try {
            val buf = new Array[Byte](64 * 1024)
            var n = in.read(buf)
            while (n > 0) { os.write(buf, 0, n); n = in.read(buf) }
          } finally os.close()
          out += target
        }
        in.closeEntry()
        entry = in.getNextEntry
      }
    } finally in.close()
    out.result()
  }
}
