package graft.sources

import java.io.InputStream
import java.net.URI
import java.nio.file.{Files, Paths, StandardCopyOption}

/** S1 (SURVEY §2.1): the reference's data-collection step — GET a public
  * dataset URL and land it in the staging area (`1. data-collection-from-
  * data-source.py:19-62`).
  *
  * Spark posture: an HTTP GET is a DRIVER-side acquisition, not an
  * executor operator — the file lands once in staging (the reference's
  * `./data/<today>/` → S3 layout), and only then does the distributed
  * engine read it. Executors never open sockets to external services.
  */
object Http {

  /** Fetch `url` to `stagingDir/<date>/<basename>`, returning the landed
    * path (the reference's date-partitioned landing, `R1:30-52`).
    * Supports any URL scheme the JDK opens (http/https/file — file URLs
    * make this testable offline). */
  def fetchToStaging(url: String, stagingDir: String, date: String): String = {
    val name = {
      val p = new URI(url).getPath
      val base = p.substring(p.lastIndexOf('/') + 1) // F3 basename split
      if (base.isEmpty) "download" else base
    }
    val dir = Paths.get(stagingDir, date)
    Files.createDirectories(dir)
    val dst = dir.resolve(name)
    var in: InputStream = null
    try {
      in = new URI(url).toURL.openStream()
      Files.copy(in, dst, StandardCopyOption.REPLACE_EXISTING)
    } finally if (in != null) in.close()
    dst.toString
  }
}
