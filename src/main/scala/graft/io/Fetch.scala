package graft.io

import java.io.{BufferedInputStream, File, FileInputStream, FileOutputStream, InputStream}
import java.nio.file.{Files, StandardCopyOption}
import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.commons.compress.archivers.zip.ZipArchiveInputStream
import org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S17 download + extract (reference: datasets.py:40-122) — the
  * driver-side tooling that fills the local dataset root
  * [[Datasets.load]] resolves against.
  *
  *  - [[download]] streams a URL to a file with CACHE-BY-EXISTENCE
  *    semantics (datasets.py:56-58: an existing target short-circuits
  *    the fetch), writing through a `.part` temp file so a killed
  *    download never leaves a truncated file that the cache check
  *    would then trust. `file://` URLs work identically to `http(s)`,
  *    so tests and air-gapped clusters need no network.
  *  - [[extract]] mirrors datasets.py:82-122's by-extension dispatch
  *    (.gz single-file gunzip to the stem, .zip, .tar, .tgz), adding
  *    the .tar.gz double extension the reference mis-files under plain
  *    .gz, and a path-traversal guard on archive entry names (a
  *    hostile "../" entry throws instead of escaping `destDir`).
  *
  * Everything here is DRIVER-side by design: datasets are fetched once
  * to shared storage; executors only ever see the extracted files via
  * the distributed readers in [[EdgeListReader]] (which read .gz
  * directly, so SNAP's .txt.gz needs no extract step at all).
  */
object Fetch {

  /** Fetch `url` to `dest` unless `dest` already exists
    * (cache-by-existence, datasets.py:56-58). Returns `dest`.
    *
    * The connection carries connect/read timeouts so a stalled server
    * fails the call instead of hanging the driver, and a failed
    * transfer deletes its `.part` temp file — the cache check only
    * ever sees fully-renamed files. */
  def download(url: String, dest: File, overwrite: Boolean = false,
               connectTimeoutMs: Int = 30000,
               readTimeoutMs: Int = 120000): File = {
    if (dest.exists() && !overwrite) return dest
    Option(dest.getParentFile).foreach(_.mkdirs())
    val tmp = new File(dest.getPath + ".part")
    val conn = new java.net.URI(url).toURL.openConnection()
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    try {
      val in = conn.getInputStream
      try Files.copy(in, tmp.toPath, StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
    } catch {
      case e: Throwable => tmp.delete(); throw e
    }
    Files.move(tmp.toPath, dest.toPath, StandardCopyOption.REPLACE_EXISTING)
    dest
  }

  /** Extract `archive` into `destDir` (defaults to the archive's own
    * directory, like datasets.py:96-100). Dispatch by extension as the
    * reference does (datasets.py:107-119); unknown extensions return
    * the file untouched (the reference logs a warning and moves on).
    * Returns the files written. */
  def extract(archive: File, destDirOpt: Option[File] = None): Seq[File] = {
    val destDir = destDirOpt.getOrElse(archive.getParentFile)
    destDir.mkdirs()
    val name = archive.getName.toLowerCase
    def fin = new BufferedInputStream(new FileInputStream(archive))
    if (name.endsWith(".tar.gz") || name.endsWith(".tgz"))
      untar(new GzipCompressorInputStream(fin), destDir)
    else if (name.endsWith(".tar")) untar(fin, destDir)
    else if (name.endsWith(".zip")) unzip(fin, destDir)
    else if (name.endsWith(".gz")) {
      // single gzipped file -> stem, datasets.py:108-113
      val out = new File(destDir, archive.getName.dropRight(3))
      val gz = new GzipCompressorInputStream(fin)
      try copyTo(gz, out) finally gz.close()
      Seq(out)
    } else Seq(archive)
  }

  /** Resolve an archive entry under destDir, refusing traversal. */
  private def entryFile(destDir: File, entryName: String): File = {
    val f = new File(destDir, entryName)
    val canon = f.getCanonicalPath
    if (!canon.startsWith(destDir.getCanonicalPath + File.separator) &&
        canon != destDir.getCanonicalPath)
      throw new IllegalArgumentException(
        s"archive entry '$entryName' escapes extraction dir $destDir")
    f
  }

  private def copyTo(in: InputStream, out: File): Unit = {
    Option(out.getParentFile).foreach(_.mkdirs())
    val os = new FileOutputStream(out)
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { os.write(buf, 0, n); n = in.read(buf) }
    } finally os.close()
  }

  private def untar(in: InputStream, destDir: File): Seq[File] = {
    val tar = new TarArchiveInputStream(in)
    try {
      Iterator.continually(tar.getNextEntry).takeWhile(_ != null).flatMap { e =>
        val f = entryFile(destDir, e.getName)
        if (e.isDirectory) { f.mkdirs(); None }
        else { copyTo(tar, f); Some(f) }
      }.toList
    } finally tar.close()
  }

  private def unzip(in: InputStream, destDir: File): Seq[File] = {
    val zip = new ZipArchiveInputStream(in)
    try {
      Iterator.continually(zip.getNextEntry).takeWhile(_ != null).flatMap { e =>
        val f = entryFile(destDir, e.getName)
        if (e.isDirectory) { f.mkdirs(); None }
        else { copyTo(zip, f); Some(f) }
      }.toList
    } finally zip.close()
  }

  /** One-call `load_dataset` UX including the fetch (datasets.py:
    * 726-758 + :40-80): download the catalog dataset's URL into `root`
    * under its canonical filename (skipped when already cached), then
    * parse it with the matching distributed reader. */
  def fetchAndLoad(spark: SparkSession, name: String, root: String): DataFrame = {
    val info = Datasets.catalog.getOrElse(name,
      sys.error(s"'$name' is not a catalog dataset (known: ${Datasets.catalog.keys.toSeq.sorted.mkString(", ")})"))
    download(info.url, new File(root, info.fileName))
    Datasets.load(spark, name, root)
  }
}
