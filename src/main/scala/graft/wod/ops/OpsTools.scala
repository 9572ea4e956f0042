package graft.wod.ops

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.time.Duration

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

/** Ops-side file movers (SURVEY §2.1 S12/S13) — the two tools the
  * reference ships for its HTCondor workers, re-expressed without the
  * http-client/AWS-SDK dependency stack:
  *
  *  - [[HttpFetch]] ⇔ `OsPoolHttpDownloader.java:42-94` (HTTP GET →
  *    file; 2xx writes, status printed) on the JDK 17 HttpClient,
  *    plus an in-tool retry envelope the reference delegates to
  *    HTCondor `periodic_release` (C6).
  *  - [[Uploader]] ⇔ `OsPoolS3Uploader.java:59-83` (walk a local dir,
  *    upload each file under a target prefix, key = normalized prefix
  *    + relative path). The AWS TransferManager becomes Hadoop FS
  *    streams, so the SAME code path serves `s3a://`, `file://`, or
  *    any registered scheme — consistent with the engine's one-FS
  *    design (SURVEY §1.1).
  *
  * Deliberately driver-side plain CLIs, like the reference: these run
  * on fetch workers next to the data, not inside a Spark job.
  */
object HttpFetch {

  /** Download `url` → `dest`. Returns the final HTTP status; writes
    * the file only on 2xx (reference semantics). Retries transport
    * errors and 5xx up to `retries` times with linear backoff.
    */
  def fetch(url: String, dest: Path, retries: Int = 3,
      backoffMs: Long = 1000L): Int = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMinutes(1))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMinutes(10)).GET().build()
    var attempt = 0
    var status = -1
    val tmp = dest.resolveSibling(s".fetch_${dest.getFileName}")
    while (attempt <= retries) {
      try {
        Option(dest.getParent).foreach(Files.createDirectories(_))
        // TRUNCATE_EXISTING: a retained partial tmp from a failed
        // attempt must never contribute stale trailing bytes to a
        // later, shorter 2xx body.
        val rsp = client.send(req, HttpResponse.BodyHandlers.ofFile(tmp,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
          java.nio.file.StandardOpenOption.WRITE))
        status = rsp.statusCode()
        if (status >= 200 && status < 300) {
          Files.move(tmp, dest,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          return status
        }
        Files.deleteIfExists(tmp)
        if (status < 500) return status // 4xx: retrying won't help
      } catch {
        // Unconditional: a last-attempt transport failure still falls
        // through to return the last status (-1 if none), per the
        // "returns the final HTTP status" contract — the CLI prints
        // and exits 1 instead of dying on a stack trace.
        case e: Exception =>
          try Files.deleteIfExists(tmp) catch { case _: Exception => () }
          System.err.println(s"[http-fetch] attempt ${attempt + 1} " +
            s"failed: ${e.getMessage}")
      }
      attempt += 1
      if (attempt <= retries) Thread.sleep(backoffMs * attempt)
    }
    status
  }

  /** `HttpFetch <url> <output-file> [retries]` — prints the status
    * code like the reference; non-2xx exits 1.
    */
  def main(args: Array[String]): Unit = {
    val status = args match {
      case Array(url, out) => fetch(url, Paths.get(out))
      case Array(url, out, r) => fetch(url, Paths.get(out), r.toInt)
      case _ => sys.error("usage: HttpFetch <url> <output-file> [retries]")
    }
    println(status)
    if (status < 200 || status >= 300) sys.exit(1)
  }
}

object Uploader {

  /** Reference key normalization (`OsPoolS3Uploader.normalize`):
    * blank or "/" → empty, trailing slashes stripped.
    */
  def normalize(key: String): String =
    if (key == null || key.trim.isEmpty || key == "/") ""
    else key.replaceAll("/+$", "")

  /** Walk `source` and copy every file to `destPrefix/<relative>`
    * through the destination's own Hadoop FileSystem. Returns the
    * uploaded (relativePath, bytes) pairs in walk order. Each file is
    * retried independently.
    */
  def upload(source: Path, destPrefix: String, conf: Configuration,
      retries: Int = 3): Seq[(String, Long)] = {
    // A blank/"/" prefix normalizes to "" (reference key semantics),
    // which Hadoop's Path cannot represent — resolve those targets
    // against the default FS working directory instead.
    val destRoot = Some(normalize(destPrefix)).filter(_.nonEmpty)
      .map(new HPath(_))
    val fs = destRoot.fold(org.apache.hadoop.fs.FileSystem.get(conf))(
      _.getFileSystem(conf))
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val it = Files.walk(source).iterator()
    while (it.hasNext) {
      val p = it.next()
      if (!Files.isDirectory(p)) {
        val rel = source.relativize(p).toString
        val target = destRoot.fold(new HPath(rel))(new HPath(_, rel))
        var attempt = 0
        var done = false
        while (!done) {
          try {
            val os = fs.create(target, true)
            try Files.copy(p, os) finally os.close()
            done = true
          } catch {
            case e: Exception =>
              attempt += 1
              if (attempt > retries) throw new RuntimeException(
                s"upload failed for $rel after $retries retries", e)
              System.err.println(s"[upload] retry $attempt for $rel: " +
                s"${e.getMessage}")
          }
        }
        out += ((rel, Files.size(p)))
      }
    }
    out.toSeq
  }

  /** `Uploader <dir> <dest-prefix>` (prefix may be any Hadoop-FS URI:
    * `s3a://bucket/key`, `file:///...`).
    */
  def main(args: Array[String]): Unit = {
    val (dir, dest) = args match {
      case Array(d, p) => (d, p)
      case _ => sys.error("usage: Uploader <dir> <dest-prefix>")
    }
    val uploaded = upload(Paths.get(dir), dest, new Configuration())
    uploaded.foreach { case (rel, bytes) => println(s"$rel: $bytes bytes") }
    println(s"${uploaded.size} files uploaded to ${normalize(dest)}")
  }
}
