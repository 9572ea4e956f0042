package graft.wod

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.conf.Configuration
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.wod.ops.{HttpFetch, Uploader}

/** S12/S13 ops tools against an in-JVM loopback HTTP server (JDK
  * HttpServer — the reference's equivalent test needs s3mock/WireMock;
  * loopback needs no egress) and the mockobj:// Hadoop FS scheme.
  */
class OpsToolsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var port: Int = 0
  private val flaky = new AtomicInteger(0)

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    port = server.getAddress.getPort
    def respond(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      val os: OutputStream = ex.getResponseBody
      try if (body.nonEmpty) os.write(body) finally os.close()
    }
    server.createContext("/data.gz", (ex: HttpExchange) =>
      respond(ex, 200, "payload-bytes".getBytes(StandardCharsets.UTF_8)))
    server.createContext("/missing", (ex: HttpExchange) =>
      respond(ex, 404, Array.emptyByteArray))
    server.createContext("/flaky", (ex: HttpExchange) =>
      // two 503s, then success — exercises the retry envelope
      if (flaky.incrementAndGet() <= 2) respond(ex, 503, Array.emptyByteArray)
      else respond(ex, 200, "eventually".getBytes(StandardCharsets.UTF_8)))
    server.start()
  }

  override def afterAll(): Unit = server.stop(0)

  private def url(p: String) = s"http://127.0.0.1:$port$p"

  test("fetch downloads a 2xx body to the destination file") {
    val dest = Files.createTempDirectory("fetch").resolve("sub/data.gz")
    val status = HttpFetch.fetch(url("/data.gz"), dest)
    assert(status === 200)
    assert(new String(Files.readAllBytes(dest), StandardCharsets.UTF_8)
      === "payload-bytes")
  }

  test("fetch does not write a file on 4xx and does not retry it") {
    val dest = Files.createTempDirectory("fetch").resolve("gone")
    val status = HttpFetch.fetch(url("/missing"), dest)
    assert(status === 404)
    assert(!Files.exists(dest))
  }

  test("fetch retries 5xx until success") {
    flaky.set(0)
    val dest = Files.createTempDirectory("fetch").resolve("flaky.bin")
    val status = HttpFetch.fetch(url("/flaky"), dest, retries = 3,
      backoffMs = 10L)
    assert(status === 200)
    assert(new String(Files.readAllBytes(dest), StandardCharsets.UTF_8)
      === "eventually")
  }

  test("fetch returns -1 instead of throwing when transport fails on " +
      "every attempt, and leaves no tmp behind") {
    val dest = Files.createTempDirectory("fetch").resolve("never.bin")
    // nothing listens on loopback:1 → immediate connection refused
    val status = HttpFetch.fetch("http://127.0.0.1:1/x", dest,
      retries = 1, backoffMs = 1L)
    assert(status === -1)
    assert(!Files.exists(dest))
    assert(!Files.exists(dest.resolveSibling(".fetch_never.bin")))
  }

  test("a stale partial tmp never contributes trailing bytes to a " +
      "shorter 2xx body") {
    val dir = Files.createTempDirectory("fetch")
    val dest = dir.resolve("data.gz")
    Files.write(dir.resolve(".fetch_data.gz"),
      ("X" * 100).getBytes(StandardCharsets.UTF_8))
    val status = HttpFetch.fetch(url("/data.gz"), dest)
    assert(status === 200)
    assert(new String(Files.readAllBytes(dest), StandardCharsets.UTF_8)
      === "payload-bytes")
  }

  test("uploader preserves relative paths under a normalized prefix " +
      "through a non-file scheme") {
    val src = Files.createTempDirectory("up_src")
    Files.createDirectories(src.resolve("CTD/OBS"))
    Files.write(src.resolve("CTD/OBS/a.gz"), "AA".getBytes)
    Files.write(src.resolve("top.txt"), "T".getBytes)

    val conf = new Configuration()
    conf.set("fs.mockobj.impl", classOf[MockObjFileSystem].getName)
    val destRoot = Files.createTempDirectory("up_dest")
    // trailing slashes must normalize away (reference semantics)
    val uploaded = Uploader.upload(src, s"mockobj://$destRoot/prefix//", conf)
    assert(uploaded.map(_._1).toSet === Set(
      Paths.get("CTD/OBS/a.gz").toString, "top.txt"))
    assert(Files.readAllLines(destRoot.resolve("prefix/CTD/OBS/a.gz"))
      .get(0) === "AA")
    assert(Files.readAllLines(destRoot.resolve("prefix/top.txt"))
      .get(0) === "T")
  }

  test("blank/root dest prefix resolves against the FS working " +
      "directory instead of crashing") {
    val conf = new Configuration()
    conf.set("fs.mockobj.impl", classOf[MockObjFileSystem].getName)
    conf.set("fs.defaultFS", "mockobj:///")
    val wd = Files.createTempDirectory("up_wd")
    org.apache.hadoop.fs.FileSystem.get(conf).setWorkingDirectory(
      new org.apache.hadoop.fs.Path(wd.toString))
    val src = Files.createTempDirectory("up_src2")
    Files.write(src.resolve("r.txt"), "R".getBytes(StandardCharsets.UTF_8))
    val uploaded = Uploader.upload(src, "/", conf)
    assert(uploaded.map(_._1) === Seq("r.txt"))
    assert(Files.readAllLines(wd.resolve("r.txt")).get(0) === "R")
  }

  test("normalize matches the reference's key rules") {
    assert(Uploader.normalize("") === "")
    assert(Uploader.normalize("/") === "")
    assert(Uploader.normalize("a/b/") === "a/b")
    assert(Uploader.normalize("a/b///") === "a/b")
    assert(Uploader.normalize("a/b") === "a/b")
  }
}
