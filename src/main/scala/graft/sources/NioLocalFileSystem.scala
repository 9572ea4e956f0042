package graft.sources

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._
import java.nio.file.{Files, NoSuchFileException}

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}

/** `file://` filesystem whose `setPermission` is a java.nio syscall
  * instead of Hadoop's fork+exec `chmod` fallback.
  *
  * Without libhadoop (NativeIO), stock `RawLocalFileSystem` shells out
  * `chmod 0755 <path>` for EVERY directory it creates and file it
  * commits (`RawLocalFileSystem.setPermission` → `Shell.execCommand`).
  * On the conversion path that is ~3 forks per written part file
  * (file + .crc sidecar + partition dir): a measured 34,092 process
  * launches in 23 s of the 24-way per-file conversion fleet (JFR
  * `jdk.ProcessStart`, r20) — each fork duplicating the page tables of
  * a multi-GB JVM and serializing on the kernel, the dominant term of
  * `wod_convert`'s wall-clock and the reason it tracked "IO noise" so
  * strongly round-over-round. A cluster deploy never sees this
  * (libhadoop present, or the data path is HDFS/S3); this class gives
  * the local deploy the same no-fork behavior through public Hadoop
  * API, with identical on-disk results (same permission bits).
  *
  * Wired via `spark.hadoop.fs.file.impl` in [[graft.GraftSession]].
  * Semantics parity: the 9 posix bits are applied exactly; sticky/
  * setuid bits (never used by Spark's write paths) fall back to the
  * stock shell path rather than being silently dropped.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val special = (permission.toShort & 0xfe00) != 0
    if (special) super.setPermission(p, permission)
    else {
      val bits = permission.toShort.toInt
      val set = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
      def add(bit: Int, perm: PosixFilePermission): Unit =
        if ((bits & bit) != 0) { set.add(perm); () }
      add(0x100, OWNER_READ); add(0x80, OWNER_WRITE); add(0x40, OWNER_EXECUTE)
      add(0x20, GROUP_READ); add(0x10, GROUP_WRITE); add(0x8, GROUP_EXECUTE)
      add(0x4, OTHERS_READ); add(0x2, OTHERS_WRITE); add(0x1, OTHERS_EXECUTE)
      try Files.setPosixFilePermissions(pathToFile(p).toPath, set)
      catch {
        case e: NoSuchFileException =>
          // stock chmod surfaces a missing target as an IOException too
          throw new java.io.FileNotFoundException(
            s"setPermission target does not exist: $p (${e.getMessage})")
      }
    }
  }
}

/** The checksummed `file://` wrapper over [[NioRawLocalFileSystem]] —
  * drop-in for `org.apache.hadoop.fs.LocalFileSystem`.
  *
  * Write-side `.crc` sidecars are OFF (reads still verify any
  * existing sidecar): every parquet file the engine writes already
  * carries parquet's own page-level checksums
  * (`parquet.page.write-checksum.enabled`, on by default), so the
  * sidecar is a redundant second checksum that costs one extra
  * create+write+rename per part file and a CRC pass over every byte —
  * measured 16% of the partitioned store write after the fork fix
  * (WodWriteMicro r20: 1.07 → 0.90 s/store). Cluster deploys (HDFS /
  * S3) never had client-side sidecars on the data path.
  */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem) {
  override def initialize(uri: java.net.URI,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(uri, conf)
    setWriteChecksum(false)
  }
}
