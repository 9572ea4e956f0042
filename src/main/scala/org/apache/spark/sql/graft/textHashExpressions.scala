package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5-prefix 60-bit hash — bit-identical to the SQL
  * `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)` the DuckDB oracle
  * uses (first 15 hex chars = first 8 bytes big-endian >> 4).
  */
private[graft] object Md5Hash60 {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    val top = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  def hash(s: String): Long = hash(s.getBytes(StandardCharsets.UTF_8))
}

/** MinHash signature over an array<string> of shingles: for each seed
  * 0..numHashes-1, min of hash60(seed + "|" + shingle). One native pass
  * — replaces a numHashes×shingles higher-order-function expression
  * tree (md5→hex→substring→conv per element) with direct byte-level
  * hashing. Value-identical to the DuckDB oracle formulation.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      var seed = 0
      while (seed < numHashes) {
        val h = Md5Hash60.hash(seed.toString + "|" + s)
        if (h < sig(seed)) sig(seed) = h
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** SimHash fingerprint over an array<string> of tokens: 60-bit majority
  * vote of per-token hash60 bits, single native pass (hash each token
  * once, accumulate votes for all bits). Value-identical to the DuckDB
  * oracle formulation (votes >= 0 → bit set).
  */
case class SimHashFingerprint(child: Expression, bits: Int = 60)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = Md5Hash60.hash(arr.getUTF8String(i).toString)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) >= 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Block-mean perceptual hash over an opaque BINARY payload (public
  * technique: block-mean-value hashing, Yang et al. 2006 — the aHash
  * family SimHash's binary sibling): split the byte stream into `bits`
  * equal segments; bit i is set iff segment i's mean byte value
  * strictly exceeds the payload's global mean. The comparison is exact
  * integer cross-multiplication (segSum·n > totalSum·segLen — no
  * float mean), so any engine derives the identical fingerprint from
  * the same bytes; the DuckDB oracle recomputes it from the payload's
  * hex encoding. 60 bits keeps the value in signed-long range on
  * every engine (same choice as SimHash). Segments shorter than one
  * byte (payload smaller than `bits`) contribute 0-bits; empty payload
  * → 0. Exact-integer bound: segSum·n ≤ 255·n² stays inside a signed
  * long for payloads < ~190 MB — far above any sane row-level blob.
  */
case class PHashFingerprint(child: Expression, bits: Int = 60)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(bits >= 1 && bits <= 60, s"bits must be in [1, 60], got $bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "phash"

  override def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    val n = bytes.length
    var total = 0L
    var i = 0
    while (i < n) { total += (bytes(i) & 0xff); i += 1 }
    var fp = 0L
    var b = 0
    while (b < bits) {
      val lo = (b.toLong * n / bits).toInt
      val hi = ((b + 1).toLong * n / bits).toInt
      var segSum = 0L
      var j = lo
      while (j < hi) { segSum += (bytes(j) & 0xff); j += 1 }
      if (hi > lo && segSum * n > total * (hi - lo)) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Rabin-Karp rolling hashes over an array<long> of token hashes:
  * every length-`window` substring's polynomial hash
  * `(t_i·B^(w-1) + t_{i+1}·B^(w-2) + … + t_{i+w-1}) mod M`, computed
  * in ONE O(n) pass via the rolling update (drop the outgoing term,
  * multiply by B, add the incoming) instead of O(n·w) per-window
  * refolds — the winnowing/fingerprinting primitive (Schleimer et
  * al., SIGMOD'03). Inputs reduce mod M first and M ≤ 2^31−1, so
  * every intermediate product fits a 64-bit long in both engines;
  * value-identical to the DuckDB per-window `list_reduce` Horner
  * formulation the oracle runs.
  */
case class RollingHashWindows(child: Expression, window: Int,
    base: Long = 1000003L, mod: Long = 2147483647L)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(window >= 1, s"window must be >= 1, got $window")
  require(mod > 1 && mod <= Int.MaxValue.toLong,
    s"mod must be in (1, 2^31-1], got $mod")
  require(base > 0 && base < mod, s"base must be in (0, mod), got $base")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < window) return new GenericArrayData(Array.emptyLongArray)
    var pw = 1L // B^(w-1) mod M, for evicting the outgoing term
    var k = 1
    while (k < window) { pw = pw * base % mod; k += 1 }
    val t = new Array[Long](n)
    var i = 0
    while (i < n) {
      t(i) = ((arr.getLong(i) % mod) + mod) % mod
      i += 1
    }
    val out = new Array[Long](n - window + 1)
    var h = 0L
    i = 0
    while (i < window) { h = (h * base + t(i)) % mod; i += 1 }
    out(0) = h
    i = window
    while (i < n) {
      h = (h + mod - t(i - window) * pw % mod) % mod
      h = (h * base + t(i)) % mod
      out(i - window + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
