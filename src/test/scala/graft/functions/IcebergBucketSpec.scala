package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll

/** [[IcebergBucketHash]] vs an INDEPENDENT textbook murmur3_x86_32
  * (implemented here from the published algorithm, not from Spark):
  * the spec's Appendix-B vectors pin the two known answers, and
  * scalacheck pins the whole domain — longs (as 8 little-endian
  * bytes) and arbitrary unicode strings (as UTF-8 bytes), every
  * length class of the tail handling (0..3 remainder bytes). A drift
  * in either path would mis-bucket rows against a real Iceberg
  * engine. */
class IcebergBucketSpec extends SparkSpec {

  /** Textbook murmur3_x86_32 over a byte array (Austin Appleby's
    * published reference algorithm), standard tail handling. */
  private def reference(bytes: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val nBlocks = bytes.length / 4
    var i = 0
    while (i < nBlocks) {
      val base = i * 4
      var k1 = (bytes(base) & 0xff) | ((bytes(base + 1) & 0xff) << 8) |
        ((bytes(base + 2) & 0xff) << 16) | ((bytes(base + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nBlocks * 4
    (bytes.length & 3) match {
      case 3 =>
        k1 ^= (bytes(tail + 2) & 0xff) << 16
        k1 ^= (bytes(tail + 1) & 0xff) << 8
        k1 ^= bytes(tail) & 0xff
      case 2 =>
        k1 ^= (bytes(tail + 1) & 0xff) << 8
        k1 ^= bytes(tail) & 0xff
      case 1 =>
        k1 ^= bytes(tail) & 0xff
      case _ =>
    }
    if ((bytes.length & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= bytes.length
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  private def leBytes(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  private def check(p: Prop): Unit = {
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500), p)
    assert(r.passed, r.status.toString)
  }

  test("spec vectors: long 34 -> 2017239379, string 'iceberg' -> 1210000089") {
    assert(IcebergBucketHash.hashLong(34L) === 2017239379)
    assert(IcebergBucketHash.hashString(UTF8String.fromString("iceberg"))
      === 1210000089)
    // and the independent reference agrees with the spec on both
    assert(reference(leBytes(34L), 0) === 2017239379)
    assert(reference("iceberg".getBytes("UTF-8"), 0) === 1210000089)
  }

  test("property: hashLong equals textbook murmur3 over 8 LE bytes, whole long domain") {
    check(forAll { (v: Long) =>
      IcebergBucketHash.hashLong(v) == reference(leBytes(v), 0)
    })
  }

  test("property: hashString equals textbook murmur3 over UTF-8 bytes, all tail classes") {
    // strings drawn to hit every remainder-byte class incl. multi-byte
    // code points (2/3/4-byte UTF-8) straddling block boundaries
    val rocket = new String(Character.toChars(0x1F680)) // 4-byte UTF-8
    val gen = Gen.oneOf(
      Gen.listOf(Gen.asciiPrintableChar).map(_.mkString),
      Gen.listOf(Gen.oneOf("a", "ß", "щ", "文", rocket)).map(_.mkString))
    check(forAll(gen) { s =>
      IcebergBucketHash.hashString(UTF8String.fromString(s)) ==
        reference(s.getBytes("UTF-8"), 0)
    })
  }
}
