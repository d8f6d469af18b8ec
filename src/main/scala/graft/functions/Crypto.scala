package graft.functions

import java.security.MessageDigest

/** Pure-JVM crypto primitives for the reference's scalar layer (SURVEY.md
  * §2.8 F1–F5): SHA-512/256 (rpc.js:320-322 Sha512Trunc256Sum), hash160 +
  * base58check (BTC addresses), c32check (Stacks addresses, rpc.js:358-362),
  * and secp256k1 point decompression (rpc.js:356).
  *
  * All from public specs: FIPS 180-4 (SHA-512/256 is a JDK 11+ built-in
  * digest), the RIPEMD-160 reference description, the base58check and
  * c32check encodings, and the SEC2 secp256k1 curve parameters. No external
  * dependencies — everything must run on executors from the application jar.
  */
object Crypto {

  // digests are reused per executor thread — getInstance per row shows up
  // at 100k+ rows/s (digest() leaves the instance reset for the next call)
  private def tl(alg: String) = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance(alg)
  }
  private val sha256Local = tl("SHA-256")
  private val sha512_256Local = tl("SHA-512/256")

  def sha256(b: Array[Byte]): Array[Byte] = sha256Local.get().digest(b)

  /** F1 — SHA-512/256 (NOT a truncated SHA-512: distinct IV; the JDK ships
    * it). Spark's sha2(col, 512) is SHA-512, hence this helper. */
  def sha512_256(b: Array[Byte]): Array[Byte] = sha512_256Local.get().digest(b)

  private val HexChars = "0123456789abcdef".toCharArray

  def hex(b: Array[Byte]): String = {
    // table lookup, not String.format — this runs per row inside UDFs
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(i * 2) = HexChars((b(i) >> 4) & 0xF)
      out(i * 2 + 1) = HexChars(b(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // ---------------------------------------------------------------- RIPEMD-160

  private val RL = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
    3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
    1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
    4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13)
  private val RR = Array(
    5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
    6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
    15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
    8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
    12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11)
  private val SL = Array(
    11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
    7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
    11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
    11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
    9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6)
  private val SR = Array(
    8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
    9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
    9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
    15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
    8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11)
  private val KL = Array(0x00000000, 0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC, 0xA953FD4E)
  private val KR = Array(0x50A28BE6, 0x5C4DD124, 0x6D703EF3, 0x7A6D76E9, 0x00000000)

  private def rotl(x: Int, n: Int): Int = (x << n) | (x >>> (32 - n))

  private def f(j: Int, x: Int, y: Int, z: Int): Int = j / 16 match {
    case 0 => x ^ y ^ z
    case 1 => (x & y) | (~x & z)
    case 2 => (x | ~y) ^ z
    case 3 => (x & z) | (y & ~z)
    case _ => x ^ (y | ~z)
  }

  /** RIPEMD-160 of arbitrary input (pure Scala; JDK has no provider). */
  def ripemd160(input: Array[Byte]): Array[Byte] = {
    // MD5-style padding: 0x80, zeros, 64-bit little-endian bit length
    val len = input.length
    val padLen = if (len % 64 < 56) 56 - len % 64 else 120 - len % 64
    val msg = new Array[Byte](len + padLen + 8)
    System.arraycopy(input, 0, msg, 0, len)
    msg(len) = 0x80.toByte
    val bits = len.toLong * 8
    for (i <- 0 until 8) msg(len + padLen + i) = ((bits >>> (8 * i)) & 0xFF).toByte

    val h = Array(0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476, 0xC3D2E1F0)
    val x = new Array[Int](16)
    for (block <- 0 until msg.length / 64) {
      for (i <- 0 until 16) {
        val o = block * 64 + i * 4
        x(i) = (msg(o) & 0xFF) | ((msg(o + 1) & 0xFF) << 8) |
          ((msg(o + 2) & 0xFF) << 16) | ((msg(o + 3) & 0xFF) << 24)
      }
      var (al, bl, cl, dl, el) = (h(0), h(1), h(2), h(3), h(4))
      var (ar, br, cr, dr, er) = (h(0), h(1), h(2), h(3), h(4))
      for (j <- 0 until 80) {
        var t = rotl(al + f(j, bl, cl, dl) + x(RL(j)) + KL(j / 16), SL(j)) + el
        al = el; el = dl; dl = rotl(cl, 10); cl = bl; bl = t
        t = rotl(ar + f(79 - j, br, cr, dr) + x(RR(j)) + KR(j / 16), SR(j)) + er
        ar = er; er = dr; dr = rotl(cr, 10); cr = br; br = t
      }
      val t = h(1) + cl + dr
      h(1) = h(2) + dl + er; h(2) = h(3) + el + ar
      h(3) = h(4) + al + br; h(4) = h(0) + bl + cr; h(0) = t
    }
    val out = new Array[Byte](20)
    for (i <- 0 until 5; k <- 0 until 4)
      out(i * 4 + k) = ((h(i) >>> (8 * k)) & 0xFF).toByte
    out
  }

  /** hash160 = RIPEMD-160(SHA-256(x)) — the BTC/Stacks address digest. */
  def hash160(b: Array[Byte]): Array[Byte] = ripemd160(sha256(b))

  // ---------------------------------------------------------------- base58check

  private val B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

  def base58(b: Array[Byte]): String = {
    var n = BigInt(1, b)
    val sb = new StringBuilder
    while (n > 0) { sb.append(B58((n % 58).toInt)); n /= 58 }
    val zeros = b.takeWhile(_ == 0).length
    ("1" * zeros) + sb.reverseInPlace().toString
  }

  /** F2 (inverse leg) — base58check address: version ++ payload ++ first 4
    * of double-SHA256. */
  def base58check(version: Byte, payload: Array[Byte]): String = {
    val body = version +: payload
    base58(body ++ sha256(sha256(body)).take(4))
  }

  // ---------------------------------------------------------------- c32check

  private val C32 = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"

  /** c32 (Crockford-like base32) of a byte string; leading zero bytes are
    * preserved as leading '0' digits. */
  def c32(b: Array[Byte]): String = {
    var n = BigInt(1, b)
    val sb = new StringBuilder
    while (n > 0) { sb.append(C32((n % 32).toInt)); n /= 32 }
    ("0" * b.takeWhile(_ == 0).length) + sb.reverseInPlace().toString
  }

  /** F3 — c32check address (Stacks): 'S' + version digit + c32(payload ++
    * checksum), checksum = first 4 of double-SHA256(version ++ payload). */
  def c32address(version: Int, hash160Bytes: Array[Byte]): String = {
    val checksum = sha256(sha256(version.toByte +: hash160Bytes)).take(4)
    "S" + C32(version) + c32(hash160Bytes ++ checksum)
  }

  /** F4 — pubkey → addresses: hash160 of the (compressed) pubkey under both
    * encodings. Mainnet versions: BTC p2pkh 0x00, Stacks single-sig 22. */
  def btcAddress(pubkey: Array[Byte]): String = base58check(0x00, hash160(pubkey))
  def stxAddress(pubkey: Array[Byte]): String = c32address(22, hash160(pubkey))

  // ---------------------------------------------------------------- secp256k1

  private val P = BigInt("fffffffffffffffffffffffffffffffffffffffffffffffffffffffefffffc2f", 16)

  /** F5 — decompress a 33-byte secp256k1 pubkey (02/03 ‖ x) to 65-byte
    * uncompressed (04 ‖ x ‖ y): y² = x³ + 7 (mod p), sqrt via p ≡ 3 mod 4. */
  def decompress(compressed: Array[Byte]): Array[Byte] = {
    require(compressed.length == 33 && (compressed(0) == 2 || compressed(0) == 3),
      "expected 33-byte compressed secp256k1 point")
    val x = BigInt(1, compressed.tail)
    val y2 = (x.modPow(3, P) + 7) mod P
    val y0 = y2.modPow((P + 1) / 4, P)
    val y = if (y0.testBit(0) == (compressed(0) == 3)) y0 else P - y0
    def pad32(n: BigInt): Array[Byte] = {
      val raw = n.toByteArray.dropWhile(_ == 0)
      Array.fill[Byte](32 - raw.length)(0) ++ raw
    }
    4.toByte +: (pad32(x) ++ pad32(y))
  }
}
