package graft

import graft.functions.Crypto
import org.scalatest.funsuite.AnyFunSuite

/** Public test vectors for the crypto scalar layer (SURVEY §5.1: hash and
  * address functions get fixed-vector unit tests, not a DuckDB oracle). */
class CryptoSpec extends AnyFunSuite {
  import Crypto._

  test("SHA-512/256 matches NIST FIPS 180-4 vectors") {
    assert(hex(sha512_256("abc".getBytes)) ===
      "53048e2681941ef99b2e29b76b4c7dabe4c2d0c634fc6d46e0e2f13107e7af23")
    assert(hex(sha512_256(Array.empty[Byte])) ===
      "c672b8d1ef56ed28ab87c3622c5114069bdd3ad7b8f9737498d0c01ecef0967a")
  }

  test("SHA-512/256 is not truncated SHA-512 (distinct IV)") {
    val sha512 = java.security.MessageDigest.getInstance("SHA-512")
      .digest("abc".getBytes).take(32)
    assert(hex(sha512_256("abc".getBytes)) !== hex(sha512))
  }

  test("RIPEMD-160 matches the reference vectors") {
    assert(hex(ripemd160("abc".getBytes)) ===
      "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc")
    assert(hex(ripemd160(Array.empty[Byte])) ===
      "9c1185a5c5e9fc54612808977ee8f548b2258d31")
    assert(hex(ripemd160("message digest".getBytes)) ===
      "5d0689ef49d2fae572b881b123a85ffa21595f36")
  }

  test("base58check reproduces the Bitcoin genesis address") {
    assert(base58check(0x00, unhex("62e907b15cbf27d5425399ebf6f0fb50ebb88f18")) ===
      "1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa")
  }

  test("c32check reproduces the Stacks burn address") {
    assert(c32address(22, Array.fill[Byte](20)(0)) ===
      "SP000000000000000000002Q6VF78")
  }

  test("secp256k1 decompression recovers the generator point") {
    val gx = "79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798"
    val gy = "483ada7726a3c4655da4fbfc0e1108a8fd17b448a68554199c47d08ffb10d4b8"
    val un = decompress(unhex("02" + gx))
    assert(hex(un) === "04" + gx + gy)
    // odd-y flag flips the root
    val flipped = decompress(unhex("03" + gx))
    assert(hex(flipped.slice(1, 33)) === gx)
    assert(hex(flipped.drop(33)) !== gy)
  }

  test("decompressed points satisfy the curve equation") {
    val p = BigInt("fffffffffffffffffffffffffffffffffffffffffffffffffffffffefffffc2f", 16)
    val un = decompress(unhex(
      "0279be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798"))
    val x = BigInt(1, un.slice(1, 33)); val y = BigInt(1, un.drop(33))
    assert((y * y - (x * x * x + 7)).mod(p) === BigInt(0))
  }

}

/** Spark-side laws for the crypto-keyed queries (CryptoSpec proper is
  * vector-only, no session). */
class CryptoQueriesSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("tx-count index admits a delta incrementally: merge == recompute") {
    // split the fact MID-ORDER-KEY (the boundary straddle is the case the
    // additive merge must get right): stored sees part of an order's rows,
    // the delta the rest — per-digest sums must still equal the one-shot
    graft.GraftExtensions.ensure(spark)
    val li = Tables.lineitem(spark, sf)
    val stored = li.filter(col("l_linenumber") <= 2)
    val delta = li.filter(col("l_linenumber") > 2)
    val merged = functions.CryptoQueries.mergeTxCounts(
      functions.CryptoQueries.txCountsOf(stored), delta)
    val oneShot = functions.CryptoQueries.txCountsOf(li)
    assert(merged.except(oneShot).isEmpty && oneShot.except(merged).isEmpty)
    // and f1 over the memoized index keeps its output shape: every order
    // key exactly once with a positive count
    val f1 = q("f1_block_id_join")
    assert(f1.filter(col("n_txs") <= 0).count() === 0L)
    assert(f1.groupBy("o_orderkey").count().filter(col("count") > 1).count() === 0L)
  }
}
