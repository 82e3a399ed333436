package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class RollingFpSpec extends AnyFunSuite {
  import RollingFp.{B, P}

  private def fp(s: String): Long = RollingFp.compute(UTF8String.fromString(s))

  test("empty / no-token text hashes to 0; punctuation-only too") {
    assert(fp("") == 0L)
    assert(fp("!!! ... ---") == 0L)
  }

  test("order-sensitive (unlike the md5 set fingerprint)") {
    assert(fp("alpha beta") != fp("beta alpha"))
  }

  test("case and separator insensitive via word tokenization") {
    assert(fp("Connection  TIMEOUT,host") == fp("connection timeout host"))
  }

  test("composability: fp(a ++ b) == fp(a)*B^|b| + fp(b) (mod P)") {
    val a = "the quick brown fox"
    val b = "jumps over lazy dogs"
    def powMod(base: Long, e: Long, m: Long): Long = {
      var r = 1L; var bb = base % m; var ee = e
      while (ee > 0) {
        if ((ee & 1) == 1) r = r * bb % m
        bb = bb * bb % m; ee >>= 1
      }
      r
    }
    val nB = 4 // tokens in b
    val expected = (fp(a) % P * powMod(B, nB, P) + fp(b)) % P
    assert(fp(a + " " + b) == expected,
      "chunk fingerprints must compose without re-hashing")
  }
}
