package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.concurrent.TimeLimits
import org.scalatest.concurrent.Signaler
import org.scalatest.time.SpanSugar._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Fuzz coverage for the RIFF/AVI chunk walker. The walker consumes
  * attacker-shaped input — every chunk size is read from the container
  * itself — so the contract is absolute: malformed input yields "no (or
  * partial) frames", NEVER a throw, a hang, or a StackOverflowError that
  * kills the scan task. Each case here is a shape a 100 TB crawl corpus
  * is certain to contain: random garbage, bit-flipped headers, truncation
  * at every boundary, 32-bit size wraps, and pathological LIST nesting. */
class AviWalkerFuzzSpec extends AnyFunSuite with TimeLimits {
  private implicit val signaler: Signaler = org.scalatest.concurrent.ThreadSignaler

  private def frames(bytes: Array[Byte]): Seq[Array[Byte]] =
    failAfter(30.seconds) { Multimodal.MjpegAviDecoder.aviMjpegFrames(bytes) }

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1234L + i)))

  private def u32le(v: Long): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  test("random byte soup: no throw, no hang") {
    val gen = for {
      n <- Gen.choose(0, 4096)
      bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield bs.toArray
    sample(gen, 150).foreach(b => frames(b))
  }

  test("the 0xFFFFFFF8 size wrap (the former infinite loop) terminates empty") {
    // size -8 as a signed Int makes next-offset == current-offset: the
    // pre-fix walker spun forever here without throwing
    val evil = ascii("RIFF") ++ u32le(0xFFFFFFF8L) ++ ascii("AVI ") ++
      ascii("00dc") ++ u32le(0xFFFFFFF8L) ++ Array.fill(64)(0x7F.toByte)
    // partial-parse contract: the truncated 00dc body may come back as a
    // (non-decodable) partial frame — the requirement is termination
    val got = frames(evil)
    got.foreach { f =>
      val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
                catch { case _: Exception => null }
      assert(img == null)
    }
  }

  test("every 32-bit size extreme at top level and nested terminates") {
    val sizes = Seq(0L, 1L, 7L, 8L, 0x7FFFFFFFL, 0x80000000L, 0xFFFFFFFEL, 0xFFFFFFFFL)
    for (outer <- sizes; inner <- sizes) {
      val payload = ascii("RIFF") ++ u32le(outer) ++ ascii("AVI ") ++
        ascii("LIST") ++ u32le(inner) ++ ascii("movi") ++
        ascii("00dc") ++ u32le(inner) ++ Array.fill(32)(1.toByte)
      frames(payload) // contract: returns, whatever the lying sizes say
    }
  }

  test("truncation at every prefix of a well-formed AVI: no throw, frames <= full") {
    val full = Multimodal.syntheticMjpegAvi(group = 9L, nFrames = 3)
    val nFull = frames(full).length
    assert(nFull == 3)
    (0 until full.length).foreach { k =>
      assert(frames(full.take(k)).length <= nFull)
    }
  }

  test("bit flips anywhere in a well-formed AVI: no throw, no hang") {
    val full = Multimodal.syntheticMjpegAvi(group = 11L, nFrames = 2)
    val gen = for {
      pos <- Gen.choose(0, full.length - 1)
      bit <- Gen.choose(0, 7)
    } yield (pos, bit)
    sample(gen, 300).foreach { case (pos, bit) =>
      val mutated = full.clone()
      mutated(pos) = (mutated(pos) ^ (1 << bit)).toByte
      frames(mutated)
    }
    // and flips concentrated in the size fields, the dangerous bytes
    (4 until math.min(full.length, 96)).foreach { pos =>
      val mutated = full.clone()
      mutated(pos) = 0xFF.toByte
      frames(mutated)
    }
  }

  test("pathological LIST nesting stops at the depth cap, no StackOverflowError") {
    // 200k nested LISTs, each claiming the rest of the buffer as its body:
    // unbounded recursion would blow the task's stack (an Error the
    // walker's Exception handler cannot catch)
    val levels = 200000
    val out = new java.io.ByteArrayOutputStream()
    val remaining = levels * 12
    (0 until levels).foreach { i =>
      out.write(ascii("LIST")); out.write(u32le((remaining - i * 12 - 8).toLong))
      out.write(ascii("movi"))
    }
    assert(frames(out.toByteArray).isEmpty)
  }

  test("a valid frame after a malformed sibling chunk is still recovered") {
    // partial-parse contract: garbage first, honest 00dc second — the
    // walker keeps whatever the advance rule can still reach
    val jpeg = {
      val full = Multimodal.syntheticMjpegAvi(group = 3L, nFrames = 1)
      frames(full).head
    }
    val honest = ascii("00dc") ++ u32le(jpeg.length.toLong) ++ jpeg ++
      (if (jpeg.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    val junkThenFrame = ascii("JUNK") ++ u32le(4L) ++ Array.fill(4)(9.toByte) ++ honest
    val movi = ascii("LIST") ++ u32le((4 + junkThenFrame.length).toLong) ++
      ascii("movi") ++ junkThenFrame
    val riff = ascii("RIFF") ++ u32le((4 + movi.length).toLong) ++ ascii("AVI ") ++ movi
    assert(frames(riff).length == 1)
  }
}
