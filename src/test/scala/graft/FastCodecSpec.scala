package graft

import graft.ops.FastCodec
import org.scalatest.funsuite.AnyFunSuite

/** Byte-identity contract of the round-17 direct container writers
  * (FastCodec doc): the fast BMP/WAV encoders must reproduce the JDK
  * encoders' output bit-for-bit, so swapping them into the Mm fixture
  * synthesis changes NOTHING the decode side (still javax.imageio /
  * javax.sound.sampled) can observe — payloads, hashes, and every
  * oracled result stay identical by construction. */
class FastCodecSpec extends AnyFunSuite {

  private def jdkBmp(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "bmp", bos), "no bmp writer")
    bos.toByteArray
  }

  private def jdkWav(rate: Int, pcm: Array[Byte]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // every fixture geometry in the Mm family, plus padded-row odd widths
  private val geometries =
    Seq((64, 64), (36, 32), (32, 24), (48, 48), (5, 3), (33, 7), (1, 1))

  test("bmp24 is byte-identical to ImageIO TYPE_3BYTE_BGR bmp output") {
    for ((w, h) <- geometries; seed <- Seq(0, 7, 31)) {
      def rgb(x: Int, y: Int): Int = {
        val r = (x * 7 + y * 13 + seed * 31) % 256
        val g = (x * 3 + y * 5 + seed * 17) % 256
        val b = (x * 11 + y * 2 + seed * 23) % 256
        (r << 16) | (g << 8) | b
      }
      val fast = FastCodec.bmp24(w, h, rgb)
      val jdk = jdkBmp(w, h, rgb)
      assert(fast.sameElements(jdk), s"bmp bytes diverge at ${w}x$h seed=$seed")
    }
  }

  test("bmpGray matches ImageIO for a grayscale field") {
    def v(x: Int, y: Int): Int = 60 + (3 * x + 5 * y) % 40
    val fast = FastCodec.bmpGray(64, 64, v)
    val jdk = jdkBmp(64, 64, (x, y) => { val p = v(x, y); (p << 16) | (p << 8) | p })
    assert(fast.sameElements(jdk))
  }

  test("wavPcm16Mono is byte-identical to AudioSystem WAVE output") {
    for (rate <- Seq(8000, 9000, 10000); n <- Seq(10, 160, 8000)) {
      val pcm = new Array[Byte](2 * n)
      var i = 0
      while (i < n) {
        val s = ((i * 37 + rate) % 4001) - 2000
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fast = FastCodec.wavPcm16Mono(rate, pcm)
      val jdk = jdkWav(rate, pcm)
      assert(fast.sameElements(jdk), s"wav bytes diverge at rate=$rate n=$n")
    }
  }

  test("cached WAVE reader decodes identically to the AudioSystem path") {
    // samplesOf now opens via the once-resolved SPI provider (Llm6
    // scaladoc: the per-call registry walk serialized 32-core decode);
    // pin sample-exact equality against the registry path it replaced
    for (id <- Seq(0L, 5L, 29L, 123L)) {
      val wav = graft.ops.MmAudio.synthesize(id, 200 + id.toInt)
      val fast = graft.ops.MmAudio.samplesOf(graft.ops.MmAudio.Wav(id, wav))
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val bytes = try ais.readAllBytes() finally ais.close()
      assert(fast.length * 2 == bytes.length)
      for (i <- fast.indices)
        assert(fast(i) ==
          (((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt),
          s"sample $i diverges for doc $id")
    }
  }

  test("fixture synthesis round-trips decode to the same payloads as before") {
    // spot-pin the swapped call sites against a fresh JDK-encoder replica
    // of the ORIGINAL synthesis, for a sample of doc ids per family
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 12L, 49L, 101L)) {
      val ah = graft.ops.MmAHash.synthesize(id)
      val f = (id % 50).toInt
      val diag = id % 3 == 0
      val ahJdk = jdkBmp(64, 64, (x, y) => {
        var v = (x * 7 + y * 13 + f * 31) % 255
        if (diag && x == y) v += 1
        (v << 16) | (v << 8) | v
      })
      assert(ah.sameElements(ahJdk), s"MmAHash payload changed for doc $id")

      val vf = graft.ops.MmVideo.synthesizeFrame(id, (id % 16).toInt)
      assert(vf.length == 54 + 32 * 3 * 24 &&
        vf(0) == 'B'.toByte && vf(1) == 'M'.toByte)

      val wav = graft.ops.MmAudio.synthesize(id, 100 + id.toInt)
      val n = graft.ops.MmAudio.nFrames(100 + id.toInt)
      val pcm = new Array[Byte](2 * n)
      var i = 0
      while (i < n) {
        val s = graft.ops.MmAudio.sample(id, i)
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      assert(wav.sameElements(jdkWav(graft.ops.MmAudio.rate(id), pcm)),
        s"MmAudio payload changed for doc $id")
    }
  }
}
