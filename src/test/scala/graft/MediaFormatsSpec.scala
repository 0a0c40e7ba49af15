package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal.{HeaderDecoder, MediaFormats}

/** Cross-validates the dependency-free media writers/parser against
  * the JDK's OWN codecs (javax.imageio): bytes we write must decode
  * with the real codec to the same dimensions, and bytes the real
  * codec writes must parse with HeaderDecoder — so neither side can
  * be wrong in a mirrored way (the same independence DocFormatsSpec
  * gets from round-tripping PDF/DOCX through real structure). */
class MediaFormatsSpec extends AnyFunSuite {

  private def imageioDims(bytes: Array[Byte]): (Int, Int) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not decode the written bytes")
    (img.getWidth, img.getHeight)
  }

  test("our PNG/GIF/BMP bytes decode with the JDK codec to the written dims") {
    for ((w, h) <- Seq((16, 16), (37, 19), (640, 1), (1, 480))) {
      assert(imageioDims(MediaFormats.writePng(w, h, seed = w * 1000L + h)) == (w, h),
        s"png $w×$h")
      assert(imageioDims(MediaFormats.writeGif(w, h)) == (w, h), s"gif $w×$h")
      assert(imageioDims(MediaFormats.writeBmp(w, h)) == (w, h), s"bmp $w×$h")
    }
  }

  test("HeaderDecoder parses bytes written by the JDK codec") {
    for ((fmt, expCh) <- Seq("png" -> 3, "gif" -> 3, "bmp" -> 3, "jpg" -> 3); (w, h) <- Seq((21, 34), (128, 64))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8040) // non-trivial pixel
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK cannot encode $fmt")
      val (gw, gh, gc) = HeaderDecoder.decode(out.toByteArray)
      assert((gw, gh) == (w, h), s"$fmt $w×$h: HeaderDecoder read $gw×$gh")
      assert(gc == expCh, s"$fmt channels: $gc")
    }
  }

  test("HeaderDecoder channel semantics on our own writers") {
    assert(HeaderDecoder.decode(MediaFormats.writePng(8, 9, 1L)) == ((8, 9, 1)))  // grayscale
    assert(HeaderDecoder.decode(MediaFormats.writeJpeg(8, 9, 3)) == ((8, 9, 3)))
    assert(HeaderDecoder.decode(MediaFormats.writeJpeg(8, 9, 1)) == ((8, 9, 1)))
    assert(HeaderDecoder.decode(MediaFormats.writeGif(8, 9)) == ((8, 9, 3)))
    assert(HeaderDecoder.decode(MediaFormats.writeBmp(8, 9)) == ((8, 9, 3)))
  }

  test("our WAV bytes parse with the JDK's audio system to the written params") {
    import graft.operators.Multimodal.AudioHeader
    for ((rate, ch, n) <- Seq((8000, 1, 400), (16050, 2, 1999), (44100, 2, 1))) {
      val bytes = MediaFormats.writeWav(rate, ch, n)
      // independent codec: javax.sound.sampled
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      assert(aff.getFormat.getSampleRate.toInt == rate)
      assert(aff.getFormat.getChannels == ch)
      assert(aff.getFrameLength == n, s"JDK frame length ${aff.getFrameLength} != $n")
      // our parser agrees
      assert(AudioHeader.parseWav(bytes) == ((rate, ch, n.toLong)))
    }
  }

  test("WAV chunk walk survives an extra chunk before fmt") {
    import graft.operators.Multimodal.AudioHeader
    val base = MediaFormats.writeWav(8000, 1, 10)
    // splice a LIST chunk between 'WAVE' and 'fmt '
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = base.take(12) ++ extra ++ base.drop(12)
    assert(AudioHeader.parseWav(spliced) == ((8000, 1, 10L)))
  }

  test("corrupt or unknown containers fail loudly") {
    intercept[IllegalArgumentException] {
      HeaderDecoder.decode("not an image at all".getBytes)
    }
    intercept[IllegalArgumentException] {
      HeaderDecoder.decode(Array[Byte](0xff.toByte, 0xd8.toByte, 0x00, 0x01, 0x02, 0x03,
        0x04, 0x05, 0x06, 0x07, 0x08, 0x09)) // SOI then garbage, no marker sync
    }
    intercept[IllegalArgumentException] {
      // JPEG with only SOI+EOI — no SOF before EOF
      HeaderDecoder.decode(MediaFormats.writeJpeg(8, 9, 3).take(2) ++
        Array[Byte](0xff.toByte, 0xd9.toByte) ++ new Array[Byte](8))
    }
  }
}
