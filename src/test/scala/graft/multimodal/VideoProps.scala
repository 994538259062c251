package graft.multimodal

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, throws}

/** Generative checks for the Y4M codec: encode∘decode identity on random
  * geometry/rate/frame-count/payload, and rejection on random container
  * mutations — the codec-level mirror of the spec's hand-built cases. */
object VideoProps extends Properties("graft.multimodal.y4m") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30).withWorkers(1)

  private val containerGen: Gen[(Int, Int, Int, Int, Seq[Array[Byte]])] = for {
    w <- Gen.chooseNum(1, 6)
    h <- Gen.chooseNum(1, 6)
    fn <- Gen.chooseNum(1, 60)
    fd <- Gen.chooseNum(1, 3)
    nf <- Gen.chooseNum(1, 5)
    frames <- Gen.listOfN(nf, Gen.listOfN(w * h,
      Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray))
  } yield (w, h, fn, fd, frames)

  property("encode -> decode recovers geometry, rate, count, checksum") =
    forAll(containerGen) { case (w, h, fn, fd, frames) =>
      val blob = Video.Y4mCodec.encode(w, h, fn, fd, frames)
      val (dw, dh, dfn, dfd, dnf, sum) = Video.Y4mCodec.decode(blob)
      val want = frames.map(_.map(b => (b & 0xFF).toLong).sum).sum % 65536
      dw == w && dh == h && dfn == fn && dfd == fd &&
        dnf == frames.size && sum == want
    }

  property("encode -> frames round-trips every raster bit-for-bit") =
    forAll(containerGen) { case (w, h, fn, fd, frames) =>
      val back = Video.Y4mCodec.frames(Video.Y4mCodec.encode(w, h, fn, fd, frames))
      back.length == frames.size &&
        back.zip(frames).forall { case (a, b) => a.sameElements(b) }
    }

  // Y4M carries no frame count in the header, so cutting on an exact frame
  // boundary (a multiple of the 6-byte FRAME marker + w*h raster) produces a
  // VALID shorter container the decoder must accept; every other cut must be
  // rejected. Both arms asserted. `math.floorMod` keeps the body total even
  // if the shrinker escapes chooseNum's range (observed: shrunk cut = -1).
  property("truncation: frame-boundary cuts decode shorter, others rejected") =
    forAll(containerGen, Gen.chooseNum(1, 64)) {
      case ((w, h, fn, fd, frames), cut) =>
        val blob = Video.Y4mCodec.encode(w, h, fn, fd, frames)
        val k = 1 + math.floorMod(cut, blob.length)
        val rec = 6 + w * h
        val short = blob.dropRight(k)
        if (k % rec == 0 && k / rec < frames.size) {
          val (dw, dh, dfn, dfd, dnf, _) = Video.Y4mCodec.decode(short)
          dw == w && dh == h && dfn == fn && dfd == fd &&
            dnf == frames.size - k / rec
        } else
          throws(classOf[IllegalArgumentException])(
            Video.Y4mCodec.decode(short))
    }

  property("short trailing junk after the last frame is rejected") =
    forAll(containerGen, Gen.chooseNum(1, 5).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(0, 255).map(_.toByte)))) {
      case ((w, h, fn, fd, frames), junk) =>
        // 1-5 bytes can never form another FRAME marker + raster
        val blob = Video.Y4mCodec.encode(w, h, fn, fd, frames)
        throws(classOf[IllegalArgumentException])(
          Video.Y4mCodec.decode(blob ++ junk))
    }
}
