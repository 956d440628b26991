package graft.llm

import org.scalatest.funsuite.AnyFunSuite

class GifFramesSpec extends AnyFunSuite {

  test("animated GIF round-trips frame count, dimensions, and exact means") {
    val bytes = Multimodal.encodeAnimatedGif(10, 6, 4,
      (f, _, _) => (10 * f, 20 + f, 200 - f))
    val frames = Multimodal.decodeGifFrames(bytes)
    assert(frames.size === 4)
    frames.zipWithIndex.foreach { case (i, f) =>
      assert(i.width === 10 && i.height === 6)
      assert(i.meanR === 10.0 * f)
      assert(i.meanG === 20.0 + f)
      assert(i.meanB === 200.0 - f)
    }
  }

  test("two-color frames stay palette-exact (GIF is lossless under 256 colors)") {
    // checkerboard of (0,0,0) and (100,50,25): mean = half of each color
    val bytes = Multimodal.encodeAnimatedGif(8, 8, 2,
      (_, x, y) => if ((x + y) % 2 == 0) (0, 0, 0) else (100, 50, 25))
    val frames = Multimodal.decodeGifFrames(bytes)
    assert(frames.size === 2)
    frames.foreach { i =>
      assert(i.meanR === 50.0 && i.meanG === 25.0 && i.meanB === 12.5)
    }
  }

  test("gifFrameSample keeps every step-th frame with its index") {
    val bytes = Multimodal.encodeAnimatedGif(4, 4, 7, (f, _, _) => (f, f, f))
    val sampled = Multimodal.gifFrameSample(bytes, step = 3)
    assert(sampled.map(_._1) === Seq(0, 3, 6))
    assert(sampled.map(_._2.meanR) === Seq(0.0, 3.0, 6.0))
    // a single-frame GIF still samples frame 0
    val one = Multimodal.encodeAnimatedGif(4, 4, 1, (_, _, _) => (9, 9, 9))
    assert(Multimodal.gifFrameSample(one, step = 2).map(_._1) === Seq(0))
  }
}
