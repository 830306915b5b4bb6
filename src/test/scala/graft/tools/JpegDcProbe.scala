package graft.tools

/** One-off probe for the round-10 q32c directive: is the JDK JPEG
  * round-trip of an 8x8-TILE-CONSTANT grayscale image exactly
  * reproducible from a per-gray LUT?
  *
  * JPEG of a uniform 8x8 block is DC-only (every AC term is a weighted
  * sum of differences of equal values = 0 exactly, in integer and float
  * DCTs alike), DC coefficients entropy-code losslessly (differential
  * Huffman), and IDCT of a DC-only block is constant — so IF the JDK
  * encoder doesn't smooth across block edges, decoded tile value =
  * f(input gray) independent of neighbors, capturable as a 256-entry
  * LUT by running the real codec on uniform images.
  *
  * Checks:
  *   1. uniform 16x16 image per gray g: decode is uniform; record d(g).
  *   2. random 2x2-tile images (4 distinct grays): every decoded tile
  *      is uniform AND equals d(g_tile) — neighbor independence.
  *   3. the mapping d(g) printed (is it identity? how lossy?).
  *
  * Run: sbt "Test/runMain graft.tools.JpegDcProbe"
  */
object JpegDcProbe {
  private def gray16(vals: (Int, Int, Int, Int)): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val (a, b, c, d) = vals
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        val t = (y / 8) * 2 + (x / 8)
        val g = t match { case 0 => a; case 1 => b; case 2 => c; case _ => d }
        img.getRaster.setSample(x, y, 0, g)
        x += 1
      }
      y += 1
    }
    img
  }

  private def roundTrip(img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
    javax.imageio.ImageIO.setUseCache(false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
  }

  private def tileSamples(img: java.awt.image.BufferedImage, t: Int): Seq[Int] = {
    val y0 = (t / 2) * 8; val x0 = (t % 2) * 8
    for (y <- y0 until y0 + 8; x <- x0 until x0 + 8)
      yield img.getRaster.getSample(x, y, 0)
  }

  def main(args: Array[String]): Unit = {
    // 1) uniform images: capture d(g), check uniformity
    val lut = new Array[Int](256)
    var nonUniform1 = 0
    for (g <- 0 until 256) {
      val dec = roundTrip(gray16((g, g, g, g)))
      val s = tileSamples(dec, 0) ++ tileSamples(dec, 1) ++
        tileSamples(dec, 2) ++ tileSamples(dec, 3)
      if (s.distinct.size != 1) { nonUniform1 += 1; println(s"g=$g NOT uniform: ${s.distinct}") }
      lut(g) = s.head
    }
    val identity = (0 until 256).count(g => lut(g) == g)
    println(s"[probe] uniform-image check: $nonUniform1 non-uniform of 256")
    println(s"[probe] d(g)==g for $identity/256 grays")
    val diffs = (0 until 256).filter(g => lut(g) != g).map(g => s"$g->${lut(g)}")
    println(s"[probe] non-identity entries (${diffs.size}): ${diffs.take(40).mkString(" ")}")

    // 2) mixed-tile images: neighbor independence
    val rnd = new java.util.Random(12345)
    var mismatches = 0; var nonUniform2 = 0
    for (_ <- 0 until 2000) {
      val vs = (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))
      val dec = roundTrip(gray16(vs))
      val expect = Seq(vs._1, vs._2, vs._3, vs._4).map(lut)
      for (t <- 0 until 4) {
        val s = tileSamples(dec, t).distinct
        if (s.size != 1) nonUniform2 += 1
        else if (s.head != expect(t)) {
          mismatches += 1
          if (mismatches <= 10)
            println(s"[probe] tile mismatch vs=$vs t=$t got=${s.head} want=${expect(t)}")
        }
      }
    }
    println(s"[probe] mixed-tile: $nonUniform2 non-uniform tiles, $mismatches LUT mismatches over 2000 images")
    println(if (nonUniform1 == 0 && nonUniform2 == 0 && mismatches == 0)
      "[probe] VERDICT: DC-exact — LUT oracle is viable"
    else "[probe] VERDICT: NOT exact — document and keep no_oracle")
  }
}
