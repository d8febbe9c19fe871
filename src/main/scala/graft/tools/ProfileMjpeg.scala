package graft.tools

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Dev probe for the MJPEG-in-AVI slice (round-10 verdict #4):
  *  1. EXACTNESS — does a UNIFORM TYPE_BYTE_GRAY frame survive a
  *     JPEG encode/decode round-trip bit-exactly at max quality?
  *     (DC-only blocks with an all-ones quant table should; if all
  *     256 gray values do, an MJPEG fixture of constant frames is
  *     rule-oracle-able in DuckDB like the BI_RGB path.)
  *  2. PARALLELISM — does ImageIO's JPEG reader scale across 32
  *     threads, or does it serialize like javax.sound's provider
  *     registry (the round-10 WAV lesson)?
  * Usage: runMain graft.tools.ProfileMjpeg
  */
object ProfileMjpeg {
  private def encodeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    w.dispose(); ios.close()
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    ImageIO.setUseCache(false)
    // 1. exactness across all 256 uniform gray values, odd sizes too
    var bad = 0
    for (v <- 0 to 255; (w, h) <- Seq((8, 8), (9, 8), (12, 8), (11, 8))) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, v)
      val back = ImageIO.read(new ByteArrayInputStream(encodeJpeg(img, 1.0f)))
      var ok = back != null && back.getWidth == w && back.getHeight == h &&
        back.getRaster.getNumBands == 1
      if (ok)
        for (y <- 0 until h; x <- 0 until w)
          if (back.getRaster.getSample(x, y, 0) != v) ok = false
      if (!ok) { bad += 1; if (bad < 4) println(s"[mjpeg] INEXACT v=$v ${w}x$h") }
    }
    println(s"[mjpeg] uniform-frame exactness: ${if (bad == 0) "EXACT for all 256 values" else s"$bad failures"}")

    // 2. 32-thread decode scaling via raw threads (no Spark needed)
    val payloads = (0 until 20000).map { i =>
      val img = new BufferedImage(12, 8, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 8; x <- 0 until 12)
        img.getRaster.setSample(x, y, 0, (i + x + y) % 256)
      encodeJpeg(img, 1.0f)
    }.toArray
    def decodeAll(threads: Int): Double = {
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val chunk = payloads.length / threads
      val fs = (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = t * chunk
            val end = if (t == threads - 1) payloads.length else (t + 1) * chunk
            while (i < end) {
              val im = ImageIO.read(new ByteArrayInputStream(payloads(i)))
              if (im == null) throw new IllegalStateException("null decode")
              i += 1
            }
          }
        })
      }
      fs.foreach(_.get())
      pool.shutdown()
      (System.nanoTime() - t0) / 1e9
    }
    decodeAll(4) // warm
    val t1 = (1 to 3).map(_ => decodeAll(1)).min
    val t32 = (1 to 3).map(_ => decodeAll(32)).min
    println(f"[mjpeg] 20k decodes: 1 thread $t1%6.2f s, 32 threads $t32%6.2f s, speedup ${t1 / t32}%4.1f x")
  }
}
