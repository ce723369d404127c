package graft

/** Dev micro-probe (round 17 optimization): attribute the mm_* codec
  * keys' per-frame cost to synthesis (BufferedImage+setRGB+ImageIO.write)
  * vs decode (ImageIO.read) vs raster reads (getSample loops), single
  * threaded, so the optimization targets the measured component.
  * Usage: runMain graft.MmProbe [nFrames]
  */
object MmProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5000
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mmprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s (${(System.nanoTime() - t0) / 1e3 / n}%.1f us/frame)")
      r
    }
    // warm
    (0 until 500).foreach { i => ops.MmVideo.synthesizeFrame(i.toLong, i % 16) }
    val bmps = time("video synthesizeFrame (32x24)") {
      Array.tabulate(n)(i => ops.MmVideo.synthesizeFrame(i.toLong % 40, i % 16))
    }
    time("video ImageIO decode+getSample (readRaster)") {
      var s = 0L
      var i = 0
      while (i < n) {
        val r = ops.MmDHash.readRaster(i.toLong % 40, bmps(i), 32, 24)
        s += r.getSample(0, 0, 0)
        i += 1
      }
      s
    }
    time("video full decodeFramePixels") {
      var s = 0L
      var i = 0
      while (i < n) {
        s += ops.MmVideo.decodeFramePixels(i.toLong % 40, i % 16).length
        i += 1
      }
      s
    }
    // audio chain attribution
    val nA = n / 4
    (0 until 200).foreach { i => ops.MmMel.melOf(i.toLong) }
    val wavs = time(s"audio MmVad.synthesize (n=$nA)") {
      Array.tabulate(nA)(i => ops.MmVad.synthesize(i.toLong))
    }
    time(s"audio MmAudio.samplesOf decode (n=$nA)") {
      var s = 0L
      var i = 0
      while (i < nA) {
        s += ops.MmAudio.samplesOf(ops.MmAudio.Wav(i.toLong, wavs(i)))(0)
        i += 1
      }
      s
    }
    time(s"audio full melOf (n=$nA)") {
      var s = 0L
      var i = 0
      while (i < nA) { s += ops.MmMel.melOf(i.toLong).dom_band; i += 1 }
      s
    }
    time(s"audio full mfccOf (n=$nA)") {
      var s = 0L
      var i = 0
      while (i < nA) { s += ops.MmMfcc.mfccOf(i.toLong).c0; i += 1 }
      s
    }
    // thread-scaling probe: same work on 1 vs 32 threads — a wall that
    // does NOT shrink (or grows) indicts a shared lock in the codec path
    def onThreads(tag: String, threads: Int)(work: Int => Unit): Unit = {
      val per = nA / threads
      val ts = Array.tabulate(threads)(t => new Thread(() => {
        var i = t * per
        while (i < (t + 1) * per) { work(i); i += 1 }
      }))
      val t0 = System.nanoTime()
      ts.foreach(_.start()); ts.foreach(_.join())
      println(f"[mmprobe] $tag x$threads threads: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    onThreads("zcrOf", 1)(i => ops.MmZcr.zcrOf(i.toLong))
    onThreads("zcrOf", 32)(i => ops.MmZcr.zcrOf(i.toLong))
    onThreads("otsuOf", 1)(i => ops.MmOtsu.otsuOf(i.toLong))
    onThreads("otsuOf", 32)(i => ops.MmOtsu.otsuOf(i.toLong))
    val nImg = n / 5
    (0 until 100).foreach { i => ops.MmEq.synthesize(i.toLong) }
    val eqs = time(s"image MmEq.synthesize (64x64, n=$nImg)") {
      Array.tabulate(nImg)(i => ops.MmEq.synthesize(i.toLong))
    }
    time(s"image ImageIO.read (64x64, n=$nImg)") {
      var s = 0L
      var i = 0
      while (i < nImg) {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(eqs(i)))
        s += img.getRaster.getSample(0, 0, 0)
        i += 1
      }
      s
    }
    time(s"image full otsuOf (n=$nImg)") {
      var s = 0L
      var i = 0
      while (i < nImg) { s += ops.MmOtsu.otsuOf(i.toLong).otsu_threshold; i += 1 }
      s
    }
  }
}
