package graft.tools

import graft.operators.MediaCodec

// scratch micro-benchmark; run with Test/runMain graft.tools.CodecProbe
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val N = 500
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"PROBE $label: ${(System.nanoTime - t0) / 1e6 / N}%.3f ms/call")
    }
    val png = MediaCodec.encodePng(31, 31, (x, y) => (x * 31 + y * 17) % 256)
    val wav = MediaCodec.encodeWav(8000f, Array.tabulate(1500)(i => ((i * 7) % 256).toByte))
    (1 to 2).foreach { round =>
      time(s"r$round encodePng") { var i = 0; while (i < N) { MediaCodec.encodePng(31, 31, (x, y) => (x * 31 + y * 17) % 256); i += 1 } }
      time(s"r$round analyzeImage") { var i = 0; while (i < N) { MediaCodec.analyzeImage(png); i += 1 } }
      time(s"r$round encodeWav") { var i = 0; while (i < N) { MediaCodec.encodeWav(8000f, Array.tabulate(1500)(j => ((j * 7) % 256).toByte)); i += 1 } }
      time(s"r$round analyzeAudio") { var i = 0; while (i < N) { MediaCodec.analyzeAudio(wav); i += 1 } }
    }
  }
}

object CodecProbeMT {
  def main(args: Array[String]): Unit = {
    val N = 500
    def timeMT(label: String)(f: Int => Unit): Unit = {
      val t0 = System.nanoTime
      val threads = (0 until 32).map(t => new Thread(() => { var i = 0; while (i < N) { f(i); i += 1 } }))
      threads.foreach(_.start()); threads.foreach(_.join())
      println(f"PROBE-MT $label: ${(System.nanoTime - t0) / 1e6}%.0f ms for 32x$N calls")
    }
    val png = MediaCodec.encodePng(31, 31, (x, y) => (x * 31 + y * 17) % 256)
    val wav = MediaCodec.encodeWav(8000f, Array.tabulate(1500)(i => ((i * 7) % 256).toByte))
    (1 to 2).foreach { r =>
      timeMT(s"r$r analyzeImage")(_ => MediaCodec.analyzeImage(png))
      timeMT(s"r$r encodePng")(_ => MediaCodec.encodePng(31, 31, (x, y) => (x * 31 + y * 17) % 256))
      timeMT(s"r$r analyzeAudio")(_ => MediaCodec.analyzeAudio(wav))
      timeMT(s"r$r encodeWav")(_ => MediaCodec.encodeWav(8000f, Array.tabulate(1500)(j => ((j * 7) % 256).toByte)))
    }
  }
}

object CodecProbeAudio {
  def main(args: Array[String]): Unit = {
    val N = 500
    def timeMT(label: String)(f: Int => Unit): Unit = {
      val t0 = System.nanoTime
      val threads = (0 until 32).map(t => new Thread(() => { var i = 0; while (i < N) { f(i); i += 1 } }))
      threads.foreach(_.start()); threads.foreach(_.join())
      println(f"PROBE-A $label: ${(System.nanoTime - t0) / 1e6}%.0f ms for 32x$N calls")
    }
    val wav = MediaCodec.encodeWav(8000f, Array.tabulate(1500)(i => ((i * 7) % 256).toByte))
    (1 to 2).foreach { r =>
      timeMT(s"r$r fileFormat")(_ => MediaCodec.probeAudioFileFormat(wav))
      timeMT(s"r$r inputStream")(_ => MediaCodec.probeAudioInputStream(wav).close())
      timeMT(s"r$r fullAnalyze")(_ => MediaCodec.analyzeAudio(wav))
    }
  }
}

object CodecProbeReaders {
  def main(args: Array[String]): Unit = {
    import javax.sound.sampled.spi.AudioFileReader
    import java.util.ServiceLoader
    import scala.jdk.CollectionConverters._
    val readers = ServiceLoader.load(classOf[AudioFileReader]).asScala.toList
    readers.foreach(r => println(s"PROBE-R ${r.getClass.getName}"))
    val wav = MediaCodec.encodeWav(8000f, Array.tabulate(1500)(i => ((i * 7) % 256).toByte))
    for (r <- readers) {
      val t0 = System.nanoTime
      var ok = 0
      (1 to 2000).foreach { _ =>
        try { r.getAudioFileFormat(new java.io.ByteArrayInputStream(wav)); ok += 1 }
        catch { case _: Exception => }
      }
      println(f"PROBE-R ${r.getClass.getSimpleName}: ${(System.nanoTime-t0)/1e6/2000}%.4f ms/call ok=$ok")
    }
  }
}
