package graft.tools

import java.util.concurrent.Executors

import graft.ext.Multimodal.{Codec, MediaGen}

/** r16 dev microbench: per-step wall time of the media codec paths
  * under 32-thread contention (no Spark) — isolates which call blocks
  * when the bench task metrics read run ≫ cpu. Usage:
  *   sbt "runMain graft.tools.MediaMicro [nRows] [threads]"
  */
object MediaMicro {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(2000)
    val threads = args.lift(1).map(_.toInt).getOrElse(32)
    val pool = Executors.newFixedThreadPool(threads)
    def bench(name: String)(f: Long => Unit): Unit = {
      // warm
      (0L until 64L).foreach(f)
      val t0 = System.nanoTime()
      val futs = (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = t.toLong
            while (i < n) { f(i); i += threads }
          }
        })
      }
      futs.foreach(_.get())
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[micro] $name%-28s ${dt}%7.3f s  (${dt / n * 1e6}%8.1f us/row)")
    }
    val audioIds = (0L until 100000L).filter(MediaGen.kindOf(_) == "audio")
    val imageIds = (0L until 100000L).filter(MediaGen.kindOf(_) == "image")
    val videoIds = (0L until 100000L).filter(MediaGen.kindOf(_) == "video")
    val wavs = audioIds.take(256).map(id => id -> MediaGen.wav(id)).toMap
    val pngs = imageIds.take(256).map { id =>
      val (w, h) = MediaGen.imageDims(id); id -> MediaGen.png(id, 0, w, h)
    }.toMap
    bench("wav_generate")(i => MediaGen.wav(audioIds((i % 256).toInt)): Unit)
    bench("wav_decode_pcm16")(i =>
      Codec.decodePcm16(wavs(audioIds((i % 256).toInt))): Unit)
    bench("wav_phash")(i => graft.ext.Multimodal.audioPhash64(
      Codec.decodePcm16(wavs(audioIds((i % 256).toInt)))): Unit)
    bench("png_generate") { i =>
      val id = imageIds((i % 256).toInt)
      val (w, h) = MediaGen.imageDims(id)
      MediaGen.png(id, 0, w, h): Unit
    }
    bench("png_decode")(i =>
      Codec.decodeImage(pngs(imageIds((i % 256).toInt))): Unit)
    bench("png_phash")(i => graft.ext.Multimodal.imagePhash64(
      Codec.decodeImage(pngs(imageIds((i % 256).toInt)))): Unit)
    bench("video_generate")(i =>
      MediaGen.video(videoIds((i % 64).toInt)): Unit)
    // the full x6 per-row composition, one bench per kind
    val vids = videoIds.take(64).map(id => id -> MediaGen.video(id)).toMap
    def feats(kind: String, payload: Array[Byte]): Unit = {
      kind match {
        case "image" =>
          val img = Codec.decodeImage(payload)
          (img.getWidth, img.getHeight, 1): Unit
        case "audio" =>
          Codec.decodeWav(payload): Unit
        case _ =>
          val frames = Codec.demuxVideo(payload)
          Codec.decodeImage(frames.head): Unit
      }
      Codec.checksum(payload): Unit
      Codec.byteEntropy(payload): Unit
    }
    bench("x6row_image") { i =>
      val id = imageIds((i % 256).toInt)
      feats("image", pngs(id))
    }
    bench("x6row_audio") { i =>
      val id = audioIds((i % 256).toInt)
      feats("audio", wavs(id))
    }
    bench("x6row_video") { i =>
      val id = videoIds((i % 64).toInt)
      feats("video", vids(id))
    }
    bench("wav_decode_hdr")(i =>
      Codec.decodeWav(wavs(audioIds((i % 256).toInt))): Unit)
    bench("entropy_video")(i =>
      Codec.byteEntropy(vids(videoIds((i % 64).toInt))): Unit)
    bench("crc_video")(i =>
      Codec.checksum(vids(videoIds((i % 64).toInt))): Unit)
    pool.shutdown()
  }
}
