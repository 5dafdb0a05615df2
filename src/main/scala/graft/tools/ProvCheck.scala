package graft.tools
object ProvCheck {
  def main(args: Array[String]): Unit = {
    import scala.jdk.CollectionConverters._
    val rs = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileReader]).iterator().asScala.toList
    val ws = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator().asScala.toList
    println(s"readers=${rs.map(_.getClass.getName)}")
    println(s"writers=${ws.map(_.getClass.getName)}")
    // time a single decode both ways
    val wav = graft.ext.Multimodal.MediaGen.wav(1L)
    def time(name: String)(f: => Unit): Unit = {
      (0 until 200).foreach(_ => f)
      val t0 = System.nanoTime(); (0 until 1000).foreach(_ => f)
      println(f"$name: ${(System.nanoTime()-t0)/1000.0/1000.0}%8.1f us/call")
    }
    time("decodePcm16")(graft.ext.Multimodal.Codec.decodePcm16(wav))
    time("AudioSystem.getAIS") {
      val a = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      a.close()
    }
    rs.foreach { r =>
      try {
        time(s"reader ${r.getClass.getSimpleName}") {
          val a = r.getAudioInputStream(new java.io.ByteArrayInputStream(wav))
          a.close()
        }
      } catch { case e: Throwable => println(s"${r.getClass.getSimpleName}: $e") }
    }
  }
}
