package graft.tools

/** Diagnostic: do the golden HLL fixtures of one language share a stream
  * across encodings (identical estimates)? Feeds q26's merge design. */
object FixtureProbe {
  def main(args: Array[String]): Unit = {
    for (lang <- Seq("java", "cpp"); n <- Seq(10000, 1000000)) {
      val es = Seq(4, 6, 8).map { e =>
        val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
          s"/root/reference/serialization_test_data/${lang}_generated_files/hll${e}_n${n}_$lang.sk"))
        graft.sketch.interop.DataSketchesHll.read(b).estimate
      }
      println(s"[fixture] $lang n=$n: " + es.mkString(", "))
    }
  }
}
