package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MEASURED per-asset decode throughput for the multimodal gates (r15
  * VERDICT ask #5): the 10× rehearsal showed m4 at 14.5× and m1 at 10×
  * wall-clock over 10× assets, both attributed to overhead-dominated
  * sub-second bases — this probe removes the attribution step by timing
  * the DECODE LOOP itself at two asset counts and reporting ns/asset.
  *
  * Per path (the m1 PNG arm, the m4 WAV arm) and per scale it times
  *  - synth: fixture synthesis only (`pngPayload` / `wavOf(m4Samples)`),
  *  - full:  synthesis + the REAL codec decode
  *    (`decodeImage` = javax.imageio, `decodePcm` = javax.sound.sampled),
  * as Spark jobs over `spark.range(n)` (same mapPartitions shape as the
  * gates, no shuffle), median-of-3. decode ns/asset = full − synth. A
  * FLAT decode ns/asset across 10× proves the codec path is linear in
  * asset count — the gates' 10×+ wall ratios are then thread-ramp and
  * job overhead on sub-second bases, not a superlinear decode.
  *
  * Usage: scripts/run.sh graft.llm.MediaScaleProbe [N]
  */
object MediaScaleProbe {

  def main(args: Array[String]): Unit = {
    val n0 = args.headOption.map(_.toLong).getOrElse(50000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("| path | assets | synth ns/asset | full ns/asset | decode ns/asset |")
    println("|---|---|---|---|---|")
    for (n <- Seq(n0, n0 * 10); path <- Seq("png", "wav")) {
      val (synth, full) = measure(spark, path, n)
      println(f"| $path | $n | ${synth * 1e9 / n}%.0f | ${full * 1e9 / n}%.0f " +
        f"| ${(full - synth) * 1e9 / n}%.0f |")
    }
    spark.stop()
  }

  private def med3(run: () => Unit): Double = (1 to 3).map { _ =>
    val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
  }.sorted.apply(1)

  /** (synthSec, fullSec) for `n` assets through the named codec path,
    * using the gates' exact fixture formulas (m1 dims id%16+1 × id%9+1,
    * m4 samples id%50+10). */
  def measure(spark: SparkSession, path: String, n: Long): (Double, Double) = {
    import spark.implicits._
    val ids = spark.range(0, n).as[Long]
    def job(decode: Boolean): Long = path match {
      case "png" => ids.mapPartitions(_.map { id =>
        val p = Multimodal.pngPayload(id, (id % 16 + 1).toInt, (id % 9 + 1).toInt)
        if (decode) Multimodal.decodeImage(p).map(_._3).getOrElse(0L)
        else p.length.toLong
      }).reduce(_ + _)
      case _ => ids.mapPartitions(_.map { id =>
        val w = Multimodal.wavOf(Multimodal.m4Samples(id, (id % 50 + 10).toInt))
        if (decode) Multimodal.decodePcm(w).map(_._2.length.toLong).getOrElse(0L)
        else w.length.toLong
      }).reduce(_ + _)
    }
    job(decode = true) // warm codecs + JIT before either timing
    (med3(() => job(decode = false)), med3(() => job(decode = true)))
  }
}
