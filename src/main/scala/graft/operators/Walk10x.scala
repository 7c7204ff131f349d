package graft.operators

import org.apache.spark.sql.SparkSession

/** The 10× synthetic serving corpus behind the RecallReport
  * `walk10x` section and Walk10xSpec (r16 verdict #3).
  *
  * The real embedding tables stop at 2000 rows (TESTDATA sf0.1), so
  * the corpus-adaptive walk knobs ([[Similarity.walkHops]] /
  * [[Similarity.walkEf]]) were calibrated there and everything past
  * it — including the clamp constants — was extrapolation. This
  * corpus is the first extrapolated ×8 step made measurable:
  * [[N]] = 20480 unit vectors (10.24× sf0.1; floorLog8 = 4, the
  * band where hops, ef AND the r17 adaptive degree
  * [[Similarity.knnK]] all take their first extrapolated values —
  * the measurement here is what REJECTED the r16 formulas and
  * forced the degree knob, see Walk10xSpec's docstring for the
  * causal chain), isotropic 64-d Gaussians like the sf0.1 table
  * (the measured-hard case: no cluster structure for entries or the
  * router to exploit; TESTDATA's sf0.1 corpus is isotropic too, and
  * it is what dropped r15's fixed-depth recall to 0.7125).
  *
  * Deterministic BY CONSTRUCTION, not by seed management: each
  * vector derives from splitmix64(i) alone (Steele et al. 2014's
  * mix — per-row pure, order-independent), Box-Muller for the
  * Gaussians, normalized to unit length like the real table. Written
  * once per machine to a tmp dir in the testdata layout
  * (embeddings.parquet with the real (vec_id, embedding, label)
  * schema — the ScaleSpec planted-corpus convention) so every
  * REGISTERED serving face runs on it unmodified.
  */
object Walk10x {

  /** 10.24× the largest real embedding corpus; floorLog8 = 4. */
  val N = 20480
  private val DIM = 64
  private val SEED = 0x5915f22d00000000L

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** One unit vector per id: 64 Box-Muller Gaussians from a
    * splitmix64 stream keyed by (SEED, id), normalized. */
  private def vecFor(id: Long): Array[Float] = {
    var state = SEED ^ mix64(id)
    def nextU(): Double = {
      state = mix64(state)
      // (0,1]: never 0, so log() is finite
      ((state >>> 11) + 1).toDouble / (1L << 53).toDouble
    }
    val v = new Array[Double](DIM)
    var i = 0
    while (i < DIM) {
      val u1 = nextU(); val u2 = nextU()
      val r = math.sqrt(-2.0 * math.log(u1))
      v(i) = r * math.cos(2.0 * math.Pi * u2)
      if (i + 1 < DIM) v(i + 1) = r * math.sin(2.0 * math.Pi * u2)
      i += 2
    }
    val nrm = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / nrm).toFloat)
  }

  /** The corpus dir, generated on first use (a done-marker makes
    * repeat runs — and the spec after a runMain — free). Generation
    * is distributed (spark.range → per-row vecFor), the driver never
    * holds the corpus. */
  def dir(s: SparkSession): String = synchronized {
    val base = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft-walk10x-$N")
    val marker = new java.io.File(base, "_GENERATED")
    if (!marker.exists()) {
      import s.implicits._
      val rows = s.range(N.toLong).map { i =>
        (i, vecFor(i), (i % 10).toInt)
      }.toDF("vec_id", "embedding", "label")
      rows.write.mode("overwrite")
        .parquet(new java.io.File(base, "embeddings.parquet").toString)
      marker.createNewFile()
    }
    base.toString
  }
}
