package graft

import org.apache.spark.sql.functions._

/** Round-16 multimodal legs: spectral audio features (single-bin DFT
  * cross-pinned against the VAD/ZCR physics) and SSIM (graded image
  * similarity — the brightness-vs-noise ordering at identical MSE). */
class Round16bSpec extends SparkTestBase {

  test("mm_audio_spectral: even harmonic exactly 0; discrete square-wave harmonic law; VAD cross-pin") {
    val spec = SparkEntry.queries("mm_audio_spectral")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    val vad = SparkEntry.queries("mm_audio_vad")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(spec.nonEmpty && spec.keySet === vad.keySet)
    spec.foreach { case (doc, (nSpeech, eFund, eH2, eH3, ratio, centroid)) =>
      // spectral speech (fundamental-bin energy) = energy-VAD speech:
      // the two detectors must agree window for window on this fixture
      assert(nSpeech === vad(doc), s"doc $doc: spectral vs VAD speech count")
      // half-period antiperiodicity kills the even harmonic EXACTLY,
      // quantized table and real codec notwithstanding
      assert(eH2 === 0L, s"doc $doc: even harmonic must vanish")
      assert(eFund > 0L && eH3 > 0L)
      // discrete square-wave harmonic law: |X_1|/|X_3| =
      // sin(3pi/16)/sin(pi/16) so the POWER ratio is ~8.11 (the
      // continuous 1/k law would say 9 — the discrete form is the pin)
      val law = math.pow(math.sin(3 * math.Pi / 16) / math.sin(math.Pi / 16), 2)
      val got = eFund.toDouble / eH3
      assert(math.abs(got - law) < 0.1,
        s"doc $doc: fund/h3 power ratio $got vs discrete law $law")
      // centroid sits at (500*e1 + 1500*e3)/(e1+e3) ~= 610 Hz, the
      // ZCR cross-pin: 19 flips/window = period 16 = 500 Hz fundamental
      assert(centroid > 590 && centroid < 625, s"doc $doc: centroid $centroid")
      assert(ratio > 0.885 && ratio < 0.895, s"doc $doc: fund ratio $ratio")
    }
  }

  test("mm_image_ssim: self is exactly 1.0; brightness twin beats noise twin at IDENTICAL MSE") {
    val rows = SparkEntry.queries("mm_image_ssim")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, self, bright, noise) =>
      // F1F2 = G1G2 when x = y, so the self-score is 1.0 EXACTLY —
      // through the real BMP codec, before any float rounding
      assert(self === 1.0, s"doc $doc: self-SSIM $self")
      // both twins perturb EVERY pixel by |16| (equal MSE by
      // construction); SSIM must still rank luminance >> structure
      assert(bright > noise + 0.04,
        s"doc $doc: bright $bright vs noise $noise")
      assert(bright > 0.98 && bright < 1.0, s"doc $doc: bright $bright")
      assert(noise < 0.95, s"doc $doc: noise $noise")
    }
  }
}
