package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._
  import AudioFingerprint._

  /** Minimal WAV builder (the fixture's own encoder — independent of the
    * query fixture's SQL hex assembly).
    */
  private def wav(samples: Array[Int], channels: Int = 1, sr: Int = 8000,
      extraChunk: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    def ws(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val dataLen = samples.length * 2
    val extraLen = if (extraChunk) 8 + 3 + 1 else 0 // odd-size chunk + pad
    ws("RIFF"); w32(36 + extraLen + dataLen); ws("WAVE")
    ws("fmt "); w32(16); w16(1); w16(channels); w32(sr)
    w32(sr * 2 * channels); w16(2 * channels); w16(16)
    if (extraChunk) { ws("LIST"); w32(3); out.write("abc".getBytes); out.write(0) }
    ws("data"); w32(dataLen)
    samples.foreach(w16)
    out.toByteArray
  }

  test("parsePcm16: mono roundtrip, word-aligned chunk walk, stereo floorDiv mixdown") {
    val mono = Array(100, -200, 32767, -32768, 0)
    val got = parsePcm16(wav(mono))
    assert(got.sampleRate == 8000 && got.channels == 1)
    assert(got.samples.toSeq == mono.toSeq)
    // an odd-sized LIST chunk before data: the walk must pad-align
    assert(parsePcm16(wav(mono, extraChunk = true)).samples.toSeq == mono.toSeq)
    // stereo mixdown: integer MEAN with floorDiv (negative-exact:
    // (-3 + 0) / 2 = -2 under floorDiv, not -1)
    val stereo = Array(10, 20, -3, 0, -32768, -32768) // frames: (10,20) (-3,0) (min,min)
    val mixed = parsePcm16(wav(stereo, channels = 2))
    assert(mixed.samples.toSeq == Seq(15, -2, -32768))
  }

  test("parsePcm16: out-of-scope payloads fail with a reason") {
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](parsePcm16(b)).getMessage
    assert(msg("notriff".getBytes) contains "RIFF")
    val nonPcm = wav(Array(1, 2, 3)); nonPcm(20) = 3 // audio_format = 3 (float)
    assert(msg(nonPcm) contains "not PCM")
    val eightBit = wav(Array(1, 2, 3)); eightBit(34) = 8
    assert(msg(eightBit) contains "not 16")
    // cut into the data chunk header: the walk never finds data
    assert(msg(wav(Array(1, 2, 3)).dropRight(10)) contains "missing data")
    // header intact, samples short: the declared size overruns
    assert(msg(wav(Array(1, 2, 3)).dropRight(2)) contains "overruns")
  }

  /** Independent frame-energy reference (same recurrence, plain Scala). */
  private def refFp(s: Array[Int], frames: Int = 65): Long = {
    val e = (0 until frames).map { f =>
      val from = f.toLong * s.length / frames
      val until = (f + 1).toLong * s.length / frames
      (from until until).map(i => math.abs(s(i.toInt).toLong)).sum
    }
    (0 until frames - 1).foldLeft(0L) { (fp, k) =>
      if (e(k) > e(k + 1)) fp | (1L << k) else fp
    }
  }

  test("energyFingerprint64: matches the reference on uneven lengths; short clips fail") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(65, 66, 100, 331, 650, 1000)) {
      val s = Array.fill(n)(rnd.nextInt(4001) - 2000)
      assert(energyFingerprint64(s) == refFp(s), s"n=$n")
    }
    intercept[IllegalArgumentException](energyFingerprint64(Array.fill(64)(1)))
  }

  test("energyFingerprint64: survives volume scaling and small perturbations; fills all 64 bits") {
    val rnd = new scala.util.Random(7)
    val s = Array.fill(650)(rnd.nextInt(4001) - 2000)
    // volume scaling is monotone on every frame energy: delta signs hold
    // wherever the original had no tie
    assert(energyFingerprint64(s.map(_ * 2)) == energyFingerprint64(s))
    // a +3 bump on every 97th sample moves at most a few bits
    val perturbed = s.zipWithIndex.map { case (v, i) => if (i % 97 == 0) v + 3 else v }
    val dist = java.lang.Long.bitCount(
      energyFingerprint64(s) ^ energyFingerprint64(perturbed))
    assert(dist <= 3, s"perturbation moved $dist bits")
    // the sign bit (delta 63) is live: some random clip must set it —
    // the banding's top 16-bit band would otherwise carry 15 bits only
    val hits = (0 until 50).map { i =>
      val c = Array.fill(650)(rnd.nextInt(4001) - 2000)
      energyFingerprint64(c)
    }
    assert(hits.exists(_ < 0L), "bit 63 never set across 50 random clips")
  }

  test("audioFingerprint: corrupt payloads fail with their media identity") {
    val df = Seq((7L, "garbage".getBytes)).toDF("media_id", "payload")
    val e = intercept[org.apache.spark.SparkException](
      audioFingerprint(df).collect())
    assert(e.getMessage.contains("media_id=7") ||
      Option(e.getCause).exists(_.getMessage.contains("media_id=7")))
  }

  test("audioNearDups: banding reproduces brute-force pairs at distance <= 3") {
    val rnd = new scala.util.Random(11)
    // random 64-bit fps (sign bit included) plus planted near pairs at
    // distances 0..3, with mutations spread across all four 16-bit bands
    val base = (0 until 60).map(i => (i.toLong, rnd.nextLong()))
    val planted = (0 until 4).map { d =>
      val (id, fp) = base(d * 7)
      val mutated = (0 until d).foldLeft(fp)((f, k) => f ^ (1L << ((k * 23 + d) % 64)))
      (1000L + d, mutated)
    }
    val all = base ++ planted
    val got = audioNearDups(all.toDF("media_id", "fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (i1, f1) <- all; (i2, f2) <- all if i1 < i2
      d = java.lang.Long.bitCount(f1 ^ f2) if d <= 3
    } yield (i1, i2, d.toLong)).toSet
    assert(got == brute)
    assert(planted.indices.forall(d =>
      got.contains((base(d * 7)._1, 1000L + d, d.toLong))))
  }

  test("end-to-end: assembled WAV variants pair with their originals") {
    def clip(d: Int, perturb: Boolean): Array[Int] =
      Array.tabulate(650 + (d % 5) * 65) { t =>
        val s = ((d % 997 + 1) * t * t + (13 + d % 89) * t + d) % 4001 - 2000
        if (perturb && t % 97 == 0) s + 3 else s
      }
    val media = (0 until 20).map(d => (d.toLong, wav(clip(d, perturb = false)))) ++
      Seq((1000000L, wav(clip(0, perturb = true))))
    val fps = audioFingerprint(media.toDF("media_id", "payload"))
    val pairs = audioNearDups(fps).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1000000L)), pairs.toSeq.toString)
  }

  test("fp_version stamps the at-rest row; a foreign-format store fails loudly, not emptily") {
    val fps = audioFingerprint(Seq((1L, wav(Array.tabulate(130)(t => t % 100))))
      .toDF("media_id", "payload"))
    assert(fps.select("fp_version").collect().map(_.getLong(0)).toSeq == Seq(FpVersion))
    // a store written by the retired 32-bit format (v1) must REFUSE the
    // probe join in-plan — silence here would read as "no duplicates"
    val stale = Seq((1L, 7L, 1L), (2L, 7L, 1L)).toDF("media_id", "fp", "fp_version")
    val e = intercept[Exception](audioNearDups(stale).collect())
    assert(e.getMessage != null && e.getMessage.contains("format version"),
      s"expected the version refusal, got: ${e.getMessage}")
  }
}
