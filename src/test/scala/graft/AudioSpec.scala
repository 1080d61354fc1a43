package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Audio

class AudioSpec extends AnyFunSuite {

  test("WAV encode → parse round-trips samples, rate, channels exactly") {
    (0L until 40L).foreach { id =>
      val nChars = 100 + id * 37
      val w = Audio.parseWav(Audio.encodeWav(id, nChars))
      assert(w.sampleRate == Audio.sampleRate(id))
      assert(w.channels == 1)
      assert(w.bitsPerSample == 16)
      assert(w.samples.length == Audio.nSamples(nChars))
      w.samples.zipWithIndex.foreach { case (v, i) =>
        assert(v == Audio.sample(id, i.toLong), s"id=$id i=$i")
      }
    }
  }

  test("parser walks past the LIST metadata chunk (docId % 4 == 0 layout)") {
    // id 8 gets the odd-length LIST payload → exercises the RIFF pad rule
    val bytes = Audio.encodeWav(8L, 300L)
    assert(new String(bytes.slice(36, 40), "US-ASCII") == "LIST")
    val w = Audio.parseWav(bytes)
    assert(w.samples.length == Audio.nSamples(300L))
    assert(w.samples(0) == Audio.sample(8L, 0L))
  }

  test("features are exact integer math") {
    val w = Audio.Wav(8000, 1, 16, Array(100, -200, 0, 300, -300))
    val f = Audio.features(w)
    assert(f.nSamples == 5)
    assert(f.durationMs == 0) // 5 samples / 8 kHz < 1 ms, integer floor
    assert(f.peak == 300)
    assert(f.sumSq == 100L * 100 + 200L * 200 + 300L * 300 + 300L * 300)
    // crossings: 100→-200 flips, -200→0 no (zero breaks), 0→300 no, 300→-300 flips
    assert(f.zeroCross == 2)
  }

  test("malformed input is rejected, not misread") {
    intercept[IllegalArgumentException](Audio.parseWav("JUNKJUNKJUNK".getBytes))
    val good = Audio.encodeWav(1L, 200L)
    // flip the data tag so no data chunk is ever found
    val noData = good.clone()
    val di = good.indexOfSlice("data".getBytes("US-ASCII"))
    noData(di) = 'x'.toByte
    intercept[IllegalArgumentException](Audio.parseWav(noData))
  }
}
