package graft.corpus

import java.nio.{ByteBuffer, ByteOrder}

/** Deterministic PCM/WAV audio stand-in for the multimodal pipeline.
  *
  * The sandbox ships no audio codecs, but WAV/PCM needs none: RIFF is a
  * chunked byte layout and PCM16 samples are plain little-endian shorts, so
  * BOTH the encoder and the decoder here are real (pure-JDK byte work), not
  * stubs — the same relationship q41 has to ImageIO. Samples are a pure
  * integer function of (docId, i), which is what makes the feature op
  * (q44) fully DuckDB-oracle-able: the oracle regenerates the waveform from
  * the same arithmetic while Spark round-trips it through actual WAV bytes,
  * so the oracle check covers the encode→parse→extract path end to end.
  *
  * Reference tie-in: nest treats fetched payloads as opaque bodies handed to
  * a per-route scraper (/root/reference/src/spider.js:66-82, page wrapper
  * page.js:32-53); an audio route's "scraper" is exactly this parse.
  */
object Audio {

  /** Deterministic PCM16 sample i of document `docId` — all integer ops,
    * portable to any engine with 64-bit integers (DuckDB oracle uses the
    * identical expression). Range: [-32768, 32767].
    */
  def sample(docId: Long, i: Long): Int =
    (((docId * 40503L + i * 2654435761L) % 65536L) - 32768L).toInt

  /** Samples per doc derived from the table's n_chars column (256..767). */
  def nSamples(nChars: Long): Int = (256 + (nChars % 512)).toInt

  /** Sample rate keyed off docId — three common telephony/speech/CD rates. */
  def sampleRate(docId: Long): Int = (docId % 3) match {
    case 0 => 8000
    case 1 => 16000
    case _ => 44100
  }

  /** Encode a mono PCM16 WAV. For docId % 4 == 0 a LIST/INFO metadata chunk
    * (odd-length payload, so the RIFF even-byte pad rule is exercised) is
    * inserted between fmt and data — real-world WAVs carry such chunks and a
    * parser that assumes the 44-byte canonical layout breaks on them.
    */
  def encodeWav(docId: Long, nChars: Long): Array[Byte] = {
    val n = nSamples(nChars)
    val rate = sampleRate(docId)
    val junk: Array[Byte] =
      if (docId % 4 == 0) {
        val payload = s"INFOISFT_graft_$docId".getBytes("US-ASCII")
        val b = ByteBuffer.allocate(8 + payload.length + (payload.length & 1))
          .order(ByteOrder.LITTLE_ENDIAN)
        b.put("LIST".getBytes("US-ASCII")).putInt(payload.length).put(payload)
        if ((payload.length & 1) == 1) b.put(0.toByte) // RIFF pad to even
        b.array()
      } else Array.emptyByteArray
    val dataLen = n * 2
    val riffLen = 4 + (8 + 16) + junk.length + (8 + dataLen)
    val buf = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffLen).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(rate)
    buf.putInt(rate * 2)  // byte rate
    buf.putShort(2)       // block align
    buf.putShort(16)      // bits/sample
    buf.put(junk)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { buf.putShort(sample(docId, i).toShort); i += 1 }
    buf.array()
  }

  /** Parsed WAV: format metadata + raw PCM16 samples. */
  final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Int])

  /** Real RIFF chunk-walk parse (fmt anywhere before data, unknown chunks
    * skipped with the even-byte pad rule) — NOT a fixed-offset read.
    */
  def parseWav(bytes: Array[Byte]): Wav = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII") }
    require(tag() == "RIFF", "not a RIFF file")
    buf.getInt() // riff length
    require(tag() == "WAVE", "not a WAVE form")
    var rate = -1; var channels = -1; var bits = -1
    var samples: Array[Int] = null
    while (buf.remaining() >= 8 && samples == null) {
      val id = tag(); val len = buf.getInt()
      id match {
        case "fmt " =>
          val start = buf.position()
          val codec = buf.getShort()
          require(codec == 1, s"not PCM (codec $codec)")
          channels = buf.getShort().toInt
          rate = buf.getInt()
          buf.getInt(); buf.getShort() // byte rate, block align
          bits = buf.getShort().toInt
          buf.position(start + len + (len & 1))
        case "data" =>
          require(rate > 0, "data chunk before fmt")
          require(bits == 16, s"only PCM16 supported (got $bits)")
          val n = len / 2
          val out = new Array[Int](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort().toInt; i += 1 }
          samples = out
        case _ => // LIST/INFO/etc — skip, honoring the even-byte pad
          buf.position(buf.position() + len + (len & 1))
      }
    }
    require(samples != null, "no data chunk")
    Wav(rate, channels, bits, samples)
  }

  /** Integer audio features of a PCM16 stream — every output exact and
    * engine-portable (no floats): duration (integer ms), peak |amplitude|,
    * energy as a raw sum of squares, and zero crossings (strict sign flip:
    * s[i-1]*s[i] < 0, zeros break a crossing).
    */
  final case class Features(nSamples: Long, sampleRate: Long, durationMs: Long,
      peak: Long, sumSq: Long, zeroCross: Long)

  def features(w: Wav): Features = {
    var peak = 0L; var sumSq = 0L; var zc = 0L
    var i = 0
    val s = w.samples
    while (i < s.length) {
      val v = s(i).toLong
      val a = math.abs(v)
      if (a > peak) peak = a
      sumSq += v * v
      if (i > 0 && s(i - 1).toLong * v < 0) zc += 1
      i += 1
    }
    Features(s.length.toLong, w.sampleRate.toLong,
      s.length.toLong * 1000L / w.sampleRate, peak, sumSq, zc)
  }
}
