package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.{CorpusSpec, Images, SyntheticCorpus}

/** Multimodal (binary-payload) pipeline over opaque `binary` columns with
  * typed metadata — the Spark-side plumbing (schema, batching, partitioning)
  * is real; the *decoder* for q40 is a clearly-marked deterministic STUB
  * (no image/audio codecs for arbitrary media exist in this container).
  * q41 runs a REAL decode path: JDK ImageIO over the synthetic PNG/JPEG
  * corpus, inside mapPartitions — the exact shape a Pandas-UDF/mapInPandas
  * stage takes on a cluster (per-batch decode, executor-side).
  */
object MultimodalOps {

  /** STUB decoder: pretends `bytes` is a media blob and derives metadata
    * deterministically. A real deployment swaps `decodeStub` for an actual
    * codec; everything around it (binary column, batch iteration, schema)
    * stays unchanged.
    */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Int, String) = {
    val len = bytes.length
    // ??? real codec goes here — deterministic fake keeps the plumbing testable
    val w = 16 + (len % 64)
    val h = 16 + ((len / 64) % 64)
    val fmt = if (len % 2 == 0) "png" else "jpeg"
    (len, w, h, fmt)
  }

  /** Binary metadata extraction: text → UTF-8 bytes (stand-in payload) →
    * batched "decode" in mapPartitions → typed metadata columns. The byte
    * length is oracle-checked (octet_length in DuckDB); w/h/fmt come from the
    * same integer arithmetic on both sides.
    */
  def q40DecodeStub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // no scan-width guard here: the stub "decode" is integer arithmetic on
    // the byte length — cheaper than the exchange a widen would add
    // (measured +0.15 s at sf0.1); the real-codec paths q41/q42 widen
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        // batch loop mirrors an Arrow-batch UDF: decode in groups of 64
        rows.grouped(64).flatMap(_.iterator.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val (len, w, h, fmt) = decodeStub(bytes)
          (id, len.toLong, w.toLong, h.toLong, fmt)
        })
      }
      .toDF("doc_id", "byte_len", "w", "h", "fmt")
      .orderBy(col("doc_id"))
  }

  /** REAL image decode, HASH-GATED: synthesize an integer-math RGB image
    * per document ([[Images.synthInt]] — every pixel a pure function of
    * (doc_id, index, channel)), encode it to REAL PNG bytes (ImageIO),
    * decode those bytes back (ImageIO), and publish per-channel pixel sums
    * computed from the DECODED image. PNG is lossless, so the DuckDB
    * oracle regenerates the pixels arithmetically (the q44 audio recipe)
    * and the hash check covers synth → PNG encode → PNG decode → feature
    * math end to end — any codec deviation breaks the sums. Encode and
    * decode happen INSIDE the task; image bytes never cross a shuffle.
    * (JPEG, being lossy with encoder-specific output, stays in the
    * rows-only [[q58JpegFidelity]].)
    */
  def q41ImageDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // PNG encode+decode per row is the heaviest per-row kernel in the pack:
    // widen a narrow (single-row-group) scan or the codecs run one-core
    Scans.spread(s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id")), col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + (id % 17).toInt
          val h = 16 + (id % 13).toInt
          val dec = Images.decode(Images.encodePng(Images.synthInt(id, w, h)))
          var rs = 0L; var gs = 0L; var bs = 0L
          var y = 0
          while (y < dec.getHeight) {
            var x = 0
            while (x < dec.getWidth) {
              val p = dec.getRGB(x, y)
              rs += (p >> 16) & 0xFF; gs += (p >> 8) & 0xFF; bs += p & 0xFF
              x += 1
            }
            y += 1
          }
          (id, dec.getWidth.toLong, dec.getHeight.toLong, rs, gs, bs)
        }
      }
      .toDF("doc_id", "w", "h", "r_sum", "g_sum", "b_sum")
      .orderBy(col("doc_id"))
  }

  /** REAL image resize, HASH-GATED: the [[q41ImageDecode]] PNGs decoded,
    * area-average resized to 8×8 ([[Images.resize]] — specified arithmetic:
    * cell = floor(Σchannel/count + ½), integer grid mapping), re-encoded to
    * PNG, decoded AGAIN, and per-channel thumbnail sums published from that
    * second decode. The re-encode→re-decode round trip rides inside the
    * gate for free (PNG lossless ⇒ identity), so the oracle — which
    * computes the same grid fold in SQL (integer sums, one IEEE double
    * division per cell, identical in both engines) — verifies decode,
    * resize arithmetic AND the encoder round trip.
    */
  def q42Thumbnail(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // two PNG encode+decode round trips per row — same widen-if-narrow
    // rationale as q41
    Scans.spread(s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id")), col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + (id % 17).toInt
          val h = 16 + (id % 13).toInt
          val img = Images.decode(Images.encodePng(Images.synthInt(id, w, h)))
          val thumb = Images.decode(Images.encodePng(Images.resize(img, 8, 8)))
          var rs = 0L; var gs = 0L; var bs = 0L
          var y = 0
          while (y < thumb.getHeight) {
            var x = 0
            while (x < thumb.getWidth) {
              val p = thumb.getRGB(x, y)
              rs += (p >> 16) & 0xFF; gs += (p >> 8) & 0xFF; bs += p & 0xFF
              x += 1
            }
            y += 1
          }
          (id, thumb.getWidth.toLong, thumb.getHeight.toLong, rs, gs, bs)
        }
      }
      .toDF("doc_id", "tw", "th", "r_sum", "g_sum", "b_sum")
      .orderBy(col("doc_id"))
  }

  /** JPEG fidelity over the engine's sinusoid corpus — decode + phash
    * recompute + byte totals per row. ROWS-ONLY by nature: JPEG is lossy
    * and its encoder output is implementation-specific, so no independent
    * SQL engine can regenerate the decoded pixels (the PNG half of the old
    * q41/q42 is now fully hash-gated instead). The PSNR ≥ 40 dB and
    * phash-stability invariants are asserted in ImagesSpec.
    */
  def q58JpegFidelity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val spec = CorpusSpec(hosts = 2, listPages = 2, detailsPerList = 8)
    SyntheticCorpus.build(s, spec)
      .filter(col("routeId") === SyntheticCorpus.DETAIL && col("statusCode") === 200
        && col("fmt") === "jpeg") // column predicate BEFORE the typed
      // boundary: a typed lambda here would deserialize every row and
      // fence pushdown/pruning below the deserializer
      .as[graft.corpus.CorpusRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val img = Images.decode(r.body)
          val ph = Images.phash(img)
          (r.fmt, img.getWidth, img.getHeight,
            if (ph == r.phash) 1L else 0L, r.body.length.toLong)
        }
      }
      .toDF("fmt", "w", "h", "phash_match", "nbytes")
      .groupBy(col("fmt"))
      .agg(count(lit(1)).as("n"), sum(col("phash_match")).as("phash_matches"),
        min(col("w")).as("w"), min(col("h")).as("h"),
        sum(col("nbytes")).as("total_bytes"))
      .orderBy(col("fmt"))
  }

  /** Frame sampling over a multi-frame (video stand-in) payload: each row
    * carries `frames array<binary>`; every `stride`-th frame is picked
    * DECLARATIVELY (`transform(sequence(...))` over the array — the
    * projection-pushdown analogue: unsampled frames never reach the
    * decoder), then only the sampled frames pay the real ImageIO decode +
    * phash in mapPartitions. At cluster scale the container column is a
    * video blob + frame index; the plumbing (array column, Catalyst-side
    * sampling, batched decode) is exactly this. Deterministic — rows-only.
    */
  def q43FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val framesPerVideo = 12
    val stride = 4
    val vids = s.range(64).as[Long]
      .mapPartitions { ids =>
        ids.map { v =>
          val frames = (0 until framesPerVideo).map(f =>
            Images.encodePng(Images.synth(v, 64, 48, jitter = f * 0.08))).toArray
          (v, frames)
        }
      }
      .toDF("video_id", "frames")
    vids
      .select(col("video_id"), size(col("frames")).as("n_frames"),
        expr(s"transform(sequence(0, size(frames)-1, $stride), i -> element_at(frames, i+1))")
          .as("picked"))
      .select(col("video_id"), col("n_frames"), posexplode(col("picked")).as(Seq("idx", "frame")))
      .as[(Long, Int, Int, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (v, nf, _, bytes) =>
          val img = Images.decode(bytes)
          (v, nf.toLong, Images.phash(img), math.round(Images.meanLuma(img) * 1000))
        }
      }
      .toDF("video_id", "n_frames", "ph", "luma_x1000")
      .groupBy(col("video_id"), col("n_frames"))
      .agg(count(lit(1)).as("n_sampled"),
        countDistinct(col("ph")).as("n_unique_phash"),
        sum(col("luma_x1000")).as("sum_luma_x1000"))
      .orderBy(col("video_id"))
  }

  /** REAL audio decode + feature extraction: synthesize a mono PCM16 WAV
    * per document (RIFF layout with metadata chunks — [[graft.corpus.Audio]]),
    * then chunk-walk parse it back and extract integer features (duration,
    * peak, energy, zero crossings) in mapPartitions. Unlike q41-q43 this IS
    * fully DuckDB-oracled: samples are a pure integer function of
    * (doc_id, i), so the oracle regenerates the waveform arithmetically
    * while Spark round-trips real WAV bytes — the hash check covers
    * encode → RIFF parse → feature math end to end.
    */
  def q44AudioFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.corpus.Audio
    // no scan-width guard: a few hundred PCM samples per row synthesize in
    // microseconds — the widen exchange cost more than it bought
    // (measured +0.36 s at sf0.1); q41/q42's image codecs are where the
    // guard pays
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, nChars) =>
          // encode and parse INSIDE the task: bytes never cross a shuffle
          val f = Audio.features(Audio.parseWav(Audio.encodeWav(id, nChars)))
          (id, f.nSamples, f.sampleRate, f.durationMs, f.peak, f.sumSq, f.zeroCross)
        }
      }
      .toDF("doc_id", "n_samples", "sample_rate", "duration_ms", "peak",
        "sum_sq", "zero_cross")
      .orderBy(col("doc_id"))
  }

  val oracle: Map[String, String] = Map(
    "q44_audio_features" ->
      """WITH params AS (
           SELECT doc_id,
                  256 + (n_chars % 512) AS n,
                  CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                       ELSE 44100 END AS rate
           FROM documents
         ), s AS (
           SELECT p.doc_id, p.n, p.rate, g.i,
                  ((p.doc_id*40503 + g.i*2654435761) % 65536) - 32768 AS v,
                  CASE WHEN g.i > 0 THEN
                    ((p.doc_id*40503 + (g.i-1)*2654435761) % 65536) - 32768
                  END AS pv
           FROM params p,
                LATERAL (SELECT unnest(generate_series(0, CAST(p.n AS BIGINT) - 1)) AS i) g
         )
         SELECT doc_id,
                CAST(max(n) AS BIGINT) AS n_samples,
                CAST(max(rate) AS BIGINT) AS sample_rate,
                CAST(max(n) * 1000 // max(rate) AS BIGINT) AS duration_ms,
                CAST(max(abs(v)) AS BIGINT) AS peak,
                CAST(sum(v*v) AS BIGINT) AS sum_sq,
                CAST(sum(CASE WHEN pv IS NOT NULL AND pv*v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross
         FROM s GROUP BY doc_id ORDER BY doc_id""",
    "q41_image_decode" ->
      """WITH params AS (
           SELECT doc_id,
                  CAST(16 + doc_id % 17 AS BIGINT) AS w,
                  CAST(16 + doc_id % 13 AS BIGINT) AS h
           FROM documents
         ), px AS (
           SELECT p.doc_id, p.w, p.h,
                  (p.doc_id*40503 + g.i*2654435761) % 256 AS r,
                  (p.doc_id*40503 + g.i*2654435761 + 7919) % 256 AS g2,
                  (p.doc_id*40503 + g.i*2654435761 + 15838) % 256 AS b
           FROM params p,
                LATERAL (SELECT unnest(generate_series(0, CAST(p.w*p.h AS BIGINT) - 1)) AS i) g
         )
         SELECT doc_id, MAX(w) AS w, MAX(h) AS h,
                CAST(SUM(r) AS BIGINT) AS r_sum,
                CAST(SUM(g2) AS BIGINT) AS g_sum,
                CAST(SUM(b) AS BIGINT) AS b_sum
         FROM px GROUP BY doc_id ORDER BY doc_id""",
    "q42_thumbnail" ->
      """WITH params AS (
           SELECT doc_id,
                  CAST(16 + doc_id % 17 AS BIGINT) AS w,
                  CAST(16 + doc_id % 13 AS BIGINT) AS h
           FROM documents
         ), px AS (
           SELECT p.doc_id, p.w, p.h, g.i % p.w AS x, g.i // p.w AS y,
                  (p.doc_id*40503 + g.i*2654435761) % 256 AS r,
                  (p.doc_id*40503 + g.i*2654435761 + 7919) % 256 AS g2,
                  (p.doc_id*40503 + g.i*2654435761 + 15838) % 256 AS b
           FROM params p,
                LATERAL (SELECT unnest(generate_series(0, CAST(p.w*p.h AS BIGINT) - 1)) AS i) g
         ), cells AS (
           SELECT doc_id, (y * 8) // h AS gy, (x * 8) // w AS gx,
                  CAST(FLOOR(CAST(SUM(r) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cr,
                  CAST(FLOOR(CAST(SUM(g2) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cg,
                  CAST(FLOOR(CAST(SUM(b) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cb
           FROM px GROUP BY doc_id, gy, gx
         )
         SELECT doc_id, CAST(8 AS BIGINT) AS tw, CAST(8 AS BIGINT) AS th,
                CAST(SUM(cr) AS BIGINT) AS r_sum,
                CAST(SUM(cg) AS BIGINT) AS g_sum,
                CAST(SUM(cb) AS BIGINT) AS b_sum
         FROM cells GROUP BY doc_id ORDER BY doc_id""",
    "q40_decode_stub" ->
      """SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(16 + octet_length(encode(text)) % 64 AS BIGINT) AS w,
           CAST(16 + (octet_length(encode(text)) // 64) % 64 AS BIGINT) AS h,
           CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt
         FROM documents ORDER BY doc_id""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_decode_stub" -> q40DecodeStub _,
    "q41_image_decode" -> q41ImageDecode _,
    "q42_thumbnail" -> q42Thumbnail _,
    "q43_frame_sample" -> q43FrameSample _,
    "q44_audio_features" -> q44AudioFeatures _,
    "q58_jpeg_fidelity" -> q58JpegFidelity _)
}
