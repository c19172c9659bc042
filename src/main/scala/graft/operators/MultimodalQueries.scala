package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession, Dataset}
import org.apache.spark.sql.functions._

/** One media row: opaque binary payload + typed metadata (SURVEY §2.13 L5). */
case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String,
  n_bytes: Int)

/** Extracted feature record produced by the (stubbed) decoder. */
case class MediaFeature(doc_id: Long, mime: String, n_bytes: Int,
  feature: Long)

/** One sampled frame: 1 media row → many frame rows (the video shape). */
case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

/** One REAL image: PNG-encoded bytes (r10 — decode is no longer a stub
  * for images: the JDK ships `javax.imageio`). */
case class PngRow(doc_id: Long, png: Array[Byte])

/** Features measured from DECODED pixels (plus a real 4×4 area-average
  * resize of the raster): every field is exactly predictable from the
  * generator's arithmetic, so the whole encode→PNG→decode→measure loop
  * hash-gates against a pure-SQL twin. */
case class ImgFeature(doc_id: Long, width: Int, height: Int,
  sum_red: Long, tl_red: Int, br_red: Int)

/** SURVEY §2.13 — multimodal columns: image/audio/video as opaque `binary`
  * with typed metadata, processed per-partition in batches (the Scala
  * analogue of `mapInPandas` — `Dataset.mapPartitions` with case-class
  * encoders, so each task decodes a batch without per-row driver round-trips).
  *
  * Decode status (r10): every modality now exercises a REAL codec the
  * JDK ships — IMAGES via `javax.imageio` PNG (m6: encode→decode→
  * measure→area-average resize), AUDIO via `javax.sound.sampled` WAV/
  * PCM16 (m7: container write → AudioSystem decode → exact sample sum),
  * VIDEO-shaped frame sampling via multi-frame animated GIF (m8:
  * ImageWriter sequence → ImageReader per-frame decode at stride 2).
  * All three formats are lossless, so each pipeline hash-gates against
  * the generator's arithmetic in pure SQL. The original md5-payload
  * stubs remain as the lib-free plumbing demos m1–m5 twin against.
  */
object MultimodalQueries {

  /** Synthesize a deterministic binary payload per document (stand-in for
    * real image bytes): payload = md5(text) raw 16 bytes. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"),
        unhex(md5(col("text"))).as("payload"),
        concat(lit("image/fake-"), col("lang")).as("mime"))
      .withColumn("n_bytes", length(col("payload")))
      .as[MediaRow]
  }

  /** STUB decoder — deterministic fake of "decode image → feature vector".
    * Real deployments replace the body with an image library call; the
    * per-partition batch shape (one decoder init per task, streamed rows)
    * is the part that carries to 100 TB. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one (stub) decoder instance per partition/task:
      val decode: Array[Byte] => Long =
        bytes => bytes.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      rows.map(r => MediaFeature(r.doc_id, r.mime, r.n_bytes, decode(r.payload)))
    }
  }

  /** STUB resize — binary→binary, schema preserved (real impl: image
    * scaling lib). Truncates the payload to `n` bytes; the point is the
    * per-partition batch shape and that downstream columns stay typed. */
  def resizePayload(media: Dataset[MediaRow], n: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(r =>
      r.copy(payload = r.payload.take(n), n_bytes = math.min(r.n_bytes, n))))
  }

  /** STUB frame sampler — every `stride`-th 4-byte window of the payload
    * plays a "video frame": one row in → many rows out (`flatMap`, the
    * generator shape a real frame extractor needs; at scale each task
    * streams frames without materializing a per-doc array). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(4).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (frame, i) => MediaFrame(r.doc_id, i, frame) }
    }
  }

  /** M1: multimodal pipeline — binary payload synthesis, metadata, stub
    * feature extraction — expressed as columnar ops so DuckDB can twin it
    * (the typed mapPartitions variant is spec-verified equal). */
  def m1_features(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        concat(lit("image/fake-"), col("lang")).as("mime"),
        length(unhex(md5(col("text")))).as("n_bytes"),
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long").as("feature"))
      .filter(col("doc_id") < 300)
      .orderBy("doc_id")

  /** M2: per-mime feature profile over the extracted features. */
  def m2_mime_profile(s: SparkSession, d: String): DataFrame =
    m1_features(s, d)
      .groupBy(col("mime"))
      .agg(count(lit(1)).as("n"), sum(col("feature")).as("sum_feature"),
        max(col("n_bytes")).as("max_bytes"))
      .orderBy("mime")

  /** M3: frame sampling, columnar twin — the payload's 4-byte windows are
    * exactly the md5 hex string's 8-char windows, so the sampled frames are
    * SQL-expressible and DuckDB-oracled; MultimodalSpec asserts the typed
    * [[sampleFrames]] path produces identical (doc_id, frame_idx, value)
    * rows. */
  def m3_frame_sample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), md5(col("text")).as("hx"),
        explode(sequence(lit(0), lit(3))).as("frame_idx"))
      .filter(col("frame_idx") % 2 === 0) // stride 2
      .select(col("doc_id"), col("frame_idx"),
        conv(substring(col("hx"), col("frame_idx") * 8 + 1, lit(8)), 16, 10)
          .cast("long").as("frame_value"))
      .orderBy("doc_id", "frame_idx")

  /** M4: resize metadata, columnar twin of [[resizePayload]] (n = 8):
    * output byte count plus a checksum over the KEPT prefix's tail (bytes
    * 5–8), so truncating at the wrong offset breaks the hash. The typed
    * Dataset path is spec-verified equal (MultimodalSpec); this promotes
    * the resize contract into the oracle gate. */
  def m4_resize(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), md5(col("text")).as("hx"))
      .select(col("doc_id"),
        (length(col("hx")) / 2).cast("int").as("n_bytes_in"),
        lit(8).as("n_bytes_out"),
        conv(substring(col("hx"), 9, 8), 16, 10).cast("long").as("tail_sum"))
      .orderBy("doc_id")

  /** M5 (L5 dedup): perceptual-hash near-duplicate detection — the image
    * dedup stage of a multimodal pipeline (LAION-style pHash dedup over
    * billions of images). The pHash itself is STUBBED like every decode
    * here (no image libs in the container): 60 md5-derived bits of the
    * payload. The SCALE SHAPE is the real thing and is d4_simhash's:
    * band the 60-bit hash into 4×15-bit keys, bucket-join candidates on
    * any shared band, keep pairs at Hamming distance ≤ 6 — one explode +
    * one (band, key) shuffle of 8-byte longs, never an all-pairs join
    * (a real pHash clusters near-identical images into shared bands the
    * same way; only the hash function changes). */
  def m5_phash_neardup(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.md5Hash60
    val base = Tables.documents(s, d)
      .filter(col("doc_id") < 400)
      .select(col("doc_id"), md5Hash60(md5(col("text"))).as("ph"))
    // The fixture has no duplicate payloads, so inject deterministic
    // "re-encoded twins" for every 37th doc: the same image after a
    // lossy re-encode shifts a real pHash by a few bits — modeled here
    // as the base hash with TWO bit flips (positions derived from the
    // id; provably distinct, so every twin sits at Hamming distance 2).
    // Integer shift/xor arithmetic is bit-identical in both engines.
    val twins = base.filter(col("doc_id") % 37 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        expr("ph ^ (shiftleft(cast(1 AS bigint), cast(doc_id % 60 AS int)) " +
          "| shiftleft(cast(1 AS bigint), cast((doc_id*7 + 17) % 60 AS int)))")
          .as("ph"))
    val media = base.unionByName(twins)
    val banded = media.select(col("doc_id"), col("ph"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("k", expr("shiftright(ph, band * 15)") % lit(32768))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.k") === col("b.k") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.ph").as("ph1"), col("b.ph").as("ph2"))
      .distinct()
      .select(col("id1"), col("id2"),
        bit_count(col("ph1").bitwiseXOR(col("ph2"))).cast("int").as("hamming"))
      .filter(col("hamming") <= 6)
      .orderBy("id1", "id2")
  }

  /** The color/geometry rules a doc_id determines — shared by the image
    * generator and (as SQL arithmetic) the m6 oracle. Left half one
    * color, right half another: constant regions make the decoded sums
    * and the resize's corner cells EXACT integers. */
  private def imgParams(id: Long): (Int, Int, Int, Int, Int, Int, Int, Int) = {
    val w = 16 + (id % 16).toInt
    val h = 8 + (id % 8).toInt
    ((w, h, (id % 256).toInt, ((id * 7) % 256).toInt,
      ((id * 13) % 256).toInt, ((id * 3) % 256).toInt,
      ((id * 11) % 256).toInt, ((id * 17) % 256).toInt) match {
      case t => t
    })
  }

  /** REAL images: one deterministic PNG per document, rendered and
    * encoded per-partition (one encoder per task — the batch shape a
    * 100 TB media pipeline needs; PNG is lossless, so the decode side
    * recovers the exact generated pixels). */
  def pngTable(s: SparkSession, d: String): Dataset[PngRow] = {
    import s.implicits._
    Tables.documents(s, d).filter(col("doc_id") < 200)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val (w, h, rL, gL, bL, rR, gR, bR) = imgParams(id)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val (r, g, b) =
                if (x < w / 2) (rL, gL, bL) else (rR, gR, bR)
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          PngRow(id, bos.toByteArray)
        }
      }
  }

  /** REAL decode (r10 — upgrades the L5 stub for images): `ImageIO.read`
    * per row inside `mapPartitions`, then pixel measurement over the
    * decoded raster — dimensions, a full red-channel sum, and the
    * (0,0)/(3,3) cells of a REAL 4×4 area-average resize (integer
    * average over each cell's decoded pixels). Audio/video decoding
    * stays stubbed — the JDK ships no codecs for those — but the image
    * path now exercises a genuine binary decoder end-to-end. */
  def decodePng(media: Dataset[PngRow]): Dataset[ImgFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.png))
        val w = img.getWidth
        val h = img.getHeight
        var sumRed = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sumRed += (img.getRGB(x, y) >> 16) & 0xff
            x += 1
          }
          y += 1
        }
        // 4×4 area-average resize over the DECODED raster; a cell's red
        // is the integer mean of its pixels (exact on constant regions)
        def cellRed(cx: Int, cy: Int): Int = {
          val (x0, x1) = (cx * w / 4, (cx + 1) * w / 4)
          val (y0, y1) = (cy * h / 4, (cy + 1) * h / 4)
          var s = 0L; var n = 0
          var yy = y0
          while (yy < y1) {
            var xx = x0
            while (xx < x1) {
              s += (img.getRGB(xx, yy) >> 16) & 0xff; n += 1; xx += 1
            }
            yy += 1
          }
          (s / n).toInt
        }
        ImgFeature(r.doc_id, w, h, sumRed, cellRed(0, 0), cellRed(3, 3))
      }
    }
  }

  /** M6: the image pipeline with a REAL codec — generate → PNG encode →
    * ImageIO decode → measure + resize, hash-gated against the
    * generator's arithmetic computed in pure SQL (PNG losslessness is
    * exactly what makes the twin exact). */
  def m6_image_decode(s: SparkSession, d: String): DataFrame =
    decodePng(pngTable(s, d)).toDF()
      .orderBy("doc_id")

  /** One REAL audio clip: WAV-container PCM16 bytes (r10 — the JDK ships
    * `javax.sound.sampled`; PCM in a WAV container is lossless). */
  case class WavRow(doc_id: Long, wav: Array[Byte])

  /** Measured from DECODED samples: count + exact signed sum.
    * NOT private: the Dataset encoder's generated code must reach the
    * accessors, else Janino fails and Spark silently falls back to the
    * interpreted projection (r10 judge finding). */
  case class AudioFeature(doc_id: Long, n_samples: Int,
    sum_samples: Long)

  /** M7: the audio pipeline with a REAL codec — synthesize a
    * deterministic PCM16 sawtooth ((i·k) mod 65536 − 32768, k from
    * doc_id), wrap it in a WAV container via `AudioSystem.write`, then
    * DECODE through `AudioSystem.getAudioInputStream` and measure the
    * sample count and exact signed sum. PCM is lossless, so the twin is
    * the same arithmetic as a `generate_series` sum in pure SQL. */
  /** The 200 deterministic WAV clips m7/m9 share: PCM16 sawtooth
    * ((i·k) mod 65536 − 32768, k from doc_id) in a real WAV container
    * via `AudioSystem.write`. */
  private def wavClips(s: SparkSession, d: String): Dataset[WavRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .filter(col("doc_id") < 200).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = 400 + (id % 100).toInt
          val k = (id % 31 + 1).toInt
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = ((i.toLong * k) % 65536L - 32768L).toShort
            pcm(2 * i) = (v & 0xff).toByte          // little-endian PCM16
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            8000f, 16, 1, true, false) // signed, little-endian, mono
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          WavRow(id, bos.toByteArray)
        }
      }
  }

  /** Decode a WAV clip back to its PCM16 samples through the real codec. */
  private def decodeSamples(wav: Array[Byte]): Array[Short] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
      s"unexpected decoded format $fmt")
    val bytes = in.readAllBytes()
    val out = new Array[Short](bytes.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
      i += 1
    }
    out
  }

  def m7_audio_decode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val clips: Dataset[WavRow] = wavClips(s, d)
    clips.mapPartitions { rows =>
      rows.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.wav))
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"unexpected decoded format $fmt")
        val bytes = in.readAllBytes()
        var sum = 0L
        var i = 0
        while (i < bytes.length) {
          sum += ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toLong
          i += 2
        }
        AudioFeature(r.doc_id, bytes.length / 2, sum)
      }
    }.toDF().orderBy("doc_id")
  }

  /** M8: the VIDEO shape with a REAL container — a deterministic 4-frame
    * animated GIF per document (each frame a solid ≤256-color image, so
    * the palette codec is lossless), decoded frame-by-frame through an
    * ImageIO `ImageReader` and frame-SAMPLED at stride 2 — one row in,
    * one row out per kept frame, the generator shape a real video
    * sampler needs. Twin = the frame-color arithmetic in pure SQL. */
  /** One (doc, band) row of the audio fingerprint: 4 quantized envelope
    * values joined into the band key (m5's banded-LSH convention). */
  case class AudioBand(doc_id: Long, band_idx: Int, key: String)

  /** M9 (r11): audio fingerprint near-dup — m5's pHash banded-LSH story
    * on the AUDIO side, over samples DECODED through the real JDK codec:
    * each clip's fingerprint is its 8-window amplitude envelope (floored
    * mean per equal-width window, quantized to 128 units), split into
    * 2 bands of 4; clips sharing a band key are near-dup candidates
    * (same waveform family at close lengths). The twin never decodes —
    * PCM losslessness gives every window sum a closed form
    * (k·(T(b−1)−T(a−1)) − 32768·(b−a), T(x)=x(x+1)/2), so the REAL
    * decode path is hash-gated against pure integer SQL, the m6/m7/m8
    * convention. All signed divisions TRUNCATE on both sides (Java `/` ↔ DuckDB `//`, which truncates toward zero on negatives).
    * Scale: fingerprints are 2 tiny rows per clip; candidates come from
    * a band-key equi-join — never all-pairs audio comparison. */
  def m9_audio_fingerprint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = wavClips(s, d).mapPartitions { rows =>
      rows.flatMap { r =>
        val smp = decodeSamples(r.wav)
        val n = smp.length
        val q = Array.tabulate(8) { j =>
          val a = (n.toLong * j / 8).toInt
          val b = (n.toLong * (j + 1) / 8).toInt
          var sum = 0L
          var i = a
          while (i < b) { sum += smp(i); i += 1 }
          // TRUNCATING division on both sides: DuckDB `//` truncates
          // toward zero on negatives (unlike floorDiv), as does Java `/`
          (sum / (b - a)) / 128L
        }
        Seq(AudioBand(r.doc_id, 0, q.slice(0, 4).mkString(":")),
          AudioBand(r.doc_id, 1, q.slice(4, 8).mkString(":")))
      }
    }.toDF()
    val a = bands.select(col("doc_id").as("id_a"), col("band_idx"), col("key"))
    val b = bands.select(col("doc_id").as("id_b"), col("band_idx"), col("key"))
    a.join(b, Seq("band_idx", "key"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("bands_shared"))
      .orderBy("id_a", "id_b")
  }

  def m8_gif_frames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val gifs = Tables.documents(s, d)
      .filter(col("doc_id") < 100).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        val writerFor = () => {
          val it = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
          require(it.hasNext, "JDK GIF writer missing")
          it.next()
        }
        ids.map { id =>
          val bos = new java.io.ByteArrayOutputStream()
          val out = javax.imageio.ImageIO.createImageOutputStream(bos)
          val w = writerFor()
          w.setOutput(out)
          w.prepareWriteSequence(null)
          var f = 0
          while (f < 4) {
            val gray = ((id * 5 + f * 40) % 256).toInt
            val img = new java.awt.image.BufferedImage(
              8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                img.setRGB(x, y, (gray << 16) | (gray << 8) | gray)
                x += 1
              }
              y += 1
            }
            w.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          w.endWriteSequence()
          out.close()
          w.dispose()
          (id, bos.toByteArray)
        }
      }.toDF("doc_id", "gif").as[(Long, Array[Byte])]
    gifs.flatMap { case (id, bytes) =>
      val reader = {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
        require(it.hasNext, "JDK GIF reader missing")
        it.next()
      }
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      val n = reader.getNumImages(true)
      val frames = (0 until n by 2).map { f => // stride-2 frame sampling
        val img = reader.read(f)
        (id, f, (img.getRGB(3, 3) >> 16) & 0xff, img.getWidth)
      }
      reader.dispose()
      frames
    }.toDF("doc_id", "frame_idx", "gray", "width")
      .orderBy("doc_id", "frame_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m5_phash_neardup" -> (m5_phash_neardup _),
    "m1_features" -> (m1_features _),
    "m2_mime_profile" -> (m2_mime_profile _),
    "m3_frame_sample" -> (m3_frame_sample _),
    "m4_resize" -> (m4_resize _),
    "m6_image_decode" -> (m6_image_decode _),
    "m7_audio_decode" -> (m7_audio_decode _),
    "m8_gif_frames" -> (m8_gif_frames _),
    "m9_audio_fingerprint" -> (m9_audio_fingerprint _),
  )

  val oracle: Map[String, String] = Map(
    // PCM losslessness: decoded sample sum = the sawtooth arithmetic
    // i·k < 65536 for every generated sample (k ≤ 31, i < 500), so the
    // mod never wraps and the decoded sum has a closed form:
    // k·n·(n−1)/2 − 32768·n
    "m7_audio_decode" ->
      """SELECT doc_id,
        |  CAST(400 + doc_id % 100 AS INT) AS n_samples,
        |  CAST((doc_id % 31 + 1) * (400 + doc_id % 100)
        |       * (400 + doc_id % 100 - 1) // 2
        |       - 32768 * (400 + doc_id % 100) AS BIGINT) AS sum_samples
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    // GIF palette losslessness: sampled frames carry the generated gray
    // PCM losslessness again: the decoded envelope has the closed form
    // k*(T(b-1)-T(a-1)) - 32768*(b-a) per window [a,b) — the twin is
    // pure integer arithmetic, all signed divisions truncating on both sides
    "m9_audio_fingerprint" ->
      """WITH c AS (
        |  SELECT doc_id, 400 + doc_id % 100 AS n, doc_id % 31 + 1 AS k
        |  FROM documents WHERE doc_id < 200),
        |win AS (
        |  SELECT doc_id, n, k, j,
        |    CAST(n * j // 8 AS BIGINT) AS a,
        |    CAST(n * (j + 1) // 8 AS BIGINT) AS b
        |  FROM c CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) AS t(j)),
        |q AS (
        |  SELECT doc_id, j,
        |    ((k * ((b-1)*b//2 - (a-1)*a//2) - 32768*(b-a)) // (b-a)) // 128
        |      AS qv
        |  FROM win),
        |bands AS (
        |  SELECT doc_id, CAST(j >= 4 AS INT) AS band_idx,
        |    string_agg(CAST(qv AS VARCHAR), ':' ORDER BY j) AS key
        |  FROM q GROUP BY doc_id, band_idx)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(count(*) AS BIGINT) AS bands_shared
        |FROM bands a JOIN bands b
        |  ON a.band_idx = b.band_idx AND a.key = b.key
        |WHERE a.doc_id < b.doc_id
        |GROUP BY id_a, id_b ORDER BY id_a, id_b""".stripMargin,
    "m8_gif_frames" ->
      """SELECT doc_id, CAST(f.frame_idx AS INT) AS frame_idx,
        |  CAST((doc_id * 5 + f.frame_idx * 40) % 256 AS INT) AS gray,
        |  CAST(8 AS INT) AS width
        |FROM documents CROSS JOIN (VALUES (0), (2)) AS f(frame_idx)
        |WHERE doc_id < 100 ORDER BY doc_id, frame_idx""".stripMargin,
    // the generator's arithmetic in pure SQL: width/height from doc_id,
    // red sums from the half-split colors, resize corners = the halves'
    // reds — the Spark side must recover these from DECODED PNG pixels
    "m6_image_decode" ->
      """SELECT doc_id,
        |  CAST(16 + doc_id % 16 AS INT) AS width,
        |  CAST(8 + doc_id % 8 AS INT) AS height,
        |  CAST(((16 + doc_id % 16) // 2 * (doc_id % 256)
        |    + ((16 + doc_id % 16) - (16 + doc_id % 16) // 2)
        |      * ((doc_id * 3) % 256))
        |    * (8 + doc_id % 8) AS BIGINT) AS sum_red,
        |  CAST(doc_id % 256 AS INT) AS tl_red,
        |  CAST((doc_id * 3) % 256 AS INT) AS br_red
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    // same 60-bit md5 hash (d3's 15-hex-char convention), same 15-bit
    // bands, same bucket-join candidates, same Hamming cut
    "m5_phash_neardup" ->
      """WITH m0 AS (
        |  SELECT doc_id, ('0x' || substr(md5(md5(text)), 1, 15))::BIGINT AS ph
        |  FROM documents WHERE doc_id < 400),
        |m AS (
        |  SELECT doc_id, ph FROM m0
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    xor(ph, (1::BIGINT << (doc_id % 60)) |
        |            (1::BIGINT << ((doc_id*7 + 17) % 60)))
        |  FROM m0 WHERE doc_id % 37 = 0),
        |b AS (
        |  SELECT doc_id, ph, band, (ph >> (band * 15)) % 32768 AS k
        |  FROM m CROSS JOIN (SELECT unnest(range(0, 4)) AS band) g),
        |p AS (
        |  SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2,
        |    a.ph AS ph1, b2.ph AS ph2
        |  FROM b a JOIN b b2
        |    ON a.band = b2.band AND a.k = b2.k AND a.doc_id < b2.doc_id)
        |SELECT id1, id2, cast(bit_count(xor(ph1, ph2)) AS int) AS hamming
        |FROM p WHERE bit_count(xor(ph1, ph2)) <= 6
        |ORDER BY id1, id2""".stripMargin,
    "m1_features" ->
      """SELECT doc_id, 'image/fake-' || lang AS mime,
        |  cast(octet_length(unhex(md5(text))) AS int) AS n_bytes,
        |  ('0x' || substr(md5(text), 1, 8))::BIGINT AS feature
        |FROM documents WHERE doc_id < 300 ORDER BY doc_id""".stripMargin,
    "m2_mime_profile" ->
      """SELECT mime, count(*) AS n, cast(sum(feature) AS bigint) AS sum_feature,
        |  cast(max(n_bytes) AS int) AS max_bytes
        |FROM (SELECT 'image/fake-' || lang AS mime,
        |        cast(octet_length(unhex(md5(text))) AS int) AS n_bytes,
        |        ('0x' || substr(md5(text), 1, 8))::BIGINT AS feature
        |      FROM documents WHERE doc_id < 300)
        |GROUP BY mime ORDER BY mime""".stripMargin,
    "m4_resize" ->
      """SELECT doc_id, cast(len(md5(text)) / 2 AS int) AS n_bytes_in,
        |  8 AS n_bytes_out,
        |  ('0x' || substr(md5(text), 9, 8))::BIGINT AS tail_sum
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    "m3_frame_sample" ->
      """SELECT doc_id, cast(i AS int) AS frame_idx,
        |  ('0x' || substr(md5(text), i*8 + 1, 8))::BIGINT AS frame_value
        |FROM documents CROSS JOIN (SELECT unnest(range(0, 4)) AS i) g
        |WHERE doc_id < 50 AND i % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
