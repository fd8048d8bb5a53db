package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.Syntax._

/** §2.9 multimodal: opaque binary columns + typed metadata + REAL
  * image decode.
  *
  * The Spark-side machinery — binary column schema, metadata
  * extraction, partition-batched feature extraction — is real and
  * tested. The image path decodes REAL PNG bytes with the JDK's
  * javax.imageio ([[mmImageDecode]]): format name, dimensions and
  * pixels all come out of the actual codec. Audio/video codecs aren't
  * in this environment, so the generic feature path keeps the
  * deterministic [[decodeStub]] seam (swap for javacv / a Python
  * `mapInPandas` stage on a cluster with ffmpeg and nothing else
  * changes).
  *
  * Scale notes: binaries stay opaque until the last possible stage
  * (no shuffle ever carries decoded frames); decode/feature work is a
  * map-only `mapPartitions` so one task amortizes per-batch codec
  * setup across its whole partition.
  */
object BinaryPipeline extends QueryModule {

  // ImageIO defaults to DISK-backed stream caches (temp files per
  // encode/decode) — with 32 executor threads hammering tiny in-memory
  // payloads that is pure filesystem contention. Memory caching is the
  // right mode for byte-array media columns.
  javax.imageio.ImageIO.setUseCache(false)


  /** Id frame for the per-doc codec passes — deliberately NOT spread
    * to cluster width. The r12 optimization round measured the
    * obvious fix (repartition the 8-byte ids so the CPU-bound codec
    * map runs on every core) and it LOST 4×: `javax.imageio`'s static
    * IIORegistry serializes reader/writer lookups across threads, so
    * 32 concurrent codec tasks burn ~80× the single-thread task time
    * in lock contention (1.3 s serial → 105 s Σtask, wall 1.6 → 6.5 s).
    * One task per scan split is the right shape for the JDK codecs;
    * a production cluster gets parallelism across EXECUTORS (separate
    * JVMs, separate registries), not across threads in one JVM. */
  private def docIds(spark: SparkSession, dir: String): Dataset[Long] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
  }

  /** Synthesize a binary "media" column from text (deterministic stand-
    * in for real image/audio payloads): 4-byte magic + UTF-8 body. */
  def withBlob(docs: DataFrame): DataFrame =
    docs.withColumn("blob", encode(concat(lit("IMG0"), col("text")), "UTF-8"))

  // ------------------------------------------------- mm_binary_meta
  /** Typed metadata extraction from the opaque binary: magic, byte
    * size, and stub-decoded dimensions (deterministic fake in lieu of
    * a real header parse). */
  def mmBinaryMeta(spark: SparkSession, dir: String): DataFrame = {
    val size = length(col("blob"))
    withBlob(Tables.documents(spark, dir))
      .select(col("doc_id"),
        substring(hex(col("blob")), 1, 8).as("magic"),
        size.as("size_bytes"),
        (lit(64) + size % 577).as("fake_w"),
        (lit(64) + (size * 31) % 577).as("fake_h"))
      .orderBy("doc_id")
  }

  val mmBinaryMetaSql: String =
    """SELECT doc_id,
      |  substr(hex(encode('IMG0' || text)), 1, 8) AS magic,
      |  CAST(octet_length(encode('IMG0' || text)) AS INTEGER) AS size_bytes,
      |  CAST(64 + octet_length(encode('IMG0' || text)) % 577 AS INTEGER) AS fake_w,
      |  CAST(64 + (octet_length(encode('IMG0' || text)) * 31) % 577 AS INTEGER) AS fake_h
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ mm_image_decode
  /** Deterministic PNG payload for a doc id: a (w×h) image filled with
    * gray level (id mod 256), PNG-encoded by javax.imageio. Stands in
    * for real stored media (the sandbox parquet carries no images);
    * dimensions/pixels are arithmetic in the id so the decode step is
    * independently checkable. */
  def encodePng(id: Long): Array[Byte] = {
    val w = 8 + (id % 32).toInt
    val h = 8 + ((id * 7) % 32).toInt
    val c = (id % 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (c << 16) | (c << 8) | c
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL codec metadata + pixel probe: format name and dimensions
    * from the PNG header via the registered ImageReader, then a full
    * decode to read pixel (0,0) — nothing here trusts the generator's
    * arithmetic. */
  def decodeImageMeta(bytes: Array[Byte]): (String, Int, Int, Int) = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      require(readers.hasNext, "no ImageReader for payload")
      val reader = readers.next()
      reader.setInput(in)
      val fmt = reader.getFormatName.toLowerCase
      val w = reader.getWidth(0)
      val h = reader.getHeight(0)
      val img = reader.read(0)
      val red = (img.getRGB(0, 0) >> 16) & 0xff
      reader.dispose()
      (fmt, w, h, red)
    } finally in.close()
  }

  /** Driver query: encode a deterministic PNG per document, decode it
    * with the real JDK codec, emit (format, width, height, probe
    * pixel). The oracle recomputes the expected values arithmetically —
    * a hash match proves the bytes round-tripped through an actual PNG
    * encoder/decoder. Map-only (mapPartitions), no shuffle carries
    * decoded pixels. */
  def mmImageDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions { it =>
        // per-partition codec setup would go here (once per task)
        it.map { id =>
          val (fmt, w, h, red) = decodeImageMeta(encodePng(id))
          (id, fmt, w, h, red)
        }
      }
      .toDF("doc_id", "fmt", "width", "height", "p00_red")
      .orderBy("doc_id")
  }

  val mmImageDecodeSql: String =
    """SELECT doc_id, 'png' AS fmt,
      |  CAST(8 + doc_id % 32 AS INTEGER) AS width,
      |  CAST(8 + (doc_id * 7) % 32 AS INTEGER) AS height,
      |  CAST(doc_id % 256 AS INTEGER) AS p00_red
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ mm_audio_decode
  /** Deterministic PCM-WAV payload for a doc id (JDK javax.sound
    * encoder): 16-bit little-endian, rate/channels/frames arithmetic
    * in the id so the decode is independently checkable. */
  def encodeWav(id: Long): Array[Byte] = {
    val rate = 8000f + (id % 8).toInt * 1000f
    val channels = 1 + (id % 2).toInt
    val nFrames = 100 + (id % 50).toInt
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels,
      true, false)
    val data = new Array[Byte](nFrames * fmt.getFrameSize)
    var i = 0
    while (i < data.length) { data(i) = ((id + i) % 251).toByte; i += 1 }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL audio-header decode: sample rate, channels and frame count
    * parsed from the WAV header by the JDK's audio system. */
  def decodeWavMeta(bytes: Array[Byte]): (Int, Int, Int) = {
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(bytes))
    (aff.getFormat.getSampleRate.toInt, aff.getFormat.getChannels,
      aff.getFrameLength)
  }

  /** Driver query: encode a deterministic WAV per document, decode the
    * header with the real JDK codec, emit (rate, channels, frames).
    * Same contract as [[mmImageDecode]]: the oracle recomputes the
    * expected values arithmetically, so a hash match proves a real
    * encoder/decoder round-trip. Map-only. */
  def mmAudioDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions(_.map { id =>
        val (rate, ch, frames) = decodeWavMeta(encodeWav(id))
        (id, rate, ch, frames)
      })
      .toDF("doc_id", "sample_rate", "channels", "n_frames")
      .orderBy("doc_id")
  }

  val mmAudioDecodeSql: String =
    """SELECT doc_id,
      |  CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) AS sample_rate,
      |  CAST(1 + doc_id % 2 AS INTEGER) AS channels,
      |  CAST(100 + doc_id % 50 AS INTEGER) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------- mm_audio_waveform
  /** Full PCM read through the real JDK codec — past the header, into
    * the sample data: `AudioSystem.getAudioInputStream` locates and
    * streams the WAV data chunk, and the 16-bit little-endian frames
    * are assembled into signed samples. Emits exact waveform stats
    * (sample count, Σ|s|, max |s|) so the oracle — which recomputes
    * the synthetic payload's samples arithmetically — pins the codec
    * path bit-for-bit. Map-only pass; at scale the decode cost rides
    * the same partition-batched shape as [[extractFeatures]]. */
  def decodeWavSamples(bytes: Array[Byte]): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val data = ais.readAllBytes()
    val out = new Array[Int](data.length / 2)
    var k = 0
    while (k < out.length) {
      val lo = data(2 * k) & 0xff
      val hi = data(2 * k + 1) // sign-carrying high byte
      out(k) = (hi << 8) | lo
      k += 1
    }
    out
  }

  def mmAudioWaveform(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions(_.map { id =>
        val s = decodeWavSamples(encodeWav(id))
        var sum = 0L
        var mx = 0
        var i = 0
        while (i < s.length) {
          val a = math.abs(s(i)); sum += a; if (a > mx) mx = a; i += 1
        }
        (id, s.length, sum, mx)
      })
      .toDF("doc_id", "n_samples", "sum_abs", "max_abs")
      .orderBy("doc_id")
  }

  /** The payload's data bytes are (id + i) % 251, so sample k is
    * lo=(id+2k)%251, hi=(id+2k+1)%251 → signed16(lo + 256·hi). */
  val mmAudioWaveformSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    (100 + doc_id % 50) * (1 + doc_id % 2) AS ns
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    ((doc_id + 2*k) % 251) + ((doc_id + 2*k + 1) % 251) * 256 AS u
      |  FROM (SELECT doc_id, unnest(range(0, ns)) AS k FROM d) t),
      |v AS (SELECT doc_id,
      |  CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS smp FROM s)
      |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_samples,
      |  CAST(SUM(ABS(smp)) AS BIGINT) AS sum_abs,
      |  CAST(MAX(ABS(smp)) AS INTEGER) AS max_abs
      |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ----------------------------------- partition-batched feature path
  /** STUB decoder: a real implementation would parse the codec header
    * and decode pixels/samples here. Deterministic fake: 4 features
    * derived from byte content so tests can pin behavior. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    var a = 0; var b = 0
    var i = 0
    while (i < bytes.length) { a = (a + (bytes(i) & 0xff)) % 997; b = (b ^ (bytes(i) & 0xff)) + i; i += 1 }
    Array(bytes.length.toFloat, a.toFloat, (b % 1013).toFloat,
      if (bytes.length > 4) (bytes(4) & 0xff).toFloat else 0f)
  }

  /** Partition-batched feature extraction over (id, blob) rows — the
    * `mapPartitions` shape a real codec plugs into (per-partition
    * setup once, streamed batches, no driver involvement). */
  def extractFeatures(rows: Dataset[(Long, Array[Byte])]): Dataset[(Long, Array[Float])] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition codec init would go here (once per task)
      it.map { case (id, bytes) => (id, decodeStub(bytes)) }
    }
  }

  // ------------------------------------------------ mm_video_frames
  /** Synthetic length-prefixed frame container ("GVID" magic + frame
    * count + [len][PNG bytes] per frame) — the JDK ships no video
    * codec, so the CONTAINER layer is the honest part here (what an
    * mp4 atom walk does), while every sampled frame still round-trips
    * the real PNG codec. Frame f of video id is [[encodePng]] of
    * m = (id + f) mod 256, so frame dims/pixels stay arithmetically
    * checkable and the whole corpus shares only 256 distinct frames —
    * which the cache below exploits. */
  def encodeVideo(id: Long, frame: Int => Array[Byte]): Array[Byte] = {
    val n = 4 + (id % 8).toInt
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(0x47564944) // "GVID"
    d.writeInt(n)
    var f = 0
    while (f < n) {
      val b = frame(((id + f) % 256).toInt)
      d.writeInt(b.length)
      d.write(b)
      f += 1
    }
    d.flush()
    out.toByteArray
  }

  /** Frame sampling WITHOUT full decode: the walk SEEKS over unsampled
    * frames (length-prefixed skip — the reason container-aware
    * sampling beats decode-everything at scale) and only every
    * `stride`-th frame passes through the real PNG codec. `decode` is
    * content-addressed by the caller (identical frame bytes decode
    * once per task — the dedup play applied to media). */
  def videoFrameStats(bytes: Array[Byte], stride: Int,
      decode: Array[Byte] => (String, Int, Int, Int)): (Int, Int, Long, Long, Long) = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == 0x47564944, "not a GVID container")
    val n = in.readInt()
    var f = 0; var sampled = 0
    var sumW = 0L; var sumH = 0L; var sumGray = 0L
    while (f < n) {
      val len = in.readInt()
      if (f % stride == 0) {
        val fb = new Array[Byte](len)
        in.readFully(fb)
        val (fmt, w, h, red) = decode(fb)
        require(fmt == "png", s"unexpected frame codec $fmt")
        sampled += 1; sumW += w; sumH += h; sumGray += red
      } else {
        // skipNBytes raises EOFException on truncation — a plain
        // skip() loop would spin forever on skip()=0 at EOF
        in.skipNBytes(len)
      }
      f += 1
    }
    (n, sampled, sumW, sumH, sumGray)
  }

  /** Driver query: build the frame container per doc, stride-2 sample,
    * decode sampled frames with the real codec; per-task caches make
    * encode and decode content-addressed (256 distinct frames
    * corpus-wide), so codec work amortizes like any content-hashed
    * media store. The oracle recomputes the sums arithmetically. */
  def mmVideoFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions { it =>
        val enc = new scala.collection.mutable.HashMap[Int, Array[Byte]]
        val dec = new scala.collection.mutable.HashMap[String, (String, Int, Int, Int)]
        val md = java.security.MessageDigest.getInstance("MD5")
        def key(b: Array[Byte]): String = {
          md.reset(); md.digest(b).map("%02x".format(_)).mkString
        }
        it.map { id =>
          val video = encodeVideo(id, m => enc.getOrElseUpdate(m, encodePng(m.toLong)))
          val (n, s, w, h, g) = videoFrameStats(video, 2,
            fb => dec.getOrElseUpdate(key(fb), decodeImageMeta(fb)))
          (id, n, s, w, h, g)
        }
      }
      .toDF("doc_id", "n_frames", "n_sampled", "sum_width", "sum_height",
        "sum_gray")
      .orderBy("doc_id")
  }

  val mmVideoFramesSql: String =
    """WITH v AS (SELECT doc_id, 4 + doc_id % 8 AS nf FROM documents),
      |s AS (SELECT doc_id, nf, unnest(range(0, nf, 2)) AS f FROM v),
      |m AS (SELECT doc_id, nf, (doc_id + f) % 256 AS mm FROM s)
      |SELECT doc_id, CAST(nf AS INTEGER) AS n_frames,
      |  CAST(COUNT(*) AS INTEGER) AS n_sampled,
      |  CAST(SUM(8 + mm % 32) AS BIGINT) AS sum_width,
      |  CAST(SUM(8 + (mm * 7) % 32) AS BIGINT) AS sum_height,
      |  CAST(SUM(mm) AS BIGINT) AS sum_gray
      |FROM m GROUP BY doc_id, nf ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ mm_image_border
  /** Letterboxed gradient PNG: [[encodeGradientPng]]'s pixel field
    * surrounded by BLACK bands — (id mod 5) rows top and bottom,
    * ((id·3) mod 5) columns left and right — the padded shape a
    * vision-training corpus is full of (thumbnailers and aspect-fit
    * resizes letterbox everything). All pad arithmetic lives in the
    * id so the border scan is independently checkable. */
  def encodeLetterboxPng(id: Long): Array[Byte] = {
    val w = 8 + (id % 32).toInt
    val h = 8 + ((id * 7) % 32).toInt
    val pt = (id % 5).toInt
    val pl = ((id * 3) % 5).toInt
    val base = (id % 256).toInt
    val img = new java.awt.image.BufferedImage(
      w + 2 * pl, h + 2 * pt, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { // bands stay at the BufferedImage default (black)
      var x = 0
      while (x < w) {
        val g = (base + x + y) % 256
        img.setRGB(x + pl, y + pt, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL border scan on the decoded image: count leading/trailing
    * rows and columns whose every pixel equals the (0,0) corner —
    * the standard uniform-border letterbox detector. */
  def borderScan(bytes: Array[Byte]): (Int, Int, Int, Int, Int, Int) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val corner = img.getRGB(0, 0)
    def rowUniform(y: Int): Boolean =
      (0 until w).forall(x => img.getRGB(x, y) == corner)
    def colUniform(x: Int): Boolean =
      (0 until h).forall(y => img.getRGB(x, y) == corner)
    val top = (0 until h).takeWhile(rowUniform).size
    val bottom = ((h - 1) to 0 by -1).takeWhile(rowUniform).size
    val left = (0 until w).takeWhile(colUniform).size
    val right = ((w - 1) to 0 by -1).takeWhile(colUniform).size
    (w, h, math.min(top, h), math.min(bottom, h),
      math.min(left, w), math.min(right, w))
  }

  /** Driver query: encode a letterboxed gradient PNG per document,
    * decode with the real JDK codec, detect the uniform border, and
    * report the content fraction — the audit a vision-data pipeline
    * runs before cropping/packing (wasted letterbox pixels are wasted
    * encoder FLOPs). content_pm derives from the MEASURED bands, so a
    * hash match proves the detector found exactly the injected pad.
    * Map-only; only the 8-number feature row crosses a shuffle. */
  def mmImageBorder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, t, b, l, r) = borderScan(encodeLetterboxPng(id))
          val contentPm =
            (w - l - r).toLong * (h - t - b) * 1000 / (w.toLong * h)
          (id, w, h, t, b, l, r, contentPm)
        }
      }
      .toDF("doc_id", "width", "height", "top_rows", "bottom_rows",
        "left_cols", "right_cols", "content_pm")
      .orderBy("doc_id")
  }

  val mmImageBorderSql: String =
    """SELECT doc_id,
      |  CAST(8 + doc_id % 32 + 2 * ((doc_id * 3) % 5) AS INTEGER)
      |    AS width,
      |  CAST(8 + (doc_id * 7) % 32 + 2 * (doc_id % 5) AS INTEGER)
      |    AS height,
      |  CAST(doc_id % 5 AS INTEGER) AS top_rows,
      |  CAST(doc_id % 5 AS INTEGER) AS bottom_rows,
      |  CAST((doc_id * 3) % 5 AS INTEGER) AS left_cols,
      |  CAST((doc_id * 3) % 5 AS INTEGER) AS right_cols,
      |  CAST((8 + doc_id % 32) * (8 + (doc_id * 7) % 32) * 1000
      |    // ((8 + doc_id % 32 + 2 * ((doc_id * 3) % 5))
      |       * (8 + (doc_id * 7) % 32 + 2 * (doc_id % 5)))
      |    AS BIGINT) AS content_pm
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ mm_image_resize
  /** Gradient PNG for a doc id — same dimension arithmetic as
    * [[encodePng]] but pixel (x,y) carries gray (id + x + y) mod 256,
    * so RESAMPLING actually selects different values and the oracle
    * can recompute exactly which. */
  def encodeGradientPng(id: Long): Array[Byte] = {
    val w = 8 + (id % 32).toInt
    val h = 8 + ((id * 7) % 32).toInt
    val base = (id % 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (base + x + y) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL decode + nearest-neighbor resample to (tw × th): source
    * pixel for target (x,y) is (x·w div tw, y·h div th) — the standard
    * integer nearest-neighbor map — read from the DECODED image, and
    * the resampled grays are summed. */
  def resizeGraySum(bytes: Array[Byte], tw: Int, th: Int): (Int, Int, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L
    var y = 0
    while (y < th) {
      var x = 0
      while (x < tw) {
        sum += (img.getRGB(x * w / tw, y * h / th) >> 16) & 0xff
        x += 1
      }
      y += 1
    }
    (tw, th, sum)
  }

  /** Driver query: decode→resize→feature, the canonical multimodal
    * preprocessing stage (thumbnailing for a vision encoder), with the
    * resample arithmetic pinned by the oracle: encode a gradient PNG
    * per doc, decode it with the real JDK codec, nearest-neighbor
    * resample to 8×8, and emit the resampled gray sum. Map-only; only
    * the 3-number feature row crosses a shuffle. */
  def mmImageResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions { it =>
        // content-addressed decode cache (the same play as the video
        // frames): dims and every pixel are functions of id mod 256
        // (32 | 256), so ≤256 distinct payloads exist corpus-wide and
        // each decodes once per task
        val cache = scala.collection.mutable.HashMap.empty[Long, (Int, Int, Long)]
        it.map { id =>
          val (rw, rh, sum) = cache.getOrElseUpdate(id % 256,
            resizeGraySum(encodeGradientPng(id % 256), 8, 8))
          (id, rw, rh, sum)
        }
      }
      .toDF("doc_id", "rw", "rh", "gray_sum")
      .orderBy("doc_id")
  }

  /** aHash (average-hash) of the decoded image: nearest-neighbor
    * resample to 8×8 grays, threshold each cell against the mean —
    * `g·64 > Σg` keeps it pure integer, no division boundary — and
    * pack the 64 bits row-major. Returned as (hi, lo) 32-bit halves so
    * both engines stay in exact signed-64 range. */
  def resizeAHash(bytes: Array[Byte], tw: Int, th: Int): (Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val n = tw * th
    val g = new Array[Long](n)
    var sum = 0L
    var i = 0
    while (i < n) {
      g(i) = (img.getRGB((i % tw) * w / tw, (i / tw) * h / th) >> 16) & 0xff
      sum += g(i)
      i += 1
    }
    var lo = 0L; var hi = 0L
    i = 0
    while (i < n) {
      if (g(i) * n > sum) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (hi, lo)
  }

  // ------------------------------------------------ mm_image_phash
  /** Perceptual image near-dup gate: aHash every image (REAL PNG
    * decode → 8×8 resample → mean threshold) and count, per image, how
    * many other corpus images share its hash — hash-equality blocking,
    * the image-side analogue of the text dedup family (a hash join on
    * a 16-byte key, never pairwise pixels). The decode/hash pass is
    * map-only with the same content-addressed cache as the resize; the
    * oracle recomputes every bit of every hash from the gradient
    * arithmetic. */
  /** Per-image aHash frame (doc_id, hash_hi, hash_lo) — the REAL
    * PNG-decode + 8×8 resample pass, content-addressed per partition.
    * Shared by [[mmImagePhash]] (equality blocking) and
    * [[mmPhashDedup]] (banded Hamming near-dup). */
  private def aHashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions { it =>
        val cache = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
        it.map { id =>
          val (hi, lo) = cache.getOrElseUpdate(id % 256,
            resizeAHash(encodeGradientPng(id % 256), 8, 8))
          (id, hi, lo)
        }
      }
      .toDF("doc_id", "hash_hi", "hash_lo")
  }

  def mmImagePhash(spark: SparkSession, dir: String): DataFrame = {
    val hashes = aHashes(spark, dir)
    val counts = hashes.groupBy("hash_hi", "hash_lo")
      .agg(count(lit(1)).as("n_same"))
    hashes.join(counts, Seq("hash_hi", "hash_lo"))
      .select(col("doc_id"), col("hash_hi"), col("hash_lo"), col("n_same"))
      .orderBy("doc_id")
  }

  /** Oracle CTE chain ending at `h(doc_id, hash_hi, hash_lo)` — the
    * gradient-arithmetic mirror of [[aHashes]], shared by both
    * aHash-consuming oracles. */
  private val aHashCte: String =
    """WITH d AS (
      |  SELECT doc_id, 8 + doc_id % 32 AS w, 8 + (doc_id * 7) % 32 AS h
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, flatten(list_transform(range(8), y ->
      |    list_transform(range(8), x ->
      |      (doc_id + (x * w) // 8 + (y * h) // 8) % 256))) AS gs
      |  FROM d),
      |h AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(range(32), i ->
      |      CASE WHEN gs[i + 33] * 64 > list_sum(gs)
      |           THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS hash_hi,
      |    CAST(list_sum(list_transform(range(32), i ->
      |      CASE WHEN gs[i + 1] * 64 > list_sum(gs)
      |           THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS hash_lo
      |  FROM g)""".stripMargin

  val mmImagePhashSql: String =
    s"""$aHashCte,
       |c AS (SELECT hash_hi, hash_lo, COUNT(*) AS n_same FROM h
       |      GROUP BY hash_hi, hash_lo)
       |SELECT h.doc_id, h.hash_hi, h.hash_lo, c.n_same
       |FROM h JOIN c USING (hash_hi, hash_lo)
       |ORDER BY h.doc_id""".stripMargin

  // ------------------------------------------------ mm_phash_dedup
  /** Perceptual NEAR-dup pairs over the image corpus — the multimodal
    * analogue of SimHash text dedup: two images whose 64-bit aHashes
    * differ in ≤ 3 bits are near-identical content (recompression,
    * slight crops). Granularity is the DISTINCT hash class (the
    * content-addressed store's unit, with member counts), not the doc
    * — a billion re-posts of one image are one class row. Candidate
    * generation is the pigeonhole band trick: 4 disjoint 16-bit bands
    * per hash; any pair within Hamming ≤ 3 agrees EXACTLY on ≥ 1 band
    * (4 bands, ≤ 3 differing bits), so one melt + one self-join on
    * (band_idx, band_value) finds every qualifying pair with no
    * all-pairs scan, and `bit_count(xor)` verifies survivors — both
    * plain codegen integer ops. At corpus scale the join shuffles the
    * skinny (16-byte key, counts) class table on band keys — band
    * selectivity 2⁻¹⁶ per band bounds bucket fan-out. */
  def mmPhashDedup(spark: SparkSession, dir: String): DataFrame = {
    // both self-join sides read the class table; checkpoint the
    // ≤ |distinct hashes| rows so the decode pass runs ONCE
    val hh = aHashes(spark, dir)
      .groupBy("hash_hi", "hash_lo").agg(count(lit(1)).as("n"))
      .cut
    val melted = hh.select(col("hash_hi"), col("hash_lo"), col("n"),
        posexplode(array(
          pmod(col("hash_lo"), lit(65536L)),
          expr("hash_lo div 65536"),
          pmod(col("hash_hi"), lit(65536L)),
          expr("hash_hi div 65536"))))
      .withColumnRenamed("pos", "bi").withColumnRenamed("col", "bv")
    val left = melted.select(col("bi"), col("bv"), col("hash_hi").as("h1"),
      col("hash_lo").as("l1"), col("n").as("n1"))
    val right = melted.select(col("bi"), col("bv"), col("hash_hi").as("h2"),
      col("hash_lo").as("l2"), col("n").as("n2"))
    left.join(right, Seq("bi", "bv"))
      .filter(col("h1") < col("h2") ||
        (col("h1") === col("h2") && col("l1") < col("l2")))
      .select("h1", "l1", "n1", "h2", "l2", "n2").distinct()
      .withColumn("hamming",
        (bit_count(col("h1").bitwiseXOR(col("h2"))) +
          bit_count(col("l1").bitwiseXOR(col("l2")))).cast("long"))
      .filter(col("hamming") <= 3L)
      .select(col("h1").as("hash_hi1"), col("l1").as("hash_lo1"),
        col("h2").as("hash_hi2"), col("l2").as("hash_lo2"),
        col("hamming"), col("n1"), col("n2"))
      .reportSort("hash_hi1", "hash_lo1", "hash_hi2", "hash_lo2")
  }

  val mmPhashDedupSql: String =
    s"""$aHashCte,
       |hh AS (SELECT hash_hi, hash_lo, COUNT(*) AS n FROM h
       |       GROUP BY hash_hi, hash_lo),
       |b AS (
       |  SELECT hash_hi, hash_lo, n,
       |    unnest([0, 1, 2, 3]) AS bi,
       |    unnest([hash_lo % 65536, hash_lo // 65536,
       |            hash_hi % 65536, hash_hi // 65536]) AS bv
       |  FROM hh),
       |cand AS (
       |  SELECT DISTINCT a.hash_hi AS h1, a.hash_lo AS l1, a.n AS n1,
       |    c.hash_hi AS h2, c.hash_lo AS l2, c.n AS n2
       |  FROM b a JOIN b c ON a.bi = c.bi AND a.bv = c.bv
       |    AND (a.hash_hi < c.hash_hi OR
       |         (a.hash_hi = c.hash_hi AND a.hash_lo < c.hash_lo)))
       |SELECT h1 AS hash_hi1, l1 AS hash_lo1,
       |  h2 AS hash_hi2, l2 AS hash_lo2,
       |  CAST(bit_count(xor(h1, h2)) + bit_count(xor(l1, l2)) AS BIGINT)
       |    AS hamming, n1, n2
       |FROM cand
       |WHERE bit_count(xor(h1, h2)) + bit_count(xor(l1, l2)) <= 3
       |ORDER BY hash_hi1, hash_lo1, hash_hi2, hash_lo2""".stripMargin

  // ------------------------------------------------ mm_video_scenes
  /** Temporal analysis over the decoded frame sequence: scene-CUT
    * detection by thresholding the inter-frame change of the 8×8
    * resampled gray mass — the downstream stage after the container
    * walk ([[videoFrameStats]] proves the seek/sample layer; this
    * operator consumes consecutive frames, each through the REAL PNG
    * decode + resample, and reports per video the frame count, cut
    * count, and total absolute frame-to-frame delta). Exact integers
    * throughout; the oracle recomputes every frame's resampled mass
    * from the gradient arithmetic and the same lag/threshold. Decode
    * stays content-addressed (≤256 distinct frames corpus-wide). */
  def mmVideoScenes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions { it =>
        val grayCache = scala.collection.mutable.HashMap.empty[Int, Long]
        def gs(m: Int): Long = grayCache.getOrElseUpdate(m,
          resizeGraySum(encodeGradientPng(m.toLong), 8, 8)._3)
        it.map { id =>
          val n = 4 + (id % 8).toInt
          var cuts = 0L; var sumD = 0L; var prev = 0L
          var f = 0
          while (f < n) {
            val g = gs(((id + f) % 256).toInt)
            if (f > 0) {
              val d = math.abs(g - prev)
              sumD += d
              if (d > 3000) cuts += 1
            }
            prev = g
            f += 1
          }
          (id, n.toLong, cuts, sumD)
        }
      }
      .toDF("doc_id", "n_frames", "n_cuts", "sum_delta")
      .orderBy("doc_id")
  }

  val mmVideoScenesSql: String =
    """WITH d AS (
      |  SELECT doc_id, 4 + doc_id % 8 AS n FROM documents),
      |fr AS (SELECT doc_id, n, unnest(range(n)) AS f FROM d),
      |g AS (
      |  SELECT doc_id, n, f,
      |    list_sum(flatten(list_transform(range(8), y ->
      |      list_transform(range(8), x ->
      |        ((doc_id + f) % 256
      |         + (x * (8 + (doc_id + f) % 256 % 32)) // 8
      |         + (y * (8 + (((doc_id + f) % 256) * 7) % 32)) // 8)
      |        % 256)))) AS gs
      |  FROM fr),
      |w AS (
      |  SELECT doc_id, n,
      |    gs - LAG(gs) OVER (PARTITION BY doc_id ORDER BY f) AS dd
      |  FROM g)
      |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_frames,
      |  CAST(SUM(CASE WHEN ABS(dd) > 3000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_cuts,
      |  CAST(SUM(ABS(dd)) AS BIGINT) AS sum_delta
      |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val mmImageResizeSql: String =
    """WITH d AS (
      |  SELECT doc_id, 8 + doc_id % 32 AS w, 8 + (doc_id * 7) % 32 AS h
      |  FROM documents)
      |SELECT doc_id, CAST(8 AS INTEGER) AS rw, CAST(8 AS INTEGER) AS rh,
      |  CAST(list_sum(flatten(list_transform(range(8), y ->
      |    list_transform(range(8), x ->
      |      (doc_id + (x * w) // 8 + (y * h) // 8) % 256))))
      |    AS BIGINT) AS gray_sum
      |FROM d ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ mm_audio_vad
  /** Energy-based voice-activity segmentation — the audio curation
    * primitive (cut silence, keep speech-dense spans) run over the
    * REAL decoded PCM: frames of 32 samples, frame energy = Σ|s|
    * (exact integer), a frame is ACTIVE when energy > 530000 (the
    * corpus median — both engines compare the same integers), and
    * active runs merge into segments by gaps-and-islands on the frame
    * index. Per doc: full frames, active frames, segment count, and
    * the longest segment. The decode is the same map-only
    * [[decodeWavSamples]] path as the waveform stats; the only window
    * is per-doc over ≤ 10 frames. The oracle recomputes every sample
    * arithmetically and replays the identical thresholds. */
  def mmAudioVad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions(_.map { id =>
        val sm = decodeWavSamples(encodeWav(id))
        val nf = sm.length / 32
        var f = 0
        var active = 0L
        var segs = 0L
        var run = 0L
        var maxRun = 0L
        while (f < nf) {
          var e = 0L
          var i = f * 32
          val end = i + 32
          while (i < end) { e += math.abs(sm(i)); i += 1 }
          if (e > 530000L) {
            active += 1
            if (run == 0) segs += 1
            run += 1
            if (run > maxRun) maxRun = run
          } else run = 0
          f += 1
        }
        (id, nf.toLong, active, segs, maxRun)
      })
      .toDF("doc_id", "n_frames", "n_active", "n_segments", "max_run")
      .orderBy("doc_id")
  }

  val mmAudioVadSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    (100 + doc_id % 50) * (1 + doc_id % 2) AS ns
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, k,
      |    ((doc_id + 2*k) % 251) + ((doc_id + 2*k + 1) % 251) * 256 AS u
      |  FROM (SELECT doc_id, unnest(range(0, ns)) AS k FROM d) t),
      |v AS (SELECT doc_id, k // 32 AS f,
      |  ABS(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS a
      |  FROM s),
      |fr AS (
      |  SELECT doc_id, f, SUM(a) AS e FROM v
      |  GROUP BY doc_id, f HAVING COUNT(*) = 32),
      |act AS (
      |  SELECT doc_id, f, e > 530000 AS live FROM fr),
      |isl AS (
      |  SELECT doc_id, f,
      |    f - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f) AS g
      |  FROM act WHERE live),
      |runs AS (
      |  SELECT doc_id, COUNT(*) AS rl FROM isl GROUP BY doc_id, g),
      |agg AS (
      |  SELECT doc_id, COUNT(*) AS n_segments, MAX(rl) AS max_run,
      |    SUM(rl) AS n_active
      |  FROM runs GROUP BY doc_id),
      |base AS (SELECT doc_id, COUNT(*) AS n_frames FROM fr
      |         GROUP BY doc_id)
      |SELECT b.doc_id, CAST(b.n_frames AS BIGINT) AS n_frames,
      |  CAST(COALESCE(a.n_active, 0) AS BIGINT) AS n_active,
      |  CAST(COALESCE(a.n_segments, 0) AS BIGINT) AS n_segments,
      |  CAST(COALESCE(a.max_run, 0) AS BIGINT) AS max_run
      |FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id
      |ORDER BY b.doc_id""".stripMargin

  // ------------------------------------------------ mm_audio_zcr
  /** ZERO-CROSSING RATE — the cheapest voiced/unvoiced + noisiness
    * feature in the classic audio front-end (pairs with
    * [[mmAudioVad]]'s energy gate: high energy + high ZCR = fricative
    * or noise, high energy + low ZCR = voiced speech or tone): the
    * REAL WAV payload is decoded with the JDK codec and each doc
    * reports its sample count, exact sign-change count, and ZCR in
    * per-mille of sample transitions; the per-rate rollup is what a
    * corpus audit actually reads (does the 8 kHz slice skew noisier
    * than the 15 kHz one?). Map-only to the |rates| hash-agg; the
    * oracle recomputes every sample from the generator arithmetic,
    * so a hash match proves the decode and the DSP. Zero-valued
    * samples are carried OVER (sign compares against the last
    * non-zero sample — the textbook definition that doesn't count
    * silence as crossings). */
  def mmAudioZcr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = docIds(spark, dir)
      .mapPartitions(_.map { id =>
        val sm = decodeWavSamples(encodeWav(id))
        var i = 0
        var last = 0 // sign of last non-zero sample; 0 = none yet
        var cross = 0L
        while (i < sm.length) {
          val s = Integer.signum(sm(i))
          if (s != 0) {
            if (last != 0 && s != last) cross += 1
            last = s
          }
          i += 1
        }
        (id, (8000L + (id % 8) * 1000L), sm.length.toLong, cross)
      })
      .toDF("doc_id", "rate", "n_samples", "n_cross")
    per.groupBy("rate")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_samples")).as("n_samples"),
        sum(col("n_cross")).as("n_cross"))
      .select(col("rate"), col("n_docs"), col("n_samples"),
        col("n_cross"),
        expr("n_cross * 1000 div (n_samples - n_docs)").as("zcr_pm"))
      .reportSort("rate")
  }

  val mmAudioZcrSql: String =
    """WITH d AS (
      |  SELECT doc_id, 8000 + (doc_id % 8) * 1000 AS rate,
      |    (100 + doc_id % 50) * (1 + doc_id % 2) AS ns
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, k,
      |    ((doc_id + 2*k) % 251) + ((doc_id + 2*k + 1) % 251) * 256 AS u
      |  FROM (SELECT doc_id, unnest(range(0, ns)) AS k FROM d) t),
      |sg AS (
      |  SELECT doc_id, k,
      |    SIGN(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS sg
      |  FROM s),
      |nz AS (
      |  SELECT doc_id, k, sg,
      |    LAG(sg) OVER (PARTITION BY doc_id ORDER BY k) AS prev
      |  FROM sg WHERE sg <> 0),
      |cr AS (
      |  SELECT doc_id,
      |    SUM(CASE WHEN prev IS NOT NULL AND sg <> prev
      |        THEN 1 ELSE 0 END) AS n_cross
      |  FROM nz GROUP BY doc_id),
      |per AS (
      |  SELECT d.doc_id, d.rate, d.ns AS n_samples,
      |    COALESCE(cr.n_cross, 0) AS n_cross
      |  FROM d LEFT JOIN cr USING (doc_id))
      |SELECT CAST(rate AS BIGINT) AS rate, COUNT(*) AS n_docs,
      |  CAST(SUM(n_samples) AS BIGINT) AS n_samples,
      |  CAST(SUM(n_cross) AS BIGINT) AS n_cross,
      |  CAST(SUM(n_cross) * 1000 // (SUM(n_samples) - COUNT(*))
      |    AS BIGINT) AS zcr_pm
      |FROM per GROUP BY rate ORDER BY rate""".stripMargin

  // ------------------------------------------------ mm_audio_snr
  /** SNR PROXY over real JDK-decoded PCM — the transcription-pipeline
    * gate beside [[mmAudioVad]]'s segmentation (low signal-to-noise
    * audio wastes ASR compute; corpora drop it before featurizing):
    * 32-sample frame energies split at the VAD live threshold, and
    * the active/idle MEAN-energy ratio lands in whole bits via the
    * bin-length identity on the cross products —
    * len(bin(Σe_act·n_idle)) − len(bin(Σe_idle·n_act)) — no float
    * division anywhere. All-active or all-idle docs report NULL-free
    * sentinel 0 with the side counts telling which. Map-only decode
    * (same codec pass as VAD) → per-doc row; oracle replays every
    * sample from the generator arithmetic. */
  def mmAudioSnr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions(_.map { id =>
        val sm = decodeWavSamples(encodeWav(id))
        val nf = sm.length / 32
        var f = 0
        var nAct = 0L
        var nIdle = 0L
        var sumAct = 0L
        var sumIdle = 0L
        while (f < nf) {
          var e = 0L
          var i = f * 32
          val end = i + 32
          while (i < end) { e += math.abs(sm(i)); i += 1 }
          if (e > 530000L) { nAct += 1; sumAct += e }
          else { nIdle += 1; sumIdle += e }
          f += 1
        }
        val snr =
          if (nAct > 0 && nIdle > 0 && sumIdle > 0)
            (java.lang.Long.toBinaryString(sumAct * nIdle).length -
              java.lang.Long.toBinaryString(sumIdle * nAct).length).toLong
          else 0L
        (id, nAct, nIdle, snr)
      })
      .toDF("doc_id", "n_active", "n_idle", "snr_bits")
      .orderBy("doc_id")
  }

  val mmAudioSnrSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    (100 + doc_id % 50) * (1 + doc_id % 2) AS ns
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, k,
      |    ((doc_id + 2*k) % 251) + ((doc_id + 2*k + 1) % 251) * 256 AS u
      |  FROM (SELECT doc_id, unnest(range(0, ns)) AS k FROM d) t),
      |v AS (SELECT doc_id, k // 32 AS f,
      |  ABS(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS a
      |  FROM s),
      |fr AS (
      |  SELECT doc_id, f, SUM(a) AS e FROM v
      |  GROUP BY doc_id, f HAVING COUNT(*) = 32),
      |agg AS (
      |  SELECT doc_id,
      |    SUM(CASE WHEN e > 530000 THEN 1 ELSE 0 END) AS n_active,
      |    SUM(CASE WHEN e > 530000 THEN 0 ELSE 1 END) AS n_idle,
      |    SUM(CASE WHEN e > 530000 THEN e ELSE 0 END) AS sum_act,
      |    SUM(CASE WHEN e > 530000 THEN 0 ELSE e END) AS sum_idle
      |  FROM fr GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(COALESCE(n_active, 0) AS BIGINT) AS n_active,
      |  CAST(COALESCE(n_idle, 0) AS BIGINT) AS n_idle,
      |  CAST(CASE WHEN COALESCE(n_active, 0) > 0
      |    AND COALESCE(n_idle, 0) > 0 AND COALESCE(sum_idle, 0) > 0
      |    THEN length(bin(sum_act * n_idle)) -
      |         length(bin(sum_idle * n_active))
      |    ELSE 0 END AS BIGINT) AS snr_bits
      |FROM d LEFT JOIN agg USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------- mm_audio_crest
  /** CREST FACTOR over real JDK-decoded PCM — the dynamic-range gauge
    * between [[mmAudioClip]]'s hard-limit counter and [[mmAudioSnr]]'s
    * activity split: peak-to-RMS ratio, reported SQUARED
    * (peak²·n / Σs², per-mille) so no square root crosses the engine
    * boundary — heavily-compressed/limited audio sits near the
    * 1000‰..2000‰ floor (sine = 2000‰), spiky clean speech runs high.
    * Per-doc int64 headroom is absolute: peak² ≤ 2³⁰, ×n ×1000 caps
    * at ~2⁶⁰ for million-sample clips. Map-only decode → per-doc
    * (peak, energy) → |rates| hash-agg with the mean of per-doc
    * ratios; oracle replays every sample from the generator
    * arithmetic. */
  def mmAudioCrest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = docIds(spark, dir)
      .mapPartitions(_.map { id =>
        val sm = decodeWavSamples(encodeWav(id))
        var i = 0
        var peak = 0L
        var energy = 0L
        while (i < sm.length) {
          val a = math.abs(sm(i).toLong)
          if (a > peak) peak = a
          energy += a * a
          i += 1
        }
        val crest =
          if (energy > 0) peak * peak * sm.length * 1000L / energy
          else 0L
        (id, 8000L + (id % 8) * 1000L, crest)
      })
      .toDF("doc_id", "rate", "crest_sq_pm")
    per.groupBy("rate")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("crest_sq_pm")).as("_s"),
        max(col("crest_sq_pm")).as("max_crest_sq_pm"))
      .select(col("rate"), col("n_docs"),
        expr("_s div n_docs").as("mean_crest_sq_pm"),
        col("max_crest_sq_pm"))
      .reportSort("rate")
  }

  val mmAudioCrestSql: String =
    """WITH d AS (
      |  SELECT doc_id, 8000 + (doc_id % 8) * 1000 AS rate,
      |    (100 + doc_id % 50) * (1 + doc_id % 2) AS ns
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, ns,
      |    ABS(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS a
      |  FROM (
      |    SELECT doc_id, ns,
      |      ((doc_id + 2*k) % 251) + ((doc_id + 2*k + 1) % 251) * 256
      |        AS u
      |    FROM (SELECT doc_id, ns, unnest(range(0, ns)) AS k FROM d)
      |      t) t2),
      |per AS (
      |  SELECT doc_id, MAX(ns) AS ns, MAX(a) AS peak, SUM(a*a) AS e
      |  FROM s GROUP BY doc_id),
      |cr AS (
      |  SELECT doc_id,
      |    CASE WHEN e > 0 THEN peak * peak * ns * 1000 // e
      |         ELSE 0 END AS crest
      |  FROM per)
      |SELECT CAST(d.rate AS BIGINT) AS rate, COUNT(*) AS n_docs,
      |  CAST(SUM(crest) // COUNT(*) AS BIGINT) AS mean_crest_sq_pm,
      |  CAST(MAX(crest) AS BIGINT) AS max_crest_sq_pm
      |FROM d JOIN cr USING (doc_id)
      |GROUP BY d.rate ORDER BY rate""".stripMargin

  // ---------------------------------------------- mm_image_patches
  /** ViT-style PATCH extraction — the preprocessing that turns an
    * image into the token sequence a vision transformer trains on:
    * the REAL decoded image is cut into non-overlapping 8×8 pixel
    * patches (ragged edges cropped, the standard behavior) and each
    * patch emits its exact integer gray mass — the stand-in for the
    * patch-embedding input vector. One row per (doc, py, px): the
    * exploded layout a multimodal training pipeline shuffles by doc
    * or interleaves with text tokens. Decode is content-addressed
    * (≤ 256 distinct images) and map-only; no shuffle carries pixels.
    * The oracle recomputes every patch mass from the gradient
    * arithmetic. */
  def mmImagePatches(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions { it =>
        val cache = scala.collection.mutable.HashMap
          .empty[Int, Array[(Int, Int, Long)]]
        def patches(m: Int): Array[(Int, Int, Long)] =
          cache.getOrElseUpdate(m, {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(encodeGradientPng(m.toLong)))
            val (w, h) = (img.getWidth, img.getHeight)
            (for {
              py <- 0 until h / 8
              px <- 0 until w / 8
            } yield {
              var mass = 0L
              var dy = 0
              while (dy < 8) {
                var dx = 0
                while (dx < 8) {
                  mass += (img.getRGB(px * 8 + dx, py * 8 + dy) >> 16) & 0xff
                  dx += 1
                }
                dy += 1
              }
              (py, px, mass)
            }).toArray
          })
        it.flatMap { id =>
          patches((id % 256).toInt).iterator.map { case (py, px, m) =>
            (id, py.toLong, px.toLong, m)
          }
        }
      }
      .toDF("doc_id", "py", "px", "mass")
      .orderBy("doc_id", "py", "px")
  }

  val mmImagePatchesSql: String =
    """WITH d AS (
      |  SELECT doc_id, 8 + doc_id % 32 AS w, 8 + (doc_id * 7) % 32 AS h,
      |    doc_id % 256 AS base
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, base,
      |    unnest(range(0, h // 8)) AS py, w, h
      |  FROM d),
      |gp AS (
      |  SELECT doc_id, base, py, unnest(range(0, w // 8)) AS px
      |  FROM g),
      |px8 AS (
      |  SELECT doc_id, base, py, px, unnest(range(0, 8)) AS dy
      |  FROM gp),
      |cells AS (
      |  SELECT doc_id, py, px,
      |    list_sum(list_transform(range(0, 8),
      |      dx -> (base + (px*8 + dx) + (py*8 + dy)) % 256)) AS rowmass
      |  FROM px8)
      |SELECT doc_id, py, px, CAST(SUM(rowmass) AS BIGINT) AS mass
      |FROM cells GROUP BY doc_id, py, px
      |ORDER BY doc_id, py, px""".stripMargin

  // ------------------------------------------------- mm_chunk_dedup
  /** Content-defined chunking over the OPAQUE BINARY column — the
    * byte-level rsync primitive [[graft.dedup.Dedup.chunkDedup]]
    * applies to tokenized text, verified here on actual bytes (no
    * tokenizer exists for media payloads): cut the blob wherever the
    * gear rolling hash's 6-bit state hits 0 (expected chunk = 64
    * bytes), fingerprint the variable-size byte chunks, and report
    * per blob how many chunks are shared with another blob — the
    * near-dup detector for media that survives container-level
    * prepends/edits, because every boundary after the edit
    * re-synchronizes on content.
    *
    * Cut points come from the [[graft.expr.GearCuts]] production
    * rolling hash (one O(1)-per-byte pass per blob, no per-position
    * digest, no row explosion, no per-blob window shuffle — see
    * [[graft.dedup.Dedup.gearChunkDedup]] for the full scale story);
    * the md5-per-position form survives as
    * [[graft.dedup.Dedup.chunkDedup]], the verification mode the
    * re-sync spec pins against. */
  def mmChunkDedup(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.gearChunkDedup(
      withBlob(Tables.documents(spark, dir))
        .select(col("doc_id"), col("blob").as("bin")))

  val mmChunkDedupSql: String = graft.dedup.Dedup.gearChunkSql(
    """SELECT doc_id, hex(encode('IMG0' || text)) AS h,
      |    octet_length(encode('IMG0' || text)) AS len
      |  FROM documents""".stripMargin)

  // ------------------------------------------- mm_image_histogram
  /** Luminance HISTOGRAM over REAL decoded pixels — the
    * exposure/contrast profile an image-quality filter thresholds
    * before letting a picture into a training mix: every distinct
    * payload decodes ONCE through the actual PNG codec
    * (content-addressed, ≤256 distinct gradient payloads — the same
    * dedupe-before-decode move a 100 TB media pass must make), its
    * 16-bucket gray histogram is a ≤(256·16)-row frame BROADCAST back
    * onto the corpus, and the rollup per source is a map-side
    * combining hash-agg. No pixel ever crosses a shuffle. The oracle
    * replays the known gradient arithmetic (gray = (seed+x+y) mod
    * 256 over w×h) — the decode path itself is pinned by the spec
    * that diffs codec output against the formula. */
  def mmImageHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perSeed = Tables.documents(spark, dir)
      .select((col("doc_id") % 256).as("seed")).distinct().as[Long]
      .mapPartitions { it =>
        it.flatMap { m =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(encodeGradientPng(m)))
          val counts = new Array[Long](16)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              counts((img.getRGB(x, y) & 0xff) / 16) += 1
              x += 1
            }
            y += 1
          }
          counts.zipWithIndex.collect {
            case (c, b) if c > 0 => (m, b, c) }
        }
      }
      .toDF("seed", "bucket", "n_px")
    Tables.documents(spark, dir)
      .select(col("source"), (col("doc_id") % 256).as("seed"))
      .join(broadcast(perSeed), "seed")
      .groupBy("source", "bucket")
      .agg(sum(col("n_px")).as("n_px"))
      .reportSort("source", "bucket")
  }

  val mmImageHistogramSql: String =
    """WITH s AS (
      |  SELECT source, doc_id % 256 AS seed FROM documents),
      |dim AS (
      |  SELECT DISTINCT seed, 8 + seed % 32 AS w,
      |    8 + (seed * 7) % 32 AS h
      |  FROM s),
      |px AS (
      |  SELECT seed, h,
      |    unnest(generate_series(0, CAST(w AS INT) - 1)) AS x
      |  FROM dim),
      |py AS (
      |  SELECT seed, x,
      |    unnest(generate_series(0, CAST(h AS INT) - 1)) AS y
      |  FROM px),
      |g AS (
      |  SELECT seed,
      |    CAST(((seed + x + y) % 256) // 16 AS INTEGER) AS bucket,
      |    COUNT(*) AS n
      |  FROM py GROUP BY 1, 2)
      |SELECT s.source, g.bucket, CAST(SUM(g.n) AS BIGINT) AS n_px
      |FROM s JOIN g USING (seed)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------- mm_audio_resample
  /** DECIMATE-BY-2 RESAMPLING over REAL decoded PCM — the sample-rate
    * normalization every audio ingest runs before feature extraction
    * (a 16 kHz model can't eat 44.1 kHz audio): each output sample is
    * the 2-tap boxcar floor-mean of an input pair, computed on the
    * +2¹⁶-shifted (hence non-negative) sum — where every engine's
    * integer division agrees (DuckDB's `//` truncates toward zero on
    * INTEGER operands, so a signed floor-mean drifts by one on
    * negative odd sums) — then shifted back:
    * ((a + b + 2¹⁶) >> 1) − 2¹⁵, exact on signed PCM. The decode is the same real RIFF/WAV parse as
    * [[mmAudioWaveform]] (header walk + PCM16 extraction), so the
    * audit covers container → samples → DSP → stats end-to-end.
    * Row-local mapPartitions (no shuffle until the final orderBy);
    * the trailing odd sample drops, the standard decimator edge. */
  def mmAudioResample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions(_.map { id =>
        val s = decodeWavSamples(encodeWav(id))
        val m = s.length / 2
        var sumIn = 0L; var i = 0
        while (i < 2 * m) { sumIn += math.abs(s(i)); i += 1 }
        var sumOut = 0L; var mx = 0; var k = 0
        while (k < m) {
          val v = ((s(2 * k) + s(2 * k + 1) + 65536) >> 1) - 32768
          val a = math.abs(v); sumOut += a; if (a > mx) mx = a
          k += 1
        }
        val retention =
          if (sumIn > 0) sumOut * 1000 / sumIn else 1000L
        (id, m, sumOut, mx, retention)
      })
      .toDF("doc_id", "n_out", "sum_abs_out", "max_abs_out",
        "retention_pm")
      .orderBy("doc_id")
  }

  /** Replays [[mmAudioWaveform]]'s sample formula, then the 2-tap
    * floor-mean decimator on the shifted non-negative sum:
    * out_k = (s_{2k} + s_{2k+1} + 65536) // 2 - 32768. */
  val mmAudioResampleSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    (100 + doc_id % 50) * (1 + doc_id % 2) AS ns
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, k,
      |    ((doc_id + 2*k) % 251) + ((doc_id + 2*k + 1) % 251) * 256 AS u
      |  FROM (SELECT doc_id, ns, unnest(range(0, ns)) AS k FROM d) t),
      |v AS (SELECT doc_id, k,
      |  CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS smp FROM s),
      |pairs AS (
      |  SELECT a.doc_id, (a.smp + b.smp + 65536) // 2 - 32768 AS o,
      |    ABS(a.smp) + ABS(b.smp) AS abs_in
      |  FROM v a JOIN v b
      |    ON b.doc_id = a.doc_id AND b.k = a.k + 1
      |  WHERE a.k % 2 = 0),
      |g AS (
      |  SELECT doc_id, COUNT(*) AS n_out,
      |    SUM(ABS(o)) AS sum_abs_out, MAX(ABS(o)) AS max_abs_out,
      |    SUM(abs_in) AS sum_abs_in
      |  FROM pairs GROUP BY 1)
      |SELECT doc_id, CAST(n_out AS INTEGER) AS n_out,
      |  CAST(sum_abs_out AS BIGINT) AS sum_abs_out,
      |  CAST(max_abs_out AS INTEGER) AS max_abs_out,
      |  CAST(CASE WHEN sum_abs_in > 0
      |    THEN sum_abs_out * 1000 // sum_abs_in ELSE 1000 END AS BIGINT)
      |    AS retention_pm
      |FROM g ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- mm_image_edges
  /** SOBEL EDGE PASS over the REAL PNG decode — the canonical
    * feature-extraction step (edge density gates blurry/blank images
    * out of a vision corpus) run end-to-end on actual bytes: encode →
    * ImageIO decode → 3×3 Sobel over the interior → per-source edge
    * stats. On the deterministic gradient fixtures the only strong
    * responses are the 255→0 wrap lines, so the expected output is
    * analytically known and the oracle recomputes every pixel from
    * the closed form p(x,y) = (seed + x + y) mod 256 — the decode
    * path is verified against pure arithmetic. Integer magnitudes
    * (|Gx|+|Gy|, the L1 Sobel norm) keep it exact; decodes are
    * content-addressed per seed (≤ 256) and broadcast back to the
    * corpus — the image work never rescales with the table. */
  def mmImageEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perSeed = Tables.documents(spark, dir)
      .select((col("doc_id") % 256).as("seed")).distinct().as[Long]
      .mapPartitions { it =>
        it.map { m =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(encodeGradientPng(m)))
          def p(x: Int, y: Int): Int = img.getRGB(x, y) & 0xff
          var interior = 0L; var edges = 0L; var magSum = 0L
          var y = 1
          while (y < img.getHeight - 1) {
            var x = 1
            while (x < img.getWidth - 1) {
              val gx = (p(x + 1, y - 1) + 2 * p(x + 1, y) + p(x + 1, y + 1)) -
                (p(x - 1, y - 1) + 2 * p(x - 1, y) + p(x - 1, y + 1))
              val gy = (p(x - 1, y + 1) + 2 * p(x, y + 1) + p(x + 1, y + 1)) -
                (p(x - 1, y - 1) + 2 * p(x, y - 1) + p(x + 1, y - 1))
              val mag = math.abs(gx) + math.abs(gy)
              interior += 1
              magSum += mag
              if (mag >= 256) edges += 1
              x += 1
            }
            y += 1
          }
          (m, interior, edges, magSum)
        }
      }
      .toDF("seed", "n_interior", "n_edge_px", "mag_sum")
    Tables.documents(spark, dir)
      .select(col("source"), (col("doc_id") % 256).as("seed"))
      .join(broadcast(perSeed), "seed")
      .groupBy("source")
      .agg(count(lit(1)).as("n_images"),
        sum(col("n_interior")).as("n_interior"),
        sum(col("n_edge_px")).as("n_edge_px"),
        sum(col("mag_sum")).as("mag_sum"))
      .reportSort("source")
  }

  val mmImageEdgesSql: String =
    """WITH s AS (
      |  SELECT source, doc_id % 256 AS seed FROM documents),
      |dim AS (
      |  SELECT DISTINCT seed, 8 + seed % 32 AS w, 8 + (seed * 7) % 32 AS h
      |  FROM s),
      |px AS (
      |  SELECT seed, w, h,
      |    unnest(generate_series(1, CAST(w AS INT) - 2)) AS x
      |  FROM dim),
      |py AS (
      |  SELECT seed, w, h, x,
      |    unnest(generate_series(1, CAST(h AS INT) - 2)) AS y
      |  FROM px),
      |g AS (
      |  SELECT seed,
      |    ((seed + x+1 + y-1) % 256 + 2*((seed + x+1 + y) % 256)
      |      + (seed + x+1 + y+1) % 256)
      |    - ((seed + x-1 + y-1) % 256 + 2*((seed + x-1 + y) % 256)
      |      + (seed + x-1 + y+1) % 256) AS gx,
      |    ((seed + x-1 + y+1) % 256 + 2*((seed + x + y+1) % 256)
      |      + (seed + x+1 + y+1) % 256)
      |    - ((seed + x-1 + y-1) % 256 + 2*((seed + x + y-1) % 256)
      |      + (seed + x+1 + y-1) % 256) AS gy
      |  FROM py),
      |agg AS (
      |  SELECT seed, COUNT(*) AS n_interior,
      |    SUM(CASE WHEN ABS(gx) + ABS(gy) >= 256 THEN 1 ELSE 0 END)
      |      AS n_edge_px,
      |    SUM(ABS(gx) + ABS(gy)) AS mag_sum
      |  FROM g GROUP BY seed)
      |SELECT s.source, COUNT(*) AS n_images,
      |  CAST(SUM(a.n_interior) AS BIGINT) AS n_interior,
      |  CAST(SUM(a.n_edge_px) AS BIGINT) AS n_edge_px,
      |  CAST(SUM(a.mag_sum) AS BIGINT) AS mag_sum
      |FROM s JOIN agg a USING (seed)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------- mm_image_entropy
  /** LUMINANCE ENTROPY over REAL decoded pixels — the blank/flat-image
    * gate beside [[mmImageHistogram]]'s exposure profile: an image
    * whose gray mass piles into one bucket is a blank page, a solid
    * color card, or a corrupted render, and it leaves a vision corpus
    * before any GPU sees it. Entropy is the WHOLE-BIT surprisal
    * H_bits = Σ_b n_b·(⌊log₂N⌋+1 − (⌊log₂n_b⌋+1)) = Σ n_b·(len(bin N)
    * − len(bin n_b)) — pure integer string-length arithmetic, no libm
    * (the [[graft.text.TextAnalysis]] surprisal identity on pixel
    * buckets). Decode is content-addressed exactly like the histogram
    * key (≤ 256 real PNG decodes, broadcast back; no pixel ever
    * shuffles); the per-seed entropy frame is ≤ 256 rows. The oracle
    * replays the gradient arithmetic, so a hash match pins codec
    * output = formula AND the integer entropy fold. */
  def mmImageEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perSeed = Tables.documents(spark, dir)
      .select((col("doc_id") % 256).as("seed")).distinct().as[Long]
      .mapPartitions { it =>
        it.flatMap { m =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(encodeGradientPng(m)))
          val counts = new Array[Long](16)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              counts((img.getRGB(x, y) & 0xff) / 16) += 1
              x += 1
            }
            y += 1
          }
          counts.zipWithIndex.collect {
            case (c, b) if c > 0 => (m, b, c) }
        }
      }
      .toDF("seed", "bucket", "n")
    val tot = perSeed.groupBy("seed").agg(sum(col("n")).as("npx"))
    val ent = perSeed.join(tot, "seed")
      .select(col("seed"), col("npx"),
        (col("n") * (length(expr("bin(npx)")) -
          length(expr("bin(n)")))).as("_bits"))
      .groupBy("seed", "npx")
      .agg(sum(col("_bits")).as("bits"))
    Tables.documents(spark, dir)
      .select(col("source"), (col("doc_id") % 256).as("seed"))
      .join(broadcast(ent), "seed")
      .groupBy("source")
      .agg(count(lit(1)).as("n_images"),
        sum(col("npx")).as("n_px"),
        sum(col("bits")).as("total_bits"))
      .withColumn("ent_milli_bits_per_px",
        expr("total_bits * 1000 div n_px"))
      .reportSort("source")
  }

  val mmImageEntropySql: String =
    """WITH s AS (
      |  SELECT source, doc_id % 256 AS seed FROM documents),
      |dim AS (
      |  SELECT DISTINCT seed, 8 + seed % 32 AS w,
      |    8 + (seed * 7) % 32 AS h
      |  FROM s),
      |px AS (
      |  SELECT seed, h,
      |    unnest(generate_series(0, CAST(w AS INT) - 1)) AS x
      |  FROM dim),
      |py AS (
      |  SELECT seed, x,
      |    unnest(generate_series(0, CAST(h AS INT) - 1)) AS y
      |  FROM px),
      |g AS (
      |  SELECT seed,
      |    CAST(((seed + x + y) % 256) // 16 AS INTEGER) AS bucket,
      |    COUNT(*) AS n
      |  FROM py GROUP BY 1, 2),
      |tot AS (SELECT seed, SUM(n) AS npx FROM g GROUP BY seed),
      |ent AS (
      |  SELECT g.seed, tot.npx,
      |    SUM(g.n * (length(bin(tot.npx)) - length(bin(g.n)))) AS bits
      |  FROM g JOIN tot USING (seed) GROUP BY 1, 2)
      |SELECT s.source, COUNT(*) AS n_images,
      |  CAST(SUM(ent.npx) AS BIGINT) AS n_px,
      |  CAST(SUM(ent.bits) AS BIGINT) AS total_bits,
      |  CAST(SUM(ent.bits) * 1000 // SUM(ent.npx) AS BIGINT)
      |    AS ent_milli_bits_per_px
      |FROM s JOIN ent USING (seed)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------ mm_stride_dedup
  /** FIXED-STRIDE block dedup — the backup-industry baseline under
    * [[mmChunkDedup]]'s content-defined cuts: the blob splits at
    * fixed 64-byte offsets, blocks are fingerprinted, and sharing is
    * counted exactly as in the CDC form. Kept as a first-class
    * operator because it is the RIGHT tool for aligned data
    * (fixed-record media, tensors) and the instructive FOIL for
    * everything else — one prepended byte shifts every later block,
    * so stride sharing collapses where the gear cuts re-synchronize
    * (R10OpsSpec pins that contrast). Fully map-only until the
    * posting join: cut positions are an arithmetic sequence, no scan
    * of any kind. */
  def mmStrideDedup(spark: SparkSession, dir: String): DataFrame = {
    val base = withBlob(Tables.documents(spark, dir))
      .select(col("doc_id"), hex(col("blob")).as("h"),
        length(col("blob")).as("len"))
    val chunks = base
      .select(col("doc_id"), col("h"),
        explode(expr("transform(sequence(1, len, 64), c -> " +
          "named_struct('cut', c, 'nxt', least(c + 64, len + 1)))"))
          .as("g"))
      .select(col("doc_id"),
        conv(substring(md5(expr(
            "substring(h, g.cut * 2 - 1, (g.nxt - g.cut) * 2)")), 1, 15),
          16, 10).cast("long").as("fp"))
    val posting = chunks.select(col("doc_id"), col("fp")).distinct()
      .groupBy("fp").agg(count(lit(1)).as("_docs"))
    chunks.join(posting, "fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("_docs") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_pm", expr("n_dup_chunks * 1000 div n_chunks"))
      .orderBy("doc_id")
  }

  val mmStrideDedupSql: String =
    """WITH base AS (
      |  SELECT doc_id, hex(encode('IMG0' || text)) AS h,
      |    octet_length(encode('IMG0' || text)) AS len
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, h, CAST(c AS INTEGER) AS cut,
      |    CAST(LEAST(c + 64, len + 1) AS INTEGER) AS nxt
      |  FROM (SELECT doc_id, h, len, unnest(range(1, len + 1, 64)) AS c
      |        FROM base) z),
      |ch AS (
      |  SELECT doc_id,
      |    ('0x'||substr(md5(substr(h, cut * 2 - 1, (nxt - cut) * 2)),
      |      1,15))::BIGINT AS fp
      |  FROM m),
      |posting AS (
      |  SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY fp)
      |SELECT ch.doc_id, COUNT(*) AS n_chunks,
      |  CAST(SUM(CASE WHEN p.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup_chunks,
      |  CAST(SUM(CASE WHEN p.nd >= 2 THEN 1 ELSE 0 END) * 1000
      |    // COUNT(*) AS BIGINT) AS dup_pm
      |FROM ch JOIN posting p ON ch.fp = p.fp
      |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin

  // -------------------------------------------------- mm_audio_clip
  /** CLIPPING DETECTION over real decoded PCM — the audio-quality
    * gate a speech corpus runs before transcription (clipped runs ≡
    * saturated ADC ≡ distorted phonemes): samples stream through the
    * actual JDK WAV codec, a sample clips at |s| ≥ 30000, and the
    * audit reports the clipped count and the LONGEST CONSECUTIVE
    * clipped run (one saturated syllable matters more than scattered
    * peaks). Map-only per-blob loop (same shape as the other codec
    * passes — no sample ever shuffles); the oracle replays the known
    * PCM formula with a gaps-and-islands run computation. */
  def mmAudioClip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions(_.map { id =>
        val s = decodeWavSamples(encodeWav(id))
        var clipped = 0L; var run = 0L; var maxRun = 0L
        var i = 0
        while (i < s.length) {
          if (math.abs(s(i)) >= 30000) {
            clipped += 1; run += 1; if (run > maxRun) maxRun = run
          } else run = 0
          i += 1
        }
        (id, s.length.toLong, clipped, maxRun,
          if (s.length > 0) clipped * 1000 / s.length else 0L)
      })
      .toDF("doc_id", "n_samples", "n_clipped", "max_run", "clip_pm")
      .orderBy("doc_id")
  }

  val mmAudioClipSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    (100 + doc_id % 50) * (1 + doc_id % 2) AS ns
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, ns, k,
      |    ((doc_id + 2*k) % 251) + ((doc_id + 2*k + 1) % 251) * 256 AS u
      |  FROM (SELECT doc_id, ns, unnest(range(0, ns)) AS k FROM d) t),
      |v AS (SELECT doc_id, ns, k,
      |  CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS smp FROM s),
      |cl AS (SELECT doc_id, ns, k FROM v WHERE ABS(smp) >= 30000),
      |grp AS (
      |  SELECT doc_id, ns,
      |    k - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY k) AS g
      |  FROM cl),
      |runs AS (
      |  SELECT doc_id, COUNT(*) AS run FROM grp GROUP BY doc_id, g),
      |agg AS (
      |  SELECT doc_id, COUNT(*) AS n_clipped FROM cl GROUP BY doc_id),
      |mx AS (
      |  SELECT doc_id, MAX(run) AS max_run FROM runs GROUP BY doc_id)
      |SELECT d.doc_id, CAST(d.ns AS BIGINT) AS n_samples,
      |  CAST(COALESCE(agg.n_clipped, 0) AS BIGINT) AS n_clipped,
      |  CAST(COALESCE(mx.max_run, 0) AS BIGINT) AS max_run,
      |  CAST(COALESCE(agg.n_clipped, 0) * 1000 // d.ns AS BIGINT)
      |    AS clip_pm
      |FROM d
      |LEFT JOIN agg ON agg.doc_id = d.doc_id
      |LEFT JOIN mx ON mx.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // --------------------------------------------- mm_image_letterbox
  /** ASPECT-RATIO BUCKETING + LETTERBOX PLAN — the batch-shape
    * planner vision training runs over a 100 TB image corpus (fixed
    * 32×32 tiles; images scale-to-fit and the rest is padding, and
    * padding is wasted FLOPs): dimensions come off the REAL PNG
    * header via the JDK codec, the fit is exact integer milli-scale
    * arithmetic, and the report groups by aspect class (wide/square/
    * tall) with the padding-waste per-mille a batching policy would
    * minimize by bucketing same-aspect images together. Map-only per
    * blob to a 3-row rollup; the oracle replays the generator's
    * dimension arithmetic — a hash match proves the decode AND the
    * plan math. */
  def mmImageLetterbox(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = docIds(spark, dir)
      .mapPartitions(_.map { id =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(encodePng(id)))
        val w = img.getWidth.toLong
        val h = img.getHeight.toLong
        val scale = math.min(32000L / w, 32000L / h)
        val sw = w * scale / 1000L
        val sh = h * scale / 1000L
        val wastePm = (1024L - sw * sh) * 1000L / 1024L
        val arPm = w * 1000L / h
        val bucket =
          if (arPm >= 1250) "wide"
          else if (arPm <= 800) "tall"
          else "square"
        (id, bucket, wastePm, sw * sh)
      })
      .toDF("doc_id", "bucket", "waste_pm", "px")
    per.groupBy("bucket")
      .agg(count(lit(1)).as("n_images"),
        sum(col("waste_pm")).as("_sw"),
        min(col("waste_pm")).as("min_waste_pm"),
        max(col("waste_pm")).as("max_waste_pm"),
        sum(col("px")).as("scaled_px"))
      .select(col("bucket"), col("n_images"),
        expr("_sw div n_images").as("avg_waste_pm"),
        col("min_waste_pm"), col("max_waste_pm"), col("scaled_px"))
      .reportSort("bucket")
  }

  val mmImageLetterboxSql: String =
    """WITH d AS (
      |  SELECT doc_id, 8 + doc_id % 32 AS w,
      |    8 + (doc_id * 7) % 32 AS h
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, w, h,
      |    LEAST(32000 // w, 32000 // h) AS scale
      |  FROM d),
      |q AS (
      |  SELECT doc_id,
      |    (w * scale) // 1000 AS sw, (h * scale) // 1000 AS sh,
      |    CASE WHEN w * 1000 // h >= 1250 THEN 'wide'
      |         WHEN w * 1000 // h <= 800 THEN 'tall'
      |         ELSE 'square' END AS bucket
      |  FROM p),
      |r AS (
      |  SELECT doc_id, bucket,
      |    (1024 - sw * sh) * 1000 // 1024 AS waste_pm,
      |    sw * sh AS px
      |  FROM q)
      |SELECT bucket, COUNT(*) AS n_images,
      |  CAST(SUM(waste_pm) // COUNT(*) AS BIGINT) AS avg_waste_pm,
      |  CAST(MIN(waste_pm) AS BIGINT) AS min_waste_pm,
      |  CAST(MAX(waste_pm) AS BIGINT) AS max_waste_pm,
      |  CAST(SUM(px) AS BIGINT) AS scaled_px
      |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin

  // ------------------------------------------------ mm_audio_pitch
  /** AUTOCORRELATION PITCH-LAG ESTIMATE over real decoded PCM — the
    * classic f0 front-end (speech pitch = the lag maximizing the
    * signal's self-similarity): samples stream through the JDK WAV
    * codec, R(τ) = Σ s[i]·s[i+τ] is evaluated at 8 candidate lags
    * (24..52 step 4 — the telephone-band pitch range at these
    * rates), and each doc reports its argmax lag with a smallest-lag
    * tie-break plus the R(best)/R(0) voicing ratio in per-mille.
    * Map-only per-blob loop → |rates × lags| rollup; exact integer
    * products (|s| ≤ 2¹⁵, so R caps at ~2³⁰·len — far inside int64).
    * The oracle replays every sample from the generator arithmetic:
    * a hash match proves decode + DSP. */
  def mmAudioPitch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lags = Array(24, 28, 32, 36, 40, 44, 48, 52)
    val per = docIds(spark, dir)
      .mapPartitions(_.map { id =>
        val s = decodeWavSamples(encodeWav(id))
        var r0 = 0L
        var i = 0
        while (i < s.length) { r0 += s(i).toLong * s(i); i += 1 }
        var bestLag = -1L
        var bestR = Long.MinValue
        var j = 0
        while (j < lags.length) {
          val t = lags(j)
          var r = 0L
          var k = 0
          while (k + t < s.length) { r += s(k).toLong * s(k + t); k += 1 }
          if (k > 0 && r > bestR) { bestR = r; bestLag = t.toLong }
          j += 1
        }
        // +1000·r0 shift before the divide (the q60_mom_change
        // idiom): bestR can be negative on noise-like content, and a
        // non-negative numerator makes truncating and flooring
        // division agree across engines
        val voiced =
          if (r0 > 0 && bestLag >= 0)
            (bestR * 1000 + 1000 * r0) / r0 - 1000
          else 0L
        (id, 8000L + (id % 8) * 1000L, bestLag, voiced)
      })
      .toDF("doc_id", "rate", "best_lag", "voiced_pm")
    per.groupBy("rate", "best_lag")
      .agg(count(lit(1)).as("n_docs"),
        min(col("voiced_pm")).as("min_voiced_pm"),
        max(col("voiced_pm")).as("max_voiced_pm"))
      .reportSort("rate", "best_lag")
  }

  val mmAudioPitchSql: String =
    """WITH d AS (
      |  SELECT doc_id, 8000 + (doc_id % 8) * 1000 AS rate,
      |    (100 + doc_id % 50) * (1 + doc_id % 2) AS ns
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, k,
      |    CAST(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END
      |      AS BIGINT) AS v
      |  FROM (
      |    SELECT doc_id, k,
      |      ((doc_id + 2*k) % 251) + ((doc_id + 2*k + 1) % 251) * 256
      |        AS u
      |    FROM (SELECT doc_id, unnest(range(0, ns)) AS k FROM d)
      |      t0) t),
      |r0 AS (SELECT doc_id, SUM(v * v) AS r0 FROM s GROUP BY 1),
      |rl AS (
      |  SELECT a.doc_id, l.lag, SUM(a.v * b.v) AS r,
      |    COUNT(*) AS n_terms
      |  FROM (SELECT UNNEST([24,28,32,36,40,44,48,52]) AS lag) l,
      |    s a JOIN s b
      |      ON b.doc_id = a.doc_id AND b.k = a.k + l.lag
      |  GROUP BY 1, 2),
      |best AS (
      |  SELECT doc_id, lag AS best_lag, r,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY r DESC, lag) AS rn
      |  FROM rl),
      |per AS (
      |  SELECT b.doc_id, d.rate, b.best_lag,
      |    CASE WHEN r0.r0 > 0
      |      THEN (b.r * 1000 + 1000 * r0.r0) // r0.r0 - 1000
      |      ELSE 0 END AS voiced_pm
      |  FROM best b JOIN r0 USING (doc_id) JOIN d USING (doc_id)
      |  WHERE b.rn = 1)
      |SELECT rate, best_lag, COUNT(*) AS n_docs,
      |  CAST(MIN(voiced_pm) AS BIGINT) AS min_voiced_pm,
      |  CAST(MAX(voiced_pm) AS BIGINT) AS max_voiced_pm
      |FROM per GROUP BY 1, 2 ORDER BY rate, best_lag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_audio_pitch" -> (mmAudioPitch _),
    "mm_image_letterbox" -> (mmImageLetterbox _),
    "mm_stride_dedup" -> (mmStrideDedup _),
    "mm_image_entropy" -> (mmImageEntropy _),
    "mm_audio_clip" -> (mmAudioClip _),
    "mm_image_edges" -> (mmImageEdges _),
    "mm_audio_resample" -> (mmAudioResample _),
    "mm_image_border" -> (mmImageBorder _),
    "mm_image_histogram" -> (mmImageHistogram _),
    "mm_chunk_dedup" -> (mmChunkDedup _),
    "mm_binary_meta" -> (mmBinaryMeta _),
    "mm_image_decode" -> (mmImageDecode _),
    "mm_image_resize" -> (mmImageResize _),
    "mm_image_phash" -> (mmImagePhash _),
    "mm_phash_dedup" -> (mmPhashDedup _),
    "mm_audio_vad" -> (mmAudioVad _),
    "mm_audio_zcr" -> (mmAudioZcr _),
    "mm_audio_crest" -> (mmAudioCrest _),
    "mm_audio_snr" -> (mmAudioSnr _),
    "mm_image_patches" -> (mmImagePatches _),
    "mm_video_scenes" -> (mmVideoScenes _),
    "mm_audio_decode" -> (mmAudioDecode _),
    "mm_audio_waveform" -> (mmAudioWaveform _),
    "mm_video_frames" -> (mmVideoFrames _))

  val oracles: Map[String, String] = Map(
    "mm_audio_pitch" -> mmAudioPitchSql,
    "mm_image_letterbox" -> mmImageLetterboxSql,
    "mm_stride_dedup" -> mmStrideDedupSql,
    "mm_image_entropy" -> mmImageEntropySql,
    "mm_audio_clip" -> mmAudioClipSql,
    "mm_image_edges" -> mmImageEdgesSql,
    "mm_audio_resample" -> mmAudioResampleSql,
    "mm_image_border" -> mmImageBorderSql,
    "mm_image_histogram" -> mmImageHistogramSql,
    "mm_chunk_dedup" -> mmChunkDedupSql,
    "mm_binary_meta" -> mmBinaryMetaSql,
    "mm_image_decode" -> mmImageDecodeSql,
    "mm_image_resize" -> mmImageResizeSql,
    "mm_image_phash" -> mmImagePhashSql,
    "mm_phash_dedup" -> mmPhashDedupSql,
    "mm_audio_vad" -> mmAudioVadSql,
    "mm_audio_zcr" -> mmAudioZcrSql,
    "mm_audio_crest" -> mmAudioCrestSql,
    "mm_audio_snr" -> mmAudioSnrSql,
    "mm_image_patches" -> mmImagePatchesSql,
    "mm_video_scenes" -> mmVideoScenesSql,
    "mm_audio_decode" -> mmAudioDecodeSql,
    "mm_audio_waveform" -> mmAudioWaveformSql,
    "mm_video_frames" -> mmVideoFramesSql)
}
