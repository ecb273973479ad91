package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side contract (schema, partitioning, batch
  * shape, null handling) is real and tested, and the PROBE stage is a real
  * pure-JVM header parser ([[HeaderCodec]]): PNG IHDR width/height, JPEG SOF
  * dimensions, WAV fmt/data sample-rate/channels/frame-count, MP4 tkhd/stts
  * dimensions/frame-count — no external codec libraries needed. A payload
  * NO parser recognizes is not guessed at: its meta row carries
  * `parsed = false` and zeros, and [[probeViolations]] turns it into the
  * same violation-row shape the validators emit — corrupt media is a data
  * QUALITY fact, not something to paper over with fabricated dimensions.
  * (Only FEATURE extraction, which would need a real decode, remains a
  * declared stub: [[StubFeatures]].)
  *
  * Design notes for 100 TB of media:
  *   - media bytes live in their own column; metadata-only queries never
  *     touch them (parquet column pruning — verified in tests via ReadSchema);
  *   - decode runs per-partition (`mapPartitions`), so codec init happens
  *     once per task, not per row — the Scala analogue of a Pandas UDF's
  *     batch amortization;
  *   - output is (id, meta, features), never the raw bytes again, so the
  *     decode stage is the last stage that carries them.
  */
object Multimodal {

  final case class MediaRow(media_ref: String, mime: String, content: Array[Byte])

  /** Typed probe result. Field population by modality:
    * images — width/height from the header, nframes = 1;
    * audio  — sample_rate/channels/nframes (sample frames) from the header;
    * video  — width/height/nframes from the MP4 container boxes.
    * `parsed = false` (all numeric fields 0) marks a payload no header
    * parser recognized — surfaced as a violation by [[probeViolations]].
    */
  final case class MediaMeta(media_ref: String, mime: String, bytes: Long,
      width: Int, height: Int, nframes: Int, sample_rate: Int, channels: Int,
      parsed: Boolean)
  final case class MediaFeature(media_ref: String, dim: Int, feature: Array[Float])

  /** Real pure-JVM header parsing — dispatches on magic bytes, not the mime
    * string (a mislabeled file reports what it IS).
    */
  object HeaderCodec {
    private def beInt(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def beShort(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    private def leInt(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def leShort(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
      b.length >= o + s.length && s.indices.forall(i => b(o + i) == s.charAt(i).toByte)

    def isPng(b: Array[Byte]): Boolean =
      b.length >= 24 && (b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG") &&
        ascii(b, 12, "IHDR")
    def isJpeg(b: Array[Byte]): Boolean =
      b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8
    def isWav(b: Array[Byte]): Boolean =
      b.length >= 12 && ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")

    /** PNG: IHDR is mandated to be the first chunk — width/height are the
      * big-endian ints at bytes 16..23.
      */
    def probePng(b: Array[Byte]): Option[(Int, Int)] =
      if (isPng(b)) Some((beInt(b, 16), beInt(b, 20))) else None

    /** JPEG: walk the marker stream to the first SOFn frame header
      * (C0..CF except C4/C8/CC); height/width are the big-endian shorts at
      * +5/+7 of the segment.
      */
    def probeJpeg(b: Array[Byte]): Option[(Int, Int)] = {
      if (!isJpeg(b)) return None
      var i = 2
      while (i + 9 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None // desynced marker stream
        val m = b(i + 1) & 0xff
        if (m == 0xff) i += 1 // 0xFF fill bytes before a marker are legal
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          return Some((beShort(b, i + 7), beShort(b, i + 5)))
        }
        else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd9)) i += 2 // bare markers
        else i += 2 + beShort(b, i + 2)
      }
      None
    }

    /** WAV: scan RIFF chunks for `fmt ` (channels LE16 at +2, sample rate
      * LE32 at +4, block align LE16 at +12) and `data` (payload size →
      * sample frames = size / blockAlign). Returns
      * (sampleRate, channels, sampleFrames).
      */
    def probeWav(b: Array[Byte]): Option[(Int, Int, Int)] = {
      if (!isWav(b)) return None
      var i = 12
      var rate = -1; var ch = -1; var align = -1; var dataSize = -1
      while (i + 8 <= b.length && (rate < 0 || dataSize < 0)) {
        val size = leInt(b, i + 4)
        if (size < 0) return None // corrupt size field: never walk backwards
        if (ascii(b, i, "fmt ") && i + 8 + 16 <= b.length) {
          ch = leShort(b, i + 10)
          rate = leInt(b, i + 12)
          align = leShort(b, i + 20)
        } else if (ascii(b, i, "data")) {
          dataSize = size
        }
        i += 8 + size + (size & 1) // chunks are word-aligned
      }
      if (rate > 0 && ch > 0 && align > 0 && dataSize >= 0)
        Some((rate, ch, dataSize / align))
      else None
    }

    def isMp4(b: Array[Byte]): Boolean =
      b.length >= 12 && ascii(b, 4, "ftyp")

    /** MP4/ISO-BMFF container walk — REAL parsing, no codec libs: boxes
      * are (size:int32be, type:4cc, payload); `tkhd` carries track
      * width/height as 16.16 fixed point at payload offsets 76/80 (v0);
      * `stts` entries are (sample_count, sample_delta) pairs whose count
      * sum is the EXACT frame count. Returns (width, height, frames) from
      * the first sized track. Only frame DECODING would need a codec;
      * container metadata does not.
      */
    def probeMp4(b: Array[Byte]): Option[(Int, Int, Int)] = {
      if (!isMp4(b)) return None
      var w = 0; var h = 0; var frames = 0
      // real container trees are ~5 deep; the bound keeps adversarial
      // nested-box bytes from overflowing the stack (fail-soft contract)
      def walk(start: Int, end: Int, depth: Int = 0): Unit = {
        if (depth > 16) return
        var i = start
        var ok = true
        while (ok && i + 8 <= end) {
          val size = beInt(b, i)
          if (size < 8 || i + size > end) ok = false
          else {
            def is(s: String) = ascii(b, i + 4, s)
            if (is("moov") || is("trak") || is("mdia") || is("minf") || is("stbl"))
              walk(i + 8, i + size, depth + 1)
            else if (is("tkhd") && size >= 92 && b(i + 8) == 0) {
              val tw = beInt(b, i + 8 + 76) >>> 16
              val th = beInt(b, i + 8 + 80) >>> 16
              if (tw > 0 && th > 0 && w == 0) { w = tw; h = th }
            } else if (is("stts") && size >= 16) {
              val n = beInt(b, i + 12)
              var j = 0; var acc = 0
              while (j < n && i + 16 + j * 8 + 4 <= i + size) {
                acc += beInt(b, i + 16 + j * 8); j += 1
              }
              if (frames == 0) frames = acc
            }
            i += size
          }
        }
      }
      walk(0, b.length)
      if (w > 0 && h > 0) Some((w, h, frames)) else None
    }

    /** Full probe → (width, height, nframes, sampleRate, channels), or None
      * when NO header parser recognizes the payload (incl. null content) —
      * magic-byte dispatch, so a mislabeled file reports what it IS. There
      * is deliberately no fabricated fallback: an unrecognized payload is a
      * violation ([[probeViolations]]), never invented dimensions.
      */
    def probe(content: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
      if (content == null) return None
      probePng(content).map { case (w, h) => (w, h, 1, 0, 0) }
        .orElse(probeJpeg(content).map { case (w, h) => (w, h, 1, 0, 0) })
        .orElse(probeWav(content).map { case (r, c, f) => (0, 0, f, r, c) })
        .orElse(probeMp4(content).map { case (w, h, f) => (w, h, f, 0, 0) })
    }
  }

  /** STUB feature extractor: deterministic pseudo-embedding derived from the
    * content bytes — `???` in spirit (a real image/audio embedding needs
    * decode + a model this container doesn't ship); the Spark-side plumbing
    * (schema, batch shape, per-partition init) is the real contract, swap
    * this body for a real encoder without touching it. Unlike the retired
    * probe stub, a FAKE FEATURE VECTOR is the declared output of this stage,
    * not fiction presented as parsed metadata.
    */
  object StubFeatures {
    def features(content: Array[Byte], dim: Int): Array[Float] = {
      val bytes = if (content == null) Array.emptyByteArray else content
      val out = new Array[Float](dim)
      var acc = 1125899906842597L
      var i = 0
      while (i < bytes.length) { acc = acc * 31 + bytes(i); i += 1 }
      var j = 0
      while (j < dim) {
        acc = acc * 6364136223846793005L + 1442695040888963407L
        out(j) = ((acc >>> 33).toInt % 1000) / 1000.0f
        j += 1
      }
      out
    }
  }

  /** Builders for REAL media headers (used by the synthetic corpus and the
    * specs, so probe results are value-checkable against the numbers the
    * bytes actually encode).
    */
  object HeaderBytes {
    def png(width: Int, height: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(33)
      out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      out.putInt(13).put("IHDR".getBytes("US-ASCII"))
      out.putInt(width).putInt(height)
      out.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      out.putInt(0) // CRC not validated by the probe
      out.array()
    }
    def jpeg(width: Int, height: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(2 + 18 + 2 + 11)
      out.put(Array(0xff, 0xd8).map(_.toByte))
      // APP0/JFIF segment (probe must skip it)
      out.put(Array(0xff, 0xe0).map(_.toByte)).putShort(16.toShort)
        .put("JFIF".getBytes("US-ASCII")).put(new Array[Byte](10))
      // SOF0
      out.put(Array(0xff, 0xc0).map(_.toByte)).putShort(11.toShort)
        .put(8.toByte).putShort(height.toShort).putShort(width.toShort)
        .put(1.toByte).put(new Array[Byte](3))
      out.array()
    }
    def wav(sampleRate: Int, channels: Int, sampleFrames: Int): Array[Byte] = {
      val blockAlign = channels * 2 // 16-bit PCM
      val out = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36)
        .put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort).putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
        .putShort(16.toShort)
      // header-only fixture: data chunk declares its payload size but the
      // samples are not materialized (the probe never reads past the header)
      out.put("data".getBytes("US-ASCII")).putInt(sampleFrames * blockAlign)
      out.array()
    }
    /** Minimal-but-valid ISO-BMFF: ftyp + moov{mvhd, trak{tkhd,
      * mdia{minf{stbl{stts}}}}} — 280 bytes; tkhd carries width/height
      * (16.16 fixed), stts one (frames, delta) entry.
      */
    def mp4(width: Int, height: Int, frames: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(280)
      def box(size: Int, tpe: String): Unit = {
        out.putInt(size); out.put(tpe.getBytes("US-ASCII"))
      }
      box(16, "ftyp"); out.put("isom".getBytes("US-ASCII")).putInt(0)
      box(264, "moov")
      box(108, "mvhd")
      out.putInt(0) // version 0 + flags
        .putInt(0).putInt(0) // ctime, mtime
        .putInt(600).putInt(frames * 25) // timescale, duration
        .putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
        .put(new Array[Byte](10)) // reserved
      putUnityMatrix(out)
      out.put(new Array[Byte](24)).putInt(2) // predefined, next track id
      box(148, "trak")
      box(92, "tkhd")
      out.putInt(0) // version 0 + flags
        .putInt(0).putInt(0).putInt(1).putInt(0) // ctime, mtime, track, rsvd
        .putInt(frames * 25).put(new Array[Byte](8)) // duration, reserved
        .putShort(0.toShort).putShort(0.toShort) // layer, alt group
        .putShort(0.toShort).putShort(0.toShort) // volume, reserved
      putUnityMatrix(out)
      out.putInt(width << 16).putInt(height << 16) // 16.16 fixed point
      box(48, "mdia"); box(40, "minf"); box(32, "stbl")
      box(24, "stts")
      out.putInt(0).putInt(1) // version+flags, entry count
        .putInt(frames).putInt(25) // sample count, sample delta
      out.array()
    }
    private def putUnityMatrix(out: java.nio.ByteBuffer): Unit = {
      out.putInt(0x00010000).putInt(0).putInt(0)
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
    }
  }

  /** Deterministic synthetic media table — PNG, WAV and MP4 rows all
    * carry REAL headers encoding id-derived dimensions/frame counts, so
    * every probe result is value-checkable against the id formula.
    */
  def syntheticMedia(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map { id =>
      val ref = "m-" + ("%08x".format(id))
      (id % 3) match {
        case 0 =>
          val w = 16 + (id % 1920).toInt
          val h = 16 + ((id / 7) % 1080).toInt
          (ref, "image/png", HeaderBytes.png(w, h))
        case 1 =>
          val rate = 8000 + (id % 8).toInt * 1000
          val ch = 1 + (id % 2).toInt
          val frames = 100 + (id % 1000).toInt
          (ref, "audio/wav", HeaderBytes.wav(rate, ch, frames))
        case _ =>
          val w = 16 + (id % 640).toInt
          val h = 16 + ((id / 3) % 480).toInt
          val frames = 1 + (id % 300).toInt
          (ref, "video/mp4", HeaderBytes.mp4(w, h, frames))
      }
    }.toDF("media_ref", "mime", "content")
  }

  /** Decode/probe stage: binary → typed metadata, one codec init per
    * partition. PNG/JPEG/WAV/MP4 headers are really parsed; a payload no
    * parser recognizes yields `parsed = false` with zeroed fields (see
    * [[probeViolations]]).
    */
  def probeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_ref"), col("mime"), col("content")).as[MediaRow]
      .mapPartitions { rows =>
        // a real demuxer/codec would initialize once here
        rows.map { r =>
          val bytes = if (r.content == null) 0L else r.content.length.toLong
          HeaderCodec.probe(r.content) match {
            case Some((w, h, f, sr, ch)) =>
              MediaMeta(r.media_ref, r.mime, bytes, w, h, f, sr, ch, parsed = true)
            case None =>
              MediaMeta(r.media_ref, r.mime, bytes, 0, 0, 0, 0, 0, parsed = false)
          }
        }
      }
  }

  /** Unparseable payloads as violation rows — the same (path, rule, message)
    * shape the schema validators emit, so corrupt media feeds the SAME
    * verdict/error-sink machinery as any other data-quality failure.
    */
  def probeViolations(media: DataFrame): DataFrame =
    probeMeta(media).toDF()
      .filter(!col("parsed"))
      .select(col("media_ref").as("doc_id"),
        lit("content").as("path"),
        lit("media_header").as("rule"),
        concat(lit("Unrecognized media payload ("), col("bytes"),
          lit(" bytes, declared "), col("mime"), lit(")")).as("message"))

  /** Feature-extraction stage: binary → fixed-dim float vector. */
  def extractFeatures(media: DataFrame, dim: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_ref"), col("mime"), col("content")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map(r => MediaFeature(r.media_ref, dim, StubFeatures.features(r.content, dim)))
      }
  }

  /** Aspect-preserving resize PLAN for image/video rows: the target
    * dimensions each decoder task must produce for a maxW×maxH bounding
    * box (never upscaled) — pure Column math over probed metadata, so the
    * plan for 10^12 media rows costs one metadata scan and the expensive
    * decode+scale stage receives exact work orders. Rounding is
    * `floor(x + 0.5)` (IEEE-exact, engine-portable — same rationale as
    * [[Similarity.quantizeInt8]]). Only `parsed` rows with real dimensions
    * qualify.
    */
  def resizePlan(meta: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    require(maxW >= 1 && maxH >= 1)
    val scale = least(lit(1.0),
      least(lit(maxW.toDouble) / col("width"), lit(maxH.toDouble) / col("height")))
    meta.filter(col("parsed") && col("width") > 0 && col("height") > 0)
      .select(col("media_ref"), col("width"), col("height"),
        floor(col("width") * scale + 0.5).cast("int").as("out_w"),
        floor(col("height") * scale + 0.5).cast("int").as("out_h"))
  }

  /** Frame sampling plan for video rows: every `stride`-th frame index up to
    * the probed frame count — pure Column math over the probed metadata (the
    * actual frame decode would join back to bytes by media_ref). Only
    * `parsed` rows qualify: an unparseable container has no trustworthy
    * frame count to sample from (it is a violation, not a zero-frame video).
    */
  def sampleFrames(meta: DataFrame, stride: Int = 10): DataFrame =
    meta.filter(col("mime").startsWith("video") && col("parsed"))
      .select(col("media_ref"),
        sequence(lit(0), greatest(col("nframes") - 1, lit(0)), lit(stride))
          .as("frame_indices"))
}
