package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, batch-decoded per partition.
  *
  * The decode path is REAL for five container formats — BMP, PNG and JPEG
  * (image), RIFF/WAVE (audio), RIFF/AVI (video): media type, dimensions,
  * sample/frame counts and the feature histogram all derive from the
  * actual payload bytes (magic numbers, BITMAPINFOHEADER, PNG IHDR chunk
  * walk with CRC-framed lengths, JPEG SOFn segment walk, RIFF chunk walk).
  * No external codec libraries are needed for the header parses, so this
  * runs in any executor JVM; pixel-level decode of the compressed streams
  * (IDAT inflate / entropy-coded scans) would slot into the same
  * per-partition batched kernel.
  */
object Multimodal {

  final case class MediaRow(media_ref: String, media_type: String, payload: Array[Byte])

  /** Decoded features. Field meaning per type:
    *  - image: width/height = pixel dims, n_frames = 1
    *  - audio: width = sample rate (Hz), height = channels, n_frames =
    *    PCM sample frames in the data chunk
    *  - video: width/height = frame dims, n_frames = total frames
    * feature = 8-bin normalized byte histogram over the payload body
    * (pixel / PCM / movi data) — a deterministic content fingerprint. */
  final case class MediaFeatures(media_ref: String, media_type: String,
                                 width: Int, height: Int, n_frames: Int,
                                 feature: Array[Float])

  // ------------------------------------------------------------ synthesis
  /** Deterministic payloads for media refs (stands in for a blob-store
    * fetch): REAL container bytes — a 24bpp BMP, a PCM16 WAV, or a minimal
    * AVI — whose headers encode dimensions derived from the ref hash, so
    * the decoder's output is verifiable against the synthesis parameters. */
  def synthPayloads(spark: SparkSession, refs: DataFrame, refCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    refs.select(col(refCol).cast("string")).as[String].map { ref =>
      val h = ref.hashCode
      math.abs(h) % 3 match {
        case 0 =>
          val w = 2 + math.abs(h >> 3) % 6
          val ht = 2 + math.abs(h >> 7) % 6
          MediaRow(ref, "image", synthBmp(w, ht, h))
        case 1 =>
          val channels = 1 + math.abs(h >> 3) % 2
          val samples = 16 + math.abs(h >> 5) % 32
          MediaRow(ref, "audio", synthWav(channels, 8000, samples, h))
        case _ =>
          val w = 16 + math.abs(h >> 3) % 64
          val ht = 16 + math.abs(h >> 9) % 64
          val frames = 10 + math.abs(h >> 5) % 50
          MediaRow(ref, "video", synthAvi(w, ht, frames, h))
      }
    }
  }

  private def le16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
  }
  private def le32(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
    b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
  }
  private def tag(b: Array[Byte], i: Int, t: String): Unit =
    t.getBytes("US-ASCII").zipWithIndex.foreach { case (c, j) => b(i + j) = c }

  /** 24bpp bottom-up BMP with BITMAPINFOHEADER; rows padded to 4 bytes. */
  def synthBmp(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val b = new Array[Byte](54 + dataSize)
    tag(b, 0, "BM"); le32(b, 2, b.length.toLong); le32(b, 10, 54)
    le32(b, 14, 40); le32(b, 18, w.toLong); le32(b, 22, h.toLong)
    le16(b, 26, 1); le16(b, 28, 24); le32(b, 34, dataSize.toLong)
    var i = 0
    while (i < dataSize) { b(54 + i) = ((seed >> (i % 24)) & 0xff).toByte; i += 1 }
    b
  }

  /** Canonical PCM16 WAV: RIFF/WAVE + fmt(16) + data. */
  def synthWav(channels: Int, rate: Int, samples: Int, seed: Int): Array[Byte] = {
    val blockAlign = channels * 2
    val dataSize = samples * blockAlign
    val b = new Array[Byte](44 + dataSize)
    tag(b, 0, "RIFF"); le32(b, 4, (36 + dataSize).toLong); tag(b, 8, "WAVE")
    tag(b, 12, "fmt "); le32(b, 16, 16); le16(b, 20, 1); le16(b, 22, channels)
    le32(b, 24, rate.toLong); le32(b, 28, (rate * blockAlign).toLong)
    le16(b, 32, blockAlign); le16(b, 34, 16)
    tag(b, 36, "data"); le32(b, 40, dataSize.toLong)
    var i = 0
    while (i < dataSize) { b(44 + i) = ((seed >> (i % 16)) & 0xff).toByte; i += 1 }
    b
  }

  /** Minimal RIFF/AVI: LIST hdrl { avih } + empty LIST movi. */
  def synthAvi(w: Int, h: Int, frames: Int, seed: Int): Array[Byte] = {
    val avihSize = 56
    val hdrlSize = 4 + 8 + avihSize // "hdrl" + avih chunk
    val moviSize = 4 + 32 // "movi" + fake payload
    val b = new Array[Byte](12 + 8 + hdrlSize + 8 + moviSize)
    tag(b, 0, "RIFF"); le32(b, 4, (b.length - 8).toLong); tag(b, 8, "AVI ")
    tag(b, 12, "LIST"); le32(b, 16, hdrlSize.toLong); tag(b, 20, "hdrl")
    tag(b, 24, "avih"); le32(b, 28, avihSize.toLong)
    val a = 32 // avih data start
    le32(b, a, 33333); le32(b, a + 16, frames.toLong)
    le32(b, a + 32, w.toLong); le32(b, a + 36, h.toLong)
    val m = a + avihSize
    tag(b, m, "LIST"); le32(b, m + 4, moviSize.toLong); tag(b, m + 8, "movi")
    var i = m + 12
    while (i < b.length) { b(i) = ((seed >> (i % 24)) & 0xff).toByte; i += 1 }
    b
  }

  private def be32(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = ((v >> 24) & 0xff).toByte; b(i + 1) = ((v >> 16) & 0xff).toByte
    b(i + 2) = ((v >> 8) & 0xff).toByte; b(i + 3) = (v & 0xff).toByte
  }

  /** Real PNG: signature + IHDR + IDAT (actual zlib-deflated 8-bit gray
    * scanlines) + IEND, all with valid CRC32s — decodable by any PNG
    * reader, synthesized pure-JVM (java.util.zip). */
  def synthPng(w: Int, h: Int, seed: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"png dims must be positive ($w x $h)")
    val raw = new Array[Byte](h * (1 + w)) // filter byte 0 + gray pixels
    var i = 0
    for (y <- 0 until h) {
      raw(i) = 0; i += 1
      for (x <- 0 until w) { raw(i) = ((seed >> ((x + y) % 24)) & 0xff).toByte; i += 1 }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    // drain fully: one deflate() call can return before finished() on
    // low-redundancy rasters (5-byte stored-block overhead per 64 KiB),
    // which would embed a truncated zlib stream behind a VALID CRC
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val k = d.deflate(buf)
      bos.write(buf, 0, k)
    }
    d.end()
    val comp = bos.toByteArray
    val n = comp.length
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](12 + data.length)
      be32(out, 0, data.length.toLong)
      typ.getBytes("US-ASCII").copyToArray(out, 4)
      data.copyToArray(out, 8)
      val crc = new java.util.zip.CRC32()
      crc.update(out, 4, 4 + data.length)
      be32(out, 8 + data.length, crc.getValue)
      out
    }
    val ihdr = new Array[Byte](13)
    be32(ihdr, 0, w.toLong); be32(ihdr, 4, h.toLong)
    ihdr(8) = 8; ihdr(9) = 0 // 8-bit grayscale
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", comp) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Minimal structurally-valid JPEG: SOI + APP0/JFIF + DQT + SOF0
    * (baseline, carrying the dims) + EOI. Headers are real per ITU T.81;
    * no entropy-coded scan is included (header decode never reads one). */
  def synthJpeg(w: Int, h: Int, seed: Int): Array[Byte] = {
    require(w > 0 && w <= 0xffff && h > 0 && h <= 0xffff, s"jpeg dims out of range ($w x $h)")
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        (((payload.length + 2) >> 8) & 0xff).toByte,
        ((payload.length + 2) & 0xff).toByte) ++ payload
    val app0 = "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val dqt = Array[Byte](0) ++ (0 until 64).map(i => ((seed >> (i % 24)) & 0x7f | 1).toByte)
    val sof0 = Array[Byte](8, // precision
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
      1, 1, 0x11, 0) // 1 component, 1x1 sampling, table 0
    Array(0xff.toByte, 0xd8.toByte) ++ seg(0xe0, app0) ++ seg(0xdb, dqt) ++
      seg(0xc0, sof0) ++ Array(0xff.toByte, 0xd9.toByte)
  }

  // ------------------------------------------------------------- decoding
  /** Header codec: derives type + metadata from the payload BYTES (the
    * claimed media_type on MediaRow is ignored — decode is the source of
    * truth). Malformed payloads raise; silent misclassification would
    * poison every downstream triple. */
  final class HeaderCodec extends Serializable {
    private def u16(b: Array[Byte], i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
        ((b(i + 3) & 0xffL) << 24)
    private def tagAt(b: Array[Byte], i: Int, t: String) =
      b.length >= i + 4 && t.getBytes("US-ASCII").zipWithIndex.forall { case (c, j) => b(i + j) == c }

    /** Validated RIFF chunk size at offset i: a corrupt 32-bit size field
      * must raise, not wedge the walk (a size like 0xFFFFFFF8 as a
      * truncated Int made `i += 8 + size` advance by zero or backwards —
      * an executor-side infinite loop on adversarial bytes). */
    private def chunkSize(b: Array[Byte], i: Int, ref: String): Int = {
      val size = u32(b, i + 4)
      if (size > b.length - i - 8)
        throw new IllegalArgumentException(
          s"malformed RIFF chunk in $ref: size $size exceeds remaining ${b.length - i - 8} bytes")
      size.toInt
    }

    /** 8-bin normalized byte histogram over b[from, b.length). */
    private def histogram(b: Array[Byte], from: Int): Array[Float] = {
      val bins = new Array[Int](8)
      var i = math.max(0, from)
      while (i < b.length) { bins((b(i) & 0xff) >> 5) += 1; i += 1 }
      val n = math.max(1, b.length - math.max(0, from))
      bins.map(_.toFloat / n)
    }

    private def bu16(b: Array[Byte], i: Int) = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def bu32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

    private val pngSig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    private def isPng(b: Array[Byte]) =
      b.length >= 8 && pngSig.indices.forall(i => (b(i) & 0xff) == pngSig(i))

    /** PNG IHDR parse with a validated chunk walk (same discipline as the
      * RIFF codecs: a corrupt length must raise, never wedge or overrun). */
    private def decodePng(r: MediaRow): MediaFeatures = {
      val b = r.payload
      var i = 8
      var w = -1; var h = -1; var dataOff = b.length
      var first = true
      while (i + 8 <= b.length) {
        val len = bu32(b, i)
        if (len > b.length - i - 12)
          throw new IllegalArgumentException(
            s"malformed PNG in ${r.media_ref}: chunk length $len exceeds remaining ${b.length - i - 12} bytes")
        val typ = new String(b, i + 4, 4, "US-ASCII")
        if (first) {
          if (typ != "IHDR" || len < 13)
            throw new IllegalArgumentException(
              s"malformed PNG in ${r.media_ref}: first chunk is $typ($len), expected IHDR(13)")
          w = bu32(b, i + 8).toInt; h = bu32(b, i + 12).toInt
          first = false
        } else if (typ == "IDAT" && dataOff == b.length) dataOff = i + 8
        i += 12 + len.toInt
      }
      if (w < 0)
        throw new IllegalArgumentException(s"malformed PNG in ${r.media_ref}: no IHDR chunk")
      MediaFeatures(r.media_ref, "image", w, h, 1, histogram(b, dataOff))
    }

    /** JPEG SOF-marker parse (ITU T.81 segment walk): dims come from the
      * first SOFn segment; the walk stops at SOS (entropy-coded data
      * follows) and every declared segment length is bounds-checked. */
    private def decodeJpeg(r: MediaRow): MediaFeatures = {
      val b = r.payload
      var i = 2
      var w = -1; var h = -1; var dataOff = b.length
      var done = false
      while (!done && i + 2 <= b.length) {
        if ((b(i) & 0xff) != 0xff)
          throw new IllegalArgumentException(
            s"malformed JPEG in ${r.media_ref}: expected marker at offset $i, " +
              f"got ${b(i) & 0xff}%02x")
        // ITU T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker
        while (i + 2 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
        val m = b(i + 1) & 0xff
        if (m == 0xd9) done = true // EOI
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2 // standalone
        else {
          if (i + 4 > b.length)
            throw new IllegalArgumentException(
              s"malformed JPEG in ${r.media_ref}: truncated segment header at $i")
          val len = bu16(b, i + 2)
          if (len < 2 || len > b.length - i - 2)
            throw new IllegalArgumentException(
              s"malformed JPEG in ${r.media_ref}: segment ${f"$m%02x"} length $len " +
                s"out of bounds (${b.length - i - 2} remaining)")
          val isSof = (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof && w < 0) {
            if (len < 7)
              throw new IllegalArgumentException(
                s"malformed JPEG in ${r.media_ref}: SOF segment too short ($len)")
            h = bu16(b, i + 5); w = bu16(b, i + 7)
          }
          if (m == 0xda) { dataOff = i + 2 + len; done = true } // SOS
          else i += 2 + len
        }
      }
      if (w < 0)
        throw new IllegalArgumentException(s"malformed JPEG in ${r.media_ref}: no SOF marker")
      MediaFeatures(r.media_ref, "image", w, h, 1, histogram(b, dataOff))
    }

    def decode(r: MediaRow): MediaFeatures = {
      val b = r.payload
      if (isPng(b)) decodePng(r)
      else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
        decodeJpeg(r)
      else if (tagAt(b, 0, "BM") && b.length >= 54) {
        val w = u32(b, 18).toInt
        val h = u32(b, 22).toInt // negative = top-down; dims are |h|
        val dataOff = u32(b, 10).toInt
        MediaFeatures(r.media_ref, "image", w, math.abs(h), 1, histogram(b, dataOff))
      } else if (tagAt(b, 0, "RIFF") && tagAt(b, 8, "WAVE")) {
        // RIFF chunk walk: fmt (rate/channels/blockAlign) + data (size).
        // frames is computed AFTER the walk from the recorded data size —
        // legal-in-the-wild files may place data before fmt, and dividing
        // inline would use the default blockAlign (wrong by channels*2).
        var i = 12
        var rate = 0; var channels = 0; var blockAlign = 1
        var dataSize = 0; var dataOff = b.length
        while (i + 8 <= b.length) {
          val size = chunkSize(b, i, r.media_ref)
          if (tagAt(b, i, "fmt ") && i + 8 + 16 <= b.length) {
            channels = u16(b, i + 10); rate = u32(b, i + 12).toInt
            blockAlign = math.max(1, u16(b, i + 20))
          } else if (tagAt(b, i, "data")) {
            dataSize = size; dataOff = i + 8
          }
          i += 8 + size + (size & 1) // chunks are word-aligned
        }
        MediaFeatures(r.media_ref, "audio", rate, channels, dataSize / blockAlign,
          histogram(b, dataOff))
      } else if (tagAt(b, 0, "RIFF") && tagAt(b, 8, "AVI ")) {
        // walk top-level LISTs; read avih out of hdrl
        var i = 12
        var w = 0; var h = 0; var frames = 0; var moviOff = b.length
        while (i + 8 <= b.length) {
          val size = chunkSize(b, i, r.media_ref)
          if (tagAt(b, i, "LIST") && tagAt(b, i + 8, "hdrl") &&
              tagAt(b, i + 12, "avih")) {
            val a = i + 20 // avih data
            if (a + 40 > b.length) // avih fields read up to a+36..a+40
              throw new IllegalArgumentException(
                s"malformed AVI in ${r.media_ref}: truncated avih header " +
                  s"(need ${a + 40} bytes, have ${b.length})")
            frames = u32(b, a + 16).toInt; w = u32(b, a + 32).toInt; h = u32(b, a + 36).toInt
          } else if (tagAt(b, i, "LIST") && tagAt(b, i + 8, "movi")) moviOff = i + 12
          i += 8 + size + (size & 1)
        }
        MediaFeatures(r.media_ref, "video", w, h, frames, histogram(b, moviOff))
      } else
        throw new IllegalArgumentException(
          s"unrecognized media container for ${r.media_ref} " +
            s"(${b.take(4).map(x => f"${x & 0xff}%02x").mkString(" ")}…)")
    }
  }

  /** Batched decode/feature-extract: one codec instance per partition
    * (codec init cost amortized over the partition, the Scala analogue of a
    * mapInPandas batch). */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val codec = new HeaderCodec // per-partition init
      it.map(codec.decode)
    }
  }

  /** Frame sampling plumbing for video rows: explode a deterministic frame
    * index selection (every `stride`-th frame). */
  def sampleFrames(features: DataFrame, stride: Int = 30): DataFrame =
    features.filter(col("media_type") === "video")
      .select(col("media_ref"), explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
