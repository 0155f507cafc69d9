package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, processed batch-wise with mapPartitions
  * (the Scala analog of arrow-batched Python UDFs).
  *
  * IMAGE decode is REAL: the JDK ships PNG/JPEG/BMP/GIF codecs in
  * `javax.imageio` (zero new dependencies), so a payload that parses as an
  * image yields pixel-space features and its DCT perceptual hash. AUDIO
  * decode is REAL for PCM containers: WAV/AIFF/AU payloads decode through
  * `javax.sound.sampled` (also in the JDK) to sample-space features —
  * RMS, peak, duration, zero-crossings. VIDEO decode is REAL for the two
  * formats the JDK can parse: raw YUV4MPEG2 (Y4M — the uncompressed
  * interchange format every ffmpeg pipeline can emit; a ~60-line header +
  * plane parser, [[readY4m]]) and multi-frame animated GIF (the
  * `javax.imageio` GIF codec plus a real frame compositor honoring
  * per-frame offsets and disposal methods, [[readGifFrames]]); both yield
  * frame-space features — per-frame luminance, temporal activity,
  * duration, fps — and the temporal fingerprint [[videoFingerprint]].
  * COMPRESSED audio decodes for real where the mathematics is
  * library-free: IMA and MS ADPCM (4-bit, mono/stereo) and FLAC — the
  * entropy-coded lossless codec — via [[Flac]]. PERCEPTUAL codecs
  * (mp3/aac/h264/vp9…) stay STUBBED — their MDCT/psychoacoustic stacks
  * genuinely need libraries this environment lacks: `decodeStub`
  * derives deterministic byte-moment features, and every undecodable
  * payload falls back to it — that fallback is also the portable path the
  * DuckDB correctness gate's m01 replays (SQL cannot decode pixels or
  * samples, and that fixture's payloads are md5 bytes, not media
  * streams). The VIDEO gate is stronger: m07/m08 attach REAL Y4M clips
  * whose luma planes are derived from md5 arithmetic BOTH engines compute
  * ([[syntheticY4m]]), so the oracle replays the decoded ground truth —
  * a misparsed header or plane offset fails the gate. Everything else —
  * schema, encoders, partition-wise batching, metadata propagation — is
  * shared across the paths.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, nFrames: Int)
  case class MediaRow(doc_id: Long, media: Array[Byte], meta: MediaMeta)
  case class DecodedRow(doc_id: Long, format: String, width: Int, height: Int,
      n_frames: Int, n_bytes: Int, features: Array[Double])

  /** Attach a deterministic fake media payload + metadata to each document
    * (stands in for reading a real binary column from parquet). */
  def attachFakeMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      unhex(md5(col("text"))).as("media"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (lit(64) + (col("doc_id") % 8) * 32).cast("int").as("width"),
        (lit(64) + (col("doc_id") % 5) * 48).cast("int").as("height"),
        (col("doc_id") % 10 + 1).cast("int").as("nFrames")).as("meta"))

  // ImageIO's default stream cache writes executor temp FILES per decode —
  // disable once per JVM (first use of any decode path touches this)
  @transient private lazy val imageioInit: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** JDK-codec image parse; None when the payload is not a decodable
    * image (wav/video payloads, the gate's md5 fixture bytes, truncated
    * streams) — the caller falls back to [[decodeStub]]. */
  private def readImage(bytes: Array[Byte])
      : Option[java.awt.image.BufferedImage] = {
    imageioInit
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }
  }

  /** ITU-R BT.601 luma of a packed ARGB pixel (the classic 0.299/0.587/
    * 0.114 weights — deterministic double arithmetic on int channels). */
  private def luminance(argb: Int): Double = {
    val r = (argb >> 16) & 0xff
    val g = (argb >> 8) & 0xff
    val b = argb & 0xff
    0.299 * r + 0.587 * g + 0.114 * b
  }

  /** REAL image decode: pixel-space luminance moments [mean, stddev, max,
    * n_pixels], with width/height taken from the DECODED image — declared
    * metadata can lie; the decoder is the authority. */
  private def decodePixels(r: MediaRow,
      im: java.awt.image.BufferedImage): DecodedRow = {
    val w = im.getWidth
    val h = im.getHeight
    val rgb = im.getRGB(0, 0, w, h, null, 0, w)
    var s0 = 0.0; var s1 = 0.0; var mx = 0.0
    var i = 0
    while (i < rgb.length) {
      val v = luminance(rgb(i))
      s0 += v; s1 += v * v; if (v > mx) mx = v
      i += 1
    }
    val n = math.max(rgb.length, 1).toDouble
    DecodedRow(r.doc_id, r.meta.format, w, h, r.meta.nFrames, r.media.length,
      Array(s0 / n, math.sqrt(math.max(s1 / n - (s0 / n) * (s0 / n), 0.0)),
        mx, n))
  }

  /** Container magic-byte gate for the audio paths: every stream the JDK's
    * built-in audio readers accept opens with one of these signatures
    * (RIFF/WAVE, FORM/AIFF+AIFC, .snd for AU), so the check loses
    * nothing — and it keeps the miss path FREE. Without it, every
    * non-audio payload pays AudioSystem's provider iteration + exception
    * construction per ROW (~20 µs), which at corpus scale dominates the
    * decode pass itself (observed 0.6 s → 10.7 s on m01 at 500k docs). */
  private def looksLikePcmContainer(b: Array[Byte]): Boolean =
    (b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
    (b.length >= 12 &&
      b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
      b(8) == 'A' && b(9) == 'I' && b(10) == 'F') ||
    (b.length >= 4 &&
      b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd') ||
    Flac.looksLikeFlac(b)

  // Sample encodings a clip's byte view can carry: linear PCM (8/16/24/32
  // bit), IEEE float32, and the two G.711 companding laws (8-bit bytes
  // decoded through [[ulawTab]]/[[alawTab]]).
  private[ops] final val EncPcm = 0
  private final val EncFloat32 = 1
  private final val EncUlaw = 2
  private final val EncAlaw = 3

  /** G.711 μ-law decode table: code byte → 16-bit linear PCM, built with
    * the exact arithmetic of the JDK's ULAW→PCM codec (complement, 4-bit
    * mantissa biased by 132, 3-bit exponent, sign off the top bit) — the
    * OpsSpec pins all 256 entries equal to a real
    * `AudioSystem.getAudioInputStream(PCM_SIGNED, ulawStream)`
    * conversion, so the table IS the codec, not an approximation of it. */
  private[graft] val ulawTab: Array[Short] = Array.tabulate(256) { i =>
    val u = ~i & 0xff
    val t = (((u & 0xf) << 3) + 132) << ((u & 0x70) >> 4)
    (if ((u & 0x80) != 0) 132 - t else t - 132).toShort
  }

  /** G.711 A-law decode table — same contract as [[ulawTab]] (all 256
    * entries OpsSpec-pinned to the JDK's ALAW→PCM codec): XOR 0x55
    * toggle, 4-bit mantissa, 3-bit segment with the +0x100 bias applied
    * from segment 1, sign off the top bit (set = positive). */
  private[graft] val alawTab: Array[Short] = Array.tabulate(256) { i =>
    val a = i ^ 0x55
    val seg = (a & 0x70) >> 4
    var v = ((a & 0xf) << 4) + 8
    if (seg >= 1) v += 0x100
    if (seg > 1) v <<= seg - 1
    (if ((a & 0x80) == 0) -v else v).toShort
  }

  /** A PCM clip ready to scan: sample geometry plus a byte view — for the
    * canonical-WAV fast path a window straight into the payload (zero
    * copies), for the AudioSystem fallback one decoded buffer of the same
    * size as the container's data chunk (still per-row-bounded). `enc`
    * names the sample encoding ([[EncPcm]]/[[EncFloat32]]/[[EncUlaw]]/
    * [[EncAlaw]]); bits/signed describe the linear-PCM layout and are 8/
    * unsigned-irrelevant for the law codecs (one code byte per sample). */
  private[ops] case class PcmClip(bits: Int, ch: Int, signed: Boolean,
      big: Boolean, sampleRate: Float, frames: Long, data: Array[Byte],
      off: Int, enc: Int = EncPcm)

  /** The located fmt + data chunks of a RIFF/WAVE payload: `body` is the
    * offset of the fmt chunk's BODY (tag at body, channels at body+2, …,
    * extension fields from body+16), `bodyLen` its declared size. */
  private case class WavFmt(tag: Int, ch: Int, rate: Int, blockAlign: Int,
      bits: Int, body: Int, bodyLen: Long, dataOff: Int, dataLen: Long)

  private def wavU16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** RIFF chunk walk shared by the PCM-family and ADPCM fast paths:
    * locates fmt + data, validating sizes against the payload. LONG walk
    * position: hostile multi-GB chunk sizes must end the walk (→ codec
    * fallback → stub), never wrap an Int into bytes(-n). */
  private def wavChunks(b: Array[Byte]): Option[WavFmt] = {
    if (!(b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E')) return None
    def u32(o: Int): Long = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    var pos = 12L
    var tag = -1
    var bits = -1; var ch = -1; var rate = -1; var blockAlign = -1
    var body = -1; var bodyLen = -1L
    var dataOff = -1; var dataLen = -1L
    while (pos + 8 <= b.length && (dataOff < 0 || bits < 0)) {
      val p = pos.toInt
      val sz = u32(p + 4)
      if (sz > b.length) return None // bogus/hostile chunk length
      if (b(p) == 'f' && b(p + 1) == 'm' && b(p + 2) == 't' &&
          b(p + 3) == ' ') {
        if (sz < 16 || p + 24 > b.length) return None
        tag = wavU16(b, p + 8)
        ch = wavU16(b, p + 10)
        rate = u32(p + 12).toInt
        blockAlign = wavU16(b, p + 20)
        bits = wavU16(b, p + 22)
        body = p + 8
        bodyLen = sz
      } else if (b(p) == 'd' && b(p + 1) == 'a' && b(p + 2) == 't' &&
          b(p + 3) == 'a') {
        dataOff = p + 8
        dataLen = sz
      }
      pos += 8L + sz + (sz & 1L) // RIFF chunks are word-aligned
    }
    if (bits < 0 || dataOff < 0 || dataOff + dataLen > b.length) None
    else Some(WavFmt(tag, ch, rate, blockAlign, bits, body, bodyLen,
      dataOff, dataLen))
  }

  /** Canonical-WAV fast path: ONE RIFF chunk walk, then dispatch on the
    * format tag — WITHOUT javax.sound's provider machinery. AudioSystem
    * session setup costs ~0.2 ms per stream, 50× the actual sample scan,
    * and at corpus scale it IS the decode pass (observed 115 s for 500k
    * clips on the sweep's audio row vs ~2 s for the equivalent
    * hand-parsed video row). Decodes linear PCM (format 1, 8/16/24/32
    * bit), IEEE float32 (format 3), G.711 A-law/μ-law (formats 6/7 —
    * the telephony WAVs; table decode spec-pinned to the JDK codec),
    * and IMA ADPCM (format 17); anything else — AIFF/AU, extensible/
    * MS-ADPCM/MP3-in-WAV, truncated data — returns None and takes the
    * full [[readPcmViaAudioSystem]] path with identical semantics: the
    * fast path reads exactly the bytes the codec would hand back. */
  private def parseWav(b: Array[Byte]): Option[PcmClip] =
    wavChunks(b).flatMap { f =>
      if (f.tag == 17)
        (if (f.ch == 2) parseWavImaAdpcmStereo(f, b)
         else parseWavImaAdpcm(f, b))
      else if (f.tag == 2) parseWavMsAdpcm(f, b)
      else parseWavPcm(f, b)
    }

  private def parseWavPcm(f: WavFmt, b: Array[Byte]): Option[PcmClip] = {
    val bits = f.bits
    // Format tags this path decodes directly: 1 = linear PCM (WAV
    // convention: 8-bit unsigned, wider signed little-endian), 3 = IEEE
    // float32, 6/7 = G.711 A-law/μ-law (one code byte per sample, the
    // table decode). Anything else (extensible, MS-ADPCM, MP3-in-WAV…)
    // → codec fallback.
    val enc = f.tag match {
      case 1 if bits == 8 || bits == 16 || bits == 24 || bits == 32 =>
        EncPcm
      case 3 if bits == 32 => EncFloat32
      case 6 if bits == 8 => EncAlaw
      case 7 if bits == 8 => EncUlaw
      case _ => return None
    }
    if (f.ch < 1 || f.rate <= 0 || f.blockAlign != f.ch * (bits / 8))
      return None
    val frames = f.dataLen / f.blockAlign
    if (frames <= 0) return None
    Some(PcmClip(bits, f.ch, signed = bits > 8, big = false, f.rate.toFloat,
      frames, b, f.dataOff, enc))
  }

  /** IMA ADPCM step-size table (89 entries) and index-adjust table — the
    * public DVI/IMA 4-bit codec every game/telephony toolchain ships.
    * The decode recurrence below (diff = Σ step>>k over the nibble's
    * magnitude bits + step>>3, predictor clamped to int16, index clamped
    * to [0, 88]) matches the reference implementation bit-for-bit; the
    * m13 gate replays it independently in SQL from the same tables. */
  private val imaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val imaIdxAdj: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** REAL compressed-audio decode: mono IMA ADPCM in WAV (format tag 17,
    * 4-bit nibbles, 4:1 compression — the DVI codec). Block layout per
    * the IMA-WAV spec: a 4-byte header (int16 LE predictor, emitted as
    * the block's FIRST sample; step index; reserved byte) then two
    * samples per byte, LOW nibble first, up to the fmt extension's
    * samplesPerBlock. Decodes every block into ONE 16-bit little-endian
    * PCM buffer (≤ 4× the payload — per-row bounded) that rides the
    * shared [[pcmFeatures]]/[[pcmWindowRms]] scans, so features AND
    * fingerprints come from decoded samples. A short final block decodes
    * to the samples its bytes actually carry. Stereo and non-standard
    * geometries fall back to the stub — the JDK has no ADPCM codec
    * either, and a partial decode is worse than an honest stub. */
  private def parseWavImaAdpcm(f: WavFmt, b: Array[Byte])
      : Option[PcmClip] = {
    if (f.bits != 4 || f.ch != 1 || f.rate <= 0) return None
    // samplesPerBlock lives in the fmt extension (cbSize ≥ 2)
    if (f.bodyLen < 20 || f.body + 20 > b.length) return None
    val spb = wavU16(b, f.body + 18)
    if (f.blockAlign < 4 || spb < 1 || spb > (f.blockAlign - 4) * 2 + 1)
      return None
    val dataEnd = f.dataOff + f.dataLen.toInt
    // total decoded frames: full blocks carry spb samples, a short final
    // block carries what its bytes hold (header sample + 2 per byte)
    var total = 0L
    var blk = f.dataOff
    while (blk + 4 <= dataEnd) {
      val blockBytes = math.min(f.blockAlign, dataEnd - blk)
      total += math.min(spb.toLong, (blockBytes - 4).toLong * 2 + 1)
      blk += f.blockAlign
    }
    // a decoded form that would not fit a byte array (spb ≫ blockAlign on
    // a multi-hundred-MB payload) declines to the stub like every other
    // hostile geometry — never an uncaught overflow
    if (total <= 0 || total > (Int.MaxValue - 8) / 2) return None
    val out = new Array[Byte](total.toInt * 2)
    var w = 0
    blk = f.dataOff
    while (blk + 4 <= dataEnd) {
      val blkEnd = math.min(blk + f.blockAlign, dataEnd)
      var pred = (wavU16(b, blk) << 16) >> 16 // int16 LE header predictor
      var idx = b(blk + 2) & 0xff
      if (idx > 88) return None // corrupt stream → stub, not a clamp lie
      out(w) = (pred & 0xff).toByte
      out(w + 1) = ((pred >> 8) & 0xff).toByte
      w += 2
      var produced = 1
      var p = blk + 4
      while (p < blkEnd && produced < spb) {
        val byte = b(p) & 0xff
        var half = 0
        while (half < 2 && produced < spb) {
          val n = if (half == 0) byte & 0xf else byte >> 4 // LOW first
          val step = imaStep(idx)
          var diff = step >> 3
          if ((n & 1) != 0) diff += step >> 2
          if ((n & 2) != 0) diff += step >> 1
          if ((n & 4) != 0) diff += step
          pred = if ((n & 8) != 0) pred - diff else pred + diff
          if (pred > 32767) pred = 32767
          else if (pred < -32768) pred = -32768
          idx += imaIdxAdj(n & 7)
          if (idx < 0) idx = 0 else if (idx > 88) idx = 88
          out(w) = (pred & 0xff).toByte
          out(w + 1) = ((pred >> 8) & 0xff).toByte
          w += 2
          produced += 1
          half += 1
        }
        p += 1
      }
      blk += f.blockAlign
    }
    Some(PcmClip(16, 1, signed = true, big = false, f.rate.toFloat,
      total, out, 0, EncPcm))
  }

  /** STEREO IMA ADPCM (format tag 17, 2 channels): per the IMA-WAV spec
    * each block opens with one 4-byte header PER CHANNEL (int16 LE
    * predictor = the channel's first sample, step index, reserved), then
    * the nibble stream interleaves in 4-BYTE WORDS per channel — 4 bytes
    * (8 samples) for channel 0, 4 bytes for channel 1, alternating. The
    * per-nibble recurrence is identical to the mono path (m13's gate);
    * the m17 gate replays BOTH channels' chains plus the mean mixdown in
    * SQL, so a wrong word-interleave or header stride fails the hash.
    * Decodes each channel into a per-block buffer (≤ samplesPerBlock
    * int16s — bounded) then emits interleaved 16-bit LE PCM frames. A
    * short final block decodes the complete 8-byte word-rounds it holds
    * (a truncated round would leave the channels unequal — declined). */
  private def parseWavImaAdpcmStereo(f: WavFmt, b: Array[Byte])
      : Option[PcmClip] = {
    if (f.bits != 4 || f.rate <= 0) return None
    if (f.bodyLen < 20 || f.body + 20 > b.length) return None
    val spb = wavU16(b, f.body + 18)
    // per-channel capacity: (blockAlign − 8)/2 nibble bytes → ×2 samples
    // + the header sample
    if (f.blockAlign < 8 || spb < 1 || spb > (f.blockAlign - 8) + 1)
      return None
    val dataEnd = f.dataOff + f.dataLen.toInt
    var total = 0L
    var blk = f.dataOff
    while (blk + 8 <= dataEnd) {
      val rounds = (math.min(f.blockAlign, dataEnd - blk).toInt - 8) / 8
      total += math.min(spb.toLong, rounds.toLong * 8 + 1)
      blk += f.blockAlign
    }
    if (total <= 0 || total > (Int.MaxValue - 8) / 4) return None
    val out = new Array[Byte](total.toInt * 4)
    val chan = Array.ofDim[Short](2, spb)
    var w = 0
    blk = f.dataOff
    while (blk + 8 <= dataEnd) {
      val rounds = (math.min(f.blockAlign, dataEnd - blk).toInt - 8) / 8
      val frames = math.min(spb, rounds * 8 + 1)
      var c = 0
      while (c < 2) {
        val hoff = blk + 4 * c
        var pred = (wavU16(b, hoff) << 16) >> 16
        var idx = b(hoff + 2) & 0xff
        if (idx > 88) return None // corrupt stream → stub, not a clamp lie
        chan(c)(0) = pred.toShort
        var produced = 1
        var r = 0
        while (r < rounds && produced < frames) {
          val base = blk + 8 + r * 8 + 4 * c
          var bi = 0
          while (bi < 4 && produced < frames) {
            val byte = b(base + bi) & 0xff
            var half = 0
            while (half < 2 && produced < frames) {
              val n = if (half == 0) byte & 0xf else byte >> 4 // LOW first
              val step = imaStep(idx)
              var diff = step >> 3
              if ((n & 1) != 0) diff += step >> 2
              if ((n & 2) != 0) diff += step >> 1
              if ((n & 4) != 0) diff += step
              pred = if ((n & 8) != 0) pred - diff else pred + diff
              if (pred > 32767) pred = 32767
              else if (pred < -32768) pred = -32768
              idx += imaIdxAdj(n & 7)
              if (idx < 0) idx = 0 else if (idx > 88) idx = 88
              chan(c)(produced) = pred.toShort
              produced += 1
              half += 1
            }
            bi += 1
          }
          r += 1
        }
        c += 1
      }
      var i = 0
      while (i < frames) { // interleave the two channel buffers
        var c2 = 0
        while (c2 < 2) {
          val v = chan(c2)(i)
          out(w) = (v & 0xff).toByte
          out(w + 1) = ((v >> 8) & 0xff).toByte
          w += 2
          c2 += 1
        }
        i += 1
      }
      blk += f.blockAlign
    }
    Some(PcmClip(16, 2, signed = true, big = false, f.rate.toFloat,
      total, out, 0, EncPcm))
  }

  /** MS ADPCM adaptation table (16 entries) — the public WAVE-format
    * codec (format tag 2) every Windows toolchain ships; the delta
    * update is delta' = max(16, (adapt[nibble]·delta) >> 8). */
  private val msAdapt: Array[Int] = Array(
    230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230,
    230, 230)

  /** MS ADPCM (WAV format tag 2, mono or stereo) — the other ubiquitous
    * compressed WAV codec next to IMA. Block layout per the WAVE spec,
    * channel-interleaved header: one predictor-index byte per channel
    * (selects a pair from the fmt chunk's DECLARED coefficient table —
    * read from the payload, as a real decoder must), then int16 LE
    * iDelta, iSamp1, iSamp2 per channel. iSamp2 is the OLDER sample and
    * emits first, then iSamp1, then the nibble stream: HIGH nibble first
    * (the opposite of IMA), stereo alternating channels per byte. The
    * recurrence: pred = ((s1·c1 + s2·c2) >> 8) + signed4(nibble)·delta,
    * clamped to int16; delta' = max(16, (adapt[nibble]·delta) >> 8) —
    * exact integer arithmetic the m18 gate unrolls one CTE per nibble
    * from its own restatement of the public tables. Bounded per-row
    * state; a short final block decodes the samples its bytes carry. */
  private def parseWavMsAdpcm(f: WavFmt, b: Array[Byte])
      : Option[PcmClip] = {
    if (f.bits != 4 || f.ch < 1 || f.ch > 2 || f.rate <= 0) return None
    // fmt extension: cbSize(2) samplesPerBlock(2) numCoef(2) + pairs
    if (f.bodyLen < 22 || f.body + 22 > b.length) return None
    val spb = wavU16(b, f.body + 18)
    val nCoef = wavU16(b, f.body + 20)
    if (nCoef < 1 || nCoef > 256) return None
    if (f.bodyLen < 22 + 4L * nCoef || f.body + 22 + 4 * nCoef > b.length)
      return None
    val co1 = new Array[Int](nCoef)
    val co2 = new Array[Int](nCoef)
    var j = 0
    while (j < nCoef) {
      co1(j) = (wavU16(b, f.body + 22 + 4 * j) << 16) >> 16
      co2(j) = (wavU16(b, f.body + 24 + 4 * j) << 16) >> 16
      j += 1
    }
    val ch = f.ch
    val hdr = 7 * ch
    if (f.blockAlign < hdr || spb < 2 ||
        spb > 2 + (f.blockAlign - hdr).toLong * 2 / ch) return None
    val dataEnd = f.dataOff + f.dataLen.toInt
    var total = 0L
    var blk = f.dataOff
    while (blk + hdr <= dataEnd) {
      val avail = math.min(f.blockAlign, dataEnd - blk).toInt - hdr
      // mono bytes carry two samples, stereo bytes one frame (hi=ch0)
      total += math.min(spb.toLong, 2L + (if (ch == 1) avail * 2 else avail))
      blk += f.blockAlign
    }
    if (total <= 0 || total > (Int.MaxValue - 8) / (2L * ch)) return None
    val out = new Array[Byte](total.toInt * 2 * ch)
    var w = 0
    def emit(v: Int): Unit = {
      out(w) = (v & 0xff).toByte
      out(w + 1) = ((v >> 8) & 0xff).toByte
      w += 2
    }
    val bp = new Array[Int](ch)
    val dl = new Array[Int](ch)
    val s1 = new Array[Int](ch)
    val s2 = new Array[Int](ch)
    def step(c: Int, nib: Int): Int = {
      val sn = if (nib >= 8) nib - 16 else nib // two's-complement 4-bit
      // DIVISION CONVENTION, a documented fork in the wild: the
      // coefficient sum scales down by `>> 8` (FLOOR division — matches
      // libsndfile), while Microsoft's reference decoder and ffmpeg use
      // truncating `/ 256` (toward zero). The two differ by 1 LSB when
      // the sum is negative and not a multiple of 256, so decoders
      // genuinely disagree on such samples in the wild. This engine and
      // its DuckDB oracle (msAdpcmOracleSql's floor(x/256.0)) both state
      // the FLOOR convention — self-consistent end-to-end; cross-
      // toolchain fingerprint comparison against ffmpeg-decoded PCM can
      // be off by 1 LSB on those samples.
      var pred = ((s1(c) * co1(bp(c)) + s2(c) * co2(bp(c))) >> 8) +
        sn * dl(c)
      if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
      s2(c) = s1(c)
      s1(c) = pred
      dl(c) = (msAdapt(nib) * dl(c)) >> 8
      if (dl(c) < 16) dl(c) = 16
      pred
    }
    blk = f.dataOff
    while (blk + hdr <= dataEnd) {
      val blkEnd = math.min(blk + f.blockAlign, dataEnd).toInt
      val avail = blkEnd - blk - hdr
      val frames = math.min(spb, 2 + (if (ch == 1) avail * 2 else avail))
      var c = 0
      while (c < ch) {
        bp(c) = b(blk + c) & 0xff
        if (bp(c) >= nCoef) return None // corrupt stream → stub
        dl(c) = (wavU16(b, blk + ch + 2 * c) << 16) >> 16
        s1(c) = (wavU16(b, blk + 3 * ch + 2 * c) << 16) >> 16
        s2(c) = (wavU16(b, blk + 5 * ch + 2 * c) << 16) >> 16
        c += 1
      }
      c = 0
      while (c < ch) { emit(s2(c)); c += 1 } // frame 0: the older sample
      c = 0
      while (c < ch) { emit(s1(c)); c += 1 } // frame 1 (spb ≥ 2 → always)
      var produced = 2
      var p = blk + hdr
      while (produced < frames) {
        val byte = b(p) & 0xff
        if (ch == 1) {
          emit(step(0, byte >> 4)) // HIGH nibble first, per MS spec
          produced += 1
          if (produced < frames) {
            emit(step(0, byte & 0xf))
            produced += 1
          }
        } else {
          emit(step(0, byte >> 4))
          emit(step(1, byte & 0xf))
          produced += 1
        }
        p += 1
      }
      blk += f.blockAlign
    }
    Some(PcmClip(16, ch, signed = true, big = false, f.rate.toFloat,
      total, out, 0, EncPcm))
  }

  /** Full-codec fallback for PCM containers the fast path declines
    * (AIFF/AU, extensible WAVs, truncated data): decode through
    * `javax.sound.sampled` into one buffer. Returns the clip plus the
    * HEADER's declared frame count so callers can detect truncation. */
  private def readPcmViaAudioSystem(bytes: Array[Byte])
      : Option[(PcmClip, Long)] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais =
      try AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => return None }
    try {
      val fmt = ais.getFormat
      val fe = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      val signed = fe == AudioFormat.Encoding.PCM_SIGNED
      val unsigned = fe == AudioFormat.Encoding.PCM_UNSIGNED
      // Sample encodings the scan decodes: linear PCM 8/16/24/32,
      // float32, and the G.711 laws (the JDK's AU/AIFC readers hand the
      // raw code bytes back with Encoding.ULAW/ALAW — decoded here
      // through the spec-pinned tables, identical to routing the stream
      // through the JDK's own FormatConversionProvider without paying a
      // second provider lookup per row).
      val enc =
        if ((signed || unsigned) &&
            (bits == 8 || bits == 16 || bits == 24 || bits == 32)) EncPcm
        else if (fe == AudioFormat.Encoding.PCM_FLOAT && bits == 32)
          EncFloat32
        else if (fe == AudioFormat.Encoding.ULAW && bits == 8) EncUlaw
        else if (fe == AudioFormat.Encoding.ALAW && bits == 8) EncAlaw
        else return None
      if (ch < 1 || fmt.getFrameSize != ch * (bits / 8) ||
          fmt.getFrameRate <= 0)
        return None
      val declared = ais.getFrameLength
      val data = ais.readAllBytes()
      val frames = data.length.toLong / fmt.getFrameSize
      if (frames <= 0) return None
      Some((PcmClip(bits, ch, signed, fmt.isBigEndian, fmt.getSampleRate,
        frames, data, 0, enc), declared))
    } catch { case _: Exception => None }
    finally ais.close()
  }

  /** Sample scan shared by both PCM access paths: RMS, peak |amplitude|,
    * duration in seconds, zero-crossing count — running accumulators,
    * channels mixed down by mean. */
  /** One frame's channel-mixed sample value in [-1, 1): each channel
    * decoded per the clip's encoding, mixed down by mean — the single
    * frame scan shared by [[pcmFeatures]] and [[pcmWindowRms]] so every
    * consumer (features, fingerprints) agrees on decode semantics. */
  private def frameValue(c: PcmClip, off: Int, bps: Int, full: Double)
      : Double = {
    val lawFull = 1.0 / 32768 // G.711 tables decode to 16-bit PCM
    var s = 0.0
    var k = 0
    while (k < c.ch) {
      val o = off + k * bps
      s += (c.enc match {
        case EncPcm => pcmRaw(c.data, o, c.bits, c.signed, c.big) * full
        case EncFloat32 => readFloat32(c.data, o, c.big)
        case EncUlaw => ulawTab(c.data(o) & 0xff) * lawFull
        case _ => alawTab(c.data(o) & 0xff) * lawFull
      })
      k += 1
    }
    s / c.ch
  }

  private def pcmFeatures(c: PcmClip): (Int, Int, Long, Array[Double]) = {
    val bps = c.bits / 8
    val frameSize = c.ch * bps
    val full = 1.0 / (1L << (c.bits - 1)) // LSB scale to [-1, 1)
    var sumSq = 0.0
    var peak = 0.0
    var zeroX = 0L
    var prevNonNeg = true
    var first = true
    var f = 0L
    var off = c.off
    while (f < c.frames) {
      val s = frameValue(c, off, bps, full)
      sumSq += s * s
      val a = math.abs(s)
      if (a > peak) peak = a
      val nonNeg = s >= 0.0
      if (!first && nonNeg != prevNonNeg) zeroX += 1
      prevNonNeg = nonNeg
      first = false
      f += 1
      off += frameSize
    }
    val rms = math.sqrt(sumSq / c.frames)
    val dur = c.frames / c.sampleRate.toDouble // PCM frame rate = sample rate
    (math.round(c.sampleRate).toInt, c.ch, c.frames,
      Array(rms, peak, dur, zeroX.toDouble))
  }

  /** PCM audio parse: the canonical-WAV fast path when the payload allows
    * it, the `javax.sound.sampled` codec otherwise; None for anything no
    * JDK path decodes — the caller falls back to [[decodeStub]]. */
  private def readAudio(bytes: Array[Byte])
      : Option[(Int, Int, Long, Array[Double])] = {
    if (!looksLikePcmContainer(bytes)) return None
    parseWav(bytes).map(pcmFeatures)
      .orElse(Flac.parseFlac(bytes).map(pcmFeatures))
      .orElse(readPcmViaAudioSystem(bytes).map { case (c, _) =>
        pcmFeatures(c)
      })
  }

  /** One PCM sample → signed raw value centered on 0. Unsigned samples
    * re-center by subtracting the midpoint of their UNSIGNED range —
    * never sign-extend first (an unsigned-16 value ≥ 32768 would corrupt
    * to [-65536, -32768) under extend-then-shift, mapping the whole upper
    * half of the amplitude range to garbage). */
  private[graft] def pcmRaw(buf: Array[Byte], base: Int, bits: Int,
      signed: Boolean, big: Boolean): Int = bits match {
    case 8 =>
      if (signed) buf(base).toInt else (buf(base) & 0xff) - 128
    case 16 =>
      val b0 = buf(base) & 0xff
      val b1 = buf(base + 1) & 0xff
      val v = if (big) (b0 << 8) | b1 else (b1 << 8) | b0
      if (signed) (v << 16) >> 16 else v - 32768
    case 24 =>
      val b0 = buf(base) & 0xff
      val b1 = buf(base + 1) & 0xff
      val b2 = buf(base + 2) & 0xff
      val v = if (big) (b0 << 16) | (b1 << 8) | b2
              else (b2 << 16) | (b1 << 8) | b0
      if (signed) (v << 8) >> 8 else v - (1 << 23)
    case _ => // 32: the assembled Int IS the signed sample; the unsigned
      // re-center (− 2³¹) is exactly a sign-bit flip, no wider type needed
      val b0 = buf(base) & 0xff
      val b1 = buf(base + 1) & 0xff
      val b2 = buf(base + 2) & 0xff
      val b3 = buf(base + 3) & 0xff
      val v = if (big) (b0 << 24) | (b1 << 16) | (b2 << 8) | b3
              else (b3 << 24) | (b2 << 16) | (b1 << 8) | b0
      if (signed) v else v ^ Int.MinValue
  }

  /** One IEEE float32 sample (WAV format 3 / PCM_FLOAT), honoring the
    * container's endianness. Non-finite bit patterns (NaN/±Inf — legal
    * in a hostile or corrupt payload) read as silence: one poisoned
    * sample must not NaN every downstream aggregate, fingerprint, and
    * feature the clip feeds. */
  private def readFloat32(buf: Array[Byte], base: Int, big: Boolean)
      : Double = {
    val b0 = buf(base) & 0xff
    val b1 = buf(base + 1) & 0xff
    val b2 = buf(base + 2) & 0xff
    val b3 = buf(base + 3) & 0xff
    val raw = if (big) (b0 << 24) | (b1 << 16) | (b2 << 8) | b3
              else (b3 << 24) | (b2 << 16) | (b1 << 8) | b0
    val v = java.lang.Float.intBitsToFloat(raw).toDouble
    if (java.lang.Double.isFinite(v)) v else 0.0
  }

  /** REAL audio decode: sample-space features [rms, peak, duration_sec,
    * zero_crossings]. The fixed row schema reuses width for the sample
    * rate and height for the channel count (audio has no pixel grid;
    * n_frames is the DECODED frame count — the header is the authority,
    * like the image path's decoded w/h). */
  private def decodeSamples(r: MediaRow, sampleRate: Int, channels: Int,
      nFrames: Long, features: Array[Double]): DecodedRow =
    DecodedRow(r.doc_id, r.meta.format, sampleRate, channels,
      math.min(nFrames, Int.MaxValue).toInt, r.media.length, features)

  // ======================================================= video decode

  /** Magic-byte gate for [[readY4m]] — every YUV4MPEG2 stream opens with
    * this exact signature (the space is part of it), so the check loses
    * nothing and keeps the miss path free, like [[looksLikePcmContainer]]. */
  private def looksLikeY4m(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'Y' && b(1) == 'U' && b(2) == 'V' &&
      b(3) == '4' && b(4) == 'M' && b(5) == 'P' && b(6) == 'E' &&
      b(7) == 'G' && b(8) == '2' && b(9) == ' '

  private def looksLikeGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** A parsed raw-video clip: decoded geometry, the header's frame rate,
    * and one luma SUM per frame (the bounded per-row state — w·h ints
    * never live at once; the plane streams through one accumulator). */
  private[graft] case class Y4mClip(width: Int, height: Int, fpsNum: Int,
      fpsDen: Int, frameLumaSum: Array[Long])

  /** REAL raw-video parse: YUV4MPEG2 (the uncompressed interchange format
    * ffmpeg/x264/mjpegtools pipelines emit — an ASCII header
    * `YUV4MPEG2 W… H… F<num>:<den> … C<space>` then per frame a `FRAME…`
    * line + raw planes). Supports the C420 family (420/420jpeg/420mpeg2/
    * 420paldv), C422, C444 and Cmono plane layouts; unknown colourspaces,
    * odd dimensions under subsampling, missing W/H/F, overlong header
    * lines, and truncated frames all return None — the caller falls back
    * to [[decodeStub]], never a partial decode. Per frame only the luma
    * (Y) plane is read — for Y4M the Y plane IS BT.601 luma, no matrix
    * needed; chroma is skipped by offset. */
  private[graft] def readY4m(bytes: Array[Byte]): Option[Y4mClip] = {
    if (!looksLikeY4m(bytes)) return None
    def lineEnd(from: Int): Int = {
      var i = from
      val cap = math.min(bytes.length, from + 512)
      while (i < cap && bytes(i) != '\n') i += 1
      if (i < cap) i else -1
    }
    def intOf(s: String): Int =
      try s.toInt catch { case _: NumberFormatException => -1 }
    val hEnd = lineEnd(0)
    if (hEnd < 0) return None
    val header =
      new String(bytes, 0, hEnd, java.nio.charset.StandardCharsets.US_ASCII)
    var w = -1; var h = -1; var num = -1; var den = -1
    var colour = "420"
    header.split(' ').drop(1).foreach { t =>
      if (t.nonEmpty) t.charAt(0) match {
        case 'W' => w = intOf(t.substring(1))
        case 'H' => h = intOf(t.substring(1))
        case 'F' =>
          val parts = t.substring(1).split(':')
          if (parts.length == 2) { num = intOf(parts(0)); den = intOf(parts(1)) }
        case 'C' => colour = t.substring(1)
        case _ => () // I (interlace), A (aspect), X (extensions) — ignored
      }
    }
    if (w <= 0 || h <= 0 || num <= 0 || den <= 0) return None
    // hostile headers: reject before any w·h arithmetic can overflow Int
    if (w.toLong * h > Int.MaxValue / 4) return None
    val chromaPlane =
      if (colour.startsWith("420")) {
        if (w % 2 != 0 || h % 2 != 0) return None
        (w / 2) * (h / 2)
      } else if (colour == "422") {
        if (w % 2 != 0) return None
        (w / 2) * h
      } else if (colour == "444") w * h
      else if (colour == "mono") 0
      else return None
    val lumaLen = w * h
    val frameLen = lumaLen + 2 * chromaPlane
    val sums = scala.collection.mutable.ArrayBuffer.empty[Long]
    var pos = hEnd + 1
    while (pos < bytes.length) {
      if (pos + 5 > bytes.length || bytes(pos) != 'F' ||
          bytes(pos + 1) != 'R' || bytes(pos + 2) != 'A' ||
          bytes(pos + 3) != 'M' || bytes(pos + 4) != 'E') return None
      val fEnd = lineEnd(pos + 5) // optional per-frame params before '\n'
      // LONG bound check: a hostile header can put frameLen near 2^31
      if (fEnd < 0 || fEnd + 1L + frameLen > bytes.length) return None
      var s = 0L
      var i = fEnd + 1
      val stop = fEnd + 1 + lumaLen
      while (i < stop) { s += bytes(i) & 0xff; i += 1 }
      sums += s
      pos = fEnd + 1 + frameLen
    }
    if (sums.isEmpty) None
    else Some(Y4mClip(w, h, num, den, sums.toArray))
  }

  /** One attribute of a GIF metadata tree node, or `default`. */
  private def gifAttr(root: org.w3c.dom.Node, node: String, attr: String,
      default: String): String = {
    var c = root.getFirstChild
    while (c != null) {
      if (c.getNodeName == node) {
        val a = c.getAttributes.getNamedItem(attr)
        return if (a == null) default else a.getNodeValue
      }
      c = c.getNextSibling
    }
    default
  }

  /** [[readGifFrames]]'s outcome: a composited multi-frame clip, or the
    * single decoded still frame (returned so the image path never parses
    * the same bytes twice). */
  private[graft] sealed trait GifParse
  private[graft] final case class GifAnimated(w: Int, h: Int,
      means: Array[Double], delayCs: Int) extends GifParse
  private[graft] final case class GifStill(
      im: java.awt.image.BufferedImage) extends GifParse

  /** REAL multi-frame animated-GIF decode through the JDK's `javax.imageio`
    * GIF codec: frames COMPOSITE onto the logical-screen canvas honoring
    * each frame's offset and disposal method (none/doNotDispose keep the
    * canvas, restoreToBackgroundColor clears the frame's rectangle,
    * restoreToPrevious reverts to the pre-frame canvas) — the same state
    * machine a browser runs, so per-frame luminance reflects what a viewer
    * SEES, not the stored sub-rectangles an optimized encoder writes.
    * Animated clips yield (canvas w, canvas h, per-frame mean luma with
    * undrawn pixels black, total delay in centiseconds); a single-frame
    * GIF yields its decoded still so the caller's image path reuses THIS
    * parse instead of re-opening the bytes. A hostile logical screen
    * (> 2^24 pixels — beyond any real GIF) declines to the stub rather
    * than attempting the allocation: the canvas is attacker-sized, and an
    * OutOfMemoryError is not catchable the way a parse error is. */
  private[graft] def readGifFrames(bytes: Array[Byte]): Option[GifParse] = {
    if (!looksLikeGif(bytes)) return None
    imageioInit
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    var reader: javax.imageio.ImageReader = null
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      reader = readers.next()
      reader.setInput(iis, false, false) // seekForward=false: keep metadata
      val n =
        try reader.getNumImages(true)
        catch { case _: Exception => return None }
      if (n < 1) return None
      val first = reader.read(0)
      if (n == 1) return Some(GifStill(first))
      // canvas = logical screen; fall back to frame-0 extent when absent
      var cw = first.getWidth
      var ch = first.getHeight
      try {
        val sm = reader.getStreamMetadata
        if (sm != null) {
          val tree = sm.getAsTree("javax_imageio_gif_stream_1.0")
          val wS = gifAttr(tree, "LogicalScreenDescriptor",
            "logicalScreenWidth", "")
          val hS = gifAttr(tree, "LogicalScreenDescriptor",
            "logicalScreenHeight", "")
          if (wS.nonEmpty && hS.nonEmpty) { cw = wS.toInt; ch = hS.toInt }
        }
      } catch { case _: Exception => () }
      if (cw <= 0 || ch <= 0 || cw.toLong * ch > (1 << 24)) return None
      val canvas = new java.awt.image.BufferedImage(cw, ch,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)
      val g = canvas.createGraphics()
      g.setComposite(java.awt.AlphaComposite.SrcOver)
      val means = new Array[Double](n)
      val rgb = new Array[Int](cw * ch) // one scan buffer for all frames
      var prev: Array[Int] = null // restore-to-previous snapshot, reused
      var delayCs = 0
      var i = 0
      while (i < n) {
        val im = if (i == 0) first else reader.read(i)
        val md = reader.getImageMetadata(i)
        val tree = md.getAsTree("javax_imageio_gif_image_1.0")
        val x = gifAttr(tree, "ImageDescriptor", "imageLeftPosition", "0").toInt
        val y = gifAttr(tree, "ImageDescriptor", "imageTopPosition", "0").toInt
        val disposal = gifAttr(tree, "GraphicControlExtension",
          "disposalMethod", "none")
        delayCs += gifAttr(tree, "GraphicControlExtension",
          "delayTime", "0").toInt
        if (disposal == "restoreToPrevious") {
          if (prev == null) prev = new Array[Int](cw * ch)
          canvas.getRGB(0, 0, cw, ch, prev, 0, cw)
        }
        g.drawImage(im, x, y, null)
        var s = 0.0
        canvas.getRGB(0, 0, cw, ch, rgb, 0, cw)
        var p = 0
        while (p < rgb.length) {
          // undrawn (fully transparent) canvas is black, like a player
          if ((rgb(p) >>> 24) != 0) s += luminance(rgb(p))
          p += 1
        }
        means(i) = s / math.max(rgb.length, 1)
        disposal match {
          case "restoreToBackgroundColor" =>
            val comp = g.getComposite
            g.setComposite(java.awt.AlphaComposite.Clear)
            g.fillRect(x, y, im.getWidth, im.getHeight)
            g.setComposite(comp)
          case "restoreToPrevious" =>
            canvas.setRGB(0, 0, cw, ch, prev, 0, cw)
          case _ => ()
        }
        i += 1
      }
      g.dispose()
      Some(GifAnimated(cw, ch, means, delayCs))
    } catch { case _: Exception => None }
    finally {
      // readers hold per-instance decode buffers — release them here, not
      // at GC time (a decode pass churns one reader per animated asset)
      if (reader != null) reader.dispose()
      iis.close()
    }
  }

  /** REAL video decode → the fixed row schema: decoded canvas w/h, DECODED
    * frame count (the header/container is the authority, as in the image
    * and audio paths), and frame-space features [mean luma over frames,
    * temporal activity = mean |Δ frame luma| (0 for single-window clips),
    * duration in seconds, fps]. */
  private def decodeFrames(r: MediaRow, w: Int, h: Int,
      means: Array[Double], durationSec: Double, fps: Double): DecodedRow = {
    val n = means.length
    var s = 0.0
    var act = 0.0
    var i = 0
    while (i < n) {
      s += means(i)
      if (i > 0) act += math.abs(means(i) - means(i - 1))
      i += 1
    }
    DecodedRow(r.doc_id, r.meta.format, w, h, n, r.media.length,
      Array(s / n, if (n < 2) 0.0 else act / (n - 1), durationSec, fps))
  }

  /** STUB decoder — stands in for the compressed audio/video codecs this
    * environment lacks, and the fallback for any payload neither
    * javax.imageio nor javax.sound.sampled can parse.
    * Deterministic: features are byte-derived moments. */
  private def decodeStub(r: MediaRow): DecodedRow = {
    val bytes = r.media
    var s0 = 0.0; var s1 = 0.0; var mx = Double.MinValue
    var i = 0
    while (i < bytes.length) {
      val v = (bytes(i) & 0xff).toDouble
      s0 += v; s1 += v * v; if (v > mx) mx = v
      i += 1
    }
    val n = math.max(bytes.length, 1)
    DecodedRow(r.doc_id, r.meta.format, r.meta.width, r.meta.height,
      r.meta.nFrames, bytes.length,
      Array(s0 / n, math.sqrt(math.max(s1 / n - (s0 / n) * (s0 / n), 0.0)),
        mx, n.toDouble))
  }

  /** One media row → typed features: real frame decode when the payload
    * parses as video (raw Y4M, or a multi-frame animated GIF — a
    * single-frame GIF is a still image and takes the image path), real
    * pixel decode when it parses as an image, real sample decode when it
    * parses as PCM audio (WAV/AIFF/AU), byte-moment stub otherwise
    * (compressed codecs — the remaining gap — and the m01 gate's md5
    * fixture bytes, which is why that oracle replays the stub path
    * unchanged; the m07 video gate attaches REAL Y4M payloads instead). */
  private[graft] def decodeOne(r: MediaRow): DecodedRow =
    readY4m(r.media) match {
      case Some(c) =>
        val ppf = c.width * c.height
        decodeFrames(r, c.width, c.height,
          c.frameLumaSum.map(_.toDouble / ppf),
          c.frameLumaSum.length.toDouble * c.fpsDen / c.fpsNum,
          c.fpsNum.toDouble / c.fpsDen)
      case None => readGifFrames(r.media) match {
        case Some(GifAnimated(w, h, means, delayCs)) =>
          decodeFrames(r, w, h, means, delayCs / 100.0,
            if (delayCs > 0) means.length * 100.0 / delayCs else 0.0)
        case Some(GifStill(im)) => decodePixels(r, im) // parsed once
        case None => readImage(r.media) match {
          case Some(im) => decodePixels(r, im)
          case None => readAudio(r.media) match {
            case Some((sr, ch, nf, feats)) =>
              decodeSamples(r, sr, ch, nf, feats)
            case None => decodeStub(r)
          }
        }
      }
    }

  /** Partition-batched decode: binary column → typed features. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(decodeOne))
  }

  /** Deterministic frame sampling: every `stride`-th frame index, exploded to
    * one row per sampled frame (video path; frame decode itself stubbed).
    * UNSORTED by design — a data-sized global sort would shuffle the whole
    * corpus for presentation only; callers that need a total order (the m02
    * gate wrapper, a report sink) sort their own bounded result. */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media.select(col("doc_id"), col("meta.nFrames").as("n_frames"),
        explode(expr(s"sequence(0, meta.nFrames - 1, $stride)"))
          .as("frame_idx"))

  /** DECODE-BATCH packing plan — assign media items to fixed-byte-budget
    * decode batches per modality, the scheduling step that feeds a GPU
    * decode pool (each worker takes one batch of ≈ `batchBytes` of decoded
    * output, so batch latency is uniform regardless of item sizes).
    * est_bytes is the decoded size (w·h·frames); the assignment is the
    * concat-then-chunk running sum (the t16 sequence-packing layout applied
    * to bytes), so it is deterministic and engine-replayable. The window
    * partitions by modality; at extreme per-modality cardinality the
    * bucketed two-phase prefix sum of [[TextOps.packOffsets]] is the scale
    * path (same contract). */
  def decodeBatchPlan(media: DataFrame, batchBytes: Long): DataFrame = {
    require(batchBytes > 0, "batchBytes must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("format").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    media.select(col("doc_id"), col("meta.format").as("format"),
        (col("meta.width").cast("long") * col("meta.height") *
          col("meta.nFrames")).as("est_bytes"))
      .withColumn("offset", coalesce(sum("est_bytes").over(w), lit(0L)))
      .withColumn("batch_id", expr(s"offset DIV ${batchBytes}L"))
      .select("doc_id", "format", "est_bytes", "offset", "batch_id")
      .orderBy("format", "doc_id")
  }

  /** 64-bit perceptual hash of the media payload, as two 32-bit halves —
    * STUB: a real pHash would decode and DCT the pixels; the stub derives
    * the 64 bits from the payload's leading bytes (locality-preserving on
    * the payload: a re-encode that perturbs trailing bytes or flips a
    * low bit yields a near-identical hash, the property the dedup pass
    * exploits). Halves ride as separate longs so Hamming distance is the
    * sum of two bit_counts — no wrapping 64-bit arithmetic anywhere the
    * oracle must replay (the d03 portable-SimHash discipline). */
  def mediaPhash(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      // COALESCE: conv('') is NULL, so a payload shorter than the half
      // being read must hash to 0 (not poison the Hamming arithmetic
      // downstream with nulls) — [[phashDecoded]]'s byte fallback matches
      expr("COALESCE(CAST(conv(substr(hex(media), 1, 8), 16, 10) " +
        "AS BIGINT), 0)").as("ph_hi"),
      expr("COALESCE(CAST(conv(substr(hex(media), 9, 8), 16, 10) " +
        "AS BIGINT), 0)").as("ph_lo"))

  /** REAL 64-bit DCT perceptual hash of decoded pixels (the classic
    * pHash recipe): area-average the luminance plane to 32×32, 2-D DCT-II
    * (two unnormalized 1-D passes — scale factors cancel against the
    * median threshold), keep the 8×8 lowest-frequency block, drop the DC
    * term, and set bit k when coefficient k exceeds the median of the 63.
    * Invariant to global brightness/contrast shifts (they move only the
    * excluded DC term and a uniform coefficient scale) and robust to
    * re-encode noise — the two properties the near-dup pass needs. */
  private[graft] def phashPixels(im: java.awt.image.BufferedImage): Long = {
    val N = 32
    val w = im.getWidth
    val h = im.getHeight
    val rgb = im.getRGB(0, 0, w, h, null, 0, w)
    // deterministic integer-tiled area average to N×N luminance
    val g = Array.ofDim[Double](N * N)
    var ty = 0
    while (ty < N) {
      val y0 = ty * h / N
      val y1 = math.min(math.max((ty + 1) * h / N, y0 + 1), h)
      var tx = 0
      while (tx < N) {
        val x0 = tx * w / N
        val x1 = math.min(math.max((tx + 1) * w / N, x0 + 1), w)
        var s = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += luminance(rgb(y * w + x)); x += 1 }
          y += 1
        }
        g(ty * N + tx) = s / ((y1 - y0) * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
    // 2-D DCT-II via row pass then column pass, only the first 8 of each
    val B = 8
    val cosTab = Array.tabulate(B, N)((u, x) =>
      math.cos(math.Pi * (2 * x + 1) * u / (2.0 * N)))
    val rows = Array.ofDim[Double](N * B) // rows × first-8 row coefficients
    var y = 0
    while (y < N) {
      var u = 0
      while (u < B) {
        var s = 0.0
        var x = 0
        while (x < N) { s += g(y * N + x) * cosTab(u)(x); x += 1 }
        rows(y * B + u) = s
        u += 1
      }
      y += 1
    }
    val coef = Array.ofDim[Double](B * B)
    var v = 0
    while (v < B) {
      var u = 0
      while (u < B) {
        var s = 0.0
        var yy = 0
        while (yy < N) { s += rows(yy * B + u) * cosTab(v)(yy); yy += 1 }
        coef(v * B + u) = s
        u += 1
      }
      v += 1
    }
    val ac = coef.drop(1) // 63 non-DC coefficients (row-major from (0,1))
    val med = ac.sorted.apply(ac.length / 2)
    var bits = 0L
    var k = 0
    while (k < ac.length) {
      if (ac(k) > med) bits |= 1L << k
      k += 1
    }
    bits
  }

  /** [[mediaPhash]]'s schema from REAL decodes: payloads that parse as
    * images hash from their pixels ([[phashPixels]]); everything else
    * falls back to the same leading-byte hash the SQL form derives, so
    * mixed corpora band and join uniformly. */
  def phashDecoded(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      readImage(r.media) match {
        case Some(im) =>
          val ph = phashPixels(im)
          (r.doc_id, ph >>> 32, ph & 0xffffffffL)
        case None =>
          // byte fallback = EXACTLY the SQL spelling: ph_hi from bytes
          // 0..3, ph_lo from bytes 4..7, each RIGHT-ALIGNED like
          // conv(substr(hex, …)) on a short payload — so a short asset
          // hashes identically through either entry point and an exact
          // re-upload is never missed by the banding
          def word(from: Int): Long = {
            var acc = 0L
            var i = from
            while (i < from + 4 && i < r.media.length) {
              acc = (acc << 8) | (r.media(i) & 0xffL)
              i += 1
            }
            acc
          }
          (r.doc_id, word(0), word(4))
      }
    }).toDF("doc_id", "ph_hi", "ph_lo")
  }

  /** MEDIA NEAR-DUPLICATE detection — the image-dedup pass every multimodal
    * training pipeline runs (exact re-uploads and re-encodes of the same
    * asset): pairs within Hamming distance `maxHamming` of the 64-bit
    * [[mediaPhash]] (`decoded = true` hashes real pixels via
    * [[phashDecoded]] instead — same banding, same join shape).
    * Candidates come from the pigeonhole combo blocks
    * shared with SimHash ([[Dedup.simhashBlockKeys]] — complete for
    * Hamming ≤ maxHamming, no false negatives), travel SKINNY through the
    * self-join, and verify with two bit_counts. Same scale shape as d03:
    * map-side hash, ~n/2^26-sized buckets, pair work linear until tens of
    * billions of assets. */
  def phashNearDupPairs(media: DataFrame, maxHamming: Int,
      decoded: Boolean = false): DataFrame =
    bandedHammingPairs(
      if (decoded) phashDecoded(media) else mediaPhash(media), maxHamming)

  /** Per-window RMS energies of a decoded PCM payload: the clip's frames
    * split into min(`nWindows`, frameCount) equal spans (frame `i` lands
    * in window `i·n/total` — exact integer arithmetic, no drift; capping
    * n at the frame count keeps EVERY window populated, so short clips
    * never interleave empty zero-RMS windows whose delta signs would be
    * content-independent), channels mix down by mean, and each window
    * accumulates Σs² streaming (one frame buffer + n doubles live — the
    * bounded-row contract). The returned array has min(nWindows, total)
    * entries. None when the payload is not PCM
    * ([[looksLikePcmContainer]] keeps the miss path free) or has fewer
    * than 2 frames. */
  private def pcmWindowRms(bytes: Array[Byte], nWindows: Int)
      : Option[Array[Double]] = {
    if (!looksLikePcmContainer(bytes)) return None
    // short clips keep the decode-space fingerprint (container bytes
    // would differ between a WAV and its AIFF re-encode); the window
    // count shrinks to the frame count so every window holds a frame.
    // The codec fallback additionally rejects truncated payloads
    // (decoded frames < the header's declared count); the fast path
    // already declines those to the codec — shared with the transcode/
    // resample transforms so membership agrees across the boundary.
    val clip = decodeFullClip(bytes)
    clip.filter(_.frames >= 2).map { c =>
      val n = math.min(nWindows.toLong, c.frames).toInt
      val bps = c.bits / 8
      val frameSize = c.ch * bps
      val full = 1.0 / (1L << (c.bits - 1))
      val sumSq = new Array[Double](n)
      val counts = new Array[Long](n)
      var frame = 0L
      var off = c.off
      while (frame < c.frames) {
        val s = frameValue(c, off, bps, full)
        val w = ((frame * n) / c.frames).toInt
        sumSq(w) += s * s
        counts(w) += 1
        frame += 1
        off += frameSize
      }
      var w = 0
      val rms = new Array[Double](n)
      while (w < n) {
        rms(w) = math.sqrt(sumSq(w) / math.max(counts(w), 1L))
        w += 1
      }
      rms
    }
  }

  /** 64-bit FNV-1a over a whole payload — the fallback fingerprint for
    * audio bytes NO codec can decode. Content-UNIFORM on purpose, the
    * opposite of the image path's locality-preserving leading-byte
    * words: compressed audio (the dominant real format) shares container
    * headers — every ID3v2-tagged mp3 opens with the same bytes — so a
    * leading-byte fallback would collide unrelated recordings into one
    * banding bucket (false pairs at Hamming 0 AND an n² candidate join).
    * A full-content hash makes exact re-uploads pair at Hamming 0 while
    * unrelated files distribute uniformly, keeping the banding linear —
    * the only honest semantic without a codec. */
  private def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** FNV-1a over an array of doubles' raw bit patterns — the DEGENERATE-
    * sketch fallback fingerprint: content-uniform like [[fnv64]] but in
    * DECODE space, so container translations of the same degenerate clip
    * (a WAV and its AIFF, a Y4M and its GIF rendering) still hash
    * identically while unrelated degenerate clips (different fade-outs,
    * different silence lengths) distribute uniformly. */
  private def fnvDoubles(xs: Array[Double]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < xs.length) {
      var bits = java.lang.Double.doubleToLongBits(xs(i))
      var b = 0
      while (b < 8) {
        h ^= bits & 0xffL
        h *= 0x100000001b3L
        bits >>>= 8
        b += 1
      }
      i += 1
    }
    h
  }

  /** 64-bit AUDIO FINGERPRINT from decoded samples — the energy-delta
    * recipe (Haitsma & Kalker's robust-hash shape collapsed to one band):
    * split the clip into 65 equal windows, take each window's RMS, and
    * set bit k when window k+1 is louder than window k. Invariant to
    * uniform gain (every RMS scales identically, so the deltas' SIGNS
    * are unchanged), to container/endianness/channel layout (computed in
    * decoded sample space — a WAV and its AIFF re-encode fingerprint
    * identically, including clips shorter than the window count), and
    * robust to mild noise (only windows with near-equal energy can
    * flip). Undecodable payloads fall back to the content-uniform
    * [[fnv64]] hash — exact-duplicate detection only, see its note on
    * why leading-byte words would go quadratic on compressed corpora. */
  def audioFingerprint(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      val h = pcmWindowRms(r.media, 65) match {
        case Some(rms) =>
          // short clips yield fewer windows (all populated); the unused
          // high delta bits stay 0 — same-length clips still compare
          // real per-window energies, never empty-window artifacts
          var bitsAcc = 0L
          var k = 0
          while (k < rms.length - 1) {
            if (rms(k + 1) > rms(k)) bitsAcc |= 1L << k
            k += 1
          }
          // DEGENERATE sketch (silence / monotone decay: no rising
          // window anywhere): the all-zero sketch would pair every such
          // clip with every other one and pile them into a single n²
          // banding bucket. Fall back to the content-uniform hash of the
          // DECODED energies — container translations still pair, two
          // different fade-outs don't (gain invariance is forfeited:
          // with zero sketch bits it could only be had through false
          // pairs). Cannot trigger on the md5-uniform gate fixtures
          // (P ≈ 2⁻⁵⁹), so the m10 oracle replays the sketch alone.
          if (bitsAcc != 0L) bitsAcc else fnvDoubles(rms)
        case None => fnv64(r.media)
      }
      (r.doc_id, h >>> 32, h & 0xffffffffL)
    }).toDF("doc_id", "fp_hi", "fp_lo")
  }

  /** Shared banded-Hamming self-join over a 64-bit (hi, lo) fingerprint
    * frame — the engine behind [[phashNearDupPairs]] and
    * [[audioNearDupPairs]]: pigeonhole combo blocks
    * ([[Dedup.simhashBlockKeys]], complete for Hamming ≤ maxHamming),
    * skinny candidate self-join, two-bit_count verify — map-side hash,
    * ~n/2^26 buckets, pair work linear into the billions of assets. */
  /** Normalize any (doc_id, hi, lo) fingerprint frame — the ph_/fp_
    * column-name split stays out of the join machinery. */
  private def fpNormalized(fingerprints: DataFrame): DataFrame = {
    val c = fingerprints.columns
    require(c.length == 3, s"expected (doc_id, hi, lo), got ${c.toSeq}")
    fingerprints.select(col(c(0)).as("doc_id"), col(c(1)).as("fp_hi"),
      col(c(2)).as("fp_lo"))
  }

  /** Pigeonhole banding keys of a normalized fingerprint frame (complete
    * for Hamming ≤ maxHamming) — shared by the batch self-join and the
    * incremental index, so the two paths cannot diverge. */
  private def fpKeyed(fp: DataFrame, maxHamming: Int): DataFrame =
    fp.withColumn("f", shiftleft(col("fp_hi"), 32).bitwiseOR(col("fp_lo")))
      .select(col("doc_id"),
        explode(Dedup.simhashBlockKeys("f", maxHamming)).as("bk"))

  /** Re-attach fingerprints to skinny (doc_a, doc_b) candidates and keep
    * pairs within the Hamming bound — the shared verify of the batch and
    * delta paths. */
  private def verifyHamming(cand: DataFrame, fp: DataFrame,
      maxHamming: Int): DataFrame =
    cand
      .join(fp.select(col("doc_id").as("doc_a"), col("fp_hi").as("hi_a"),
        col("fp_lo").as("lo_a")), "doc_a")
      .join(fp.select(col("doc_id").as("doc_b"), col("fp_hi").as("hi_b"),
        col("fp_lo").as("lo_b")), "doc_b")
      .withColumn("hamming",
        expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")

  private def bandedHammingPairs(fingerprints: DataFrame,
      maxHamming: Int): DataFrame = {
    val fp = fpNormalized(fingerprints).localCheckpoint()
    val keyed = fpKeyed(fp, maxHamming)
    val cand = keyed.select(col("bk").as("bk_a"), col("doc_id").as("doc_a"))
      .join(keyed.select(col("bk").as("bk_b"), col("doc_id").as("doc_b")),
        col("bk_a") === col("bk_b") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    verifyHamming(cand, fp, maxHamming)
  }

  /** AUDIO NEAR-DUPLICATE detection — re-encodes, gain-normalized copies,
    * and container translations of the same recording pair up within
    * Hamming distance `maxHamming` of the 64-bit [[audioFingerprint]];
    * undecodable payloads pair only when byte-exact (the [[fnv64]]
    * fallback). Scale shape: [[bandedHammingPairs]]. */
  def audioNearDupPairs(media: DataFrame, maxHamming: Int): DataFrame =
    bandedHammingPairs(audioFingerprint(media), maxHamming)

  /** A persisted media-fingerprint index: the fingerprints plus their
    * exploded pigeonhole banding keys — built ONCE per ingested asset, so
    * a nightly delta joins only against postings, never re-fingerprints
    * (or re-pairs) the corpus. `maxHamming` is baked in because the
    * banding keys are specific to it. */
  case class MediaFpIndex(fingerprints: DataFrame, keyed: DataFrame,
      maxHamming: Int)

  /** Build a [[MediaFpIndex]] from any of the three fingerprint frames
    * ([[mediaPhash]]/[[phashDecoded]], [[audioFingerprint]],
    * [[videoFingerprint]]) — (doc_id, hi, lo) by position, so the
    * ph_/fp_ column-name split doesn't leak into the index schema. */
  def mediaFpIndex(fingerprints: DataFrame, maxHamming: Int): MediaFpIndex = {
    val fp = fpNormalized(fingerprints).localCheckpoint()
    val keyed = fpKeyed(fp, maxHamming).localCheckpoint()
    MediaFpIndex(fp, keyed, maxHamming)
  }

  /** Persist a [[MediaFpIndex]] as the between-ingests parquet layout
    * [[mediaDeltaPairs]] reads (the [[Dedup.saveLshIndex]] discipline
    * applied to the 64-bit Hamming families): `fingerprints/` plus the
    * `keyed/` banding postings, and the index's maxHamming in a one-row
    * `meta/` — the banding keys are specific to it, so a loader must
    * read it rather than guess. Same registration/tombstone lifecycle
    * as the other persisted layouts ([[graft.ops.Forget]]). */
  def saveMediaFpIndex(idx: MediaFpIndex, path: String): Unit = {
    val spark = idx.fingerprints.sparkSession
    import spark.implicits._
    idx.fingerprints.write.mode("overwrite").parquet(s"$path/fingerprints")
    idx.keyed.write.mode("overwrite").parquet(s"$path/keyed")
    Seq(idx.maxHamming).toDF("max_hamming").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
    IndexCache.registerPersisted(spark, path, "mediafp")
  }

  /** Restore a persisted [[MediaFpIndex]] (see [[saveMediaFpIndex]]).
    * Committed tombstones ([[graft.ops.Forget.forgetPersisted]]) are
    * applied UNCONDITIONALLY via [[mediaFpDelete]] — a reload after a
    * forget cannot resurrect the forgotten asset's fingerprint or
    * postings. */
  def loadMediaFpIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): MediaFpIndex = {
    IndexCache.registerPersisted(spark, path, "mediafp")
    val mh = spark.read.parquet(s"$path/meta").head.getInt(0)
    val base = MediaFpIndex(
      spark.read.parquet(s"$path/fingerprints"),
      spark.read.parquet(s"$path/keyed"), mh)
    graft.ops.Forget.tombstonesAt(spark, path).fold(base)(t =>
      mediaFpDelete(base, t.select(col("id").as("doc_id"))))
  }

  /** NIGHTLY-DELTA media near-dup — the production ingest shape of the
    * batch [[phashNearDupPairs]]/[[audioNearDupPairs]]/
    * [[videoNearDupPairs]] (the [[Dedup.lshIndex]]/`lshDeltaPairs`
    * discipline applied to the 64-bit Hamming families): tonight's batch
    * fingerprints once, its banding keys join against the INDEX postings
    * (cross pairs) and against themselves (within-delta pairs), and only
    * surviving candidates re-attach fingerprints for the two-bit_count
    * verify. Pair work per night is ∝ delta buckets, never the corpus;
    * the corpus is touched only as the posting-list join side. Returns
    * the delta's pairs (every pair involving ≥ 1 delta asset — provably
    * the batch-over-union pairs minus the already-reported index-only
    * pairs, OpsSpec-pinned) and the merged index for tomorrow.
    *
    * Ingest is IDEMPOTENT on doc_id: a delta id that already exists in
    * the index is the same asset re-presented — it is dropped before any
    * join (no self-pairs, no re-reported pairs, no duplicate index rows;
    * replaying yesterday's batch tonight is a no-op). Re-ingesting an id
    * with CHANGED content is an update, which this append-only index
    * does not model — route updates through a delete (the d22 tombstone
    * discipline) and re-add. */
  def mediaDeltaPairs(index: MediaFpIndex, deltaFingerprints: DataFrame)
      : (DataFrame, MediaFpIndex) = {
    val fresh = fpNormalized(deltaFingerprints)
      .join(index.fingerprints.select("doc_id"), Seq("doc_id"), "left_anti")
    val d = mediaFpIndex(fresh, index.maxHamming)
    val cross = d.keyed.select(col("bk"), col("doc_id").as("d_id"))
      .join(index.keyed.select(col("bk"), col("doc_id").as("e_id")), Seq("bk"))
      .select(least(col("d_id"), col("e_id")).as("doc_a"),
        greatest(col("d_id"), col("e_id")).as("doc_b"))
    val within = d.keyed.select(col("bk"), col("doc_id").as("doc_a"))
      .join(d.keyed.select(col("bk"), col("doc_id").as("doc_b")), Seq("bk"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    val cand = cross.unionByName(within).distinct()
    val fps = index.fingerprints.unionByName(d.fingerprints)
    val pairs = verifyHamming(cand, fps, index.maxHamming)
    (pairs, MediaFpIndex(fps, index.keyed.unionByName(d.keyed),
      index.maxHamming))
  }

  /** RIGHT-TO-BE-FORGOTTEN for the media index — the delete-side
    * complement of [[mediaDeltaPairs]], completing the GDPR story the
    * text side tells with [[Dedup.tombstoneDelete]]: drop the tombstoned
    * assets' fingerprints AND their banding postings, so a forgotten
    * asset can never pair against a future delta. Unlike the text side
    * there is no cross-asset artifact to repair (fingerprint and posting
    * rows are strictly per-asset), so the delete is two anti-joins and
    * the result is BIT-EQUAL to rebuilding the index on the survivors —
    * the tombstone invariant OpsSpec pins: delete(T) then delta(D)
    * reports the same pairs and serves the same merged index as
    * mediaFpIndex(survivors) then delta(D). Idempotent: deleting an
    * absent or already-deleted id is a no-op. Tombstones broadcast into
    * both anti-joins — one skinny posting scan per delete batch at any
    * corpus size, never a re-fingerprint. */
  def mediaFpDelete(index: MediaFpIndex, deletes: DataFrame)
      : MediaFpIndex = {
    val del = broadcast(deletes.select(col("doc_id").as("__del")).distinct())
    MediaFpIndex(
      index.fingerprints
        .join(del, col("doc_id") === col("__del"), "left_anti"),
      index.keyed.join(del, col("doc_id") === col("__del"), "left_anti"),
      index.maxHamming)
  }

  /** Per-frame mean luma of a decodable video payload (Y4M or animated
    * GIF), None otherwise — the shared decode step of [[videoFingerprint]]. */
  private def videoFrameMeans(bytes: Array[Byte]): Option[Array[Double]] =
    readY4m(bytes) match {
      case Some(c) =>
        val ppf = c.width * c.height
        Some(c.frameLumaSum.map(_.toDouble / ppf))
      case None => readGifFrames(bytes).collect {
        case GifAnimated(_, _, means, _) => means
      }
    }

  /** 64-bit VIDEO FINGERPRINT from decoded frames — [[audioFingerprint]]'s
    * energy-delta recipe in the temporal-luma domain: the clip's frames
    * split into min(65, frameCount) equal windows, each window takes the
    * mean of its frames' mean luminance, and bit k is set when window k+1
    * is brighter than window k. Invariant to uniform brightness shift AND
    * contrast gain (both preserve the deltas' signs), to container
    * re-encodes that preserve frames (a Y4M and its lossless GIF rendering
    * fingerprint identically when the pixels match), and robust to mild
    * noise. Clips with < 2 frames and undecodable payloads (compressed
    * video — the codec gap) fall back to the content-uniform [[fnv64]]
    * hash: exact-duplicate detection only, for the same
    * shared-container-header reason as the audio fallback.
    *
    * DEGENERATE clips — static or monotonically non-brightening, i.e. no
    * rising delta anywhere — also take the [[fnv64]] fallback: under the
    * brightness/gain invariance a constant clip carries NO temporal
    * signal, so the all-zero sketch would declare every static clip a
    * near-dup of every other one (false pairs AND one n²-sized banding
    * bucket — static assets are common in real corpora). Exact-dup
    * semantics is the only honest answer for them. Cannot trigger on the
    * md5-uniform gate fixtures (P ≈ 2⁻⁵⁹), so the m08/m11 oracles replay
    * the sketch arithmetic alone. */
  def videoFingerprint(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      val hh = videoFrameMeans(r.media).filter(_.length >= 2) match {
        case Some(means) =>
          val total = means.length
          val nw = math.min(65, total)
          val wmeans = new Array[Double](nw)
          val counts = new Array[Int](nw)
          var f = 0
          while (f < total) {
            val w = ((f.toLong * nw) / total).toInt
            wmeans(w) += means(f)
            counts(w) += 1
            f += 1
          }
          var k = 0
          while (k < nw) { wmeans(k) /= counts(k); k += 1 }
          var bitsAcc = 0L
          k = 0
          while (k < nw - 1) {
            if (wmeans(k + 1) > wmeans(k)) bitsAcc |= 1L << k
            k += 1
          }
          // degenerate sketch (static / monotone fade: no brightening
          // window) → content-uniform hash of the DECODED window means,
          // like the audio path — see audioFingerprint's note
          if (bitsAcc != 0L) bitsAcc else fnvDoubles(wmeans)
        case None => fnv64(r.media)
      }
      (r.doc_id, hh >>> 32, hh & 0xffffffffL)
    }).toDF("doc_id", "fp_hi", "fp_lo")
  }

  /** VIDEO NEAR-DUPLICATE detection — re-renders, brightness/contrast
    * grades, and container translations of the same footage pair up within
    * Hamming distance `maxHamming` of the 64-bit [[videoFingerprint]];
    * undecodable payloads pair only when byte-exact (the [[fnv64]]
    * fallback). Scale shape: [[bandedHammingPairs]]. */
  def videoNearDupPairs(media: DataFrame, maxHamming: Int): DataFrame =
    bandedHammingPairs(videoFingerprint(media), maxHamming)

  /** First 4 bytes of md5(`key`) as a uint32 — the shared randomness of
    * the synthetic media gate fixtures: md5 is the one hash BOTH engines
    * compute identically (DuckDB `md5` + Horner hex digits replay it in
    * SQL), so every decoded quantity has an independently recomputable
    * ground truth. */
  private[graft] def md5Uint(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Per-frame luma base of the SYNTHETIC Y4M gate fixtures:
    * md5("<docId>:<frame>") mod 200 — 200 leaves +55 of brightness-shift
    * headroom below 256 so a shifted re-encode never clips (clipping
    * would break the fingerprint's shift invariance). */
  private[graft] def frameLumaBase(docId: Long, frame: Int): Int =
    (md5Uint(s"$docId:$frame") % 200).toInt

  /** Deterministic REAL 4×2 C420 YUV4MPEG2 clip for the video gate: frame
    * f's luma plane is Y[p] = (frameLumaBase(docId, f) + 13·p) mod 200 +
    * shift, chroma is neutral 128. Every decoded quantity — frame means,
    * their deltas, duration at F25:1 — is exact dyadic arithmetic the
    * DuckDB oracle reproduces independently, so the gate checks the REAL
    * container parse against ground truth, not a replayed stub. Layout:
    * 35-byte header + 18 bytes/frame (FRAME\n + 8 Y + 2 U + 2 V). */
  private[graft] def syntheticY4m(docId: Long, nFrames: Int,
      shift: Int = 0): Array[Byte] = {
    require(nFrames > 0, "nFrames must be positive")
    require(shift >= 0 && shift <= 55, "shift must stay within luma headroom")
    val header = "YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val frame = "FRAME\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + nFrames * 18)
    System.arraycopy(header, 0, out, 0, header.length)
    var pos = header.length
    var f = 0
    while (f < nFrames) {
      System.arraycopy(frame, 0, out, pos, 6)
      pos += 6
      val base = frameLumaBase(docId, f)
      var p = 0
      while (p < 8) {
        out(pos) = ((base + 13 * p) % 200 + shift).toByte
        pos += 1
        p += 1
      }
      var c = 0
      while (c < 4) { out(pos) = 128.toByte; pos += 1; c += 1 }
      f += 1
    }
    out
  }

  /** Attach a [[syntheticY4m]] payload per document: doc_id % `modFrames`
    * + `addFrames` frames, optionally brightness-shifted. The m07 gate
    * uses short clips (1–10 frames) to gate the decode features; the m08
    * near-dup gate uses 60–69-frame clips so fingerprints carry 59–64
    * delta bits (md5-uniform → unrelated clips never collide, the
    * property the banding relies on). */
  def attachSyntheticVideo(docs: DataFrame, addFrames: Int, modFrames: Int,
      shift: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRow(id,
        syntheticY4m(id, (id % modFrames).toInt + addFrames, shift),
        MediaMeta("y4m", 0, 0, 0))
    }.toDF()
  }

  /** Sample i of the synthetic WAV gate fixtures, as a SIGNED raw value:
    * 2·(md5("<docId>:<i>") mod 101 − 50) ∈ [−100, 100]. Always EVEN so the
    * half-gain re-encode divides exactly (raw/2 stays an integer sample
    * and the window RMS scales by exactly 1/2 — a power of two, so IEEE
    * sqrt and division preserve the deltas' signs bit-exactly, the
    * invariance the m10 oracle replays rather than assumes). */
  private[graft] def sampleRaw(docId: Long, i: Int): Int =
    2 * ((md5Uint(s"$docId:$i") % 101).toInt - 50)

  /** Deterministic REAL 8-bit mono 8 kHz WAV clip for the audio gate: the
    * canonical 44-byte RIFF/WAVE header + unsigned PCM samples
    * 128 + [[sampleRaw]] (halved under `halfGain` — the planted
    * gain-graded re-encode). Decoded by the genuine `javax.sound.sampled`
    * path; every decoded quantity — RMS, peak, zero-crossings, duration —
    * is arithmetic on exact dyadic sample values the DuckDB oracle
    * recomputes independently (md5 + Horner hex; sqrt is correctly
    * rounded IEEE in both engines, so even the RMS matches bit-exactly). */
  private[graft] def syntheticWav(docId: Long, nSamples: Int,
      halfGain: Boolean = false): Array[Byte] = {
    require(nSamples > 0, "nSamples must be positive")
    val out = new Array[Byte](44 + nSamples)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + nSamples)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(8000) // sample rate, byte rate
      .putShort(1).putShort(8) // block align, bits per sample
      .put("data".getBytes("US-ASCII")).putInt(nSamples)
    var i = 0
    while (i < nSamples) {
      val raw = sampleRaw(docId, i)
      out(44 + i) = (128 + (if (halfGain) raw / 2 else raw)).toByte
      i += 1
    }
    out
  }

  /** Attach a [[syntheticWav]] payload per document: doc_id % `modSamples`
    * + `addSamples` samples, optionally gain-halved. The m09 gate uses
    * 1–10-sample clips to gate the decode features; the m10 near-dup gate
    * uses 60–69-sample clips for 59–64 md5-uniform fingerprint bits —
    * the same shapes as the video gate's [[attachSyntheticVideo]]. */
  def attachSyntheticAudio(docs: DataFrame, addSamples: Int,
      modSamples: Int, halfGain: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRow(id,
        syntheticWav(id, (id % modSamples).toInt + addSamples, halfGain),
        MediaMeta("wav", 0, 0, 0))
    }.toDF()
  }

  /** Deterministic REAL G.711 μ-law WAV clip (format tag 7, mono 8 kHz)
    * for the m12 gate: the canonical 44-byte RIFF header + one
    * md5-derived code byte per sample — md5Uint("<docId>:u:<i>") mod 256,
    * uniform over the code space so every exponent segment and both sign
    * halves are exercised. The decode is [[ulawTab]] (spec-pinned equal
    * to the JDK codec over all 256 codes), and the expansion formula is
    * pure integer arithmetic, so the DuckDB oracle replays the DECODED
    * ground truth — a wrong table entry, complement, or sign fails the
    * hash compare. */
  private[graft] def syntheticUlawWav(docId: Long, nSamples: Int)
      : Array[Byte] = {
    require(nSamples > 0, "nSamples must be positive")
    val out = new Array[Byte](44 + nSamples)
    writeG711Header(out, tag = 7, nSamples) // μ-law
    var i = 0
    while (i < nSamples) {
      out(44 + i) = (md5Uint(s"$docId:u:$i") % 256).toByte
      i += 1
    }
    out
  }

  /** Attach a [[syntheticUlawWav]] payload per document — the telephony
    * sibling of [[attachSyntheticAudio]], same clip-length recipe. */
  def attachSyntheticUlaw(docs: DataFrame, addSamples: Int,
      modSamples: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRow(id, syntheticUlawWav(id, (id % modSamples).toInt + addSamples),
        MediaMeta("ulaw", 0, 0, 0))
    }.toDF()
  }

  /** Deterministic REAL G.711 A-law WAV clip (format tag 6) for the m16
    * gate — [[syntheticUlawWav]]'s sibling with its own md5 key
    * (":al:"), code bytes uniform over the A-law space so every segment
    * and both signs are exercised; the oracle re-expands each code
    * through the integer A-law formula (XOR 0x55 toggle, 4-bit
    * mantissa, 3-bit segment with the +0x100 bias from segment 1, sign
    * off the top bit). */
  private[graft] def syntheticAlawWav(docId: Long, nSamples: Int)
      : Array[Byte] = {
    require(nSamples > 0, "nSamples must be positive")
    val out = new Array[Byte](44 + nSamples)
    writeG711Header(out, tag = 6, nSamples) // A-law
    var i = 0
    while (i < nSamples) {
      out(44 + i) = (md5Uint(s"$docId:al:$i") % 256).toByte
      i += 1
    }
    out
  }

  /** Attach a [[syntheticAlawWav]] payload per document. */
  def attachSyntheticAlaw(docs: DataFrame, addSamples: Int,
      modSamples: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRow(id, syntheticAlawWav(id, (id % modSamples).toInt + addSamples),
        MediaMeta("alaw", 0, 0, 0))
    }.toDF()
  }

  /** The 44-byte mono-8kHz G.711 WAV header shared by the gate fixture
    * generators (one code byte per sample, so dataLen = nSamples). */
  private def writeG711Header(out: Array[Byte], tag: Short,
      nSamples: Int): Unit = {
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + nSamples)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(tag).putShort(1)
      .putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(nSamples)
  }

  /** Deterministic REAL mono IMA-ADPCM WAV clip (format tag 17) for the
    * m13 gate: one block whose header predictor / step index and nibble
    * stream all derive from md5 arithmetic (predictor uniform over the
    * full int16 range, index over [0, 88], nibbles over [0, 15] — every
    * table segment, both signs, and both clamps get exercised across a
    * corpus). The decode recurrence is pure integer arithmetic the
    * DuckDB oracle unrolls step by step from its own copy of the public
    * step tables — a wrong table entry, clamp bound, or nibble order
    * fails the hash compare. Layout: 12-byte RIFF + 28-byte fmt (20-byte
    * body: cbSize 2, samplesPerBlock = nSamples) + 8-byte data header +
    * one block (4-byte header + ceil((n−1)/2) nibble bytes). */
  private[graft] def syntheticAdpcmWav(docId: Long, nSamples: Int)
      : Array[Byte] = {
    require(nSamples > 0, "nSamples must be positive")
    val nibBytes = nSamples / 2 // = ceil((nSamples - 1) / 2)
    val blockAlign = 4 + nibBytes
    val out = new Array[Byte](48 + blockAlign)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(40 + blockAlign)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(17).putShort(1) // IMA ADPCM, mono
      .putInt(8000).putInt(8000 * blockAlign / nSamples) // rate, byteRate
      .putShort(blockAlign.toShort).putShort(4) // block align, bits
      .putShort(2).putShort(nSamples.toShort) // cbSize, samplesPerBlock
      .put("data".getBytes("US-ASCII")).putInt(blockAlign)
    bb.putShort(((md5Uint(s"$docId:ap") % 65536) - 32768).toShort)
      .put((md5Uint(s"$docId:ai") % 89).toByte).put(0.toByte)
    var i = 0
    while (i < nSamples - 1) {
      val nib = (md5Uint(s"$docId:a:$i") % 16).toInt
      val o = 52 + i / 2
      out(o) = (if (i % 2 == 0) nib // LOW nibble first, per IMA-WAV
                else (out(o) & 0xff) | (nib << 4)).toByte
      i += 1
    }
    out
  }

  /** Attach a [[syntheticAdpcmWav]] payload per document — the
    * compressed-codec sibling of [[attachSyntheticAudio]]. */
  def attachSyntheticAdpcm(docs: DataFrame, addSamples: Int,
      modSamples: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRow(id,
        syntheticAdpcmWav(id, (id % modSamples).toInt + addSamples),
        MediaMeta("adpcm", 0, 0, 0))
    }.toDF()
  }

  /** Deterministic REAL STEREO IMA-ADPCM WAV clip (format tag 17, 2
    * channels) for the m17 gate: per-channel 4-byte block headers
    * (predictor md5(":p<c>") over the full int16 range, step index
    * md5(":i<c>") over [0, 88]) then the nibble stream in the spec's
    * 4-byte-word-per-channel interleave — nibble k of channel c is
    * md5(":n<c>:<k>") mod 16 (LOW nibble first within each byte),
    * padding nibbles beyond the clip length zero. The oracle replays
    * BOTH channels' recurrences and the engine's mean mixdown; a wrong
    * header stride or word interleave decodes the wrong nibbles for at
    * least one channel and fails the hash. Layout: 12-byte RIFF +
    * 28-byte fmt (samplesPerBlock = nFrames) + 8-byte data header + one
    * block of 8 header bytes + 8·ceil((nFrames−1)/8) word bytes. */
  private[graft] def syntheticAdpcmStereoWav(docId: Long, nFrames: Int)
      : Array[Byte] = {
    require(nFrames > 0, "nFrames must be positive")
    val words = (nFrames - 1 + 7) / 8 // 8-byte word-rounds (4 per channel)
    val blockAlign = 8 + 8 * words
    val out = new Array[Byte](48 + blockAlign)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(40 + blockAlign)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(17).putShort(2) // IMA ADPCM, stereo
      .putInt(8000).putInt(8000 * blockAlign / nFrames)
      .putShort(blockAlign.toShort).putShort(4)
      .putShort(2).putShort(nFrames.toShort) // cbSize, samplesPerBlock
      .put("data".getBytes("US-ASCII")).putInt(blockAlign)
    var c = 0
    while (c < 2) {
      bb.putShort(((md5Uint(s"$docId:p$c") % 65536) - 32768).toShort)
        .put((md5Uint(s"$docId:i$c") % 89).toByte).put(0.toByte)
      c += 1
    }
    var k = 0
    while (k < nFrames - 1) {
      c = 0
      while (c < 2) {
        val nib = (md5Uint(s"$docId:n$c:$k") % 16).toInt
        // word r of channel c starts at 56 + r·8 + 4·c; nibble k lands in
        // byte (k mod 8)/2 of word k/8, low half for even k
        val o = 56 + (k / 8) * 8 + 4 * c + (k % 8) / 2
        out(o) = (if (k % 2 == 0) (out(o) & 0xf0) | nib
                  else (out(o) & 0x0f) | (nib << 4)).toByte
        c += 1
      }
      k += 1
    }
    out
  }

  /** Attach a [[syntheticAdpcmStereoWav]] payload per document. */
  def attachSyntheticAdpcmStereo(docs: DataFrame, addSamples: Int,
      modSamples: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRow(id,
        syntheticAdpcmStereoWav(id, (id % modSamples).toInt + addSamples),
        MediaMeta("adpcm2", 0, 0, 0))
    }.toDF()
  }

  /** The 7 standard MS ADPCM coefficient pairs (8.8 fixed point) from
    * the public WAVE spec — written into the gate fixture's fmt chunk
    * (a real decoder reads the DECLARED table; the fixture declares the
    * standard one). */
  private[graft] val msStdCoef: Array[(Int, Int)] = Array(
    (256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208),
    (392, -232))

  /** Deterministic REAL mono MS-ADPCM WAV clip (format tag 2) for the
    * m18 gate: block header fields all md5-derived — predictor index
    * md5(":mb") mod 7 (every standard coefficient pair exercised across
    * a corpus), iDelta md5(":md") mod 32768, iSamp1/iSamp2 (":m1"/":m2")
    * over the full int16 range — then one md5 nibble (":mn:<k>") per
    * remaining sample, HIGH nibble first per the MS spec. nSamples ≥ 2
    * (the header itself carries the first two output samples). Layout:
    * 12-byte RIFF + 58-byte fmt (16 base + cbSize 2 + samplesPerBlock +
    * numCoef + 7 declared pairs) + 8-byte data header + one block of
    * 7 + ceil((nSamples−2)/2) bytes. */
  private[graft] def syntheticMsAdpcmWav(docId: Long, nSamples: Int)
      : Array[Byte] = {
    require(nSamples >= 2, "nSamples must be at least 2")
    val nibBytes = (nSamples - 2 + 1) / 2
    val blockAlign = 7 + nibBytes
    val out = new Array[Byte](78 + blockAlign)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(70 + blockAlign)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(50)
      .putShort(2).putShort(1) // MS ADPCM, mono
      .putInt(8000).putInt(8000 * blockAlign / nSamples)
      .putShort(blockAlign.toShort).putShort(4)
      .putShort(32).putShort(nSamples.toShort) // cbSize, samplesPerBlock
      .putShort(7) // numCoef: the standard table follows
    msStdCoef.foreach { case (a, b2) =>
      bb.putShort(a.toShort).putShort(b2.toShort)
    }
    bb.put("data".getBytes("US-ASCII")).putInt(blockAlign)
    bb.put((md5Uint(s"$docId:mb") % 7).toByte)
      .putShort((md5Uint(s"$docId:md") % 32768).toShort)
      .putShort(((md5Uint(s"$docId:m1") % 65536) - 32768).toShort)
      .putShort(((md5Uint(s"$docId:m2") % 65536) - 32768).toShort)
    var k = 0
    while (k < nSamples - 2) {
      val nib = (md5Uint(s"$docId:mn:$k") % 16).toInt
      val o = 85 + k / 2
      out(o) = (if (k % 2 == 0) (out(o) & 0x0f) | (nib << 4) // HIGH first
                else (out(o) & 0xf0) | nib).toByte
      k += 1
    }
    out
  }

  /** Attach a [[syntheticMsAdpcmWav]] payload per document. */
  def attachSyntheticMsAdpcm(docs: DataFrame, addSamples: Int,
      modSamples: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRow(id,
        syntheticMsAdpcmWav(id, (id % modSamples).toInt + addSamples),
        MediaMeta("msadpcm", 0, 0, 0))
    }.toDF()
  }

  /** Deterministic REAL STEREO MS-ADPCM WAV clip for the m19 gate —
    * [[syntheticMsAdpcmWav]]'s two-channel sibling: channel-interleaved
    * header (bPredictor md5(":sb<c>") mod 7 per channel, iDelta
    * md5(":sd<c>") mod 32768, iSamp1/iSamp2 md5(":s1<c>"/":s2<c>") over
    * int16), then ONE byte per frame beyond the header pair — HIGH
    * nibble channel 0 (md5(":sn0:<k>")), LOW nibble channel 1
    * (":sn1:<k>"), per the WAVE spec's stereo packing. The oracle
    * replays BOTH channels' recurrences and the mean mixdown, so a
    * wrong header stride or nibble-channel assignment fails the hash. */
  private[graft] def syntheticMsAdpcmStereoWav(docId: Long, nFrames: Int)
      : Array[Byte] = {
    require(nFrames >= 2, "nFrames must be at least 2")
    val blockAlign = 14 + (nFrames - 2)
    val out = new Array[Byte](78 + blockAlign)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(70 + blockAlign)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(50)
      .putShort(2).putShort(2) // MS ADPCM, stereo
      .putInt(8000).putInt(8000 * blockAlign / nFrames)
      .putShort(blockAlign.toShort).putShort(4)
      .putShort(32).putShort(nFrames.toShort)
      .putShort(7)
    msStdCoef.foreach { case (a, b2) =>
      bb.putShort(a.toShort).putShort(b2.toShort)
    }
    bb.put("data".getBytes("US-ASCII")).putInt(blockAlign)
    var c = 0
    while (c < 2) { // bPredictor bytes, channel-interleaved
      bb.put((md5Uint(s"$docId:sb$c") % 7).toByte)
      c += 1
    }
    c = 0
    while (c < 2) {
      bb.putShort((md5Uint(s"$docId:sd$c") % 32768).toShort)
      c += 1
    }
    c = 0
    while (c < 2) {
      bb.putShort(((md5Uint(s"$docId:s1$c") % 65536) - 32768).toShort)
      c += 1
    }
    c = 0
    while (c < 2) {
      bb.putShort(((md5Uint(s"$docId:s2$c") % 65536) - 32768).toShort)
      c += 1
    }
    var k = 0
    while (k < nFrames - 2) {
      val n0 = (md5Uint(s"$docId:sn0:$k") % 16).toInt
      val n1 = (md5Uint(s"$docId:sn1:$k") % 16).toInt
      out(92 + k) = ((n0 << 4) | n1).toByte
      k += 1
    }
    out
  }

  /** Attach a [[syntheticMsAdpcmStereoWav]] payload per document. */
  def attachSyntheticMsAdpcmStereo(docs: DataFrame, addSamples: Int,
      modSamples: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRow(id,
        syntheticMsAdpcmStereoWav(id, (id % modSamples).toInt + addSamples),
        MediaMeta("msadpcm2", 0, 0, 0))
    }.toDF()
  }

  /** Deterministic REAL FLAC clip for the m20 gate — the first
    * ENTROPY-CODED fixture in the suite: one mono 16-bit frame, FIXED
    * order-1 subframe, Rice parameter md5(":fp") mod 8, warmup sample
    * md5(":fw") mod 2000 − 1000, and n−1 Rice-coded residuals
    * md5(":fr:<k>") mod 64 − 32 (zigzag + unary quotient + remainder
    * bits in the actual stream). Sample i is warmup + Σ residuals —
    * a running sum the oracle recomputes directly from md5 while the
    * ENGINE must recover each residual from the bitstream (sync, UTF-8
    * frame number, CRC-8/16, unary/remainder bits — any bit-level
    * error fails the hash). The stream is zero-padded to a FIXED 200
    * bytes (tail ignored by decode, which stops at STREAMINFO's total)
    * so n_bytes is closed-form for the oracle. */
  private[graft] def syntheticFlac(docId: Long, nSamples: Int)
      : Array[Byte] = {
    require(nSamples >= 2, "nSamples must be at least 2")
    val s0 = ((md5Uint(s"$docId:fw") % 2000) - 1000).toInt
    val res = Array.tabulate(nSamples - 1)(k =>
      ((md5Uint(s"$docId:fr:$k") % 64) - 32).toInt)
    val p = (md5Uint(s"$docId:fp") % 8).toInt
    // pad to a CLOSED-FORM length: 200 covers every gate clip (n ≤ 11);
    // longer sweep clips grow by the worst-case 8 bytes/residual (u ≤ 63
    // at p = 0 is exactly 64 bits), so the length stays a pure function
    // of n — the oracle's n_bytes needs that
    val pad = math.max(200, 80 + 8 * nSamples)
    val out = Flac.buildFlacFixedMono(8000, Array(s0), res, order = 1,
      p, padToBytes = pad)
    assert(out.length == pad,
      s"fixture overflowed the fixed pad: ${out.length}")
    out
  }

  /** Attach a [[syntheticFlac]] payload per document. */
  def attachSyntheticFlac(docs: DataFrame, addSamples: Int,
      modSamples: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRow(id, syntheticFlac(id, (id % modSamples).toInt + addSamples),
        MediaMeta("flac", 0, 0, 0))
    }.toDF()
  }

  /** Deterministic 24-BIT FLAC clip for the m22 gate — the archival-depth
    * sibling of [[syntheticFlac]]. Even doc ids are MONO FIXED order-1:
    * warmup md5(":g24w") mod 2,000,000 − 1,000,000 (magnitudes far past
    * the 16-bit range, so a depth bug cannot hide inside int16), Rice
    * parameter md5(":g24p") mod 8, residuals md5(":g24r:<k>") mod 64 −
    * 32. Odd ids are LEFT/SIDE STEREO: the left channel is the same
    * recurrence, the side channel one CONSTANT subframe md5(":g24s") mod
    * 40,000 − 20,000 at the side's 25-bit width — R_i = L_i − side pins
    * the decorrelation arithmetic at depth (the mixdown mean then reads
    * L_i − side/2, which the oracle restates in closed form). The stream
    * is zero-padded to a fixed 300 bytes (n ≤ 11 at gate scale; longer
    * sweep clips grow by the worst-case Rice bytes) so n_bytes stays a
    * pure function of n for the oracle. */
  private[graft] def syntheticFlac24(docId: Long, nSamples: Int)
      : Array[Byte] = {
    require(nSamples >= 2, "nSamples must be at least 2")
    val s0 = ((md5Uint(s"$docId:g24w") % 2000000) - 1000000).toInt
    val res = Array.tabulate(nSamples - 1)(k =>
      ((md5Uint(s"$docId:g24r:$k") % 64) - 32).toInt)
    val p = (md5Uint(s"$docId:g24p") % 8).toInt
    val pad = math.max(300, 120 + 16 * nSamples)
    val out =
      if (docId % 2 == 0)
        Flac.buildFlac(8000, 0,
          Seq(Flac.Chan(1, Array(s0.toLong), res.map(_.toLong), p,
            bits = 24)),
          padToBytes = pad, bps = 24)
      else {
        val side = ((md5Uint(s"$docId:g24s") % 40000) - 20000).toInt
        Flac.buildFlac(8000, 8, Seq(
          Flac.Chan(1, Array(s0.toLong), res.map(_.toLong), p, bits = 24),
          Flac.Chan(-1, Array(side.toLong), Array.empty[Long], p,
            bits = 25)),
          padToBytes = pad, bps = 24)
      }
    assert(out.length == pad,
      s"fixture overflowed the fixed pad: ${out.length}")
    out
  }

  /** Attach a [[syntheticFlac24]] payload per document. */
  def attachSyntheticFlac24(docs: DataFrame, addSamples: Int,
      modSamples: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRow(id, syntheticFlac24(id, (id % modSamples).toInt + addSamples),
        MediaMeta("flac", 0, 0, 0))
    }.toDF()
  }

  /** 32-BIT FLAC fixture (m23) — the format ceiling, exercising the
    * decoder's Long channel buffers end-to-end. Even ids are MONO FIXED
    * order-1: warmup u0 = md5(":g32w") mod 16,000,000 − 8,000,000 and
    * residuals md5(":g32r:<k>") mod 64 − 32, both SCALED BY 256 — the
    * samples range past ±2·10⁹ (beyond any 24-bit path) while staying
    * multiples of 256, so the oracle's s = v/2³¹ = u/2²³ dyadic
    * arithmetic is exactly representable (u² ≤ 2⁴⁶, ≤ 11 terms — sums
    * fit 53 bits; no quantization on either engine). Odd ids are
    * LEFT/SIDE STEREO built so the CONSTANT side channel GENUINELY
    * EXCEEDS 32 bits: left rides the same recurrence from
    * u0 = 2²³ − 1 − a (a = md5(":g32w") mod 1000 + 320), the side is
    * (2²⁴ − 1 − a − b)·256 ≈ 2³² (b = md5(":g32s") mod 1000 + 320) —
    * a 33-bit value only a Long buffer holds — and the reconstructed
    * right channel R_i = L_i − side lands near −2³¹, pinning the
    * decorrelation arithmetic at full depth. The ±320 guards keep every
    * sample inside int32 for any residual walk (|cum| ≤ 320). Rice
    * parameter 8 + md5(":g32p") mod 7 (the ×256 residuals need the
    * larger params). Fixed 420-byte pad so n_bytes is a pure function
    * of n (constant at gate scale's n ≤ 11). */
  private[graft] def syntheticFlac32(docId: Long, nSamples: Int)
      : Array[Byte] = {
    require(nSamples >= 2, "nSamples must be at least 2")
    val res = Array.tabulate(nSamples - 1)(k =>
      ((md5Uint(s"$docId:g32r:$k") % 64) - 32) * 256L)
    val p = 8 + (md5Uint(s"$docId:g32p") % 7).toInt
    val pad = math.max(420, 140 + 24 * nSamples) // constant for n ≤ 11
    val out =
      if (docId % 2 == 0) {
        val u0 = ((md5Uint(s"$docId:g32w") % 16000000) - 8000000).toInt
        Flac.buildFlac(8000, 0,
          Seq(Flac.Chan(1, Array(u0 * 256L), res, p, bits = 32)),
          padToBytes = pad, bps = 32)
      } else {
        val a = (md5Uint(s"$docId:g32w") % 1000 + 320).toInt
        val b = (md5Uint(s"$docId:g32s") % 1000 + 320).toInt
        val left0 = ((1 << 23) - 1 - a) * 256L
        val side = ((1L << 24) - 1 - a - b) * 256L // > 2³¹: 33 bits
        Flac.buildFlac(8000, 8, Seq(
          Flac.Chan(1, Array(left0), res, p, bits = 32),
          Flac.Chan(-1, Array(side), Array.empty[Long], p, bits = 33)),
          padToBytes = pad, bps = 32)
      }
    assert(out.length == pad,
      s"fixture overflowed the fixed pad: ${out.length}")
    out
  }

  /** Attach a [[syntheticFlac32]] payload per document. */
  def attachSyntheticFlac32(docs: DataFrame, addSamples: Int,
      modSamples: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRow(id, syntheticFlac32(id, (id % modSamples).toInt + addSamples),
        MediaMeta("flac", 0, 0, 0))
    }.toDF()
  }

  /** One sample as canonical int16, per the clip's encoding — the
    * transcode quantizer. Width conversion is the standard bit-shift
    * mapping: 8→16 scales by 256, 24/32→16 arithmetic-shifts down
    * (truncation toward −∞). float32 clamps to [−1, 1] then scales by
    * 32767, rounding half toward +∞ (`Math.round`). G.711 and ADPCM
    * decode to exact int16 already — those paths are LOSSLESS. */
  private def sampleInt16(c: PcmClip, o: Int): Int = c.enc match {
    case EncPcm => c.bits match {
      case 8 => pcmRaw(c.data, o, 8, c.signed, c.big) << 8
      case 16 => pcmRaw(c.data, o, 16, c.signed, c.big)
      case 24 => pcmRaw(c.data, o, 24, c.signed, c.big) >> 8
      case _ => pcmRaw(c.data, o, 32, c.signed, c.big) >> 16
    }
    case EncFloat32 =>
      val v = readFloat32(c.data, o, c.big)
      math.round(math.max(-1.0, math.min(1.0, v)) * 32767).toInt
    case EncUlaw => ulawTab(c.data(o) & 0xff).toInt
    case _ => alawTab(c.data(o) & 0xff).toInt
  }

  /** The transform-family decode: the canonical-WAV fast path, else the
    * codec fallback WITH the declared-frame-count check — a truncated
    * AIFF/AU payload that [[audioFingerprint]] refuses to fingerprint
    * must equally refuse to transcode/resample (it passes through as the
    * honest no-op), so near-dup membership cannot differ across the
    * transform boundary. The fast path already declines truncation to
    * the codec (chunk lengths are validated against the buffer). */
  private def decodeFullClip(bytes: Array[Byte]): Option[PcmClip] =
    parseWav(bytes).orElse(Flac.parseFlac(bytes))
      .orElse(readPcmViaAudioSystem(bytes).collect {
        case (c, declared) if c.frames == declared => c
      })

  /** Transcode ONE payload to a canonical 16-bit LE PCM WAV (44-byte
    * header), preserving sample rate and channel count. None when no
    * JDK-free path decodes it (or the codec fallback decodes fewer
    * frames than the header declares — truncation), or when the
    * canonical form would not fit a byte array. */
  private[graft] def transcodeOne(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (!looksLikePcmContainer(bytes)) return None
    val c = decodeFullClip(bytes).getOrElse(return None)
    val outFrames = c.frames
    if (44L + 2L * c.ch * outFrames > Int.MaxValue) return None
    val dataLen = 2 * c.ch * outFrames.toInt
    val rate = math.round(c.sampleRate)
    val out = new Array[Byte](44 + dataLen)
    if (!writeWavHeader(out, rate, c.ch, dataLen)) return None
    val bps = c.bits / 8
    var f = 0L
    var off = c.off
    var w = 44
    while (f < outFrames) {
      var k = 0
      while (k < c.ch) {
        val v = sampleInt16(c, off + k * bps)
        out(w) = (v & 0xff).toByte
        out(w + 1) = ((v >> 8) & 0xff).toByte
        w += 2
        k += 1
      }
      f += 1
      off += c.ch * bps
    }
    Some(out)
  }

  /** Write the canonical 44-byte RIFF/WAVE header for 16-bit LE PCM into
    * `out` — shared by the transcode and resample emitters so a header
    * fix lands once. Returns false (decline to the no-op path) when any
    * field would overflow its 32-bit slot — a parseable-but-hostile
    * declared sample rate must not wrap the ByteRate field negative;
    * the emitted canonical WAV is a contract external readers validate. */
  private def writeWavHeader(out: Array[Byte], rate: Int, ch: Int,
      dataLen: Int): Boolean = {
    if (rate <= 0 || rate.toLong * ch * 2 > Int.MaxValue) return false
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(ch.toShort)
      .putInt(rate).putInt(rate * ch * 2)
      .putShort((ch * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    true
  }

  /** Resample ONE payload by integer factor `up`: decode, quantize to
    * int16 (the [[sampleInt16]] transcode mapping, so
    * resample(x) ≡ resample(transcode(x))), then linear-interpolate
    * per channel — out[i·up + k] = floorDiv((up−k)·s_i + k·s_{i+1}, up)
    * — and emit a canonical 16-bit WAV at up× the source rate.
    * (n−1)·up + 1 frames: interpolation only between real samples,
    * never extrapolation past the clip. All-integer arithmetic (floor
    * division), which is what lets the m15 gate replay the resampled
    * ground truth in SQL. None when nothing decodes or the result
    * would not fit a byte array. */
  private[graft] def resampleOne(bytes: Array[Byte], up: Int)
      : Option[Array[Byte]] = {
    if (!looksLikePcmContainer(bytes)) return None
    val c = decodeFullClip(bytes).getOrElse(return None)
    val n = c.frames
    val outFrames = (n - 1) * up + 1
    val rate = math.round(c.sampleRate)
    if (n < 1 || rate.toLong * up > Int.MaxValue ||
        44L + 2L * c.ch * outFrames > Int.MaxValue)
      return None
    val nI = n.toInt
    val bps = c.bits / 8
    val dataLen = 2 * c.ch * outFrames.toInt
    val out = new Array[Byte](44 + dataLen)
    if (!writeWavHeader(out, rate * up, c.ch, dataLen)) return None
    var w = 44
    def emit(v: Int): Unit = {
      out(w) = (v & 0xff).toByte
      out(w + 1) = ((v >> 8) & 0xff).toByte
      w += 2
    }
    // rolling two-frame window — interpolation only ever needs the
    // adjacent pair, so per-row transient state is O(channels), not a
    // whole-clip copy (a near-bound stereo clip would otherwise add a
    // GB-scale Int buffer on top of the input and output arrays)
    var prev = new Array[Int](c.ch)
    var cur = new Array[Int](c.ch)
    def readFrame(off: Int, dst: Array[Int]): Unit = {
      var k = 0
      while (k < c.ch) {
        dst(k) = sampleInt16(c, off + k * bps)
        k += 1
      }
    }
    var off = c.off
    readFrame(off, prev)
    var f = 1
    while (f < nI) {
      off += c.ch * bps
      readFrame(off, cur)
      var k = 0
      while (k < up) {
        var ch = 0
        while (ch < c.ch) {
          emit(math.floorDiv((up - k) * prev(ch) + k * cur(ch), up))
          ch += 1
        }
        k += 1
      }
      val t = prev; prev = cur; cur = t
      f += 1
    }
    var ch = 0
    while (ch < c.ch) { // the final real frame, never extrapolated
      emit(prev(ch))
      ch += 1
    }
    Some(out)
  }

  /** SAMPLE-RATE UPCONVERSION transform — the "resample everything to
    * 16 kHz" canonicalization step of a speech-training pipeline, for
    * integer upsampling factors: linear interpolation between
    * consecutive frames, per channel, emitted as canonical 16-bit WAV
    * at `up`× the source rate (see [[resampleOne]] for the exact
    * integer recipe). Every payload the PCM family decodes
    * participates; undecodable payloads pass through unchanged — the
    * same honest no-op contract as [[transcodePcm16]]. Map-only: one
    * row in, one row out, bounded per-row memory, no shuffle at any
    * corpus size. */
  def resamplePcm(media: DataFrame, up: Int): DataFrame = {
    require(up >= 2 && up <= 64, "up must be in [2, 64]")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].map { r =>
      resampleOne(r.media, up) match {
        case Some(wav) => MediaRow(r.doc_id, wav,
          MediaMeta("wav", r.meta.width, r.meta.height, r.meta.nFrames))
        case None => r
      }
    }.toDF()
  }

  /** CANONICALIZE-AUDIO transform — the "normalize everything to 16-bit
    * PCM WAV" step at the head of an audio-training pipeline: every
    * payload the audio family decodes (linear 8/16/24/32-bit, float32,
    * G.711 μ/A-law, IMA + MS ADPCM mono/stereo, FLAC — WAV/AIFF/AU/FLAC
    * containers) is re-emitted as
    * a canonical 16-bit little-endian WAV with sample rate and channel
    * count preserved and the row's format set to "wav"; payloads no
    * JDK-free path decodes (entropy-coded codecs) pass through UNCHANGED
    * with their original format — an honest no-op, never a
    * half-transcode. Quantization semantics in [[sampleInt16]]; the
    * G.711/ADPCM paths are lossless (decode(transcode(x)) ≡ decode(x)),
    * which the m14 gate replays end-to-end in SQL. Map-only: one row in,
    * one row out, bounded per-row memory — no shuffle at any corpus
    * size. */
  def transcodePcm16(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].map { r =>
      transcodeOne(r.media) match {
        case Some(wav) => MediaRow(r.doc_id, wav,
          MediaMeta("wav", r.meta.width, r.meta.height, r.meta.nFrames))
        case None => r
      }
    }.toDF()
  }

  /** ASPECT-RATIO BUCKETING + batch assembly — the multi-aspect training
    * step of image-generation pipelines (NovelAI's aspect-ratio bucketing,
    * SDXL-style multi-aspect finetuning): every image is assigned to the
    * bucket whose target aspect ratio bw/bh is CLOSEST to its own w/h, then
    * packed into fixed-size batches WITHIN its bucket, so every training
    * batch holds uniformly-shaped tensors and no image is cropped to a
    * foreign aspect.
    *
    * The argmin is exact integer arithmetic, not floats: the candidate
    * distances |w/h − bw_j/bh_j| share the per-image denominator h, so
    * comparing |w·bh_j − bw_j·h| · (L/bh_j), with L = lcm of the bucket
    * heights, is the same total order with no division anywhere — the
    * engine-portable determinism every oracle-replayed op here maintains.
    * Ties break to the lowest bucket index.
    *
    * Shape at scale: the bucket table is a literal (argmin is one map-only
    * array_min over per-bucket structs — no join, no shuffle), and batch
    * numbering uses [[graft.ops.Ranking.groupedPrefixSum]]'s two-phase
    * bucketed prefix count — NOT `row_number() OVER (PARTITION BY bucket)`,
    * whose per-bucket state is unbounded when billions of images land in a
    * handful of buckets. One range-bucketed shuffle total. */
  def arBucketPlan(media: DataFrame, buckets: Seq[(Int, Int)],
      batchSize: Int): DataFrame = {
    require(buckets.nonEmpty, "buckets must be non-empty")
    require(batchSize > 0, "batchSize must be positive")
    require(buckets.forall { case (bw, bh) => bw > 0 && bh > 0 },
      "bucket dims must be positive")
    def lcm(a: Long, b: Long): Long = a / BigInt(a).gcd(BigInt(b)).toLong * b
    val lcmBh = buckets.map(_._2.toLong).reduce(lcm)
    val scored = buckets.zipWithIndex.map { case ((bw, bh), j) =>
      struct(
        (abs(col("w") * lit(bh.toLong) - lit(bw.toLong) * col("h")) *
          lit(lcmBh / bh)).as("m"),
        lit(j).as("j"))
    }
    val sel = media.select(col("doc_id"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.width").cast("long").as("w"),
        col("meta.height").cast("long").as("h"))
      .withColumn("bucket", array_min(array(scored: _*)).getField("j"))
      .select(col("doc_id"), col("width"), col("height"), col("bucket"),
        element_at(array(buckets.map(b => lit(b._1)): _*),
          col("bucket") + 1).as("bucket_w"),
        element_at(array(buckets.map(b => lit(b._2)): _*),
          col("bucket") + 1).as("bucket_h"))
    Ranking.groupedPrefixSum(sel, col("bucket"), col("doc_id"),
        col("doc_id"), lit(1L), "__seq")
      .withColumn("batch_id", expr(s"CAST(__seq DIV $batchSize AS INT)"))
      .drop("__seq")
      .orderBy("doc_id")
  }

  /** Metadata-only resize plan (the real pixel op is the stubbed part). */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media.select(col("doc_id"), col("meta.width").as("width"),
        col("meta.height").as("height"))
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
      .orderBy("doc_id")
}
