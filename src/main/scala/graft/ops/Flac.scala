package graft.ops

/** REAL FLAC decode — the first genuinely ENTROPY-CODED codec in the
  * media family (Rice/Golomb-coded residuals in a bitstream, vs the
  * fixed-width nibble codecs of the ADPCM family), implemented from the
  * public FLAC format spec in pure JDK integer arithmetic with zero new
  * dependencies (the JDK ships no FLAC codec).
  *
  * Coverage — the lossless subset every real encoder emits:
  *  - STREAMINFO parse + all other metadata blocks skipped;
  *  - frame headers: both blocking strategies, all block-size and
  *    sample-rate codes, UTF-8-coded frame/sample numbers, CRC-8
  *    verified (a corrupted header falls to the stub, never a
  *    half-decode);
  *  - subframes: CONSTANT, VERBATIM, FIXED orders 0–4, and LPC of any
  *    order (64-bit prediction accumulator), wasted-bits unpacking;
  *  - residuals: both Rice methods (4- and 5-bit parameters), any
  *    partition order, escape partitions (raw fixed-width residuals);
  *  - stereo decorrelation: independent, left/side, right/side,
  *    mid/side (the side channel's +1 bit handled);
  *  - frame CRC-16 verified; multi-frame streams decoded sequentially
  *    with bounded per-row state (one frame's channel buffers live).
  *
  * 8/16/24/32-bit streams decode to interleaved LE PCM at their own
  * depth and channel count (1–8: all four stereo decorrelation modes;
  * 3–8 channels coded independently — the 5.1/7.1 surround layouts),
  * riding the shared [[Multimodal]] feature/fingerprint/transcode scans
  * (whose PcmClip layout already speaks those widths, and whose mixdown
  * is the generic per-frame channel mean) — a FLAC clip and the WAV of
  * its decoded samples fingerprint identically (spec-pinned); 24-bit
  * (the dominant archival depth) is oracle-gated by m22 and 32-bit (the
  * format ceiling — its side channel carries 33-bit samples, hence the
  * Long channel buffers throughout) by m23, whose stereo fixture's side
  * value genuinely exceeds 32 bits. STREAMINFO totalSamples = 0
  * ("unknown", the streaming-encoder form) decodes frame-by-frame to
  * EOF.
  *
  * The m20 gate replays decoded GROUND TRUTH: the fixture's Rice-coded
  * residual stream derives from md5 arithmetic both engines compute, so
  * the DuckDB oracle reconstructs every sample as a running sum while
  * the engine must parse sync codes, UTF-8 numbers, unary quotients and
  * zigzag remainders from the actual bits — any bit-level error fails
  * the hash.
  */
private[graft] object Flac {

  def looksLikeFlac(b: Array[Byte]): Boolean =
    b.length >= 42 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' &&
      b(3) == 'C'

  // ------------------------------------------------------------ bit I/O

  /** MSB-first bit reader (FLAC is big-endian at the bit level). */
  final class BitReader(val buf: Array[Byte]) {
    var bytePos = 0
    var bitPos = 0 // 0..7, bits already consumed in buf(bytePos)
    def atByteBoundary: Boolean = bitPos == 0
    def alignToByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def remainingBits: Long =
      (buf.length.toLong - bytePos) * 8 - bitPos
    def readBit(): Int = {
      if (bytePos >= buf.length) throw new IllegalStateException("EOF")
      val v = (buf(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }
    def readBits(n: Int): Int = { // n ≤ 32, unsigned in a wider long path
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v.toInt
    }
    def readBitsLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Signed n-bit two's-complement value. */
    def readSigned(n: Int): Int = {
      val u = readBitsLong(n)
      ((u << (64 - n)) >> (64 - n)).toInt
    }
    /** Signed n-bit two's-complement value, n ≤ 63 — the channel-sample
      * width path (a 32-bit stream's side channel carries 33 bits). */
    def readSignedLong(n: Int): Long = {
      val u = readBitsLong(n)
      (u << (64 - n)) >> (64 - n)
    }
    /** FLAC unary: count of 0 bits before the terminating 1. No separate
      * runaway cap: a crafted all-zeros run aborts at the PAYLOAD
      * boundary because readBit throws EOF after at most remainingBits
      * reads — a valid quotient can never exceed the bits left, and a
      * counter-based guard could only fire after the EOF already did. */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
  }

  /** MSB-first bit writer for the gate/spec fixture generators. */
  final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nbits += 1
      if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1).toInt); i -= 1 }
    }
    def alignToByte(): Unit = while (nbits != 0) writeBit(0)
    def toBytes: Array[Byte] = { alignToByte(); out.toByteArray }
  }

  // ------------------------------------------------------------- CRCs

  /** CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — the FLAC frame
    * header checksum. */
  def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial 0x8005, init 0 — the FLAC whole-frame checksum. */
  def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------ decode

  private final case class StreamInfo(sampleRate: Int, channels: Int,
      bps: Int, totalSamples: Long)

  private def parseStreamInfo(r: BitReader): StreamInfo = {
    r.readBits(16) // min block size
    r.readBits(16) // max block size
    r.readBits(24) // min frame size
    r.readBits(24) // max frame size
    val rate = r.readBits(20)
    val ch = r.readBits(3) + 1
    val bps = r.readBits(5) + 1
    val total = r.readBitsLong(36)
    var i = 0
    while (i < 16) { r.readBits(8); i += 1 } // decoded-audio MD5 (unchecked)
    StreamInfo(rate, ch, bps, total)
  }

  /** UTF-8-style coded number (FLAC frame/sample number, up to 36 bits). */
  private def readUtf8Number(r: BitReader): Long = {
    val b0 = r.readBits(8)
    if ((b0 & 0x80) == 0) return b0
    var n = 0
    var mask = 0x40
    while ((b0 & mask) != 0) { n += 1; mask >>= 1 }
    if (n < 1 || n > 6) throw new IllegalStateException("bad utf8 number")
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < n) {
      val bc = r.readBits(8)
      if ((bc & 0xc0) != 0x80)
        throw new IllegalStateException("bad utf8 continuation")
      v = (v << 6) | (bc & 0x3f)
      i += 1
    }
    v
  }

  /** Rice-partitioned residual into `res` (already holding `order`
    * warmups at the front; residuals land at [order, blockSize)). */
  private def readResidual(r: BitReader, blockSize: Int, order: Int,
      res: Array[Long]): Unit = {
    val method = r.readBits(2)
    if (method > 1) throw new IllegalStateException("reserved residual")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.readBits(4)
    val partitions = 1 << po
    if (blockSize % partitions != 0)
      throw new IllegalStateException("block not divisible by partitions")
    var idx = order
    var j = 0
    while (j < partitions) {
      val count = (blockSize >> po) - (if (j == 0) order else 0)
      if (count < 0) throw new IllegalStateException("bad partition order")
      val param = r.readBits(pBits)
      if (param == escape) {
        val raw = r.readBits(5)
        var i = 0
        while (i < count) {
          res(idx) = if (raw == 0) 0L else r.readSignedLong(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary()
          val u = (q.toLong << param) |
            (if (param == 0) 0L else r.readBitsLong(param))
          res(idx) = (u >> 1) ^ -(u & 1L) // zigzag decode
          idx += 1; i += 1
        }
      }
      j += 1
    }
  }

  /** One channel's subframe into `out` (length blockSize). `bps` is the
    * channel's EFFECTIVE bit depth (side channels carry +1 — up to 33
    * bits on a 32-bit stream, hence the Long channel buffers). */
  private def readSubframe(r: BitReader, blockSize: Int, bps: Int,
      out: Array[Long]): Unit = {
    if (r.readBit() != 0) throw new IllegalStateException("subframe pad")
    val tpe = r.readBits(6)
    var wasted = 0
    if (r.readBit() == 1) wasted = r.readUnary() + 1
    val eff = bps - wasted
    if (eff <= 0) throw new IllegalStateException("wasted >= bps")
    if (tpe == 0) { // CONSTANT
      val v = r.readSignedLong(eff)
      java.util.Arrays.fill(out, 0, blockSize, v)
    } else if (tpe == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { out(i) = r.readSignedLong(eff); i += 1 }
    } else if ((tpe & 0x38) == 0x08 && (tpe & 0x07) <= 4) { // FIXED
      val order = tpe & 0x07
      var i = 0
      while (i < order) { out(i) = r.readSignedLong(eff); i += 1 }
      readResidual(r, blockSize, order, out)
      // the public fixed-predictor recurrences, exact integer arithmetic
      i = order
      order match {
        case 0 => ()
        case 1 => while (i < blockSize) { out(i) += out(i - 1); i += 1 }
        case 2 => while (i < blockSize) {
          out(i) += 2 * out(i - 1) - out(i - 2); i += 1
        }
        case 3 => while (i < blockSize) {
          out(i) += 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3); i += 1
        }
        case _ => while (i < blockSize) {
          out(i) += 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) -
            out(i - 4)
          i += 1
        }
      }
    } else if ((tpe & 0x20) != 0) { // LPC, order = (tpe & 0x1f) + 1
      val order = (tpe & 0x1f) + 1
      var i = 0
      while (i < order) { out(i) = r.readSignedLong(eff); i += 1 }
      val precision = r.readBits(4) + 1
      if (precision == 16)
        throw new IllegalStateException("reserved lpc precision")
      val shift = r.readSigned(5)
      if (shift < 0) throw new IllegalStateException("negative lpc shift")
      val coef = new Array[Int](order)
      i = 0
      while (i < order) { coef(i) = r.readSigned(precision); i += 1 }
      readResidual(r, blockSize, order, out)
      i = order
      while (i < blockSize) {
        var acc = 0L // 64-bit accumulator per the spec's width analysis
        var j = 0
        while (j < order) { acc += coef(j).toLong * out(i - 1 - j); j += 1 }
        out(i) += acc >> shift
        i += 1
      }
    } else throw new IllegalStateException("reserved subframe type")
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) = out(i) << wasted; i += 1 }
    }
  }

  /** Full-stream decode to an interleaved LE PCM clip at the stream's own
    * bit depth (8/16/24/32 — the widths [[Multimodal.PcmClip]]'s feature,
    * fingerprint, and transcode scans define; 24-bit is the dominant
    * archival depth, 32-bit the full FLAC ceiling — its side channel
    * carries 33-bit samples, which is why every channel buffer in this
    * decoder is Long) and channel count (1–8: mono/stereo in all four
    * decorrelation modes, 3–8 independently-coded channels — the 5.1/7.1
    * surround layouts; the downstream feature mixdown is the generic
    * per-frame channel mean, so multichannel rides the same scans). None
    * when the payload is not FLAC or is corrupt (CRC/sync/structure).
    *
    * STREAMINFO totalSamples = 0 is LEGAL ("unknown" — streaming/pipe
    * encoders emit it): such streams decode frame-by-frame until the
    * payload is exhausted, so the byte stream must end exactly at the
    * last frame's CRC-16 (trailing bytes fail the decode — with no
    * declared total there is no honest way to tell padding from a
    * truncated next frame). */
  def parseFlac(b: Array[Byte]): Option[Multimodal.PcmClip] = {
    if (!looksLikeFlac(b)) return None
    try {
      val r = new BitReader(b)
      r.bytePos = 4
      // metadata blocks: STREAMINFO first (spec-required), rest skipped
      var last = false
      var info: StreamInfo = null
      var first = true
      while (!last) {
        last = r.readBit() == 1
        val tpe = r.readBits(7)
        val len = r.readBits(24)
        if (first) {
          if (tpe != 0 || len != 34) return None
          info = parseStreamInfo(r)
          first = false
        } else {
          if (r.bytePos + len > b.length) return None
          r.bytePos += len // blocks are byte-aligned
        }
      }
      if (info == null) return None
      if ((info.bps != 8 && info.bps != 16 && info.bps != 24 &&
          info.bps != 32) ||
          info.channels < 1 || info.channels > 8 || info.sampleRate <= 0)
        return None
      val bySam = info.bps / 8
      val frameBytes = bySam * info.channels
      val total = info.totalSamples
      if (total < 0 || total > (Int.MaxValue - 8) / frameBytes.toLong)
        return None
      val clip =
        if (total > 0) {
          val out = new Array[Byte](total.toInt * frameBytes)
          var done = 0L
          while (done < total) {
            val fr = decodeFrame(r, b, info, total - done)
            System.arraycopy(fr, 0, out, done.toInt * frameBytes, fr.length)
            done += fr.length / frameBytes
          }
          Multimodal.PcmClip(info.bps, info.channels, signed = true,
            big = false, info.sampleRate.toFloat, total, out, 0,
            Multimodal.EncPcm)
        } else {
          // unknown total: accumulate frames to EOF
          val chunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          var bytes = 0L
          // Expansion guard for the untrusted-scan path: without a
          // declared total, output is bounded only by what the frames
          // decode to, and a crafted stream of ~20-byte constant-subframe
          // frames (blockSize 65535 × 8ch × 3B) would otherwise allocate
          // ~2 GB before the absolute guard fires. A legitimate constant
          // subframe tops out near 49 k output bytes per input byte
          // (65535 samples × 3 B from a 4-byte subframe), so a 64 Ki×
          // payload-proportional cap admits every real stream — silence
          // included — while bounding a malicious one to ~64 KiB per
          // input byte.
          val maxBytes = math.min(Int.MaxValue - 8L, 65536L * b.length)
          while (r.remainingBits >= 16) {
            val fr = decodeFrame(r, b, info, Long.MaxValue)
            bytes += fr.length
            if (bytes > maxBytes)
              throw new IllegalStateException("stream too large")
            chunks += fr
          }
          // the documented invariant, exactly: ANY trailing byte fails
          // (a lone byte is below the 16-bit loop threshold but is still
          // indistinguishable from a truncated next frame)
          if (r.remainingBits != 0)
            throw new IllegalStateException("trailing bytes after last frame")
          if (chunks.isEmpty) return None
          val out = new Array[Byte](bytes.toInt)
          var w = 0
          chunks.foreach { fr =>
            System.arraycopy(fr, 0, out, w, fr.length); w += fr.length
          }
          Multimodal.PcmClip(info.bps, info.channels, signed = true,
            big = false, info.sampleRate.toFloat, bytes / frameBytes, out,
            0, Multimodal.EncPcm)
        }
      Some(clip)
    } catch { case _: Exception => None }
  }

  /** One frame: header (CRC-8-verified), subframes, CRC-16-verified
    * footer. Returns the frame's samples as interleaved LE bytes at the
    * stream's depth; `remaining` is the sample budget left (declared
    * total minus decoded so far; Long.MaxValue for unknown-total
    * streams, where no overrun check is possible). */
  private def decodeFrame(r: BitReader, b: Array[Byte], info: StreamInfo,
      remaining: Long): Array[Byte] = {
    if (!r.atByteBoundary) throw new IllegalStateException("unaligned frame")
    val frameStart = r.bytePos
    if (r.readBits(14) != 0x3ffe)
      throw new IllegalStateException("bad sync")
    r.readBit() // reserved
    r.readBit() // blocking strategy
    val bsCode = r.readBits(4)
    val srCode = r.readBits(4)
    val chanAsgn = r.readBits(4)
    val ssCode = r.readBits(3)
    if (r.readBit() != 0) throw new IllegalStateException("reserved bit")
    readUtf8Number(r)
    val blockSize = bsCode match {
      case 0 => throw new IllegalStateException("reserved block size")
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => r.readBits(8) + 1
      case 7 => r.readBits(16) + 1
      case c => 256 << (c - 8)
    }
    srCode match { // rate comes from STREAMINFO; inline forms consumed
      case 12 => r.readBits(8)
      case 13 | 14 => r.readBits(16)
      case 15 => throw new IllegalStateException("invalid sample rate code")
      case _ => ()
    }
    val bps = ssCode match {
      case 0 => info.bps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => throw new IllegalStateException("reserved sample size")
    }
    if (bps != info.bps)
      throw new IllegalStateException("frame/stream bit-depth mismatch")
    if (!r.atByteBoundary)
      throw new IllegalStateException("header alignment")
    val declaredCrc8 = r.readBits(8)
    if (crc8(b, frameStart, r.bytePos - 1) != declaredCrc8)
      throw new IllegalStateException("frame header crc8")
    val ch = info.channels
    val (nch, decor) = chanAsgn match {
      case a if a <= 7 => (a + 1, 0) // independent
      case 8 => (2, 1) // left/side
      case 9 => (2, 2) // right/side
      case 10 => (2, 3) // mid/side
      case _ => throw new IllegalStateException("reserved channels")
    }
    if (nch != ch) throw new IllegalStateException("channel mismatch")
    if (blockSize > remaining)
      throw new IllegalStateException("frame overruns stream total")
    // Long buffers: a 32-bit stream's side channel carries 33-bit
    // samples, and the decorrelation arithmetic below must not wrap
    val chans = Array.ofDim[Long](nch, blockSize)
    var c = 0
    while (c < nch) {
      // the SIDE channel carries one extra bit of depth, per the spec —
      // for right/side (9) the side channel is stored FIRST (ch 0)
      val sideChan = decor match {
        case 1 | 3 => 1
        case 2 => 0
        case _ => -1
      }
      val eff = bps + (if (c == sideChan) 1 else 0)
      readSubframe(r, blockSize, eff, chans(c))
      c += 1
    }
    r.alignToByte()
    val declaredCrc16 = r.readBits(16)
    if (crc16(b, frameStart, r.bytePos - 2) != declaredCrc16)
      throw new IllegalStateException("frame crc16")
    // undo stereo decorrelation (libFLAC's exact integer reconstruction)
    decor match {
      case 1 => // left/side: R = L − S
        var i = 0
        while (i < blockSize) {
          chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1
        }
      case 2 => // right/side: stored (side, right) → L = R + S
        var i = 0
        while (i < blockSize) {
          val s = chans(0)(i)
          chans(0)(i) = chans(1)(i) + s
          i += 1
        }
      case 3 => // mid/side
        var i = 0
        while (i < blockSize) {
          val s = chans(1)(i)
          var m = chans(0)(i) << 1
          m |= s & 1
          chans(0)(i) = (m + s) >> 1
          chans(1)(i) = (m - s) >> 1
          i += 1
        }
      case _ => ()
    }
    val bySam = bps / 8
    val lo = -(1L << (bps - 1))
    val hi = (1L << (bps - 1)) - 1
    val out = new Array[Byte](blockSize * bySam * nch)
    var i = 0
    var w = 0
    while (i < blockSize) {
      c = 0
      while (c < nch) {
        val v = chans(c)(i)
        if (v < lo || v > hi)
          throw new IllegalStateException("sample out of range")
        var k = 0
        while (k < bySam) {
          out(w) = ((v >> (8 * k)) & 0xff).toByte
          w += 1
          k += 1
        }
        c += 1
      }
      i += 1
    }
    out
  }

  // -------------------------------------------------- fixture generators

  /** Residual block per the channel spec: Rice method (2 bits),
    * partition order (4 bits), then per partition either the Rice param
    * + coded values, or — when `escapeRaw` is set — the escape param and
    * fixed-width raw values. The generator-side inverse of
    * [[readResidual]], covering every branch the decoder has. */
  private def writeResidual(body: BitWriter, c: Chan, order: Int,
      blockSize: Int): Unit = {
    val pBits = if (c.method == 0) 4 else 5
    body.writeBits(c.method, 2)
    body.writeBits(c.po, 4)
    val partitions = 1 << c.po
    require(blockSize % partitions == 0, "block not divisible")
    var idx = 0
    var j = 0
    while (j < partitions) {
      val count = (blockSize >> c.po) - (if (j == 0) order else 0)
      c.escapeRaw match {
        case Some(raw) =>
          body.writeBits((1 << pBits) - 1, pBits) // escape param
          body.writeBits(raw, 5)
          var i = 0
          while (i < count) {
            if (raw > 0)
              body.writeBits(c.residuals(idx) & ((1L << raw) - 1), raw)
            idx += 1; i += 1
          }
        case None =>
          body.writeBits(c.p, pBits)
          var i = 0
          while (i < count) {
            writeRice(body, c.residuals(idx), c.p)
            idx += 1; i += 1
          }
      }
      j += 1
    }
  }

  /** Rice-encode one residual value with parameter `p` (zigzag + unary
    * quotient + p remainder bits) — the generator-side inverse of
    * [[readResidual]]. Long-valued for the 32/33-bit depths. */
  def writeRice(w: BitWriter, v: Long, p: Int): Unit = {
    val u = (v << 1) ^ (v >> 63) // zigzag, exact for any 63-bit value
    val q = (u >>> p).toInt
    var i = 0
    while (i < q) { w.writeBit(0); i += 1 }
    w.writeBit(1)
    if (p > 0) w.writeBits(u & ((1L << p) - 1), p)
  }

  /** One channel's subframe content for the fixture builders. Exactly
    * one of the forms:
    *  - constant: order = -1, warmup = [value], residuals empty
    *  - verbatim: order = -2, warmup = all samples, residuals empty
    *  - FIXED:    order ∈ [0, 4], warmup.length = order
    *  - LPC:      order = warmup.length, lpc = Some((coefs, shift,
    *              precision))
    * `p` is the Rice parameter (partition order 0); `bits` the
    * subframe's effective width (17 for a 16-bit side channel, up to 33
    * for a 32-bit one — hence the Long sample values). */
  final case class Chan(order: Int, warmup: Array[Long],
      residuals: Array[Long], p: Int, bits: Int = 16,
      lpc: Option[(Array[Int], Int, Int)] = None, wasted: Int = 0,
      method: Int = 0, po: Int = 0, escapeRaw: Option[Int] = None)

  /** A complete in-memory FLAC stream: STREAMINFO + one frame with the
    * given channel assignment (`asgn` 0 = mono, 1 = stereo independent,
    * 8/9/10 = left-side / right-side / mid-side — callers pass the
    * STORED channels, e.g. (left, side)), correct CRC-8/16, optionally
    * zero-padded to a fixed byte length (ignored tail — decode stops at
    * STREAMINFO's declared total). The decoder must recover the planted
    * warmup/residual values from the actual bits. */
  def buildFlac(sampleRate: Int, asgn: Int, chans: Seq[Chan],
      blockSizeOpt: Option[Int] = None, padToBytes: Int = 0,
      bps: Int = 16): Array[Byte] = {
    val nch = if (asgn <= 7) asgn + 1 else 2
    require(chans.length == nch, "channel count must match assignment")
    val ssCode = bps match {
      case 8 => 1
      case 12 => 2
      case 16 => 4
      case 20 => 5
      case 24 => 6
      case 32 => 7
      case _ => throw new IllegalArgumentException(s"no ssCode for $bps")
    }
    val blockSize = blockSizeOpt.getOrElse(chans.head match {
      case c if c.order == -2 => c.warmup.length
      case c => c.warmup.length + c.residuals.length
    })
    val head = new BitWriter
    head.writeBits(0x664c6143L, 32) // "fLaC"
    head.writeBit(1) // last metadata block
    head.writeBits(0, 7) // STREAMINFO
    head.writeBits(34, 24)
    head.writeBits(blockSize, 16) // min block size
    head.writeBits(blockSize, 16) // max
    head.writeBits(0, 24) // min frame size (0 = unknown)
    head.writeBits(0, 24)
    head.writeBits(sampleRate, 20)
    head.writeBits(nch - 1, 3)
    head.writeBits(bps - 1, 5)
    head.writeBits(blockSize, 36)
    head.writeBits(0, 64) // decoded-MD5 (unchecked), 16 bytes
    head.writeBits(0, 64)
    val prefix = head.toBytes

    val fh = new BitWriter
    fh.writeBits(0x3ffe, 14) // sync
    fh.writeBit(0) // reserved
    fh.writeBit(0) // fixed block size strategy
    fh.writeBits(7, 4) // block size: 16-bit at end of header
    fh.writeBits(0, 4) // sample rate: from STREAMINFO
    fh.writeBits(asgn, 4)
    fh.writeBits(ssCode, 3)
    fh.writeBit(0)
    fh.writeBits(0, 8) // frame 0 (UTF-8 single byte)
    fh.writeBits(blockSize - 1, 16)
    val fhBytes = fh.toBytes

    val body = new BitWriter
    chans.foreach { c =>
      body.writeBit(0)
      val eff = c.bits - c.wasted
      def mask(v: Long): Long = v & ((1L << eff) - 1)
      def wastedFlag(): Unit =
        if (c.wasted == 0) body.writeBit(0)
        else { // flag 1, then unary-coded (wasted − 1)
          body.writeBit(1)
          var i = 0
          while (i < c.wasted - 1) { body.writeBit(0); i += 1 }
          body.writeBit(1)
        }
      c.order match {
        case -1 => // CONSTANT
          body.writeBits(0, 6)
          wastedFlag()
          body.writeBits(mask(c.warmup.head), eff)
        case -2 => // VERBATIM
          body.writeBits(1, 6)
          wastedFlag()
          c.warmup.foreach(v => body.writeBits(mask(v), eff))
        case o if c.lpc.isEmpty => // FIXED
          body.writeBits(8 | o, 6)
          wastedFlag()
          c.warmup.foreach(v => body.writeBits(mask(v), eff))
          writeResidual(body, c, o, blockSize)
        case o => // LPC
          val (coefs, shift, precision) = c.lpc.get
          body.writeBits(0x20 | (o - 1), 6)
          wastedFlag()
          c.warmup.foreach(v => body.writeBits(mask(v), eff))
          body.writeBits(precision - 1, 4)
          body.writeBits(shift.toLong & 0x1f, 5)
          coefs.foreach(v =>
            body.writeBits(v.toLong & ((1L << precision) - 1), precision))
          writeResidual(body, c, o, blockSize)
      }
    }
    val bodyBytes = body.toBytes

    val frame = new java.io.ByteArrayOutputStream()
    frame.write(fhBytes)
    frame.write(crc8(fhBytes, 0, fhBytes.length))
    frame.write(bodyBytes)
    val framePre = frame.toByteArray
    val c16 = crc16(framePre, 0, framePre.length)
    frame.write((c16 >> 8) & 0xff)
    frame.write(c16 & 0xff)

    val total = prefix.length + frame.size()
    val padded = math.max(total, padToBytes)
    val out = new Array[Byte](padded)
    System.arraycopy(prefix, 0, out, 0, prefix.length)
    System.arraycopy(frame.toByteArray, 0, out, prefix.length, frame.size())
    out // zero tail bytes ignored: decode stops at STREAMINFO's total
  }

  /** Mono FIXED-subframe convenience wrapper (the m20 gate fixture). */
  def buildFlacFixedMono(sampleRate: Int, warmup: Array[Int],
      residuals: Array[Int], order: Int, p: Int,
      padToBytes: Int = 0): Array[Byte] =
    buildFlac(sampleRate, 0, Seq(Chan(order, warmup.map(_.toLong),
      residuals.map(_.toLong), p)), padToBytes = padToBytes)

  /** MULTI-FRAME mono stream: each chunk becomes one FIXED-order-0
    * frame (raw Rice-coded samples) with its own UTF-8-coded frame
    * number and CRCs — the shape every real encoder emits (streams are
    * split into ~4096-sample frames). All chunks but the last must share
    * one block size (the fixed-blocksize strategy's rule). */
  def buildFlacMultiMono(sampleRate: Int, frames: Seq[Array[Int]],
      p: Int): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.nonEmpty))
    require(frames.dropRight(1).map(_.length).distinct.size <= 1,
      "all frames but the last must share a block size")
    val blockSize = frames.head.length
    val total = frames.map(_.length.toLong).sum
    val head = new BitWriter
    head.writeBits(0x664c6143L, 32)
    head.writeBit(1)
    head.writeBits(0, 7)
    head.writeBits(34, 24)
    head.writeBits(frames.map(_.length).min, 16)
    head.writeBits(blockSize, 16)
    head.writeBits(0, 24)
    head.writeBits(0, 24)
    head.writeBits(sampleRate, 20)
    head.writeBits(0, 3)
    head.writeBits(15, 5)
    head.writeBits(total, 36)
    head.writeBits(0, 64)
    head.writeBits(0, 64)
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.toBytes)
    frames.zipWithIndex.foreach { case (samples, idx) =>
      require(idx <= 127, "single-byte UTF-8 frame numbers only")
      val fh = new BitWriter
      fh.writeBits(0x3ffe, 14)
      fh.writeBit(0)
      fh.writeBit(0)
      fh.writeBits(7, 4)
      fh.writeBits(0, 4)
      fh.writeBits(0, 4) // mono
      fh.writeBits(4, 3)
      fh.writeBit(0)
      fh.writeBits(idx, 8)
      fh.writeBits(samples.length - 1, 16)
      val fhBytes = fh.toBytes
      val body = new BitWriter
      body.writeBit(0)
      body.writeBits(8, 6) // FIXED order 0
      body.writeBit(0)
      body.writeBits(0, 2)
      body.writeBits(0, 4)
      body.writeBits(p, 4)
      samples.foreach(v => writeRice(body, v, p))
      val frame = new java.io.ByteArrayOutputStream()
      frame.write(fhBytes)
      frame.write(crc8(fhBytes, 0, fhBytes.length))
      frame.write(body.toBytes)
      val pre = frame.toByteArray
      val c16 = crc16(pre, 0, pre.length)
      frame.write((c16 >> 8) & 0xff)
      frame.write(c16 & 0xff)
      out.write(frame.toByteArray)
    }
    out.toByteArray
  }
}
