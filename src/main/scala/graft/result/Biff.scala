package graft.result

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Binary `.xls` writer: a BIFF8 workbook inside a minimal OLE2 compound
  * file — the real thing, not SpreadsheetML (ref formatters/excel.rb:5-31
  * emits binary BIFF via the writeexcel gem; a strict `.xls` parser expects
  * the OLE2 container). No library exists offline, so both layers are
  * written by hand from the public [MS-XLS] / [MS-CFB] layouts:
  *
  *  - BIFF8 workbook-globals stream (BOF, CODEPAGE 1200, WINDOW1, FONT,
  *    15 style XFs + 1 cell XF, STYLE, BOUNDSHEET, EOF) and one worksheet
  *    stream (BOF, DIMENSIONS, NUMBER for numerics, LABEL with UTF-16
  *    strings for text, BLANK for nulls, EOF).
  *  - OLE2/CFB container with a Root storage + "Workbook" stream; streams
  *    under 4096 bytes go through the mini-FAT/mini-stream as the spec
  *    requires, larger ones through the regular FAT.
  *
  * Driver-side only and axis-sized by construction (same contract as the
  * CSV/JSON formatters — C8).
  */
object Biff {

  /** A complete `.xls` file for a tidy table. */
  def xls(t: Formatters.Tidy, sheetName: String = "aggregation"): Array[Byte] =
    Ole2.compound("Workbook", workbookStream(t, sheetName))

  // ---------------------------------------------------------------- BIFF8

  private def record(id: Int, body: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(id.toShort).putShort(body.length.toShort).put(body)
    b.array()
  }

  private def le16(vs: Int*): Array[Byte] = {
    val b = ByteBuffer.allocate(2 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(v => b.putShort(v.toShort))
    b.array()
  }

  /** BOF: BIFF8 version 0x0600; `dt` 0x0005 globals / 0x0010 worksheet. */
  private def bof(dt: Int): Array[Byte] =
    record(0x0809, le16(0x0600, dt, 0x0DBB, 0x07CC) ++
      Array[Byte](0x41, 0, 0, 0, 0x06, 0, 0, 0)) // fileHistory / lowestVer

  /** XLUnicodeRichExtendedString used by LABEL: cch, grbit(fHighByte=1),
    * UTF-16LE chars. Always two-byte chars — simplest and lossless.
    *
    * NOTE: labels longer than 255 chars are truncated. That is the LABEL
    * (0x0204) record's own cch limit — longer text needs the SST/LABELSST
    * machinery, deliberately out of scope for axis-sized member captions
    * (which are far shorter in practice). Documented, not silent: the cap
    * is asserted in BiffSpec. */
  private def unicodeStr(s: String): Array[Byte] = {
    val cut = if (s.length > 255) s.substring(0, 255) else s
    val chars = cut.getBytes("UTF-16LE")
    val b = ByteBuffer.allocate(3 + chars.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(cut.length.toShort).put(0x01.toByte).put(chars)
    b.array()
  }

  private val cellXf = 15 // first cell XF after the 15 mandatory style XFs

  private def numberCell(row: Int, col: Int, v: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(row.toShort).putShort(col.toShort).putShort(cellXf.toShort)
    b.putDouble(v)
    record(0x0203, b.array())
  }

  private def labelCell(row: Int, col: Int, s: String): Array[Byte] =
    record(0x0204, le16(row, col, cellXf) ++ unicodeStr(s))

  private def blankCell(row: Int, col: Int): Array[Byte] =
    record(0x0201, le16(row, col, cellXf))

  /** One XF record; the first 15 are style XFs (fStyle set), then the
    * default cell XF every cell points at. */
  private def xf(style: Boolean): Array[Byte] = {
    val flags = if (style) 0xFFF5 else 0x0001 // ixfParent 0xFFF / 0, locked
    record(0x00E0, le16(0, 0, flags, 0x0020, 0, 0, 0, 0, 0, 0x20C0))
  }

  private def workbookStream(t: Formatters.Tidy, sheetName: String)
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()

    // ---- worksheet substream (built first: globals need its offset)
    val sheet = new ByteArrayOutputStream()
    val rows = t.headers +: t.rows
    // BIFF8 hard sheet limit: 65,536 rows (row index is a 16-bit field in
    // NUMBER/LABEL/BLANK) — beyond it row.toShort would silently wrap and
    // corrupt the workbook, so fail as a 400 like the FAT-size guard below.
    if (rows.length > 65536)
      graft.model.GraftException.badRequest(
        s"result has ${rows.length - 1} rows; .xls (BIFF8) sheets cap at " +
          "65,535 data rows — use .csv or .jsonrecords")
    val nCols = math.min(t.headers.length, 256) // BIFF8 column limit
    sheet.write(bof(0x0010))
    // DIMENSIONS: rwMic, rwMac(excl), colMic, colMac(excl), reserved
    val dim = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
    dim.putInt(0).putInt(rows.length).putShort(0.toShort)
      .putShort(nCols.toShort).putShort(0.toShort)
    sheet.write(record(0x0200, dim.array()))
    rows.zipWithIndex.foreach { case (r, ri) =>
      r.take(nCols).zipWithIndex.foreach { case (v, ci) =>
        sheet.write(v match {
          case null => blankCell(ri, ci)
          case n: java.lang.Double => numberCell(ri, ci, n)
          case n: java.lang.Float => numberCell(ri, ci, n.toDouble)
          case n: java.lang.Long => numberCell(ri, ci, n.toDouble)
          case n: java.lang.Integer => numberCell(ri, ci, n.toDouble)
          case n: java.lang.Short => numberCell(ri, ci, n.toDouble)
          case n: java.lang.Byte => numberCell(ri, ci, n.toDouble)
          case n: java.math.BigDecimal => numberCell(ri, ci, n.doubleValue)
          case other => labelCell(ri, ci, String.valueOf(other))
        })
      }
    }
    sheet.write(record(0x000A, Array.emptyByteArray)) // EOF
    val sheetBytes = sheet.toByteArray

    // ---- workbook globals
    val globals = new ByteArrayOutputStream()
    globals.write(bof(0x0005))
    globals.write(record(0x0042, le16(1200))) // CODEPAGE: UTF-16
    globals.write(record(0x003D, // WINDOW1: default frame
      le16(0x0168, 0x001F, 0x3A5C, 0x23C1, 0x0038, 0, 0, 1, 0x0258)))
    // FONT: height 200 (10pt), plain, black, "Arial" (ShortXLUnicodeString)
    globals.write(record(0x0031,
      le16(200, 0, 0x7FFF, 400, 0) ++ Array[Byte](0, 0, 0, 0) ++
        Array[Byte](5, 1) ++ "Arial".getBytes("UTF-16LE")))
    (0 until 15).foreach(_ => globals.write(xf(style = true)))
    globals.write(xf(style = false))
    globals.write(record(0x0293, le16(0x8000, 0xFF00))) // STYLE: Normal
    val bsName = {
      val cut = if (sheetName.length > 31) sheetName.take(31) else sheetName
      val b = ByteBuffer.allocate(2 + cut.getBytes("UTF-16LE").length)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(cut.length.toByte).put(0x01.toByte).put(cut.getBytes("UTF-16LE"))
      b.array()
    }
    // BOUNDSHEET's stream position field is patched once sizes are known
    val bsPrefix = ByteBuffer.allocate(6).order(ByteOrder.LITTLE_ENDIAN)
    bsPrefix.putInt(0).putShort(0.toShort) // lbPlyPos placeholder; visible sheet
    val boundsheet = record(0x0085, bsPrefix.array() ++ bsName)
    globals.write(boundsheet)
    globals.write(record(0x000A, Array.emptyByteArray)) // EOF
    val globalsBytes = globals.toByteArray

    // patch lbPlyPos: worksheet BOF sits right after the globals substream
    val boundsheetOffset = globalsBytes.length - boundsheet.length - 4
    val patched = ByteBuffer.wrap(globalsBytes).order(ByteOrder.LITTLE_ENDIAN)
    patched.putInt(boundsheetOffset + 4, globalsBytes.length)

    out.write(globalsBytes)
    out.write(sheetBytes)
    out.toByteArray
  }

  // ------------------------------------------------------------- OLE2/CFB

  /** Minimal [MS-CFB] compound file: Root storage + one stream. Streams
    * < 4096 bytes live in the mini-stream (64-byte mini-sectors, mini-FAT),
    * as the spec mandates; larger streams chain through the regular FAT. */
  private object Ole2 {
    private val SectorSize = 512
    private val MiniSize = 64
    private val MiniCutoff = 4096
    private val ENDOFCHAIN = 0xFFFFFFFE
    private val FATSECT = 0xFFFFFFFD
    private val FREESECT = 0xFFFFFFFF
    private val NOSTREAM = 0xFFFFFFFF

    private def pad(b: Array[Byte], unit: Int): Array[Byte] =
      if (b.length % unit == 0) b
      else b ++ new Array[Byte](unit - b.length % unit)

    /** 128-byte directory entry; empty name = a free entry. */
    private def dirEntry(name: String, objType: Int, startSector: Int,
        size: Long, child: Int = NOSTREAM): Array[Byte] = {
      val b = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
      val utf16 = name.getBytes("UTF-16LE")
      b.put(utf16)
      b.position(64)
      b.putShort( // name length incl UTF-16 terminator; 0 marks a free entry
        (if (name.isEmpty) 0 else utf16.length + 2).toShort)
      b.put(objType.toByte)
      b.put(0x01.toByte) // color: black
      b.putInt(NOSTREAM) // left sibling
      b.putInt(NOSTREAM) // right sibling
      b.putInt(child)
      b.position(116)
      b.putInt(startSector)
      b.putLong(size)
      b.array()
    }

    def compound(streamName: String, stream: Array[Byte]): Array[Byte] = {
      val useMini = stream.length < MiniCutoff
      // sector plan (all regular sectors, in file order after the header):
      //   [FAT sector] [directory sector] [miniFAT sector?] [data sectors...]
      val dataBytes =
        if (useMini) pad(pad(stream, MiniSize), SectorSize) // ministream
        else pad(stream, SectorSize)
      val nDataSectors = dataBytes.length / SectorSize
      val nMiniFatSectors = if (useMini) 1 else 0
      val entriesPerFat = SectorSize / 4
      // nFat FAT sectors must cover themselves + directory + miniFAT + data;
      // the header DIFAT holds up to 109 FAT sectors (~7 MB file) — far above
      // any axis-sized result (BIFF8 caps sheets at 64K rows anyway)
      val nFat = Iterator.from(1)
        .find(n => n * entriesPerFat >= n + 1 + nMiniFatSectors + nDataSectors)
        .get
      require(nFat <= 109, s".xls payload too large: $nFat FAT sectors")
      val dirSector = nFat
      val miniFatSector = if (useMini) nFat + 1 else -1
      val dataStart = nFat + 1 + nMiniFatSectors

      val fat = ByteBuffer.allocate(nFat * SectorSize)
        .order(ByteOrder.LITTLE_ENDIAN)
      (0 until nFat * entriesPerFat).foreach(_ => fat.putInt(FREESECT))
      (0 until nFat).foreach(s => fat.putInt(s * 4, FATSECT))
      fat.putInt(dirSector * 4, ENDOFCHAIN)
      if (useMini) fat.putInt(miniFatSector * 4, ENDOFCHAIN)
      (0 until nDataSectors).foreach { i =>
        val s = dataStart + i
        fat.putInt(s * 4,
          if (i == nDataSectors - 1) ENDOFCHAIN else s + 1)
      }

      // directory: Root (owns the ministream when used) + the stream entry
      val rootStart = if (useMini) dataStart else ENDOFCHAIN
      val rootSize = if (useMini) dataBytes.length.toLong else 0L
      val streamStart = if (useMini) 0 else dataStart // mini-sector 0 / sector
      val dir = new ByteArrayOutputStream()
      dir.write(dirEntry("Root Entry", 5, rootStart, rootSize, child = 1))
      dir.write(dirEntry(streamName, 2, streamStart, stream.length.toLong))
      dir.write(dirEntry("", 0, 0, 0)) // free
      dir.write(dirEntry("", 0, 0, 0)) // free
      val dirBytes = pad(dir.toByteArray, SectorSize)

      // mini-FAT: chain of 64-byte mini-sectors inside the ministream
      val miniFatBytes = if (useMini) {
        val nMini = (stream.length + MiniSize - 1) / MiniSize
        val mf = ByteBuffer.allocate(SectorSize).order(ByteOrder.LITTLE_ENDIAN)
        (0 until SectorSize / 4).foreach(_ => mf.putInt(FREESECT))
        (0 until nMini).foreach(i =>
          mf.putInt(i * 4, if (i == nMini - 1) ENDOFCHAIN else i + 1))
        mf.array()
      } else Array.emptyByteArray

      // header
      val h = ByteBuffer.allocate(SectorSize).order(ByteOrder.LITTLE_ENDIAN)
      h.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
        .map(_.toByte))
      h.position(24)
      h.putShort(0x003E.toShort) // minor version
      h.putShort(0x0003.toShort) // major version 3 (512-byte sectors)
      h.putShort(0xFFFE.toShort) // little-endian
      h.putShort(9.toShort) // sector shift
      h.putShort(6.toShort) // mini sector shift
      h.position(44)
      h.putInt(nFat) // number of FAT sectors
      h.putInt(dirSector) // directory start
      h.putInt(0) // transaction signature
      h.putInt(MiniCutoff) // mini stream cutoff
      h.putInt(if (useMini) miniFatSector else ENDOFCHAIN) // miniFAT start
      h.putInt(nMiniFatSectors) // number of miniFAT sectors
      h.putInt(ENDOFCHAIN) // DIFAT start (all in header)
      h.putInt(0) // number of DIFAT sectors
      (0 until nFat).foreach(h.putInt) // DIFAT: the FAT sector ids
      (nFat until 109).foreach(_ => h.putInt(FREESECT))

      val out = new ByteArrayOutputStream()
      out.write(h.array())
      out.write(fat.array())
      out.write(dirBytes)
      if (useMini) out.write(miniFatBytes)
      out.write(dataBytes)
      out.toByteArray
    }
  }
}
