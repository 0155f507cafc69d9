package graft

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite
import graft.result.{Biff, Formatters}

/** Structural validation of the hand-written binary .xls: an independent
  * mini CFB/BIFF reader walks the OLE2 container (header, DIFAT, FAT,
  * directory, mini-FAT) exactly as a strict parser would, extracts the
  * Workbook stream, and checks the BIFF record grammar + cell values. */
class BiffSpec extends AnyFunSuite {

  private val ENDOFCHAIN = 0xFFFFFFFE

  /** Extract a named stream by walking the compound file structures. */
  private def stream(file: Array[Byte], name: String): Array[Byte] = {
    val b = ByteBuffer.wrap(file).order(ByteOrder.LITTLE_ENDIAN)
    assert(b.getLong(0) == 0xE11AB1A1E011CFD0L, "OLE2 magic")
    assert(b.getShort(28) == 0xFFFE.toShort, "little-endian marker")
    val sectorSize = 1 << b.getShort(30)
    val miniSize = 1 << b.getShort(32)
    val nFat = b.getInt(44)
    val dirStart = b.getInt(48)
    val miniCutoff = b.getInt(56)
    val miniFatStart = b.getInt(60)
    def sector(i: Int): Array[Byte] =
      file.slice(512 + i * sectorSize, 512 + (i + 1) * sectorSize)
    val fat: IndexedSeq[Int] = (0 until nFat).map(i => b.getInt(76 + 4 * i))
      .flatMap { s =>
        val sb = ByteBuffer.wrap(sector(s)).order(ByteOrder.LITTLE_ENDIAN)
        (0 until sectorSize / 4).map(_ => sb.getInt)
      }
    def chain(start: Int): Seq[Int] =
      Iterator.iterate(start)(fat(_)).takeWhile(_ != ENDOFCHAIN).toSeq
    val dirBytes = chain(dirStart).flatMap(sector).toArray
    case class Entry(name: String, objType: Int, start: Int, size: Long)
    val entries = dirBytes.grouped(128).filter(_.length == 128).map { e =>
      val eb = ByteBuffer.wrap(e).order(ByteOrder.LITTLE_ENDIAN)
      val nameLen = eb.getShort(64)
      val nm = if (nameLen >= 2)
        new String(e, 0, nameLen - 2, "UTF-16LE") else ""
      Entry(nm, e(66), eb.getInt(116), eb.getLong(120))
    }.toSeq
    val root = entries.head
    assert(root.name == "Root Entry" && root.objType == 5)
    val target = entries.find(_.name == name)
      .getOrElse(fail(s"stream '$name' not in directory: ${entries.map(_.name)}"))
    assert(target.objType == 2) // stream
    if (target.size < miniCutoff) {
      // spec-mandated path for small streams: ministream via root + mini-FAT
      val ministream = chain(root.start).flatMap(sector).toArray
      val miniFat: IndexedSeq[Int] = chain(miniFatStart).flatMap(sector)
        .grouped(4).map(g => ByteBuffer.wrap(g.toArray)
          .order(ByteOrder.LITTLE_ENDIAN).getInt).toIndexedSeq
      val minis = Iterator.iterate(target.start)(miniFat(_))
        .takeWhile(_ != ENDOFCHAIN).toSeq
      minis.flatMap(i => ministream.slice(i * miniSize, (i + 1) * miniSize))
        .take(target.size.toInt).toArray
    } else
      chain(target.start).flatMap(sector).take(target.size.toInt).toArray
  }

  /** Parse BIFF records into (id, body) pairs. */
  private def records(wb: Array[Byte]): Seq[(Int, Array[Byte])] = {
    val out = Seq.newBuilder[(Int, Array[Byte])]
    var p = 0
    while (p + 4 <= wb.length) {
      val b = ByteBuffer.wrap(wb, p, 4).order(ByteOrder.LITTLE_ENDIAN)
      val id = b.getShort & 0xFFFF
      val len = b.getShort & 0xFFFF
      out += ((id, wb.slice(p + 4, p + 4 + len)))
      p += 4 + len
    }
    assert(p == wb.length, "records must tile the stream exactly")
    out.result()
  }

  private def cells(wb: Array[Byte])
      : (Map[(Int, Int), Double], Map[(Int, Int), String]) = {
    val recs = records(wb)
    val nums = recs.collect { case (0x0203, body) =>
      val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      ((b.getShort(0).toInt, b.getShort(2).toInt), b.getDouble(6))
    }.toMap
    val labels = recs.collect { case (0x0204, body) =>
      val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      val cch = b.getShort(6).toInt
      assert(body(8) == 0x01, "fHighByte: UTF-16 chars")
      ((b.getShort(0).toInt, b.getShort(2).toInt),
        new String(body, 9, cch * 2, "UTF-16LE"))
    }.toMap
    (nums, labels)
  }

  private def checkGrammar(wb: Array[Byte]): Unit = {
    val recs = records(wb)
    assert(recs.head._1 == 0x0809, "starts with BOF")
    assert(ByteBuffer.wrap(recs.head._2).order(ByteOrder.LITTLE_ENDIAN)
      .getShort(0) == 0x0600.toShort, "BIFF8 version")
    assert(recs.count { case (id, _) => id == 0x0809 } == 2,
      "globals + one worksheet substream")
    assert(recs.count { case (id, _) => id == 0x000A } == 2, "two EOFs")
    assert(recs.count { case (id, _) => id == 0x00E0 } == 16,
      "15 style XFs + 1 cell XF")
    // BOUNDSHEET's lbPlyPos points exactly at the worksheet BOF
    val bs = recs.find { case (id, _) => id == 0x0085 }.get._2
    val plyPos = ByteBuffer.wrap(bs).order(ByteOrder.LITTLE_ENDIAN).getInt(0)
    val sheetBof = ByteBuffer.wrap(wb, plyPos, 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    assert((sheetBof.getShort & 0xFFFF) == 0x0809, "lbPlyPos -> BOF")
  }

  test("small .xls (mini-stream path) round-trips structure and values") {
    val tidy = Formatters.Tidy(
      Seq("ID Region", "Region", "Revenue"),
      Seq(Seq(0L, "AFRICA", 1.5), Seq(1L, "AMERICA", null),
        Seq(2L, "ünïcode", -3.25)))
    val file = Biff.xls(tidy)
    val wb = stream(file, "Workbook")
    assert(wb.length < 4096) // exercises the mini-FAT path
    checkGrammar(wb)
    val (nums, labels) = cells(wb)
    assert(labels((0, 0)) == "ID Region" && labels((0, 2)) == "Revenue")
    assert(labels((1, 1)) == "AFRICA" && labels((3, 1)) == "ünïcode")
    assert(nums((1, 0)) == 0.0 && nums((1, 2)) == 1.5 && nums((3, 2)) == -3.25)
    assert(!nums.contains((2, 2)) && !labels.contains((2, 2))) // null = BLANK
    val blanks = records(wb).collect { case (0x0201, b) =>
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      (bb.getShort(0).toInt, bb.getShort(2).toInt)
    }
    assert(blanks == Seq((2, 2)))
  }

  test("large .xls (regular-FAT path, multiple FAT sectors) round-trips") {
    val rows = (0 until 4000).map(i => Seq(i.toLong, s"row $i", i * 0.5))
    val file = Biff.xls(Formatters.Tidy(Seq("id", "label", "v"), rows))
    val wb = stream(file, "Workbook")
    assert(wb.length >= 4096) // regular FAT chain, >1 FAT sector territory
    checkGrammar(wb)
    val (nums, labels) = cells(wb)
    assert(labels((4000, 1)) == "row 3999")
    assert(nums((4000, 2)) == 3999 * 0.5)
    assert(nums.size == 2 * 4000) // id + v per data row
    assert(labels.size == 4000 + 3) // one label per row + 3 headers
  }

  test("rows beyond the BIFF8 65,536-row sheet limit fail as a 400") {
    // row index is 16-bit in NUMBER/LABEL/BLANK; silently wrapping would
    // corrupt the workbook, so the writer must refuse instead
    val rows = (0 until 65536).map(i => Seq(i.toLong))
    val e = intercept[graft.model.GraftException](
      Biff.xls(Formatters.Tidy(Seq("id"), rows)))
    assert(e.status == 400)
    assert(e.getMessage.contains("65,535"))
    // exactly at the cap (65,535 data rows + header) still writes
    val ok = Biff.xls(Formatters.Tidy(Seq("id"),
      (0 until 65535).map(i => Seq(i.toLong))))
    checkGrammar(stream(ok, "Workbook"))
  }
}
