package graft.result

/** Minimal dependency-free JSON writer (the repo has no JSON library and the
  * environment is offline by design). Values: null, Boolean, numbers, String,
  * Seq, Map (insertion-ordered), plus java.sql.{Date,Timestamp}. */
object Json {

  def write(v: Any): String = {
    val sb = new StringBuilder
    w(v, sb)
    sb.toString()
  }

  private def w(v: Any, sb: StringBuilder): Unit = v match {
    case null | None => sb.append("null")
    case Some(x) => w(x, sb)
    case s: String => str(s, sb)
    case b: Boolean => sb.append(if (b) "true" else "false")
    case d: Double =>
      if (d.isNaN || d.isInfinite) sb.append("null") else sb.append(d.toString)
    case f: Float => w(f.toDouble, sb)
    case n: Number => sb.append(n.toString)
    case m: scala.collection.Map[_, _] =>
      sb.append('{')
      var first = true
      m.foreach { case (k, x) =>
        if (!first) sb.append(',')
        first = false
        str(String.valueOf(k), sb); sb.append(':'); w(x, sb)
      }
      sb.append('}')
    case xs: Iterable[_] =>
      sb.append('[')
      var first = true
      xs.foreach { x =>
        if (!first) sb.append(',')
        first = false
        w(x, sb)
      }
      sb.append(']')
    case arr: Array[_] => w(arr.toSeq, sb)
    case d: java.sql.Date => str(d.toString, sb)
    case t: java.sql.Timestamp => str(t.toString, sb)
    // (scala.BigDecimal extends java.lang.Number — covered above)
    case other => str(String.valueOf(other), sb)
  }

  /** Parse JSON → Map[String, Any] (ListMap, insertion-ordered) / Seq[Any] /
    * String / Long / Double / Boolean / null. Throws IllegalArgumentException
    * on malformed input. */
  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing content at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!eof && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def expect(c: Char): Unit = {
      skipWs()
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }
    private def peek: Char = { skipWs(); require(!eof, "unexpected end"); s.charAt(pos) }

    def value(): Any = peek match {
      case '{' =>
        expect('{')
        val m = scala.collection.immutable.ListMap.newBuilder[String, Any]
        if (peek == '}') { pos += 1; return m.result() }
        var done = false
        while (!done) {
          val k = string()
          expect(':')
          m += k -> value()
          peek match {
            case ',' => pos += 1
            case '}' => pos += 1; done = true
            case c => throw new IllegalArgumentException(s"expected , or } got '$c' at $pos")
          }
        }
        m.result()
      case '[' =>
        expect('[')
        val b = Vector.newBuilder[Any]
        if (peek == ']') { pos += 1; return b.result() }
        var done = false
        while (!done) {
          b += value()
          peek match {
            case ',' => pos += 1
            case ']' => pos += 1; done = true
            case c => throw new IllegalArgumentException(s"expected , or ] got '$c' at $pos")
          }
        }
        b.result()
      case '"' => string()
      case 't' => lit("true", true)
      case 'f' => lit("false", false)
      case 'n' => lit("null", null)
      case _ => number()
    }

    private def lit(word: String, v: Any): Any = {
      skipWs()
      require(s.startsWith(word, pos), s"bad literal at $pos")
      pos += word.length
      v
    }

    private def number(): Any = {
      skipWs()
      val start = pos
      if (!eof && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      var isDouble = false
      while (!eof && (s.charAt(pos).isDigit || "eE+-.".contains(s.charAt(pos)))) {
        if (".eE".contains(s.charAt(pos))) isDouble = true
        pos += 1
      }
      val t = s.substring(start, pos)
      require(t.nonEmpty, s"bad number at $start")
      if (isDouble) t.toDouble else t.toLong
    }

    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16)
                .toChar)
              pos += 4
            case other => throw new IllegalArgumentException(
              s"bad escape '\\$other' at $pos")
          }
        } else sb.append(c)
        pos += 1
      }
      pos += 1
      sb.result()
    }
  }

  private def str(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
