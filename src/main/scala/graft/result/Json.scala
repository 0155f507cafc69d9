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
    case bd: BigDecimal => sb.append(bd.toString)
    case other => str(String.valueOf(other), sb)
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
