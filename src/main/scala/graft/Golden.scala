package graft

/** Minimal reader for the golden-fixture JSON written by
  * tools/gen_golden.py — handles the Python json module's non-standard
  * `Infinity` / `-Infinity` / `NaN` tokens.
  */
object Golden {
  final case class Table(columns: Vector[String], rows: Vector[Vector[Any]])

  def load(name: String): Table = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    require(in != null, s"missing golden fixture $name")
    val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    parse(text)
  }

  private def parse(s: String): Table = {
    var i = 0
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def expect(c: Char): Unit = { skipWs(); require(s(i) == c, s"expected $c at $i got ${s(i)}"); i += 1 }
    def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c => sb += c
          }
        } else sb += s(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    def parseValue(): Any = {
      skipWs()
      s(i) match {
        case '"' => parseString()
        case '[' =>
          i += 1
          val buf = Vector.newBuilder[Any]
          skipWs()
          if (s(i) == ']') { i += 1; buf.result() }
          else {
            var done = false
            while (!done) {
              buf += parseValue()
              skipWs()
              if (s(i) == ',') i += 1 else { expect(']'); done = true }
            }
            buf.result()
          }
        case _ =>
          if (s.startsWith("null", i)) { i += 4; null }
          else if (s.startsWith("true", i)) { i += 4; java.lang.Boolean.TRUE }
          else if (s.startsWith("false", i)) { i += 5; java.lang.Boolean.FALSE }
          else if (s.startsWith("Infinity", i)) { i += 8; Double.PositiveInfinity }
          else if (s.startsWith("-Infinity", i)) { i += 9; Double.NegativeInfinity }
          else if (s.startsWith("NaN", i)) { i += 3; Double.NaN }
          else {
            val start = i
            while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
            s.substring(start, i).toDouble
          }
      }
    }
    expect('{')
    var columns = Vector.empty[String]
    var rows = Vector.empty[Vector[Any]]
    var done = false
    while (!done) {
      skipWs()
      val key = parseString()
      expect(':')
      val v = parseValue()
      key match {
        case "columns" => columns = v.asInstanceOf[Vector[Any]].map(_.toString)
        case "rows" => rows = v.asInstanceOf[Vector[Any]].map(_.asInstanceOf[Vector[Any]])
      }
      skipWs()
      if (s(i) == ',') i += 1 else { expect('}'); done = true }
    }
    Table(columns, rows)
  }

  /** Relative/absolute tolerance compare treating NaN == NaN and
    * requiring exact equality of infinities.
    */
  def approxEq(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    if (a.isNaN && b.isNaN) true
    else if (a.isInfinite || b.isInfinite) a == b
    else math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))
}
