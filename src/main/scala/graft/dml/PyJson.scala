package graft.dml

/** Python-`json.dumps`-compatible serialization for Value trees.
  *
  * The reference serializes algorithm params / split ratios / checkpoint
  * payloads with default json.dumps (parser.py:781-841): ensure_ascii=True,
  * separators (", ", ": "), dict insertion order. The emitted SQL is part of
  * the tested contract, so byte-compatibility matters.
  */
object PyJson {
  import Value._

  def dumps(v: Value): String = v match {
    case VInt(i)   => i.toString
    // json.dumps spells non-finite floats NaN/Infinity (repr() says
    // nan/inf — that casing belongs to pyStr contexts, not JSON)
    case VFloat(f) if f.isNaN      => "NaN"
    case VFloat(f) if f.isInfinity => if (f > 0) "Infinity" else "-Infinity"
    case VFloat(f) => Value.pyFloatRepr(f)
    case VStr(s)   => dumpString(s)
    case VList(items) => items.map(dumps).mkString("[", ", ", "]")
    case VDict(es) =>
      es.map { case (k, value) => s"${dumpString(k)}: ${dumps(value)}" }
        .mkString("{", ", ", "}")
  }

  def dumps(entries: List[(String, Value)]): String = dumps(VDict(entries))

  /** Parse a flat `{"k": num, …}` object produced by [[dumps]] (e.g. the
    * registry's metrics_json) back into a double map. Not a general JSON
    * parser — flat numeric objects only, which is all the registry writes. */
  def parseFlatDoubleMap(json: String): Map[String, Double] = {
    val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*(-?(?:[0-9.eE+\-]+|nan|inf|Infinity|NaN))""".r
    pair.findAllMatchIn(json).map { m =>
      val v = m.group(2) match {
        case "nan" | "NaN"            => Double.NaN
        case "inf" | "Infinity"       => Double.PositiveInfinity
        case "-inf" | "-Infinity"     => Double.NegativeInfinity
        case n                        => n.toDouble
      }
      loadString("\"" + m.group(1) + "\"") -> v
    }.toMap
  }

  /** JSON string literal exactly like json.dumps(str): standard escapes,
    * non-ASCII to \\uXXXX. */
  def dumpString(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case '\b' => b.append("\\b")
      case '\f' => b.append("\\f")
      case c if c < 0x20 || c > 0x7e => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  /** Decode a JSON string token body (the reference uses json.loads on the
    * raw double-quoted token, parser.py:299-300). `raw` includes quotes. */
  def loadString(raw: String): String = {
    require(raw.length >= 2 && raw.head == '"' && raw.last == '"',
      s"not a JSON string: $raw")
    val s = raw.substring(1, raw.length - 1)
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') {
        if (i + 1 >= s.length)
          throw new ParseException(s"bad escape in string: $raw")
        s.charAt(i + 1) match {
          case '"'  => b.append('"');  i += 2
          case '\\' => b.append('\\'); i += 2
          case '/'  => b.append('/');  i += 2
          case 'n'  => b.append('\n'); i += 2
          case 'r'  => b.append('\r'); i += 2
          case 't'  => b.append('\t'); i += 2
          case 'b'  => b.append('\b'); i += 2
          case 'f'  => b.append('\f'); i += 2
          case 'u' =>
            if (i + 6 > s.length)
              throw new ParseException(s"bad \\u escape in string: $raw")
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other =>
            throw new ParseException(s"invalid escape \\$other in string: $raw")
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
}

/** Syntax errors — the analog of lark.exceptions.LarkError. Semantic
  * validation errors (Python ValueError) use IllegalArgumentException. */
class ParseException(msg: String) extends RuntimeException(msg)
