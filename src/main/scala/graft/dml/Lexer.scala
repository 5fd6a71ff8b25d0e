package graft.dml

/** Tokenizer for the DSL. Terminal inventory mirrors the reference grammar
  * (reference/dsl/parser.py:13-136): CNAME, SIGNED_NUMBER (sign folded into
  * the token by longest-match, like Lark), ESCAPED_STRING (double-quoted,
  * backslash escapes), SINGLE_QUOTED_STRING ('' doubling, parser.py:135),
  * and the punctuation the grammars admit. Keywords are NOT reserved at lex
  * time — the parser matches them contextually by text, reproducing Lark's
  * LALR contextual lexer (which is why `(SELECT * FROM t) predict_alias`
  * works: FROM inside the source clause lexes as a plain NAME).
  */
object Lexer {
  sealed trait Token { def start: Int; def end: Int; def text: String }
  final case class TName(text: String, start: Int, end: Int) extends Token
  final case class TNumber(text: String, start: Int, end: Int) extends Token
  /** raw includes the surrounding double quotes */
  final case class TDString(text: String, start: Int, end: Int) extends Token
  /** raw includes the surrounding single quotes */
  final case class TSString(text: String, start: Int, end: Int) extends Token
  final case class TSym(text: String, start: Int, end: Int) extends Token
  final case class TEof(start: Int, end: Int) extends Token { def text = "<EOF>" }

  private val twoCharSyms = Seq("!=", "<>", "<=", ">=")
  private val oneCharSyms = ".,()[]{}*+-/%=<>:".toSet

  def lex(input: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = input.length
    def isDigit(c: Char) = c >= '0' && c <= '9'
    def isNameStart(c: Char) = c == '_' || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    def isNamePart(c: Char) = isNameStart(c) || isDigit(c)

    while (i < n) {
      val c = input.charAt(i)
      if (c.isWhitespace) { i += 1 }
      else if (isNameStart(c)) {
        val s = i
        while (i < n && isNamePart(input.charAt(i))) i += 1
        out += TName(input.substring(s, i), s, i)
      } else if (isDigit(c) || (c == '.' && i + 1 < n && isDigit(input.charAt(i + 1))) ||
                 ((c == '+' || c == '-') && i + 1 < n &&
                  (isDigit(input.charAt(i + 1)) ||
                   (input.charAt(i + 1) == '.' && i + 2 < n && isDigit(input.charAt(i + 2)))))) {
        // SIGNED_NUMBER, longest-match: sign folded in when contiguous,
        // matching Lark's behavior for `alpha=-0.1` (test_parser.py:343-349).
        val s = i
        if (c == '+' || c == '-') i += 1
        while (i < n && isDigit(input.charAt(i))) i += 1
        if (i < n && input.charAt(i) == '.') {
          i += 1
          while (i < n && isDigit(input.charAt(i))) i += 1
        }
        if (i < n && (input.charAt(i) == 'e' || input.charAt(i) == 'E')) {
          val mark = i
          i += 1
          if (i < n && (input.charAt(i) == '+' || input.charAt(i) == '-')) i += 1
          if (i < n && isDigit(input.charAt(i))) {
            while (i < n && isDigit(input.charAt(i))) i += 1
          } else i = mark // not an exponent; leave 'e' for the next token
        }
        out += TNumber(input.substring(s, i), s, i)
      } else if (c == '"') {
        val s = i
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = input.charAt(i)
          if (ch == '\\') i += 2
          else if (ch == '"') { closed = true; i += 1 }
          else i += 1
        }
        if (!closed) throw new ParseException(s"unterminated string at offset $s")
        out += TDString(input.substring(s, i), s, i)
      } else if (c == '\'') {
        val s = i
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (input.charAt(i) == '\'') {
            if (i + 1 < n && input.charAt(i + 1) == '\'') i += 2 // '' doubling
            else { closed = true; i += 1 }
          } else i += 1
        }
        if (!closed) throw new ParseException(s"unterminated string at offset $s")
        out += TSString(input.substring(s, i), s, i)
      } else {
        val two = if (i + 2 <= n) input.substring(i, i + 2) else ""
        if (twoCharSyms.contains(two)) { out += TSym(two, i, i + 2); i += 2 }
        else if (oneCharSyms.contains(c)) { out += TSym(c.toString, i, i + 1); i += 1 }
        else throw new ParseException(s"unexpected character '$c' at offset $i")
      }
    }
    out += TEof(n, n)
    out.result()
  }
}
