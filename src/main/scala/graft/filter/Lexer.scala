package graft.filter

/** Tokenizer for the filter DSL (reference filter-lexer.c:211-296).
  *
  * Word characters include `.`, `/` and `:` so IPv4/IPv6/CIDR/MAC literals
  * lex as single words and are classified afterwards, exactly like the
  * reference (MAC first, then keyword, then int/range, else free-form ID).
  */
object Lexer {

  sealed trait Token
  case object LParen extends Token
  case object RParen extends Token
  case object Comma  extends Token
  /** Quoted 'string' literal. */
  final case class StrTok(s: String)            extends Token
  /** Number or `lo-hi` range; strtol base-0 semantics (0x hex, 0 octal). */
  final case class IntRangeTok(lo: Long, hi: Long) extends Token
  final case class MacTok(bytes: Array[Byte])   extends Token
  /** Keyword (case-insensitive match happens in the parser) or free ID
    * (ip address, cidr, list name...). */
  final case class Word(s: String)              extends Token
  case object End extends Token

  private def isIdSym(c: Char): Boolean =
    c.isLetterOrDigit || c == '.' || c == '/' || c == ':' || c == '-' ||
      c == '_'

  /** strtol(s, base 0) prefix parse; returns (value, rest) or None. */
  private def strtol(s: String): Option[(Long, String)] = {
    var i = 0
    var neg = false
    if (i < s.length && (s(i) == '+' || s(i) == '-')) {
      neg = s(i) == '-'; i += 1
    }
    if (i >= s.length || !s(i).isDigit) return None
    var radix = 10
    if (s(i) == '0' && i + 1 < s.length &&
        (s(i + 1) == 'x' || s(i + 1) == 'X')) {
      radix = 16; i += 2
    } else if (s(i) == '0' && i + 1 < s.length && s(i + 1).isDigit) {
      radix = 8; i += 1
    }
    val start = i
    while (i < s.length && Character.digit(s(i), radix) >= 0) i += 1
    if (i == start) return None
    // a literal wider than Long is a malformed token, not an exception
    // (the config file is user input; the DSL contract is Left(error))
    val v =
      try java.lang.Long.parseLong(s.substring(start, i), radix)
      catch { case _: NumberFormatException => return None }
    Some((if (neg) -v else v, s.substring(i)))
  }

  private[filter] def parseMac(s: String): Option[Array[Byte]] = {
    val parts = s.split(":", -1)
    if (parts.length != 6) return None
    val out = new Array[Byte](6)
    var i = 0
    while (i < 6) {
      val p = parts(i)
      if (p.isEmpty || p.length > 2 ||
          !p.forall(c => Character.digit(c, 16) >= 0)) return None
      out(i) = Integer.parseInt(p, 16).toByte
      i += 1
    }
    Some(out)
  }

  /** Classify a word: MAC beats keyword beats int/range beats free ID,
    * in reference order (filter-lexer.c:258-296). */
  private def classify(w: String): Token =
    parseMac(w) match {
      case Some(mac) => MacTok(mac)
      case None =>
        strtol(w) match {
          case Some((v, "")) => IntRangeTok(v, v)
          case Some((lo, rest)) if rest.startsWith("-") =>
            strtol(rest.substring(1)) match {
              case Some((hi, "")) => IntRangeTok(lo, hi)
              case _              => Word(w)
            }
          case _ => Word(w)
        }
    }

  def tokenize(input: String): Either[String, Vector[Token]] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LParen; i += 1 }
      else if (c == ')') { out += RParen; i += 1 }
      else if (c == ',') { out += Comma; i += 1 }
      else if (c == '\'') {
        val end = input.indexOf('\'', i + 1)
        if (end < 0) return Left(s"Unterminated string at offset $i")
        out += StrTok(input.substring(i + 1, end))
        i = end + 1
      } else if (isIdSym(c)) {
        val start = i
        while (i < n && isIdSym(input(i))) i += 1
        out += classify(input.substring(start, i))
      } else {
        return Left(s"Unexpected character '$c' at offset $i")
      }
    }
    out += End
    Right(out.result())
  }
}
