package graft.serving

/** Graphite-style render-target expression language — the query-time
  * function surface a Graphite-stack user composes on top of the storage
  * engine (`scale(sumSeries(servers.*.cpu),0.5)`). The reference stores
  * and serves raw series (kenshin/storage.py fetch; rurouni cache query)
  * and leaves function evaluation to graphite-web's render endpoint; here
  * the same language is parsed and compiled onto DataFrame plans so the
  * functions run distributed instead of on a single web worker.
  *
  * Grammar (whitespace-insensitive):
  * {{{
  *   expr  := call | path | number | string
  *   call  := ident '(' [ expr (',' expr)* ] ')'
  *   path  := graphite metric glob (dots, '*', '?', '[...]', '{a,b}')
  * }}}
  * An identifier immediately followed by '(' is a call; any other bare
  * token is a number if it parses as one, else a series path glob. Commas
  * inside '{...}' / '[...]' belong to the glob, not the argument list.
  */
sealed trait TExpr {
  /** Deterministic re-serialization — used as the synthesized series name
    * for function outputs (graphite names results by the expression text).
    */
  def canonical: String
}
final case class TPath(glob: String) extends TExpr {
  def canonical: String = glob
}
final case class TNum(v: Double, raw: String) extends TExpr {
  def canonical: String = raw
}
final case class TStr(v: String) extends TExpr {
  def canonical: String = "\"" + v + "\""
}
final case class TCall(name: String, args: List[TExpr]) extends TExpr {
  def canonical: String = name + args.map(_.canonical).mkString("(", ",", ")")
}

object TargetLang {

  /** Parse one target expression; all malformations throw
    * IllegalArgumentException (the serving layer's client-error class).
    */
  def parse(s: String): TExpr = {
    val p = new Parser(s)
    val e = p.parseExpr()
    p.skipWs()
    require(p.eof, s"trailing input after expression: '${s.substring(p.pos)}'")
    e
  }

  private val NumberRe = "-?[0-9]+(?:\\.[0-9]+)?".r
  private val IdentRe = "[A-Za-z_][A-Za-z0-9_]*".r

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def peek: Char = s.charAt(pos)

    def parseExpr(): TExpr = {
      skipWs()
      require(!eof, "expected expression, got end of input")
      peek match {
        case '\'' | '"' => parseString()
        case _          => parseTokenExpr()
      }
    }

    private def parseString(): TStr = {
      val quote = peek
      pos += 1
      val start = pos
      while (!eof && peek != quote) pos += 1
      require(!eof, s"unterminated string starting at ${start - 1}")
      val v = s.substring(start, pos)
      pos += 1 // closing quote
      TStr(v)
    }

    /** Bare token: path glob, number, or function name. Commas and parens
      * at depth 0 terminate it; '{'/'[' open glob groups whose commas are
      * part of the token.
      */
    private def parseTokenExpr(): TExpr = {
      val start = pos
      var depth = 0
      var done = false
      while (!eof && !done) {
        peek match {
          case '{' | '['                        => depth += 1; pos += 1
          case '}' | ']'                        => depth -= 1; pos += 1
          case ',' | ')' | '(' if depth == 0    => done = true
          case c if c.isWhitespace && depth == 0 => done = true
          case _                                => pos += 1
        }
      }
      require(depth == 0, s"unbalanced '{'/'[' in '${s.substring(start, pos)}'")
      val tok = s.substring(start, pos)
      require(tok.nonEmpty, s"expected expression at position $start")
      skipWs()
      if (!eof && peek == '(' && IdentRe.matches(tok)) parseCall(tok)
      else if (NumberRe.matches(tok)) TNum(tok.toDouble, tok)
      else TPath(tok)
    }

    private def parseCall(name: String): TCall = {
      pos += 1 // '('
      skipWs()
      if (!eof && peek == ')') { pos += 1; return TCall(name, Nil) }
      val args = scala.collection.mutable.ListBuffer(parseExpr())
      skipWs()
      while (!eof && peek == ',') {
        pos += 1
        args += parseExpr()
        skipWs()
      }
      require(!eof && peek == ')', s"expected ')' in call to '$name'")
      pos += 1
      TCall(name, args.toList)
    }
  }
}
