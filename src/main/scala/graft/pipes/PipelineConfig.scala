package graft.pipes

import graft.nlp.{Patterns, QualifierPatterns}

/** Config-addressable pipeline assembly — the engine's answer to the
  * reference's string/config-driven `edsnlp.load` / `add_pipe("eds.x")`
  * surface (`edsnlp/core/registries.py`, factory registration per pipe):
  * a pipeline spec names its components and term banks as DATA, so
  * pipelines travel as JSON strings through job configs instead of
  * compiled code.
  *
  * Grammar (JSON object):
  * {{{
  * { "terms":    { "label": ["variant", ...], ... },
  *   "regex":    { "label": ["pattern", ...], ... },
  *   "qualifiers": ["negation", "family", "hypothesis",
  *                  "reported_speech", "history"],
  *   "dates":    { "faithful": "true" } }
  * }}}
  * The optional `dates` object enables the date-extraction stage
  * (`doc.spans["dates"]` analog); `"faithful": "true"` selects the
  * exact reference grammar — the reference exposes its date grammar as
  * pipe config, so the config layer reaches the same toggle.
  * Qualifier names resolve against the built-in banks
  * ([[graft.nlp.Patterns]]); unknown names fail with the available list
  * (the reference registry's error contract).
  */
object PipelineConfig {

  private val qualifierBank: Map[String, QualifierPatterns] = Map(
    "negation" -> Patterns.negation,
    "family" -> Patterns.family,
    "hypothesis" -> Patterns.hypothesis,
    "reported_speech" -> Patterns.reportedSpeech,
    "history" -> Patterns.history)

  def availableQualifiers: Seq[String] = qualifierBank.keys.toSeq.sorted

  /** Resolve a qualifier bank by name. */
  def qualifier(name: String): QualifierPatterns =
    qualifierBank.getOrElse(name, throw new IllegalArgumentException(
      s"Unknown qualifier '$name'. " +
        s"Available qualifiers are ${availableQualifiers.mkString(", ")}"))

  /** Build a [[DocPipeline]] from a JSON spec string. Uses the tiny
    * hand-rolled parser below (flat grammar, no dependency additions).
    */
  def fromJson(json: String): DocPipeline = {
    val root = MiniJson.parseObject(json)
    def stringListMap(key: String): Map[String, Seq[String]] =
      root.get(key) match {
        case Some(m: Map[_, _]) =>
          m.asInstanceOf[Map[String, Any]].map {
            case (k, v: Seq[_]) => k -> v.map(_.toString)
            case (k, v) => throw new IllegalArgumentException(
              s"$key.$k must be a string array, got $v")
          }
        case None => Map.empty
        case Some(other) => throw new IllegalArgumentException(
          s"'$key' must be an object, got $other")
      }
    val quals = root.get("qualifiers") match {
      case Some(v: Seq[_]) => v.map(n => qualifier(n.toString))
      case None => Nil
      case Some(other) => throw new IllegalArgumentException(
        s"'qualifiers' must be an array, got $other")
    }
    val dates = root.get("dates") match {
      case Some(m: Map[_, _]) =>
        val mm = m.asInstanceOf[Map[String, Any]]
        mm.keys.foreach { k =>
          require(k == "faithful",
            s"unknown dates option '$k' (supported: faithful)")
        }
        val faithful = mm.get("faithful").map(_.toString) match {
          case Some("true") => true
          case Some("false") | None => false
          case Some(other) => throw new IllegalArgumentException(
            s"dates.faithful must be \"true\" or \"false\", got '$other'")
        }
        Some(DatesOptions(faithful = faithful))
      case None => None
      case Some(other) => throw new IllegalArgumentException(
        s"'dates' must be an object, got $other")
    }
    DocPipeline(
      terms = stringListMap("terms"),
      regexPatterns = stringListMap("regex"),
      qualifiers = quals,
      dates = dates)
  }
}

/** Minimal JSON reader for the flat pipeline-config grammar: objects,
  * arrays, strings (with escapes), and nothing else — configs are
  * authored, not machine-generated, and the engine adds no library
  * dependencies (build constraint).
  */
private[pipes] object MiniJson {

  def parseObject(s: String): Map[String, Any] = {
    val p = new P(s)
    p.ws()
    val v = p.obj()
    p.ws()
    require(p.eof, s"trailing content at ${p.pos}")
    v
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c,
        s"expected '$c' at $pos in $s")
      pos += 1
    }
    def obj(): Map[String, Any] = {
      expect('{'); ws()
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return out.toMap }
      var done = false
      while (!done) {
        ws()
        val k = str(); ws(); expect(':'); ws()
        out(k) = value(); ws()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      out.toMap
    }
    def arr(): Seq[Any] = {
      expect('['); ws()
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return out.toSeq }
      var done = false
      while (!done) {
        ws()
        out += value(); ws()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      out.toSeq
    }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          require(!eof, "dangling escape")
          sb.append(s.charAt(pos) match {
            case 'n' => '\n'
            case 't' => '\t'
            case 'r' => '\r'
            case 'u' =>
              val h = s.substring(pos + 1, pos + 5); pos += 4
              Integer.parseInt(h, 16).toChar
            case other => other
          })
        } else sb.append(c)
        pos += 1
      }
      expect('"')
      sb.toString
    }
    def value(): Any = s.charAt(pos) match {
      case '{' => obj()
      case '[' => arr()
      case '"' => str()
      case other => throw new IllegalArgumentException(
        s"unsupported JSON value starting with '$other' at $pos " +
          "(flat config grammar: objects, arrays, strings)")
    }
  }
}
