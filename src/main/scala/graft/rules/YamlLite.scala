package graft.rules

import scala.collection.mutable

/** Minimal YAML-subset parser — exactly the shape the reference's
  * `config.yml` uses (reference `config.yml:1-72`): nested maps by
  * indentation, block lists (`- item`), inline lists (`["a", "b"]`),
  * quoted/bare scalars, booleans, ints, and `#` comments. No anchors,
  * no multi-line scalars, no flow maps — a config-file subset, not a
  * YAML implementation, so the engine can load the reference's actual
  * file without a dependency (this build is offline; no snakeyaml).
  *
  * Returns `Map[String, Any]` where values are `String | Boolean |
  * Long | Seq[Any] | Map[String, Any]`.
  */
object YamlLite {

  def parse(yaml: String): Map[String, Any] = {
    val lines = yaml.split("\n", -1).toIndexedSeq
      .map(stripComment)
      .zipWithIndex
      .filter { case (l, _) => l.trim.nonEmpty }
    parseMap(lines, 0, lines.length, indentOf(lines.headOption.map(_._1).getOrElse("")))._1
  }

  /** Drop an unquoted `#` (and everything after) — `"a # b"` survives. */
  private def stripComment(line: String): String = {
    var inS = false; var inD = false
    var i = 0
    while (i < line.length) {
      line.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS  => inD = !inD
        case '#' if !inS && !inD &&
          (i == 0 || line.charAt(i - 1).isWhitespace) =>
          return line.substring(0, i)
        case _ =>
      }
      i += 1
    }
    line
  }

  private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

  /** Parse a map block at `indent` spanning lines [from, until). */
  private def parseMap(lines: IndexedSeq[(String, Int)], from: Int,
                       until: Int, indent: Int): (Map[String, Any], Int) = {
    val out = mutable.LinkedHashMap.empty[String, Any]
    var i = from
    while (i < until) {
      val (line, lineNo) = lines(i)
      val ind = indentOf(line)
      if (ind < indent) return (out.toMap, i)
      require(ind == indent,
        s"yaml line ${lineNo + 1}: unexpected indent $ind (expected $indent)")
      val t = line.trim
      val colon = colonIndex(t)
      require(colon > 0, s"yaml line ${lineNo + 1}: expected 'key:' in '$t'")
      val key = unquote(t.substring(0, colon).trim)
      val rest = t.substring(colon + 1).trim
      if (rest.nonEmpty) {
        out(key) = scalarOrInlineList(rest, lineNo)
        i += 1
      } else {
        // nested block: map, list, or empty
        val j = i + 1
        if (j >= until || indentOf(lines(j)._1) <= indent) {
          out(key) = Map.empty[String, Any]
          i = j
        } else {
          val childIndent = indentOf(lines(j)._1)
          if (lines(j)._1.trim.startsWith("- ") || lines(j)._1.trim == "-") {
            val (items, next) = parseList(lines, j, until, childIndent)
            out(key) = items
            i = next
          } else {
            val (m, next) = parseMap(lines, j, until, childIndent)
            out(key) = m
            i = next
          }
        }
      }
    }
    (out.toMap, until)
  }

  /** Parse a `- item` block list at `indent`. Items are scalars or
    * nested maps (a `- key: value` item opens a map spanning the
    * following deeper-indented lines — the reference's `repos:` shape).
    */
  private def parseList(lines: IndexedSeq[(String, Int)], from: Int,
                        until: Int, indent: Int): (Seq[Any], Int) = {
    val out = mutable.ListBuffer.empty[Any]
    var i = from
    while (i < until) {
      val (line, lineNo) = lines(i)
      val ind = indentOf(line)
      if (ind < indent) return (out.toSeq, i)
      require(ind == indent && line.trim.startsWith("-"),
        s"yaml line ${lineNo + 1}: expected '- item' at indent $indent")
      val rest = line.trim.stripPrefix("-").trim
      if (rest.isEmpty) { out += ""; i += 1 }
      else if (colonIndex(rest) > 0) {
        // map item: rewrite `- k: v` as a map whose block continues on
        // the deeper-indented following lines
        val itemIndent = ind + (line.trim.length - rest.length)
        var end = i + 1
        while (end < until && indentOf(lines(end)._1) > indent &&
          !lines(end)._1.trim.startsWith("- ")) end += 1
        val block = ((" " * itemIndent + rest, lineNo)) +:
          (i + 1 until end).map(lines)
        val (m, _) = parseMap(block.toIndexedSeq, 0, block.length, itemIndent)
        out += m
        i = end
      } else {
        out += scalarOrInlineList(rest, lineNo)
        i += 1
      }
    }
    (out.toSeq, until)
  }

  /** First `:` that terminates a key — not inside quotes, and followed
    * by end-of-line or a space (so `component:` inside a quoted value
    * never splits; keys themselves may be quoted).
    */
  private def colonIndex(t: String): Int = {
    var inS = false; var inD = false
    var i = 0
    while (i < t.length) {
      t.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS  => inD = !inD
        case ':' if !inS && !inD &&
          (i + 1 == t.length || t.charAt(i + 1) == ' ') => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def scalarOrInlineList(s: String, lineNo: Int): Any =
    if (s.startsWith("[")) {
      require(s.endsWith("]"), s"yaml line ${lineNo + 1}: unterminated list")
      val inner = s.substring(1, s.length - 1).trim
      if (inner.isEmpty) Seq.empty[Any]
      else splitTopLevel(inner).map(x => scalar(x.trim))
    } else scalar(s)

  /** Split an inline list body on commas outside quotes. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var inS = false; var inD = false
    s.foreach {
      case '\'' if !inD => inS = !inS; cur += '\''
      case '"' if !inS  => inD = !inD; cur += '"'
      case ',' if !inS && !inD => out += cur.toString; cur.clear()
      case c => cur += c
    }
    out += cur.toString
    out.toSeq
  }

  private def scalar(s: String): Any = {
    val u = unquote(s)
    if (u ne s) u // quoted: always a string
    else s match {
      case "true"  => true
      case "false" => false
      case _ => try java.lang.Long.parseLong(s): Any catch {
        case _: NumberFormatException => s
      }
    }
  }

  private def unquote(s: String): String =
    if (s.length >= 2 &&
      ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}
