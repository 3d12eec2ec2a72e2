package graft.sources.pinot

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import graft.pinot.PinotFormatException

/** Minimal JSON reader for the two controller response shapes — keeps the
  * connector dependency-free (reference uses serde;
  * datafusion-pinot/src/controller.rs:29-45).
  */
private[sources] object TinyJson {

  sealed trait JValue
  case class JString(s: String) extends JValue
  case class JNumber(d: Double) extends JValue
  case class JBool(b: Boolean) extends JValue
  case object JNull extends JValue
  case class JArray(items: Vector[JValue]) extends JValue
  case class JObject(fields: Vector[(String, JValue)]) extends JValue {
    def get(key: String): Option[JValue] = fields.find(_._1 == key).map(_._2)
  }

  def parse(input: String): JValue = {
    val p = new Parser(input)
    val v = p.parseValue()
    p.skipWs()
    if (!p.atEnd) throw new PinotFormatException(
      s"Trailing JSON content at offset ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!atEnd && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def fail(msg: String): Nothing =
      throw new PinotFormatException(s"Invalid JSON at offset $pos: $msg")
    private def expect(c: Char): Unit = {
      if (atEnd || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def parseValue(): JValue = {
      skipWs()
      if (atEnd) fail("unexpected end of input")
      s.charAt(pos) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => JString(parseString())
        case 't' => literal("true", JBool(true))
        case 'f' => literal("false", JBool(false))
        case 'n' => literal("null", JNull)
        case c if c == '-' || c.isDigit => parseNumber()
        case c => fail(s"unexpected character '$c'")
      }
    }

    private def literal(text: String, v: JValue): JValue = {
      if (!s.startsWith(text, pos)) fail(s"expected $text")
      pos += text.length
      v
    }

    private def parseObject(): JObject = {
      expect('{'); skipWs()
      val fields = Vector.newBuilder[(String, JValue)]
      if (!atEnd && s.charAt(pos) == '}') { pos += 1; return JObject(fields.result()) }
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        skipWs(); expect(':')
        fields += (k -> parseValue())
        skipWs()
        if (atEnd) fail("unterminated object")
        s.charAt(pos) match {
          case ',' => pos += 1
          case '}' => pos += 1; done = true
          case c => fail(s"expected ',' or '}' but got '$c'")
        }
      }
      JObject(fields.result())
    }

    private def parseArray(): JArray = {
      expect('['); skipWs()
      val items = Vector.newBuilder[JValue]
      if (!atEnd && s.charAt(pos) == ']') { pos += 1; return JArray(items.result()) }
      var done = false
      while (!done) {
        items += parseValue()
        skipWs()
        if (atEnd) fail("unterminated array")
        s.charAt(pos) match {
          case ',' => pos += 1
          case ']' => pos += 1; done = true
          case c => fail(s"expected ',' or ']' but got '$c'")
        }
      }
      JArray(items.result())
    }

    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!atEnd && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          if (atEnd) fail("unterminated escape")
          s.charAt(pos) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              if (pos + 4 >= s.length) fail("truncated \\u escape")
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case e => fail(s"bad escape '\\$e'")
          }
        } else sb += c
        pos += 1
      }
      expect('"')
      sb.result()
    }

    private def parseNumber(): JNumber = {
      val start = pos
      if (!atEnd && s.charAt(pos) == '-') pos += 1
      while (!atEnd && (s.charAt(pos).isDigit || "+-.eE".contains(s.charAt(pos))))
        pos += 1
      try JNumber(s.substring(start, pos).toDouble)
      catch { case _: NumberFormatException => fail("bad number") }
    }
  }
}

/** HTTP client for the Pinot controller API (reference:
  * datafusion-pinot/src/controller.rs:75-142):
  * `GET /tables` → `{"tables": [...]}`;
  * `GET /segments/{table}?type=OFFLINE|REALTIME` →
  * `[{"OFFLINE": [...]}, {"REALTIME": [...]}]` (missing type → empty list).
  */
class PinotControllerClient(baseUrl: String,
    timeout: Duration = Duration.ofSeconds(10)) {

  import TinyJson._

  private val http = HttpClient.newBuilder().connectTimeout(timeout).build()

  private def get(path: String): String = {
    val req = HttpRequest.newBuilder(URI.create(s"$baseUrl$path"))
      .timeout(timeout).GET().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new PinotFormatException(
        s"Controller returned status ${resp.statusCode()}: ${resp.body()}")
    resp.body()
  }

  def listTables(): Seq[String] =
    TinyJson.parse(get("/tables")) match {
      case o: JObject => o.get("tables") match {
        case Some(JArray(items)) => items.map {
          case JString(t) => t
          case other => throw new PinotFormatException(
            s"Non-string table name in /tables response: $other")
        }
        case _ => throw new PinotFormatException(
          "Missing 'tables' array in /tables response")
      }
      case _ => throw new PinotFormatException(
        "/tables response is not a JSON object")
    }

  def listSegments(table: String, tableType: String): Seq[String] =
    TinyJson.parse(get(s"/segments/$table?type=$tableType")) match {
      case JArray(groups) =>
        groups.collectFirst {
          case o: JObject if o.get(tableType).isDefined =>
            o.get(tableType).get match {
              case JArray(items) => items.map {
                case JString(seg) => seg
                case other => throw new PinotFormatException(
                  s"Non-string segment name: $other")
              }
              case _ => throw new PinotFormatException(
                s"'$tableType' value is not an array")
            }
        }.getOrElse(Seq.empty) // type absent → empty (≙ controller.rs:137-142)
      case _ => throw new PinotFormatException(
        "/segments response is not a JSON array")
    }
}
