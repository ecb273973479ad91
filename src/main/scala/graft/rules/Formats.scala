package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `format` keyword validators.
  *
  * Mirrors the reference's dispatcher + 19 named formats
  * (`/root/reference/src/validation/formats.rs:14-274`); unknown formats pass
  * (`formats.rs:35`). Regex-expressible formats compile to `rlike`, and
  * calendar validity (leap years etc.) is pure Column arithmetic — both stay
  * inside whole-stage codegen. Only the genuinely procedural validators
  * (URI parsing, uri-template brace matching, regex compilation) remain
  * scalar UDFs, each behind a cheap regex pre-guard where one exists so the
  * UDF runs on shape-plausible values, not every row.
  */
object Formats {

  // --- regexes (Java regex dialect; semantics match the reference's Rust
  // regexes cited per-format below) ---

  // formats.rs:59-67
  private val dateShape = "^\\d{4}-\\d{2}-\\d{2}\\z"
  // formats.rs:69-77 (RFC 3339 full-time)
  private val timeRe =
    "^([01]\\d|2[0-3]):[0-5]\\d:([0-5]\\d|60)(\\.\\d+)?([Zz]|[+-]([01]\\d|2[0-3]):[0-5]\\d)\\z"
  // formats.rs:79-90
  private val dateTimeShape =
    "^\\d{4}-\\d{2}-\\d{2}[Tt ]([01]\\d|2[0-3]):[0-5]\\d:([0-5]\\d|60)(\\.\\d+)?([Zz]|[+-]([01]\\d|2[0-3]):[0-5]\\d)\\z"
  // formats.rs:117-131 (ISO 8601 duration)
  private val durationRe =
    "^P(?=.)(\\d+Y)?(\\d+M)?(\\d+W)?(\\d+D)?(T(?=.)(\\d+H)?(\\d+M)?(\\d+(\\.\\d+)?S)?)?\\z"
  // formats.rs:135-140
  private val emailRe =
    "^[a-zA-Z0-9.!#$%&'*+/=?^_`{|}~-]+@[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?(?:\\.[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*\\z"
  // formats.rs:144-161 (label <=63, total <=253, no edge hyphens)
  private val hostnameRe =
    "^(?=.{1,253}\\z)[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?(?:\\.[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*\\z"
  // formats.rs:165-167
  private val ipv4Re =
    "^((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.){3}(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\z"
  // formats.rs:169-171 (incl. compressed + v4-mapped forms)
  private val ipv6Re =
    "^(([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,7}:|([0-9a-fA-F]{1,4}:){1,6}:[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,5}(:[0-9a-fA-F]{1,4}){1,2}|([0-9a-fA-F]{1,4}:){1,4}(:[0-9a-fA-F]{1,4}){1,3}|([0-9a-fA-F]{1,4}:){1,3}(:[0-9a-fA-F]{1,4}){1,4}|([0-9a-fA-F]{1,4}:){1,2}(:[0-9a-fA-F]{1,4}){1,5}|[0-9a-fA-F]{1,4}:((:[0-9a-fA-F]{1,4}){1,6})|:((:[0-9a-fA-F]{1,4}){1,7}|:)|([0-9a-fA-F]{1,4}:){1,4}:((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.){3}(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)|::([fF]{4}:)?((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.){3}(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d))\\z"
  // formats.rs:190-197
  private val uuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\\z"
  // formats.rs:225-245 (escapes: ~ only before 0/1)
  private val jsonPointerRe = "^(/([^/~]|~[01])*)*\\z"
  // formats.rs:249-268
  private val relJsonPointerRe = "^(0|[1-9][0-9]*)(#|(/([^/~]|~[01])*)*)\\z"

  /** Calendar validity incl. leap years (`formats.rs:92-113`): one native
    * STRICT date parse (`try_to_timestamp` → null on Feb 30, month 13,
    * non-leap Feb 29; proleptic year 0000 accepted like the arithmetic
    * form). A single intrinsic parse beats the previous 3×substring +
    * try_cast + leap-arithmetic column tree (BENCH r2 flagged the 2×
    * regression), never throws under ANSI, and stays codegen'd. Callers
    * must pre-guard with the `\d{4}-\d{2}-\d{2}` shape regex — the parser
    * alone would also accept shapes the reference rejects.
    */
  private def calendarValid(v: Column): Column =
    try_to_timestamp(v, lit("yyyy-MM-dd")).isNotNull

  // formats.rs:175-177 — uri must be absolute (has scheme); the rlike
  // scheme pre-guard keeps the UDF off rows that can't possibly pass
  private val uriSchemeShape = "^[A-Za-z][A-Za-z0-9+.-]*:"
  private val uriUdf = udf { (s: String) =>
    s != null && (try { val u = new java.net.URI(s); u.isAbsolute } catch { case _: Exception => false })
  }
  // formats.rs:179-186 — any valid URI reference (relative allowed)
  private val uriRefUdf = udf { (s: String) =>
    s != null && (try { new java.net.URI(s); true } catch { case _: Exception => false })
  }
  // formats.rs:201-221 — balanced non-nested braces, non-empty exprs
  private val uriTemplateUdf = udf { (s: String) =>
    s != null && {
      var depth = 0; var ok = true; var exprLen = 0
      s.foreach {
        case '{' => depth += 1; exprLen = 0; if (depth > 1) ok = false
        case '}' => depth -= 1; if (depth < 0 || exprLen == 0) ok = false
        case _   => if (depth == 1) exprLen += 1
      }
      ok && depth == 0
    }
  }
  // formats.rs:272-274 — the pattern itself must compile
  private val regexUdf = udf { (s: String) =>
    s != null && (try { java.util.regex.Pattern.compile(s); true } catch { case _: Exception => false })
  }

  /** Predicate: does string column `v` satisfy format `name`?
    * Unknown names accept everything (`formats.rs:35`).
    */
  def pred(name: String, v: Column): Column = name match {
    case "date"      => v.rlike(dateShape) && calendarValid(v)
    case "time"      => v.rlike(timeRe)
    case "date-time" => v.rlike(dateTimeShape) && calendarValid(substring(v, 1, 10))
    case "duration"  => v.rlike(durationRe)
    // idn-email validates with the plain email check (formats.rs:21)
    case "email" | "idn-email" => v.rlike(emailRe)
    case "hostname"  => v.rlike(hostnameRe)
    // idn-hostname always passes in the reference (formats.rs:23)
    case "idn-hostname" => lit(true)
    case "ipv4"      => v.rlike(ipv4Re)
    case "ipv6"      => v.rlike(ipv6Re)
    case "uuid"      => v.rlike(uuidRe)
    // iri / iri-reference validate as uri / uri-reference (formats.rs:28-29)
    case "uri" | "iri"                     => v.rlike(uriSchemeShape) && uriUdf(v)
    case "uri-reference" | "iri-reference" => uriRefUdf(v)
    case "uri-template"  => uriTemplateUdf(v)
    case "json-pointer"  => v.rlike(jsonPointerRe)
    case "relative-json-pointer" => v.rlike(relJsonPointerRe)
    case "regex"     => regexUdf(v)
    case _           => lit(true)
  }
}
