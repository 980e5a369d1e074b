package graft.config

import graft.functions.GraftFunctions

/** Minimal YQL -> Spark SQL translation for the reference's config
  * dialect (SURVEY.md §2.2 / §7.6 risk 6): enough to run the
  * reference README's two materialized-view transforms verbatim
  * (README.md:80-116). Handled constructs:
  *
  *  - `DECLARE $rows AS List<Struct<...>>;`  -> dropped (the batch is
  *     pre-bound as temp view `rows`)
  *  - `$name=DateTime::Parse('FMT');` binding + `$name(col)` call +
  *    `DateTime::MakeTimestamp(...)` -> `to_timestamp(col, 'translated')`
  *  - `Unwrap(x)` -> `unwrap(x)` (graft custom expression, registered)
  *  - `FROM AS_TABLE($rows)` -> `FROM rows`
  *  - leading `UPSERT INTO t` / `INSERT INTO t` / `UPDATE t ON` /
  *    `DELETE FROM t ON` -> extracted as (actionMode, actionTable)
  *    (CdcMsgParser.java:225-248 dispatch), remainder is the SELECT
  *
  * Anything else passes through to Spark SQL untouched (the reference
  * itself passes YQL through verbatim, YqlQuery.java:192-193).
  */
object YqlTranslate {

  /** declaredCols: the List<Struct<...>> member names — the reference
    * binds ONLY those source columns into the batch parameter
    * (CdcMsgParser.java:200-214), so `rows` is projected to them.
    */
  case class Translated(actionMode: String, actionTable: String,
    sql: String, declaredCols: Seq[String],
    // declared (name, YDB type) member pairs — drives the strict
    // type checks (YdbTypes) at validation
    declaredMembers: Seq[(String, String)] = Nil)

  /** Split struct members on top-level commas only (types like
    * `Optional<Uint32>` and `Decimal(22,9)` nest commas/brackets).
    */
  private def splitMembers(body: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    val cur = new StringBuilder
    var depth = 0
    body.foreach {
      case c @ ('<' | '(') => depth += 1; cur += c
      case c @ ('>' | ')') => depth -= 1; cur += c
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private val declareRe =
    """(?s)DECLARE\s+\$\w+\s+AS\s+List<Struct<(.*?)>>\s*;""".r
  private val parseBindRe =
    """\$(\w+)\s*=\s*DateTime::Parse\('([^']*)'\)\s*;""".r
  private val actionRe =
    """(?is)^\s*(UPSERT\s+INTO|INSERT\s+INTO|REPLACE\s+INTO)\s+(\w+)\s*""".r
  private val updateOnRe = """(?is)^\s*UPDATE\s+(\w+)\s+ON\s*""".r
  private val deleteOnRe = """(?is)^\s*DELETE\s+FROM\s+(\w+)\s+ON\s*""".r

  def apply(yql: String): Translated = {
    var s = yql
    // collect $fmt = DateTime::Parse('...') bindings
    val binds = parseBindRe.findAllMatchIn(s).map(m =>
      m.group(1) -> GraftFunctions.strptimeToSpark(m.group(2))).toMap
    s = parseBindRe.replaceAllIn(s, "")
    val declaredMembers = declareRe.findFirstMatchIn(s).toSeq.flatMap {
      m =>
        splitMembers(m.group(1)).flatMap { mem =>
          mem.split(":", 2) match {
            case Array(n, t) => Some(n.trim -> t.trim)
            case _ => None
          }
        }
    }
    val declaredCols = declaredMembers.map(_._1)
    s = declareRe.replaceAllIn(s, "")
    // $parse(col) [possibly wrapped in DateTime::MakeTimestamp]
    binds.foreach { case (name, fmt) =>
      s = s.replaceAll(
        s"""DateTime::MakeTimestamp\\(\\$$$name\\((\\w+)\\)\\)""",
        s"to_timestamp($$1, '$fmt')")
      s = s.replaceAll(s"""\\$$$name\\((\\w+)\\)""",
        s"to_timestamp($$1, '$fmt')")
    }
    s = s.replaceAll("""(?i)Unwrap\(""", "unwrap(")
    s = s.replaceAll("""(?i)FROM\s+AS_TABLE\(\$\w+\)""", "FROM rows")
    s = s.trim
    // extract the write action prefix (prefix match, not full-string)
    val (mode, table, rest) = actionRe.findFirstMatchIn(s) match {
      case Some(m) =>
        val mode = m.group(1).toUpperCase.replaceAll("\\s+", " ") match {
          case "INSERT INTO" => "insertInto"
          case _ => "upsertInto" // UPSERT INTO / REPLACE INTO
        }
        (mode, m.group(2), s.substring(m.end))
      case None => updateOnRe.findFirstMatchIn(s) match {
        case Some(m) => ("updateOn", m.group(1), s.substring(m.end))
        case None => deleteOnRe.findFirstMatchIn(s) match {
          case Some(m) => ("deleteFrom", m.group(1), s.substring(m.end))
          case None => ("upsertInto", "", s)
        }
      }
    }
    Translated(mode, table, rest.trim.stripSuffix(";").trim,
      declaredCols, declaredMembers)
  }
}
