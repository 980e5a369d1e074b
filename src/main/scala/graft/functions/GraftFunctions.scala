package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.DataType

/** YQL-dialect shims (SURVEY.md §7.4) as native Catalyst expressions —
  * codegen'd, no Scala UDF in the hot path.
  */
object GraftFunctions {

  /** YQL `Unwrap(optional)` (reference README.md:94): assert non-null,
    * error out otherwise. Result is non-nullable, which lets Catalyst
    * drop downstream null checks.
    */
  case class Unwrap(child: Expression) extends UnaryExpression {
    override def dataType: DataType = child.dataType
    override def nullable: Boolean = false
    override def prettyName: String = "unwrap"
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) {
        throw new IllegalStateException("unwrap: value is null")
      }
      v
    }
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      val jt = CodeGenerator.javaType(dataType)
      ev.copy(
        code = c.code + code"""
          |if (${c.isNull}) {
          |  throw new IllegalStateException("unwrap: value is null");
          |}
          |$jt ${ev.value} = ${c.value};
          |""".stripMargin,
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  /** Translate a strptime-style format (YQL `DateTime::Parse`,
    * README.md:91) to a Spark datetime pattern.
    */
  def strptimeToSpark(fmt: String): String = {
    val map = Map(
      "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd", "%H" -> "HH",
      "%M" -> "mm", "%S" -> "ss", "%Z" -> "zz", "%y" -> "yy",
      "%j" -> "DDD", "%%" -> "%")
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        sb.append(map.getOrElse(fmt.substring(i, i + 2),
          fmt.substring(i, i + 2)))
        i += 2
      } else { sb.append(fmt.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Register all graft SQL functions on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unwrap", (exprs: Seq[Expression]) => Unwrap(exprs.head), "built-in")
  }

  /** Column-API form of `unwrap` (session must be registered). */
  def unwrap(c: Column): Column = call_function("unwrap", c)
}
