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

  /** Native float-vector dot product accumulated in double, in index
    * order — bit-identical to a sequential fold but fully codegen'd
    * (the `aggregate(zip_with(...))` built-in path is interpreted and
    * ~10x slower in the pairwise-similarity hot loop).
    */
  case class FloatVecDot(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.DoubleType
    override def prettyName: String = "vec_dot"
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      java.lang.Double.valueOf(s)
    }
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
          |double $s = 0.0;
          |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          |for (int $i = 0; $i < $n; $i++) {
          |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
          |}
          |${ev.value} = $s;
          |""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression) = copy(left = l, right = r)
  }

  /** Register all graft SQL functions on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unwrap", (exprs: Seq[Expression]) => Unwrap(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", (exprs: Seq[Expression]) =>
        FloatVecDot(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "morton", (exprs: Seq[Expression]) =>
        mortonExpr(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert", (exprs: Seq[Expression]) =>
        hilbertExpr(exprs.head, exprs(1)), "built-in")
  }

  /** Karp-Rabin rolling hash of a string (base 257, 64-bit wraparound)
    * — the classic document-fingerprint primitive; codegen'd single
    * pass over the UTF-8 bytes. (Wraparound arithmetic is JVM-defined,
    * so this is deliberately NOT oracle-portable; see text_fingerprint
    * for the portable md5 canonical-form fingerprint.)
    */
  case class RollingHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.LongType
    override def prettyName: String = "rolling_hash"
    override protected def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .getBytes
      var h = 0L
      var i = 0
      while (i < bytes.length) { h = h * 257L + (bytes(i) & 0xffL); i += 1 }
      java.lang.Long.valueOf(h)
    }
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val b = ctx.freshName("b")
        val i = ctx.freshName("i")
        val h = ctx.freshName("h")
        s"""
          |byte[] $b = $c.getBytes();
          |long $h = 0L;
          |for (int $i = 0; $i < $b.length; $i++) {
          |  $h = $h * 257L + ($b[$i] & 0xffL);
          |}
          |${ev.value} = $h;
          |""".stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  /** Morton (z-order) interleave of the low 16 bits of two longs:
    * bit i of `left` lands at position 2i, bit i of `right` at 2i+1.
    * The data-layout primitive behind multi-dimensional clustering —
    * sort/range-partition by this code and parquet min/max stats stay
    * tight in BOTH dimensions (see Ext6Queries.zorderLayout). Codegen
    * is the branch-free bit-spread (5 mask-shift steps per side), so
    * the expression stays inside whole-stage codegen on the write
    * path. Construct via `mortonExpr`/`morton`, which insert
    * integral->long casts (ExpectsInputTypes is sql-private);
    * interpreted eval widens any integral defensively so eval and
    * codegen agree even on a hand-built node with int children.
    */
  case class MortonInterleave(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.LongType
    override def prettyName: String = "morton"
    @inline private def spread(x: Long): Long = {
      var s = x & 0xffffL
      s = (s | s << 8) & 0x00ff00ffL
      s = (s | s << 4) & 0x0f0f0f0fL
      s = (s | s << 2) & 0x33333333L
      s = (s | s << 1) & 0x55555555L
      s
    }
    override protected def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.valueOf(
        spread(a.asInstanceOf[Number].longValue)
          | (spread(b.asInstanceOf[Number].longValue) << 1))
    private def genSpread(v: String, s: String): String =
      s"""
        |long $s = $v & 0xffffL;
        |$s = ($s | $s << 8) & 0x00ff00ffL;
        |$s = ($s | $s << 4) & 0x0f0f0f0fL;
        |$s = ($s | $s << 2) & 0x33333333L;
        |$s = ($s | $s << 1) & 0x55555555L;
        |""".stripMargin
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val sa = ctx.freshName("sa")
        val sb = ctx.freshName("sb")
        s"""
          |${genSpread(a, sa)}
          |${genSpread(b, sb)}
          |${ev.value} = $sa | ($sb << 1);
          |""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression) = copy(left = l, right = r)
  }

  /** Hilbert-curve index (order 16) of two coordinates — the other
    * multi-dimensional clustering key next to `morton`: the Hilbert
    * walk never jumps (consecutive indices are grid neighbours), so
    * per-file bounding boxes come out tighter than z-order's bit
    * interleave on range-heavy workloads, at the cost of this
    * iterative transform. The classic xy2d loop (Warren, Hacker's
    * Delight §16; public domain formulation) runs 16 rounds of
    * quadrant-fold + rotate; codegen emits the same loop so the write
    * path stays inside whole-stage codegen. Inputs are masked to 16
    * bits in BOTH eval paths.
    */
  case class HilbertIndex(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.LongType
    override def prettyName: String = "hilbert"
    private def xy2d(xi: Long, yi: Long): Long = {
      var x = xi & 0xffffL
      var y = yi & 0xffffL
      var d = 0L
      var s = 1L << 15
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3L * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    override protected def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.valueOf(xy2d(a.asInstanceOf[Number].longValue,
        b.asInstanceOf[Number].longValue))
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        val d = ctx.freshName("d")
        val s = ctx.freshName("s")
        val rx = ctx.freshName("rx")
        val ry = ctx.freshName("ry")
        val t = ctx.freshName("t")
        s"""
          |long $x = $a & 0xffffL;
          |long $y = $b & 0xffffL;
          |long $d = 0L;
          |for (long $s = 1L << 15; $s > 0; $s >>= 1) {
          |  long $rx = (($x & $s) > 0) ? 1L : 0L;
          |  long $ry = (($y & $s) > 0) ? 1L : 0L;
          |  $d += $s * $s * ((3L * $rx) ^ $ry);
          |  if ($ry == 0) {
          |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
          |    long $t = $x; $x = $y; $y = $t;
          |  }
          |}
          |${ev.value} = $d;
          |""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression) = copy(left = l, right = r)
  }

  /** Build a HilbertIndex with integral inputs cast to long. */
  def hilbertExpr(a: Expression, b: Expression): Expression = {
    def toLong(e: Expression) =
      org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.LongType)
    HilbertIndex(toLong(a), toLong(b))
  }

  /** Build a MortonInterleave with integral inputs cast to long
    * (AbstractDataType is sql-private, so casts replace
    * ExpectsInputTypes here).
    */
  def mortonExpr(a: Expression, b: Expression): Expression = {
    def toLong(e: Expression) =
      org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.LongType)
    MortonInterleave(toLong(a), toLong(b))
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API form of `morton` (no registration needed). */
  def morton(a: Column, b: Column): Column =
    ColumnBridge.column(mortonExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-API form of `hilbert`. */
  def hilbert(a: Column, b: Column): Column =
    ColumnBridge.column(hilbertExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-API form of `rolling_hash`. */
  def rollingHash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))

  /** Column-API form of `unwrap` (no registration needed). */
  def unwrap(c: Column): Column =
    ColumnBridge.column(Unwrap(ColumnBridge.expression(c)))

  /** Column-API form of `vec_dot` (no registration needed). */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
