package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Extract one TOP-LEVEL integer field from a JSON object column as
  * BIGINT; NULL for malformed JSON, a missing field, or a non-integral
  * value — the same per-field semantics as
  * `from_json(col, 'field BIGINT').field` in PERMISSIVE mode
  * (equivalence pinned on the corpus by JsonGetLongSpec).
  *
  * Why custom (SURVEY.md §7.3): `from_json` (JsonToStructs) is
  * CodegenFallback — it breaks WholeStageCodegen, buffers a full
  * InternalRow per record, and walks the whole document under a
  * schema-driven converter even when one scalar is needed. Single-field
  * extraction over massive JSON event logs is among the most common
  * 100 TB pipeline steps; this expression does ONE streaming Jackson
  * pass (Spark's own shaded-free jackson-core, also what Spark's JSON
  * reader uses), skipping every other subtree (`skipChildren` — nested
  * objects never materialize), stops at the first top-level match, and
  * stays inside the enclosing codegen stage via a static call. A
  * reusable thread-local JsonFactory, zero per-row allocation beyond
  * Jackson's parser.
  */
case class JsonGetLong(child: Expression, field: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "json_get_long"

  override def nullSafeEval(input: Any): Any =
    JsonGetLong.extract(input.asInstanceOf[UTF8String], field)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fieldRef = ctx.addReferenceObj("field", field, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = graft.functions.JsonGetLong.extract($c, $fieldRef);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Long) $r).longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): JsonGetLong =
    copy(child = newChild)
}

object JsonGetLong {
  private val factories: ThreadLocal[JsonFactory] =
    ThreadLocal.withInitial(() => new JsonFactory())

  /** Streaming single-pass extraction; see class doc for semantics.
    * Emulates from_json's PERMISSIVE behavior exactly (spec-pinned):
    * duplicate keys -> last successful occurrence wins; a NON-INTEGRAL
    * or overflowing occurrence stops conversion but KEEPS the partial
    * result so far (PartialResultException semantics); a SYNTAX error
    * anywhere nulls the record; trailing garbage after the object is
    * ignored. */
  def extract(json: UTF8String, field: String): Any = {
    try {
      val p: JsonParser = factories.get().createParser(json.getBytes)
      try {
        if (p.nextToken() != JsonToken.START_OBJECT) return null
        var result: java.lang.Long = null
        var tok = p.nextToken()
        while (tok == JsonToken.FIELD_NAME) {
          val name = p.currentName()
          val t = p.nextToken()
          if (name == field) {
            if (t != JsonToken.VALUE_NUMBER_INT) return result // partial
            try result = java.lang.Long.valueOf(p.getLongValue)
            catch { case _: Exception => return result }       // overflow: partial
          } else p.skipChildren() // constant-cost skip of unmatched subtrees
          tok = p.nextToken()
        }
        if (tok != JsonToken.END_OBJECT) return null
        result // trailing garbage after the object is ignored
      } finally p.close()
    } catch { case _: Exception => null } // malformed JSON -> null record
  }

  def jsonGetLong(c: Column, field: String): Column =
    ExprBridge.column(JsonGetLong(ExprBridge.expression(c), field))
}
