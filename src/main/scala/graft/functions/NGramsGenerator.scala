package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram GENERATOR — the SURVEY §2.D "UDTF/generator" slot filled
  * with an actual custom `Generator` instead of the delegated
  * `transform + sequence + explode` spelling. One row per gram position,
  * produced lazily from the token array:
  *
  *   - the HOF spelling MATERIALIZES the full gram array per document
  *     before the Generate (a transient allocation proportional to
  *     document size, re-built per consumer unless checkpointed — the
  *     CollapseProject re-inlining class this repo keeps fighting);
  *   - this generator streams grams straight out of the token array —
  *     no intermediate array, one `UTF8String.concat` per emitted gram,
  *     and the join-free position column comes along for span-style
  *     consumers.
  *
  * Emits `(pos INT, gram STRING)` with `pos` 0-based. Null or shorter-
  * than-n token arrays emit nothing (the filter the HOF spelling needs
  * explicitly). Tokens that are null elements are skipped by emitting
  * nothing for windows containing them — dense token arrays from
  * `split()` never contain nulls, and refusing beats fabricating.
  *
  * Eval-only (`CodegenFallback`): Spark's own generators run through
  * GenerateExec's eval path unless specially wired; the per-row cost is
  * the UTF8String concat, identical either way.
  */
case class NGrams(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "ngrams needs n >= 1")

  override def elementSchema: StructType = StructType(
    StructField("pos", IntegerType, nullable = false) ::
    StructField("gram", StringType, nullable = false) :: Nil)

  override def prettyName: String = "ngrams"

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) return Nil
    val arr = data.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return Nil
    val toks = new Array[UTF8String](len)
    var i = 0
    var hasNull = false
    while (i < len) {
      if (arr.isNullAt(i)) hasNull = true
      else toks(i) = arr.getUTF8String(i)
      i += 1
    }
    (0 to len - n).iterator.flatMap { p =>
      var ok = true
      if (hasNull) {
        var j = p
        while (j < p + n) { if (toks(j) == null) ok = false; j += 1 }
      }
      if (!ok) Iterator.empty
      else {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks(p + j); j += 1 }
        Iterator.single(InternalRow(p, UTF8String.concatWs(space, parts: _*)))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGrams =
    copy(child = newChild)
}
