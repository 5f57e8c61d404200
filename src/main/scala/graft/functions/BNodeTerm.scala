package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Spec-mode BNODE term minting (SPARQL §17.4.1.9; reference `todo!`,
  * `/root/reference/src/calc_engine.rs:1319-1331`).
  *
  * Returns a full term struct for a FRESH blank node: kind=edge,
  * str=label, key="bn:"+label — both fields filled from the SAME
  * generated value. Building the struct from a shared `uuid()` Column
  * cannot guarantee that: Spark excludes nondeterministic expressions
  * from subexpression elimination and re-seeds each tree occurrence, so
  * the minted node's lexical form and its identity key would carry two
  * DIFFERENT uuids. One native node is the only shape that makes the
  * two fields consistent by construction.
  *
  * The child is the optional label prefix (nullable plain string; null
  * → unprefixed). Freshness/retry contract mirrors Spark's own `Uuid`:
  * a per-instance seed minted on the driver at construction (distinct
  * BNODE call sites → disjoint label streams) is mixed with the
  * partition index, so task retries regenerate identical labels while
  * every (call site, row) pair gets a distinct one.
  */
case class BNodeTerm(child: Expression,
                     instanceSeed: Long = BNodeTerm.seeds.incrementAndGet())
    extends UnaryExpression with Nondeterministic with CodegenFallback {
  // the seed is a CONSTRUCTOR field (Spark's own Uuid pattern), not a
  // body val: a body val would be re-minted by every Catalyst
  // copy()/transformExpressions pass (breaking the documented
  // stable-across-retries label stream), and two distinct BNODE call
  // sites with equal children would be equals/semanticEquals-equal
  // while behaving differently — a field makes copy preserve it and
  // equality distinguish call sites.

  @transient private var rng: java.util.SplittableRandom = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.util.SplittableRandom(
      instanceSeed * 0x9E3779B97F4A7C15L + partitionIndex)

  override def dataType: DataType = graft.model.Term.schema
  override def nullable: Boolean = false
  override def prettyName: String = BNodeTerm.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName prefix must be a (nullable) string, got $other")
  }

  override protected def evalInternal(input: InternalRow): Any = {
    val u = f"${rng.nextLong()}%016x${rng.nextLong()}%016x"
    val p = child.eval(input)
    val label = if (p == null) u else s"${p.asInstanceOf[UTF8String].toString}_$u"
    InternalRow(
      UTF8String.fromString(graft.model.Term.Kind.Edge),
      null, // num
      UTF8String.fromString(label),
      null, // lang
      UTF8String.fromString("bn:" + label))
  }

  override protected def withNewChildInternal(newChild: Expression): BNodeTerm =
    copy(child = newChild)
}

object BNodeTerm {
  val name = "graft_bnode_term"
  private val seeds = new java.util.concurrent.atomic.AtomicLong()
}
