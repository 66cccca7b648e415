package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** Partition-transform specs a graft table supports, round-tripped
  * through the `graft.partition` table property as plain strings
  * (`"k"` / `"bucket(8,k)"`).
  *
  *  - IDENTITY: one file per distinct key VALUE (exact clustering +
  *    zone maps). Right for partition-grade cardinality; declines past
  *    `graft.spjMaxKeys` because one-file-per-key at 10k+ keys is the
  *    classic small-files explosion.
  *  - BUCKET(n, col): one file per BUCKET of a high-cardinality key —
  *    the Iceberg bucket-transform shape. The write path routes rows
  *    by `pmod(murmur3(col, seed 42), n)` (Spark's own `hash()`), the
  *    stats manifest records the per-file bucket id as a derived
  *    zone-map column, and the scan reports
  *    `KeyGroupedPartitioning(bucket(n, col))` — so two fact tables
  *    bucketed the same way join with ZERO exchanges at ANY key
  *    cardinality, which is what the identity layout could never give
  *    a fact-fact join.
  */
private[graft] sealed trait PartSpec {
  def col: String
  def render: String
}
private[graft] final case class IdentitySpec(col: String)
    extends PartSpec {
  def render: String = col
}
private[graft] final case class BucketSpec(n: Int, col: String)
    extends PartSpec {
  def render: String = s"bucket($n,$col)"
  /** Manifest stats-column name carrying the per-file bucket id (the
    * derived zone map the scan's key proof reads). The `_g` prefix
    * keeps it out of any real column namespace.
    */
  def statName: String = s"_gbk${n}_$col"
}

private[graft] object PartSpec {
  private val BucketRe = """(?i)bucket\(\s*(\d+)\s*,\s*([^)]+)\)""".r

  def parse(s: String): PartSpec = s.trim match {
    case BucketRe(n, c) => BucketSpec(n.toInt, c.trim)
    case c => IdentitySpec(c)
  }

  /** Split a comma-joined spec list, respecting parentheses. */
  def parseList(s: String): Seq[PartSpec] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case ch => cur += ch
    }
    if (cur.nonEmpty) out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty).map(parse)
  }

  def renderList(specs: Seq[PartSpec]): String =
    specs.map(_.render).mkString(",")

  /** Zone-map stat-column name of one spec: identity columns by name,
    * bucket specs as the derived `_gbk<n>_<col>` column. Every producer
    * and consumer of clustered layouts must agree on this mapping —
    * INSERT's recorded stats, the DML rewrite paths' re-clustering, the
    * scan's key-grouped proof — so it lives HERE and nowhere else.
    */
  def statName(s: PartSpec): String = s match {
    case IdentitySpec(c) => c
    case b: BucketSpec => b.statName
  }

  /** [[statName]] over a spec list. */
  def statNames(specs: Seq[PartSpec]): Seq[String] = specs.map(statName)

  /** The `_gbk<n>_<col>` marker, decoded — the stats writer turns it
    * into an aggregate over the derived bucket expression.
    */
  def bucketOfStatName(name: String): Option[BucketSpec] = {
    val Re = """_gbk(\d+)_(.+)""".r
    name match {
      case Re(n, c) => Some(BucketSpec(n.toInt, c))
      case _ => None
    }
  }

  /** The write-side/function-side bucket id — MUST stay identical on
    * both: `pmod(murmur3(value, seed 42), n)`, exactly what
    * `org.apache.spark.sql.functions.hash` computes. NULL hashes to
    * the seed, so null keys route deterministically too.
    */
  def bucketId(n: Int, value: Any, dt: DataType): Int = {
    val h = new Murmur3Hash(Seq(Literal(value, dt)))
      .eval(InternalRow.empty).asInstanceOf[Int]
    ((h % n) + n) % n
  }
}

/** The catalog-registered V2 `bucket` function: what lets Spark prove
  * two scans' `bucket(n, col)` transforms COMPATIBLE (same canonical
  * name + same n → co-schedule matching buckets, no exchange) and
  * re-shuffle a mismatched side by the same function when
  * `spark.sql.sources.v2.bucketing.shuffle.enabled` is on. Semantics
  * are pinned to the write path's routing expression — see
  * [[PartSpec.bucketId]].
  */
private[graft] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(murmur3(col, seed 42), n) — the graft " +
      "bucket partition transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets INT, value), got $inputType")
    val dt = inputType.fields(1).dataType
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        Integer.valueOf(PartSpec.bucketId(n, input.get(1, dt), dt))
      }
    }
  }
}
