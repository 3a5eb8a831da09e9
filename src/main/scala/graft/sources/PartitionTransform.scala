package graft.sources

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style hidden partition transforms for [[ManifestTable]]
  * (Iceberg spec, "Partition Transforms"): a transform maps a source
  * column to a coarse partition value; the writer clusters files by the
  * transform and commits per-file stats on the TRANSFORM value — a
  * virtual column that lives only in the manifest, never in the data —
  * and the prune layer translates point predicates on the SOURCE column
  * through the transform. "Hidden" because queries keep filtering the
  * raw column; they never mention, or even know about, the transform.
  *
  * Why `bucket(n)` earns its place next to the existing stats/bloom
  * tiers: on a hash-clustered layout every file spans ~the full source
  * key range, so min/max on the source column prunes nothing. The
  * per-file blooms (lake5) fix that probabilistically at ~16 KiB per
  * file per column; the bucket transform fixes it EXACTLY — a file
  * whose bucket range excludes bucket(key) provably lacks the key — in
  * a few bytes of min/max on the virtual column. (Range-like transforms
  * such as truncate/date add no power here: per-file min/max on the
  * source column of a range-clustered write already subsumes them.)
  *
  * Soundness: translation produces a NECESSARY condition — rows
  * matching the original predicate always land in the translated
  * buckets — and only for shapes where the mapping is exact: bare
  * column = / <=> / IN literal, composed under And/Or. Anything else
  * (a widening cast on the column side changes the hashed bits; range
  * predicates don't map through a hash at all) contributes no
  * translation and prunes nothing — the keep-biased default, same
  * contract as the bloom exact-type guard.
  */
sealed trait PartitionTransform {
  def sourceCol: String

  /** The virtual stats-column name committed in the manifest. */
  def name: String

  /** Transform output type (the virtual column's type). */
  def dataType: DataType

  /** Spark-side transform expression — used for clustering writes and
    * for the stats collect over staged files. */
  def expr: Column

  /** Driver-side transform of a probe literal in Catalyst's INTERNAL
    * representation (Long/Int/UTF8String). Must agree bit-for-bit with
    * [[expr]] (spec-pinned); None for a value the transform cannot map
    * — no pruning, keep-biased. */
  def literal(v: Any): Option[Any]

  /** Line-safe manifest rendering; [[PartitionTransform.parse]] inverts. */
  def serialized: String

  /** The same transform over another source column — used to translate
    * a caller's LOGICAL column name to the PHYSICAL one on a
    * column-mapped table before the spec is committed. */
  def withSourceCol(c: String): PartitionTransform
}

/** `bucket(n)` — xxhash64 (seed 42, Spark's own `xxhash64` function) mod
  * n, over long/int/string source columns. The driver-side literal path
  * hashes exactly the way Spark's XxHash64 expression hashes the
  * column: longs via hashLong, ints via hashInt, strings via
  * hashUnsafeBytes over UTF-8. */
final case class BucketTransform(n: Int, sourceCol: String) extends PartitionTransform {
  require(n > 0, "bucket count must be positive")

  val name: String = s"bucket_${n}_$sourceCol"
  val dataType: DataType = IntegerType

  def expr: Column = pmod(xxhash64(col(sourceCol)), lit(n.toLong)).cast(IntegerType)

  def literal(v: Any): Option[Any] = {
    val h: Option[Long] = v match {
      case l: Long => Some(XXH64.hashLong(l, 42L))
      case i: Int => Some(XXH64.hashInt(i, 42L))
      case u: UTF8String =>
        val b = u.getBytes
        Some(XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L))
      case s: String =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        Some(XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L))
      case _ => None
    }
    h.map(x => (((x % n) + n) % n).toInt)
  }

  def serialized: String =
    s"bucket:$n:${URLEncoder.encode(sourceCol, StandardCharsets.UTF_8)}"

  def withSourceCol(c: String): PartitionTransform = copy(sourceCol = c)
}

object PartitionTransform {

  def parse(s: String): Option[PartitionTransform] = s.split(":", 3) match {
    case Array("bucket", n, c) =>
      // malformed counts ("bucket:x:.." / "bucket:0:..") degrade to
      // no-pruning like unknown kinds do — a corrupt meta line must
      // never make every read of the table throw
      n.toIntOption.filter(_ > 0)
        .map(BucketTransform(_, URLDecoder.decode(c, StandardCharsets.UTF_8)))
    case _ => None // unknown transform kinds from a future writer: ignore, keep-biased
  }

  /** Translate an ANALYZED predicate into a necessary condition on the
    * transform's virtual column, or None when no sound translation
    * exists. Keep-biased composition: And keeps whichever side
    * translates (a necessary condition for one conjunct is necessary
    * for the conjunction); Or needs BOTH sides (else the untranslated
    * branch could admit rows in any bucket). */
  def translate(t: PartitionTransform, cond: Expression): Option[Expression] = {
    def vattr: AttributeReference = AttributeReference(t.name, t.dataType)()
    // literal side → transformed Literal; None on null (an = / IN null
    // never matches, but mayMatch already handles that on the original
    // condition — no extra power here) or an unmappable value
    def tlit(e: Expression): Option[Literal] =
      if (!e.foldable) None
      else Option(e.eval(EmptyRow)).flatMap(t.literal).map(Literal(_, t.dataType))
    def eq(a: Expression, l: Expression): Option[Expression] = a match {
      // BARE attribute only: a cast on the column side means the literal
      // is in a widened domain and hashes differently than the stored
      // column values — no sound mapping
      case ar: AttributeReference if ar.name == t.sourceCol => tlit(l).map(EqualTo(vattr, _))
      case _ => None
    }
    cond match {
      case And(l, r) => (translate(t, l), translate(t, r)) match {
        case (Some(a), Some(b)) => Some(And(a, b))
        case (a @ Some(_), None) => a
        case (None, b) => b
      }
      case Or(l, r) =>
        for { a <- translate(t, l); b <- translate(t, r) } yield Or(a, b)
      case EqualTo(a, l) if l.foldable => eq(a, l)
      case EqualTo(l, a) if l.foldable => eq(a, l)
      case EqualNullSafe(a, l) if l.foldable => eq(a, l)
      case EqualNullSafe(l, a) if l.foldable => eq(a, l)
      case In(a: AttributeReference, vs) if a.name == t.sourceCol && vs.forall(_.foldable) =>
        // every non-null member must map (a partial mapping would have
        // to keep everything for the unmapped members — no power)
        val nonNull = vs.filter(_.eval(EmptyRow) != null)
        if (nonNull.isEmpty) None
        else {
          val mapped = nonNull.map(tlit)
          if (mapped.exists(_.isEmpty)) None
          else Some(In(vattr, mapped.flatten))
        }
      case _ => None
    }
  }
}
