package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** X320: the canonical bucket hash — ONE definition shared by the
  * write-side file rotation, the SQL FunctionCatalog's ScalarFunction
  * (what Spark resolves `bucket(n, col)` transforms against for
  * storage-partitioned-join compatibility), and any reader. The value
  * hashes through the Murmur3 64-bit finalizer (public-domain mixing
  * constants) and lands in [0, n) via floorMod, so the bucket id is
  * stable across JVMs, sessions and writers — the property the whole
  * layout contract stands on. */
object GraftBucketFn {
  /** Murmur3 fmix64 — avalanche the raw long. */
  def hashLong(v: Long): Int = {
    var h = v
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h.toInt
  }

  /** Strings hash their UTF-8 bytes (FNV-1a 64) then fmix — NOT
    * `String.hashCode` (too clustered for short keys). */
  def hashString(s: org.apache.spark.unsafe.types.UTF8String): Int = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    hashLong(h)
  }

  def bucketLong(n: Int, v: Long): Int =
    java.lang.Math.floorMod(hashLong(v), n)
  def bucketString(n: Int,
      v: org.apache.spark.unsafe.types.UTF8String): Int =
    java.lang.Math.floorMod(hashString(v), n)
}

/** X320: `bucket` as a catalog function — Spark's analyzer binds the
  * `bucket(n, col)` transform that [[GraftCatalogTable.partitioning]]
  * and the write's required distribution report, and BOTH sides of a
  * join resolve to the same canonical function, which is exactly what
  * `KeyGroupedShuffleSpec` compares for storage-partitioned-join
  * compatibility (the Iceberg bucket-join mechanics). */
object GraftBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets INT, col BIGINT|INT|STRING) -> INT: the graft " +
      "layout hash (Murmur3-finalized, floorMod into [0, n))"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, value); got $inputType")
    inputType.fields(1).dataType match {
      case LongType | IntegerType | StringType =>
        new GraftBucketBound(inputType.fields(1).dataType)
      case other => throw new UnsupportedOperationException(
        s"graft bucket: unsupported value type ${other.simpleString} " +
          "(BIGINT, INT or STRING)")
    }
  }
}

class GraftBucketBound(dt: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  /** The SPJ compatibility anchor: two scans' bucket transforms are
    * interchangeable iff this matches (and the argument trees do). */
  override def canonicalName(): String =
    s"graft.bucket(${dt.simpleString})"
  override def produceResult(input: InternalRow): Integer = {
    // NULL in → NULL out, matching the codegen MAGIC path's primitive
    // null propagation (review finding: getLong on a null slot would
    // otherwise invent bucket(0))
    if (input.isNullAt(1)) return null
    val n = input.getInt(0)
    dt match {
      case LongType    => GraftBucketFn.bucketLong(n, input.getLong(1))
      case IntegerType =>
        GraftBucketFn.bucketLong(n, input.getInt(1).toLong)
      case StringType  =>
        GraftBucketFn.bucketString(n, input.getUTF8String(1))
      case other => throw new IllegalStateException(other.toString)
    }
  }
  // the MAGIC fast path: Spark codegen StaticInvoke's these overloads
  // instead of boxing through produceResult
  def invoke(n: Int, v: Long): Int = GraftBucketFn.bucketLong(n, v)
  def invoke(n: Int, v: Int): Int = GraftBucketFn.bucketLong(n, v.toLong)
  def invoke(n: Int,
      v: org.apache.spark.unsafe.types.UTF8String): Int =
    GraftBucketFn.bucketString(n, v)
}

/** X327: the canonical TIME transforms — `days`/`months`/`hours` over
  * a UTC-micros timestamp, ONE definition shared by the write-side
  * rotation, the SQL FunctionCatalog (what Spark resolves the
  * transforms against for SPJ compatibility), and the maintenance
  * rewrite expressions. All floor toward negative infinity, so
  * pre-1970 values bin correctly. */
object GraftTimeFn {
  val MicrosPerDay  = 86_400_000_000L
  val MicrosPerHour = 3_600_000_000L

  /** Epoch DAY of the micros instant (the Iceberg days transform). */
  def days(micros: Long): Int =
    java.lang.Math.floorDiv(micros, MicrosPerDay).toInt

  /** Months since 1970-01 (the Iceberg months transform). */
  def months(micros: Long): Int = {
    val d = java.time.LocalDate.ofEpochDay(
      java.lang.Math.floorDiv(micros, MicrosPerDay))
    (d.getYear - 1970) * 12 + d.getMonthValue - 1
  }

  /** Hours since epoch (the Iceberg hours transform). */
  def hours(micros: Long): Int =
    java.lang.Math.floorDiv(micros, MicrosPerHour).toInt

  def apply(unit: String, micros: Long): Int = unit match {
    case "days"   => days(micros)
    case "months" => months(micros)
    case "hours"  => hours(micros)
    case other => throw new IllegalArgumentException(
      s"unknown time transform $other")
  }
}

/** X327: one time transform as a catalog function — the SPJ
  * resolution anchor, exactly the [[GraftBucketUnbound]] mechanics.
  * `days` results in DATE (epoch-day int), `months`/`hours` in INT —
  * the Iceberg transform result types Spark's key-grouped machinery
  * expects. */
final class GraftTimeUnbound(unit: String) extends UnboundFunction {
  override def name(): String = unit
  override def description(): String =
    s"$unit(ts TIMESTAMP) -> ${if (unit == "days") "DATE" else "INT"}: " +
      "the graft time-partition transform (UTC micros, floored)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"$unit takes one timestamp argument; got $inputType")
    inputType.fields(0).dataType match {
      case TimestampType => new GraftTimeBound(unit)
      case other => throw new UnsupportedOperationException(
        s"graft $unit: unsupported value type ${other.simpleString} " +
          "(TIMESTAMP)")
    }
  }
}

/** VERDICT r15 task 7: the layout functions as CODEGEN'D Columns — an
  * `Invoke` of the bound function's MAGIC overload (exactly what
  * Spark's own V2 function resolution emits for these classes), so
  * maintenance rewrites and staging expressions compute the canonical
  * hash/floor inside whole-stage codegen instead of a boxed Scala UDF.
  * NULL inputs propagate to NULL keys (Invoke's propagateNull),
  * matching the interpreted `produceResult` paths. */
object GraftLayoutExprs {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.expressions.objects.Invoke
  import org.apache.spark.sql.graftshim.Shim

  /** `bucket(n, in)` under the canonical [[GraftBucketFn]] hash;
    * `dt` is the VALUE type (LongType routes Int/Long via a cast the
    * caller supplies). */
  def bucketCol(dt: DataType, n: Int,
      in: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val fn = new GraftBucketBound(dt)
    Shim.column(Invoke(
      Literal.create(fn, ObjectType(classOf[GraftBucketBound])),
      "invoke", IntegerType,
      Seq(Literal(n), Shim.expression(in))))
  }

  /** `days|months|hours(in)` under the canonical [[GraftTimeFn]]
    * floors (DATE-typed result for days). */
  def timeCol(unit: String,
      in: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val fn = new GraftTimeBound(unit)
    Shim.column(Invoke(
      Literal.create(fn, ObjectType(classOf[GraftTimeBound])),
      "invoke", fn.resultType(),
      Seq(Shim.expression(in))))
  }
}

final class GraftTimeBound(unit: String) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(TimestampType)
  override def resultType(): DataType =
    if (unit == "days") DateType else IntegerType
  override def name(): String = unit
  override def canonicalName(): String = s"graft.$unit(timestamp)"
  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(0)) return null
    GraftTimeFn(unit, input.getLong(0))
  }
  // the MAGIC fast path (see GraftBucketBound)
  def invoke(micros: Long): Int = GraftTimeFn(unit, micros)
}
