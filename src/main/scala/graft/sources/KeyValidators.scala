package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed partition-key decoding for the raw binary sources (X4).
  *
  * The reference renders partition keys through the table's key-validator
  * type — `ColumnFamilyBackend.java:163-166` calls
  * `keyValidator.getString(key)`, where the validator comes from the table
  * schema. This is the engine's equivalent: a small validator algebra whose
  * `format` produces the rendered string AS A SPARK COLUMN (all builtins, so
  * the decode stays inside whole-stage codegen) and whose `encode` produces
  * the on-disk bytes driver-side (fixture writers only — real deployments
  * read keys Cassandra already wrote).
  *
  * Encodings mirror Cassandra's marshal types:
  *  - [[KeyValidator.LongKey]] — 8-byte big-endian two's-complement
  *    (`LongType` marshal);
  *  - [[KeyValidator.Utf8Key]] — raw UTF-8 bytes (`UTF8Type`);
  *  - [[KeyValidator.Int32Key]] — 4-byte big-endian two's-complement
  *    (`Int32Type`);
  *  - [[KeyValidator.UuidKey]] / [[KeyValidator.TimeUuidKey]] — 16 bytes,
  *    most-significant then least-significant long, big-endian
  *    (`UUIDType`/`TimeUUIDType`); rendered canonical dashed lowercase hex
  *    exactly as `UUID.toString` (both marshal types render through it);
  *  - [[KeyValidator.TimestampKey]] — 8-byte big-endian millis since epoch
  *    (`TimestampType`); rendered in the engine's X3 form
  *    `yyyy-MM-dd HH:mm:ss.SSS` UTC (Util.java:26-27 — the reference's own
  *    timestamp render; Cassandra's `TimestampSerializer` uses the node
  *    TZ, a documented divergence in favor of determinism);
  *  - [[KeyValidator.CompositeKey]] — per component: 2-byte big-endian
  *    length, component bytes, one end-of-component byte (0) — Cassandra's
  *    `CompositeType` layout; rendered with ":" separators as
  *    `AbstractCompositeType.getString` does.
  */
object KeyValidator {

  sealed trait Validator {
    /** Rendered string form of a binary key column (X4). */
    def format(key: Column): Column
    /** Driver-side on-disk encoding (fixture generation). */
    def encode(value: Any): Array[Byte]
  }

  case object LongKey extends Validator {
    override def format(key: Column): Column =
      BinaryKeys.beLong(key).cast("string")
    override def encode(value: Any): Array[Byte] =
      java.nio.ByteBuffer.allocate(8)
        .putLong(value.asInstanceOf[Long]).array()
  }

  case object Utf8Key extends Validator {
    override def format(key: Column): Column = key.cast("string")
    override def encode(value: Any): Array[Byte] =
      value.asInstanceOf[String]
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  case object Int32Key extends Validator {
    /** Signed 32-bit decode: `conv(hex, 16, 10)` is unsigned, so values
      * with the sign bit set land in [2^31, 2^32) and are shifted back down
      * — the 4-byte analog of [[BinaryKeys.beLong]]'s two's-complement
      * reassembly. */
    override def format(key: Column): Column = {
      val u = conv(hex(key), 16, 10).cast("long")
      (u - when(u >= 2147483648L, 4294967296L).otherwise(0L))
        .cast("int").cast("string")
    }
    override def encode(value: Any): Array[Byte] =
      java.nio.ByteBuffer.allocate(4)
        .putInt(value.asInstanceOf[Int]).array()
  }

  case object UuidKey extends Validator {
    override def format(key: Column): Column = {
      val h = lower(hex(key))
      concat_ws("-", substring(h, 1, 8), substring(h, 9, 4),
        substring(h, 13, 4), substring(h, 17, 4), substring(h, 21, 12))
    }
    override def encode(value: Any): Array[Byte] = value match {
      case u: java.util.UUID =>
        java.nio.ByteBuffer.allocate(16)
          .putLong(u.getMostSignificantBits)
          .putLong(u.getLeastSignificantBits).array()
      case b: Array[Byte] if b.length == 16 => b
      case s: String => encode(java.util.UUID.fromString(s))
      case v => throw new IllegalArgumentException(s"not a uuid: $v")
    }
  }

  /** `TimeUUIDType` shares `UUIDType`'s 16-byte layout and canonical string
    * render (both go through `UUID.toString`); the distinct validator exists
    * because Cassandra sorts them differently — irrelevant to decode. */
  case object TimeUuidKey extends Validator {
    override def format(key: Column): Column = UuidKey.format(key)
    override def encode(value: Any): Array[Byte] = UuidKey.encode(value)
  }

  case object TimestampKey extends Validator {
    override def format(key: Column): Column =
      date_format(timestamp_millis(BinaryKeys.beLong(key)),
        "yyyy-MM-dd HH:mm:ss.SSS")
    override def encode(value: Any): Array[Byte] =
      java.nio.ByteBuffer.allocate(8)
        .putLong(value.asInstanceOf[Long]).array()
  }

  /** Composite of nested validators. Component offsets are data-dependent,
    * so the walk threads a position COLUMN through `substr` (builtin,
    * codegen'd) instead of fixed offsets. */
  final case class CompositeKey(components: Validator*) extends Validator {
    override def format(key: Column): Column = {
      var pos: Column = lit(1)
      val parts = components.map { c =>
        val len = conv(hex(substr(key, pos, lit(2))), 16, 10).cast("int")
        val comp = substr(key, pos + 2, len)
        pos = pos + 2 + len + 1 // skip the end-of-component byte
        c.format(comp)
      }
      concat_ws(":", parts: _*)
    }
    override def encode(value: Any): Array[Byte] = {
      val vs = value.asInstanceOf[Seq[Any]]
      require(vs.length == components.length,
        s"composite arity ${components.length} != value arity ${vs.length}")
      val bos = new java.io.ByteArrayOutputStream()
      components.lazyZip(vs).foreach { (c, v) =>
        val b = c.encode(v)
        require(b.length <= 0xffff, "component exceeds 2-byte length")
        bos.write(b.length >>> 8); bos.write(b.length & 0xff)
        bos.write(b); bos.write(0)
      }
      bos.toByteArray
    }
  }
}
