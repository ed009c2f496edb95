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
