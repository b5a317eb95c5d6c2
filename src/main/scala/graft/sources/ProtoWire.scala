package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Minimal protobuf WIRE-FORMAT codec (no generated classes, no
  * descriptor runtime — the connector jars aren't shipped in this
  * container, and the wire format itself is a tiny public spec):
  * varint (wire type 0), fixed64 (1), length-delimited (2), fixed32 (5).
  *
  * The message shape is derived from a Spark `StructType` positionally —
  * struct field `i` is protobuf field number `i + 1` — with the obvious
  * scalar mapping: LONG/INT/BOOLEAN → varint, TIMESTAMP → varint of
  * epoch-MICROS (the khose convention the Avro slot also uses), DOUBLE →
  * fixed64, FLOAT → fixed32, STRING/BINARY → length-delimited. That
  * gives every ingest schema a canonical proto2/proto3-compatible
  * encoding without a .proto compile step; a real producer's message
  * maps on by field number.
  *
  * Decoding is spec-conformant permissive: unknown field numbers are
  * skipped by wire type (forward compatibility), missing fields stay
  * null; structural damage — truncated varint, length running past the
  * buffer, a known field with the wrong wire type, a reserved wire
  * type — raises, which the ingest slot converts into the standard
  * dead-letter row.
  */
object ProtoWire {

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7fL) | 0x80L).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Epoch-micros from whichever JVM type the row carries: TimestampType
    * externalizes as java.sql.Timestamp, TIMESTAMP_NTZ as LocalDateTime
    * (UTC wall-clock — the session tz is pinned UTC so the instant is the
    * same), and java.time.Instant appears under
    * spark.sql.datetime.java8API.enabled. Tolerating all three keeps the
    * encoder working whatever timestamp flavor the upstream frame landed
    * in — `Row.getTimestamp` on a LocalDateTime is a ClassCastException.
    */
  private def microsOf(v: Any): Long = v match {
    case ts: java.sql.Timestamp =>
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    case ldt: java.time.LocalDateTime =>
      val i = ldt.toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case i: java.time.Instant =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case other =>
      throw new IllegalArgumentException(s"not a timestamp value: $other (${other.getClass})")
  }

  /** Encode one row (the producer side — used by the staging harness and
    * any test fixture; a deployment's producer writes the same bytes from
    * its own protobuf library).
    */
  def encode(row: Row, schema: StructType): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        val num = i + 1
        f.dataType match {
          case LongType =>
            writeVarint(out, (num << 3) | 0); writeVarint(out, row.getLong(i))
          case IntegerType =>
            writeVarint(out, (num << 3) | 0); writeVarint(out, row.getInt(i).toLong)
          case BooleanType =>
            writeVarint(out, (num << 3) | 0); writeVarint(out, if (row.getBoolean(i)) 1L else 0L)
          case TimestampType | TimestampNTZType =>
            writeVarint(out, (num << 3) | 0); writeVarint(out, microsOf(row.get(i)))
          case DoubleType =>
            writeVarint(out, (num << 3) | 1)
            val bits = java.lang.Double.doubleToLongBits(row.getDouble(i))
            var k = 0
            while (k < 8) { out.write(((bits >>> (8 * k)) & 0xff).toInt); k += 1 }
          case FloatType =>
            writeVarint(out, (num << 3) | 5)
            val bits = java.lang.Float.floatToIntBits(row.getFloat(i))
            var k = 0
            while (k < 4) { out.write(((bits >>> (8 * k)) & 0xff).toInt); k += 1 }
          case StringType =>
            val b = row.getString(i).getBytes(StandardCharsets.UTF_8)
            writeVarint(out, (num << 3) | 2); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
          case BinaryType =>
            val b = row.getAs[Array[Byte]](i)
            writeVarint(out, (num << 3) | 2); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
          case dt =>
            throw new IllegalArgumentException(s"ProtoWire: unsupported type ${dt.simpleString} for field ${f.name}")
        }
      }
    }
    out.toByteArray
  }

  private final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < bytes.length
    def varint(): Long = {
      var shift = 0
      var acc = 0L
      while (true) {
        if (pos >= bytes.length) throw new IllegalArgumentException("truncated varint")
        if (shift >= 64) throw new IllegalArgumentException("varint overflow")
        val b = bytes(pos); pos += 1
        acc |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
      }
      acc
    }
    def fixed(n: Int): Long = {
      if (pos + n > bytes.length) throw new IllegalArgumentException(s"truncated fixed$n")
      var acc = 0L
      var k = 0
      while (k < n) { acc |= (bytes(pos + k) & 0xffL) << (8 * k); k += 1 }
      pos += n
      acc
    }
    def delimited(): Array[Byte] = {
      val len = varint()
      if (len < 0 || pos + len > bytes.length) throw new IllegalArgumentException("length past buffer")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt)
      pos += len.toInt
      out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 1 => fixed(8); ()
      case 2 => delimited(); ()
      case 5 => fixed(4); ()
      case w => throw new IllegalArgumentException(s"reserved wire type $w")
    }
  }

  private def tsFromMicros(us: Long): java.sql.Timestamp = {
    val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }

  /** Decode one record into field values ordered by the schema (null for
    * absent fields). Throws on structural damage — callers translate to
    * the dead-letter contract.
    */
  def decode(bytes: Array[Byte], schema: StructType): Array[Any] = {
    val vals = new Array[Any](schema.fields.length)
    val r = new Reader(bytes)
    while (r.hasMore) {
      val key = r.varint()
      val num = (key >>> 3).toInt
      val wt = (key & 7).toInt
      if (num < 1 || num > schema.fields.length) r.skip(wt)
      else {
        val i = num - 1
        (schema.fields(i).dataType, wt) match {
          case (LongType, 0)      => vals(i) = r.varint()
          case (IntegerType, 0)   => vals(i) = r.varint().toInt
          case (BooleanType, 0)   => vals(i) = r.varint() != 0L
          case (TimestampType, 0) => vals(i) = tsFromMicros(r.varint())
          case (DoubleType, 1)    => vals(i) = java.lang.Double.longBitsToDouble(r.fixed(8))
          case (FloatType, 5)     => vals(i) = java.lang.Float.intBitsToFloat(r.fixed(4).toInt)
          case (StringType, 2)    => vals(i) = new String(r.delimited(), StandardCharsets.UTF_8)
          case (BinaryType, 2)    => vals(i) = r.delimited()
          case (dt, w) =>
            throw new IllegalArgumentException(s"field $num: wire type $w does not encode ${dt.simpleString}")
        }
      }
    }
    vals
  }
}
