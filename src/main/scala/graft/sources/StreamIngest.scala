package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The khose core re-expressed as Structured Streaming: consume an event
  * stream, parse JSON into typed columns, land immutable columnar files
  * partitioned by event time.
  *
  * Source selection is config-driven. In this container only the file
  * source can actually run (the kafka connector jar isn't shipped), but
  * the Kafka/Kinesis plumbing is the same `readStream` contract — at
  * deploy time only `IngestSource` changes, nothing downstream does.
  *
  * Scale design: the sink partitions by (dt, hr) so downstream scans
  * partition-prune; `maxFilesPerTrigger`/trigger interval bound batch
  * size; `repartition(sinkPartitions)` controls output file count per
  * micro-batch (target ~128 MB files at production volume). Exactly-once
  * into the sink via checkpoint + file-sink transaction log — the same
  * at-least-once-upgraded-to-idempotent story the reference implements by
  * hand.
  */
object StreamIngest {

  sealed trait IngestSource
  /** JSON-lines files appearing under a directory (also the local test path). */
  final case class FileSource(path: String, maxFilesPerTrigger: Int = 16) extends IngestSource
  /** Kafka topic (requires the spark-sql-kafka connector on the cluster classpath).
    * `maxOffsetsPerTrigger` is the backpressure knob: it caps records per
    * micro-batch so a backlog replay can't blow sink file sizing or state.
    */
  final case class KafkaSource(
      bootstrap: String,
      topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None
  ) extends IngestSource
  /** Kinesis via its Kafka-compatible gateway or the kinesis connector. */
  final case class KinesisSource(streamName: String, region: String) extends IngestSource

  final case class IngestConfig(
      source: IngestSource,
      schema: StructType,
      tsColumn: String,
      outputPath: String,
      checkpointPath: String,
      format: String = "parquet", // or "orc"
      sinkPartitions: Int = 4,
      trigger: Trigger = Trigger.AvailableNow(),
      wireFormat: String = "json", // or "csv" | "avro" | "protobuf" (record-oriented sources)
      avroWriterSchema: Option[String] = None // Avro schema JSON for wireFormat=avro
  )

  /** Build an [[IngestConfig]] from a flat key-value config (the shape a
    * khose-style deployment ships as a properties/env file), so switching
    * an existing pipeline means translating its config, not its code.
    *
    * Keys: `source.type` (file|kafka|kinesis) + per-source keys
    * (`source.path` | `source.bootstrap`/`source.topic` |
    * `source.stream`/`source.region`), `schema.ddl` (Spark DDL string,
    * e.g. "event_id BIGINT, ts TIMESTAMP, ..."), `ts.column`,
    * `sink.path`, `sink.checkpoint`, `sink.format`, `sink.partitions`.
    */
  def fromConfig(conf: Map[String, String]): IngestConfig = {
    def req(key: String): String =
      conf.getOrElse(key, throw new IllegalArgumentException(s"ingest config is missing required key '$key'"))
    val source = conf.getOrElse("source.type", "file") match {
      case "file" =>
        FileSource(req("source.path"), conf.getOrElse("source.maxPerTrigger", "16").toInt)
      case "kafka" =>
        KafkaSource(
          req("source.bootstrap"),
          req("source.topic"),
          conf.getOrElse("source.startingOffsets", "earliest"),
          conf.get("source.maxPerTrigger").map(_.toLong)
        )
      case "kinesis" => KinesisSource(req("source.stream"), req("source.region"))
      case other     => throw new IllegalArgumentException(s"unknown source.type: $other")
    }
    IngestConfig(
      source = source,
      schema = StructType.fromDDL(req("schema.ddl")),
      tsColumn = conf.getOrElse("ts.column", "ts"),
      outputPath = req("sink.path"),
      checkpointPath = req("sink.checkpoint"),
      format = conf.getOrElse("sink.format", "parquet"),
      sinkPartitions = conf.getOrElse("sink.partitions", "4").toInt,
      wireFormat = conf.getOrElse("wire.format", "json"),
      avroWriterSchema = conf.get("wire.avroSchema")
    )
  }

  /** Raw stream of one string column `value` (a JSON document per record). */
  private def readRaw(spark: SparkSession, src: IngestSource): DataFrame = src match {
    case FileSource(path, maxFiles) =>
      spark.readStream
        .option("maxFilesPerTrigger", maxFiles)
        .text(path)
    case KafkaSource(bootstrap, topic, offsets, maxPerTrigger) =>
      val r = spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", offsets)
      maxPerTrigger
        .fold(r)(n => r.option("maxOffsetsPerTrigger", n.toString))
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
    case KinesisSource(stream, region) =>
      spark.readStream
        .format("aws-kinesis")
        .option("streamName", stream)
        .option("region", region)
        .load()
        .selectExpr("CAST(data AS STRING) AS value")
  }

  private def timePartitioned(df: DataFrame, tsColumn: String): DataFrame =
    df.withColumn("dt", date_format(col(tsColumn), "yyyy-MM-dd"))
      .withColumn("hr", date_format(col(tsColumn), "HH"))

  /** Parse + time-partition transform, shared by every source. PERMISSIVE
    * parsing with a corrupt-record column keeps malformed records (typed
    * fields null, original line in `_corrupt`) instead of killing the
    * pipeline.
    */
  def parsed(raw: DataFrame, schema: StructType, tsColumn: String): DataFrame =
    timePartitioned(
      raw
        .select(
          from_json(
            col("value"),
            schema.add("_corrupt_record", org.apache.spark.sql.types.StringType),
            Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")
          ).as("r")
        )
        .select(col("r.*"))
        .withColumnRenamed("_corrupt_record", "_corrupt"),
      tsColumn
    )

  /** CSV wire-format variant of [[parsed]] (one comma-separated record
    * per line, RFC-4180 quoting — the third khose wire shape after JSON
    * and Avro). Same PERMISSIVE contract: malformed lines keep their raw
    * text in `_corrupt`. Timestamps travel at microsecond precision via
    * an explicit format — CSV has no type system, so the format string
    * IS the wire contract and must match the producer's (`toCsvMicros`
    * on the staging side).
    */
  val csvTsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  def parsedCsv(raw: DataFrame, schema: StructType, tsColumn: String): DataFrame =
    timePartitioned(
      raw
        .select(
          from_csv(
            col("value"),
            schema.add("_corrupt_record", org.apache.spark.sql.types.StringType),
            Map(
              "mode" -> "PERMISSIVE",
              "columnNameOfCorruptRecord" -> "_corrupt_record",
              "timestampFormat" -> csvTsFormat
            )
          ).as("r")
        )
        .select(col("r.*"))
        .withColumnRenamed("_corrupt_record", "_corrupt"),
      tsColumn
    )

  /** Avro wire-format variant of [[parsed]] for record-oriented sources
    * (Kafka/Kinesis message values, or a test MemoryStream): each `value`
    * is ONE binary-encoded Avro record (the khose wire shape), decoded
    * per partition with avro-core's GenericDatumReader — the spark-avro
    * connector isn't required. Decode failures follow the same permissive
    * contract as JSON: typed fields null, base64 of the original bytes in
    * `_corrupt`. Timestamp fields dispatch on the writer schema's
    * authoritative logicalType annotation (timestamp-micros vs
    * timestamp-millis); for un-annotated longs only, a magnitude
    * heuristic decides (micros when ≥ 10^13 — epoch millis never reach
    * that before year 2286).
    */
  def parsedAvro(raw: DataFrame, writerSchemaJson: String, schema: StructType, tsColumn: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val outSchema = schema.add("_corrupt", StringType)
    val fields = schema.fields
    val out = raw
      .select(col("value").cast("binary").as("value"))
      .as(Encoders.BINARY)
      .mapPartitions { it =>
        import scala.jdk.CollectionConverters._
        val avroSchema = new org.apache.avro.Schema.Parser().parse(writerSchemaJson)
        val reader =
          new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord](avroSchema)
        var decoder: org.apache.avro.io.BinaryDecoder = null
        // authoritative timestamp unit per field from the writer schema's
        // logicalType (unwrapping nullable unions); None = un-annotated
        def unitOf(fieldName: String): Option[String] = {
          Option(avroSchema.getField(fieldName)).flatMap { f =>
            val s =
              if (f.schema().getType == org.apache.avro.Schema.Type.UNION)
                f.schema().getTypes.asScala
                  .find(_.getType != org.apache.avro.Schema.Type.NULL)
                  .getOrElse(f.schema())
              else f.schema()
            Option(s.getLogicalType).map(_.getName)
          }
        }
        val tsIsMicros: Map[String, Option[Boolean]] = fields.collect {
          case f if f.dataType == TimestampType =>
            f.name -> (unitOf(f.name) match {
              case Some("timestamp-micros") | Some("local-timestamp-micros") => Some(true)
              case Some("timestamp-millis") | Some("local-timestamp-millis") => Some(false)
              case _                                                         => None
            })
        }.toMap
        def convert(v: AnyRef, dt: DataType, name: String): Any = (v, dt) match {
          case (null, _)                           => null
          case (u: org.apache.avro.util.Utf8, StringType) => u.toString
          case (s: String, StringType)             => s
          case (l: java.lang.Long, TimestampType) =>
            val isMicros = tsIsMicros.getOrElse(name, None)
              .getOrElse(math.abs(l) >= 10000000000000L) // heuristic fallback only
            val micros = if (isMicros) l.longValue() else l.longValue() * 1000L
            val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
            ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
            ts
          case (l: java.lang.Long, LongType)       => l
          case (i: java.lang.Integer, IntegerType) => i
          case (d: java.lang.Double, DoubleType)   => d
          case (f: java.lang.Float, FloatType)     => f
          case (b: java.lang.Boolean, BooleanType) => b
          case (other, _)                          => other
        }
        it.map { bytes =>
          try {
            decoder = org.apache.avro.io.DecoderFactory.get().binaryDecoder(bytes, decoder)
            val rec = reader.read(null, decoder)
            Row.fromSeq(fields.toSeq.map(f => convert(rec.get(f.name), f.dataType, f.name)) :+ null)
          } catch {
            case _: Exception =>
              Row.fromSeq(fields.toSeq.map(_ => null) :+ java.util.Base64.getEncoder.encodeToString(bytes))
          }
        }
      }(Encoders.row(outSchema))
    timePartitioned(out, tsColumn)
  }

  /** Protobuf wire-format variant of [[parsed]] for record-oriented
    * sources: each `value` is ONE binary protobuf message whose field
    * numbers map positionally onto `schema` (see [[ProtoWire]] — the
    * fourth khose wire shape after JSON, CSV, and Avro). Same permissive
    * contract as the Avro slot: structural damage keeps the base64 of the
    * original bytes in `_corrupt` with typed fields null; unknown field
    * numbers are skipped (forward compatibility), so a producer can add
    * fields without breaking landed pipelines.
    */
  def parsedProto(raw: DataFrame, schema: StructType, tsColumn: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val outSchema = schema.add("_corrupt", StringType)
    val out = raw
      .select(col("value").cast("binary").as("value"))
      .as(Encoders.BINARY)
      .mapPartitions { it =>
        it.map { bytes =>
          try Row.fromSeq(ProtoWire.decode(bytes, schema).toSeq :+ null)
          catch {
            case _: Exception =>
              Row.fromSeq(schema.fields.toSeq.map(_ => null) :+
                java.util.Base64.getEncoder.encodeToString(bytes))
          }
        }
      }(Encoders.row(outSchema))
    timePartitioned(out, tsColumn)
  }

  /** Launch the ingest query: source → parse → partitioned columnar sink.
    * The repartition is keyed on the sink partition columns so each
    * (dt, hr) directory is written by one task — without the keys, every
    * task writes every directory (tasks × dirs small files per trigger).
    */
  def run(spark: SparkSession, cfg: IngestConfig): StreamingQuery =
    runFromRaw(readRaw(spark, cfg.source), cfg)

  /** [[run]] with a DEAD-LETTER split: well-formed records land in the
    * partitioned columnar table (corrupt column dropped — the table stays
    * clean), malformed records land under `dlqPath` with their original
    * payload and an ingest timestamp for replay/triage. Two independent
    * streaming queries over the same source, each with its own
    * checkpoint, so BOTH paths keep the exactly-once file-sink contract
    * (a foreachBatch two-sink split would be at-least-once).
    */
  def runWithDlq(spark: SparkSession, cfg: IngestConfig, dlqPath: String): (StreamingQuery, StreamingQuery) = {
    val good = {
      val typed = parsedFor(readRaw(spark, cfg.source), cfg)
        .filter(col("_corrupt").isNull)
        .drop("_corrupt")
        .repartition(cfg.sinkPartitions, col("dt"), col("hr"))
      typed.writeStream
        .format(cfg.format)
        .option("path", cfg.outputPath)
        .option("checkpointLocation", cfg.checkpointPath)
        .partitionBy("dt", "hr")
        .trigger(cfg.trigger)
        .outputMode("append")
        .start()
    }
    val dlq = parsedFor(readRaw(spark, cfg.source), cfg)
      .filter(col("_corrupt").isNotNull)
      .select(col("_corrupt").as("payload"), current_timestamp().as("ingest_ts"))
      .writeStream
      .format(cfg.format)
      .option("path", dlqPath)
      .option("checkpointLocation", s"$dlqPath/_ck")
      .trigger(cfg.trigger)
      .outputMode("append")
      .start()
    (good, dlq)
  }

  private def parsedFor(raw: DataFrame, cfg: IngestConfig): DataFrame = cfg.wireFormat match {
    case "json" => parsed(raw, cfg.schema, cfg.tsColumn)
    case "csv"  => parsedCsv(raw, cfg.schema, cfg.tsColumn)
    case "avro" =>
      parsedAvro(
        raw,
        cfg.avroWriterSchema.getOrElse(
          throw new IllegalArgumentException("wireFormat=avro requires avroWriterSchema")
        ),
        cfg.schema,
        cfg.tsColumn
      )
    case "protobuf" => parsedProto(raw, cfg.schema, cfg.tsColumn)
    case other => throw new IllegalArgumentException(s"unknown wireFormat: $other")
  }

  /** MULTI-TOPIC FAN-IN: several (topic, raw stream, parse config) legs
    * — each leg with its OWN wire format — parsed independently, tagged
    * with their topic, and unioned into ONE partitioned sink under one
    * checkpoint (khose's many-topics-one-table shape). The union is a
    * streaming union: each micro-batch drains every leg's available
    * offsets, and the sink partitions by (topic, dt, hr) so per-topic
    * reads prune at the directory level. One streaming query ⇒ the file
    * sink's exactly-once contract covers all legs together.
    */
  def runFanIn(
      legs: Seq[(String, DataFrame, IngestConfig)],
      outputPath: String,
      checkpointPath: String,
      sinkPartitions: Int = 4,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    require(legs.nonEmpty, "fan-in needs at least one leg")
    val union = legs
      .map { case (topic, raw, cfg) => parsedFor(raw, cfg).withColumn("topic", lit(topic)) }
      .reduce(_.unionByName(_))
    union
      .repartition(sinkPartitions, col("topic"), col("dt"), col("hr"))
      .writeStream
      .format("parquet")
      .option("path", outputPath)
      .option("checkpointLocation", checkpointPath)
      .partitionBy("topic", "dt", "hr")
      .trigger(trigger)
      .outputMode("append")
      .start()
  }

  /** The transform+sink half of [[run]], taking an already-constructed
    * raw stream (one string column `value`). Every source — file, Kafka,
    * Kinesis, or a test MemoryStream standing in for a broker — flows
    * through this exact path; swapping the source changes nothing
    * downstream.
    */
  def runFromRaw(raw: DataFrame, cfg: IngestConfig): StreamingQuery = {
    val df = parsedFor(raw, cfg).repartition(cfg.sinkPartitions, col("dt"), col("hr"))
    df.writeStream
      .format(cfg.format)
      .option("path", cfg.outputPath)
      .option("checkpointLocation", cfg.checkpointPath)
      .partitionBy("dt", "hr")
      .trigger(cfg.trigger)
      .outputMode("append")
      .start()
  }
}
