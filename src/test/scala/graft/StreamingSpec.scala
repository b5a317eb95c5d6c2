package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, StreamingBatch}
import graft.sources.{StreamIngest, Tables}
import graft.streaming.StreamOps

class StreamingSpec extends AnyFunSuite {
  import TestSession._

  test("s1 ingest lands every event, partitioned by dt/hr, corrupt-tolerant") {
    val dir = Files.createTempDirectory("graft_s1_test_").toString
    // stage JSON lines + 2 corrupt lines
    Tables.events(spark, sf).toJSON.coalesce(2).write.mode("overwrite").text(s"$dir/json")
    Files.writeString(
      java.nio.file.Paths.get(s"$dir/json/corrupt.txt"),
      "not json at all\n{\"event_id\": \"badtype\"}\n"
    )
    val q = StreamIngest.run(
      spark,
      StreamIngest.IngestConfig(
        StreamIngest.FileSource(s"$dir/json"),
        StreamingBatch.eventSchema,
        "ts",
        s"$dir/out",
        s"$dir/ck"
      )
    )
    q.awaitTermination()
    val landed = spark.read.parquet(s"$dir/out")
    val nEvents = Tables.events(spark, sf).count()
    assert(landed.filter(col("event_id").isNotNull).count() == nEvents)
    // corrupt rows are captured, not dropped
    assert(landed.filter(col("_corrupt").isNotNull).count() >= 1)
    // physical layout is dt=/hr= partitioned
    assert(new java.io.File(s"$dir/out").listFiles().exists(_.getName.startsWith("dt=")))
  }

  test("s1 ORC sink variant lands the same rows") {
    val dir = Files.createTempDirectory("graft_s1_orc_").toString
    Tables.events(spark, sf).limit(300).toJSON.coalesce(1).write.mode("overwrite").text(s"$dir/json")
    val q = StreamIngest.run(
      spark,
      StreamIngest.IngestConfig(
        StreamIngest.FileSource(s"$dir/json"),
        StreamingBatch.eventSchema,
        "ts",
        s"$dir/out",
        s"$dir/ck",
        format = "orc"
      )
    )
    q.awaitTermination()
    assert(spark.read.orc(s"$dir/out").count() == 300)
  }

  test("s3 streaming dedup keeps one row per key across duplicated input") {
    val dir = Files.createTempDirectory("graft_s3_test_").toString
    val ev = Tables.events(spark, sf).limit(200)
    ev.unionAll(ev).toJSON.coalesce(1).write.mode("overwrite").text(s"$dir/json")
    val stream = StreamIngest.parsed(
      spark.readStream.text(s"$dir/json"),
      StreamingBatch.eventSchema,
      "ts"
    )
    val name = "s3_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamOps
      .streamingDedup(stream.filter(col("event_id").isNotNull), Seq("event_id"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table(name).count() == 200)
  }

  test("s4 stateful sessionization closes sessions in-batch and via watermark timeout") {
    import spark.implicits._
    val input = MemoryStream[StreamOps.SessionEvent](spark, 1)
    val base = 1700000000000L
    val name = "s4_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamOps
      .sessionize(input.toDS())
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .start()
    // batch 1: user 1 burst of 2; user 2 burst of 1 — nothing closes yet
    input.addData(
      StreamOps.SessionEvent(1L, new Timestamp(base)),
      StreamOps.SessionEvent(1L, new Timestamp(base + 60000)),
      StreamOps.SessionEvent(2L, new Timestamp(base))
    )
    q.processAllAvailable()
    // batch 2: user 1 event past the 30-min gap — closes user 1's first
    // session in-batch AND advances the watermark past user 2's timeout
    input.addData(StreamOps.SessionEvent(1L, new Timestamp(base + 100 * 60000)))
    q.processAllAvailable()
    // batch 3: any event lets the engine evaluate pending event-time timeouts
    input.addData(StreamOps.SessionEvent(3L, new Timestamp(base + 101 * 60000)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).as[StreamOps.SessionOut].collect()
    val u1 = rows.filter(_.user_id == 1L)
    assert(u1.length == 1 && u1.head.n_events == 2L) // closed by in-batch gap
    val u2 = rows.filter(_.user_id == 2L)
    assert(u2.length == 1 && u2.head.n_events == 1L) // closed by event-time timeout
  }

  test("s5 stream-stream join: purchases attributed to clicks within 1h") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_s5_").toString
    Tables.events(spark, sf).toJSON.coalesce(2).write.mode("overwrite").text(s"$dir/json")
    val parsed = StreamIngest.parsed(
      spark.readStream.text(s"$dir/json"),
      StreamingBatch.eventSchema,
      "ts"
    )
    val clicks = parsed
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id"))
      .withWatermark("c_ts", "2 hours")
    val purchases = parsed
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", "2 hours")
    val joined = purchases.join(
      clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") && col("c_ts") >= col("p_ts") - expr("interval 1 hour")
    )
    val name = "s5_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = joined.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table(name).count()
    // batch reference: same join on the static table
    val ev = Tables.events(spark, sf)
    val bc = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val bp = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val want = bp.join(
      bc,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") && col("c_ts") >= col("p_ts") - expr("interval 1 hour")
    ).count()
    assert(got == want && want > 0)
  }

  test("s6 foreachBatch upsert: landed state equals latest-event-per-key") {
    val dir = Files.createTempDirectory("graft_s6_").toString
    Tables.events(spark, sf).limit(500).toJSON.coalesce(1).write.mode("overwrite").text(s"$dir/json")
    val parsed = StreamIngest
      .parsed(spark.readStream.text(s"$dir/json"), StreamingBatch.eventSchema, "ts")
      .filter(col("event_id").isNotNull)
    val stateDir = s"$dir/state"
    val q = parsed.writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ck")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // upsert: merge the batch with existing state, keep latest per user
        val existing =
          try spark.read.parquet(stateDir)
          catch { case _: Throwable => spark.emptyDataFrame }
        val all =
          if (existing.columns.isEmpty) batch.select("user_id", "event_id", "ts")
          else existing.unionByName(batch.select("user_id", "event_id", "ts"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
        all.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .write.mode("overwrite").parquet(stateDir + "_next")
        // atomic-ish swap for the test
        val fs = new org.apache.hadoop.fs.Path(stateDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(stateDir), true)
        fs.rename(new org.apache.hadoop.fs.Path(stateDir + "_next"), new org.apache.hadoop.fs.Path(stateDir))
        ()
      }
      .start()
    q.awaitTermination()
    val state = spark.read.parquet(stateDir)
    val want = Tables.events(spark, sf).limit(500)
      .groupBy("user_id").agg(max(struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.event_id").as("event_id"))
    val got = state.select("user_id", "event_id")
    assert(got.count() == want.count())
    assert(got.except(want).count() == 0)
  }

  test("ingest pipeline constructed from flat config runs end-to-end") {
    val dir = Files.createTempDirectory("graft_cfg_").toString
    Tables.events(spark, sf).limit(200).toJSON.coalesce(1).write.mode("overwrite").text(s"$dir/json")
    val cfg = StreamIngest.fromConfig(Map(
      "source.type" -> "file",
      "source.path" -> s"$dir/json",
      "schema.ddl" -> "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING",
      "ts.column" -> "ts",
      "sink.path" -> s"$dir/out",
      "sink.checkpoint" -> s"$dir/ck",
      "sink.format" -> "parquet"
    ))
    val q = StreamIngest.run(spark, cfg)
    q.awaitTermination()
    assert(spark.read.parquet(s"$dir/out").count() == 200)
    // kafka config constructs without running (connector not shipped here)
    val kc = StreamIngest.fromConfig(Map(
      "source.type" -> "kafka", "source.bootstrap" -> "b:9092", "source.topic" -> "t",
      "schema.ddl" -> "ts TIMESTAMP", "sink.path" -> "/x", "sink.checkpoint" -> "/y"
    ))
    assert(kc.source.isInstanceOf[StreamIngest.KafkaSource])
  }

  test("m1 decodeFeatures: iterator-shaped fake decode is deterministic") {
    import spark.implicits._
    val media = Tables
      .documents(spark, sf)
      .limit(50)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[Multimodal.MediaRow]
    val a = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    assert(a.length == 50)
    assert(a.forall(_.features.length == 8))
    assert(a.zip(b).forall { case (x, y) => x.features.sameElements(y.features) })
  }
}
