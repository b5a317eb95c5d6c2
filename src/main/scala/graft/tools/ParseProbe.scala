package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 evidence tooling (r18 VERDICT item 4): isolate the per-batch
  * JSON parse cost of the streaming harnesses. The s* micro-batches parse
  * the staged JSON-lines band files with `from_json(eventSchema)` inside
  * `addBatch`; this probe times exactly that expression over the SAME
  * to_json-staged bytes as a batch job, so the parse slice of the 5–6.5 s
  * heavy streaming queries can be bounded before deciding whether a
  * faster wire encoding is worth touching the scenario. Measurement
  * only — no query path imports this.
  */
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .configure(
        SparkSession
          .builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.ui.enabled", "false")
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val schema = graft.operators.StreamingBatch.eventSchema
    // stage exactly like StreamingBatch.stageJson: µs-precision ISO ts
    val dir = graft.TempDirs.create("graft_parse_probe_")
    graft.sources.Tables
      .events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .select(
        to_json(
          struct(schema.fieldNames.map(col).toIndexedSeq: _*),
          Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        ).as("value")
      )
      .repartition(1)
      .write
      .mode("overwrite")
      .text(s"$dir/json")

    def time(label: String)(body: => Long): Unit = {
      val reps = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = reps.map(_._1).min
      println(f"""{"probe":"$label%s","min_sec":$best%.3f,"rows":${reps.head._2}}""")
    }

    val raw = spark.read.text(s"$dir/json")
    time("text_scan_only")(raw.count())
    val parseOpts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")
    val full = raw
      .select(
        from_json(col("value"), schema.add("_corrupt_record", org.apache.spark.sql.types.StringType), parseOpts)
          .as("r")
      )
      .select(col("r.*"))
    time("from_json_full")(full.select(max("event_id"), max(unix_micros(col("ts")))).count())
    // same schema but ts kept as STRING: isolates the ISO-timestamp parse
    val sNoTs = org.apache.spark.sql.types.StructType(
      schema.fields.map(f => if (f.name == "ts") f.copy(dataType = org.apache.spark.sql.types.StringType) else f)
    )
    val noTs = raw
      .select(
        from_json(col("value"), sNoTs.add("_corrupt_record", org.apache.spark.sql.types.StringType), parseOpts)
          .as("r")
      )
      .select(col("r.*"))
    time("from_json_ts_as_string")(noTs.select(max("event_id")).count())
    spark.stop()
  }
}
