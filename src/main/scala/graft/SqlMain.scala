package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The QUERY half of the khose user contract ([[IngestMain]] is the
  * ingest half): run ANSI SQL against the landed tables from the command
  * line, with the full graft extension stack (graft_* SQL functions,
  * TopK rewrite, MV rewrite, stats broadcast, as-of strategy) installed.
  *
  * {{{
  *   sbt "runMain graft.SqlMain <dataDir> <sql-file|inline SQL> [outPath] [format]"
  * }}}
  *
  * `dataDir` is a directory of `<table>.parquet` stores (the staged
  * TPC-H-ish layout, or any IngestMain output renamed into it) — every
  * table found is registered as a temp view under its file name, plus
  * the normalized `events` view. The second argument is a path to a
  * `.sql` file (statements separated by `;`, `--` comments stripped) or
  * inline SQL text. Without `outPath` the last statement's result prints
  * to stdout (100-row cap); with it, the result lands as
  * parquet/orc/csv/json. Multiple statements run in order — earlier ones
  * can create temp views the last one reads, which is how a khose-style
  * report script is shaped.
  */
object SqlMain {

  /** Split a SQL script into statements: strip `--` line comments, split
    * on `;` outside single-quoted strings, drop blanks.
    */
  def splitStatements(script: String): Seq[String] = {
    val noComments = script.linesIterator
      .map { l =>
        // find -- outside quotes
        var i = 0; var inQ = false; var cut = l.length
        while (i < l.length && cut == l.length) {
          val c = l.charAt(i)
          if (c == '\'') inQ = !inQ
          else if (!inQ && c == '-' && i + 1 < l.length && l.charAt(i + 1) == '-') cut = i
          i += 1
        }
        l.substring(0, cut)
      }
      .mkString("\n")
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    noComments.foreach { c =>
      if (c == '\'') { inQ = !inQ; cur += c }
      else if (c == ';' && !inQ) { out += cur.toString; cur.clear() }
      else cur += c
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Register every `<name>.parquet` under `dataDir` as a temp view, the
    * staged-table set via [[graft.sources.Tables.registerAll]] when the
    * standard tables are present (gets the ts-normalized `events`).
    */
  def registerTables(spark: SparkSession, dataDir: String): Seq[String] = {
    val dir = Paths.get(dataDir)
    require(Files.isDirectory(dir), s"not a directory: $dataDir")
    val listing = Files.list(dir)
    val names =
      try
        listing
          .iterator()
          .asScala
          .map(_.getFileName.toString)
          .filter(_.endsWith(".parquet"))
          .map(_.stripSuffix(".parquet"))
          .toSeq
          .sorted
      finally listing.close()
    names.foreach { n =>
      if (n == "events")
        graft.sources.Tables.events(spark, dataDir).createOrReplaceTempView(n)
      else
        spark.read.parquet(s"$dataDir/$n.parquet").createOrReplaceTempView(n)
    }
    names
  }

  /** Run a script's statements in order; returns the LAST statement's
    * result (earlier statements usually create temp views / run DDL).
    */
  def runScript(spark: SparkSession, script: String): DataFrame = {
    val stmts = splitStatements(script)
    require(stmts.nonEmpty, "no SQL statements found")
    // Intermediate statements run for their SIDE EFFECTS only — and in
    // Spark, commands (CREATE VIEW, DDL, CACHE TABLE, ...) execute
    // EAGERLY inside spark.sql itself (their analyzed plan lands as
    // CommandResult), so invoking spark.sql is sufficient for them. A
    // mid-script non-command (a bare SELECT) would otherwise be built
    // and silently discarded — losing side-effecting expressions like
    // assert_true — so it is FULLY evaluated with a noop write: every
    // row executes on the executors (an assert_true that fails on row
    // 10⁶ fires), nothing lands on the driver.
    stmts.init.foreach { st =>
      val df = spark.sql(st)
      df.queryExecution.analyzed match {
        case _: org.apache.spark.sql.catalyst.plans.logical.CommandResult => () // already ran
        case _ =>
          df.write.format("noop").mode("overwrite").save()
          ()
      }
    }
    spark.sql(stmts.last)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.SqlMain <dataDir> <sql-file|inline SQL> [outPath] [format]")
    val spark = GraftSession.local()
    val registered = registerTables(spark, args(0))
    println(s"[sql] registered views: ${registered.mkString(", ")}")
    val script =
      if (Files.isRegularFile(Paths.get(args(1)))) Files.readString(Paths.get(args(1)))
      else args(1)
    val result = runScript(spark, script)
    // GRAFT_LINT=1: surface the plan-scale warnings (global windows,
    // cartesians, unbounded BNLJ builds) before the result ships
    if (sys.env.get("GRAFT_LINT").contains("1")) {
      val n = graft.plans.PlanLint.report(result, "script result")
      if (n == 0) System.err.println("[plan-lint] script result: clean")
    }
    (args.lift(2), args.lift(3).getOrElse("parquet")) match {
      case (Some(out), fmt) =>
        result.write.mode("overwrite").format(fmt).save(out)
        println(s"[sql] wrote ${spark.read.format(fmt).load(out).count()} rows to $out ($fmt)")
      case (None, _) =>
        result.show(100, truncate = false)
    }
    spark.stop()
  }
}
