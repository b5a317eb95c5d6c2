package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** SQL-surface parity: the ANSI-portable oracle texts (written for
  * DuckDB) run UNCHANGED through `spark.sql` over temp views and must
  * produce exactly what the DataFrame operators produce — i.e. a SQL
  * user can drive this engine with the same statements they'd run
  * elsewhere. (Oracles using DuckDB-specific functions — list_*,
  * epoch_us, recursive CTE clustering — are exercised by the DuckDB
  * gate instead.)
  */
class SqlSurfaceSpec extends AnyFunSuite {
  import TestSession._

  private lazy val views: Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").createOrReplaceTempView(t)
    }
  }

  private val portable = Seq(
    "q1_agg", "q3_join_agg", "q4_broadcast_join", "q5_semi_join", "q6_anti_join",
    "q9_topk_group", "q13_conditional_agg", "q16_correlated_subquery",
    "q17_multi_join_chain", "q18_having", "q25_window_correlated",
    "q30_full_outer", "q32_null_aggs", "q35_salted_join", "q37_auto_topk",
    "q40_gaps_islands", "q41_share_of_total", "q42_not_in_null"
  )

  private def canon(df: DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(_.toSeq.map(String.valueOf))
      .toSeq
  }

  test("portable oracle SQL texts run unchanged via spark.sql and match the DataFrame plans") {
    views
    portable.foreach { name =>
      val viaSql = canon(spark.sql(SparkEntry.oracleSql(name)))
      val viaDf = canon(SparkEntry.queries(name)(spark, sf))
      assert(viaSql == viaDf, s"$name: spark.sql result differs from the DataFrame operator")
    }
  }
}
