package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Maintenance, Similarity}
import graft.sources.Tables

/** Round-4 additions: IVF ANN and range-clustered layout. */
class Round4Spec extends AnyFunSuite {
  import TestSession._

  // ------------------------------------------------------------------
  // v7: IVF approximate nearest neighbor
  // ------------------------------------------------------------------
  test("v7 IVF with nProbe = nLists is exhaustive and equals brute force exactly") {
    val brute = Similarity.v1KnnBrute(spark, sf).collect().toSeq
    val full = Similarity.v7KnnIvf(spark, sf, nProbe = 16).collect().toSeq
    assert(full == brute)
  }

  test("v7 IVF at the default 4/16 probe keeps a recall floor and prunes the rerank set") {
    val brute = Similarity.v1KnnBrute(spark, sf).collect()
    val ivf = Similarity.v7KnnIvf(spark, sf).collect()
    val bruteSet = brute.map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfSet = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (bruteSet & ivfSet).size.toDouble / bruteSet.size
    // uniform-random synthetic vectors are ANN-adversarial (neighbors are
    // near-orthogonal); 0.3 is the conservative floor, measured ~0.5
    assert(recall >= 0.3, s"recall@5 = $recall")
    // every returned neighbor must still be a true cosine ranking (sorted
    // per query, descending)
    ivf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val cs = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("v7 IVF is deterministic across invocations") {
    val a = Similarity.v7KnnIvf(spark, sf).collect().toSeq
    val b = Similarity.v7KnnIvf(spark, sf).collect().toSeq
    assert(a == b)
  }

  // ------------------------------------------------------------------
  // c5: range-clustered layout
  // ------------------------------------------------------------------
  test("c5 range layout yields near-disjoint per-file key ranges that prune a quarter-range scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_c5spec_").toString
    Maintenance.rangeLayout(
      Tables.lineitem(spark, sf),
      s"$dir/data",
      16,
      Seq(col("l_shipdate"), col("l_orderkey"))
    )
    // actual per-file key ranges, from the data itself
    val files = spark.read
      .parquet(s"$dir/data")
      .groupBy(input_file_name().as("f"))
      // lexicographic-comparable "yyyy-MM-dd HH:mm:ss" strings (the column
      // is TIMESTAMP_NTZ, which collects as LocalDateTime)
      .agg(
        min(col("l_shipdate")).cast("string").as("lo"),
        max(col("l_shipdate")).cast("string").as("hi")
      )
      .collect()
    assert(files.length == 16)
    val (lo, hi) = ("1996-01-01", "1996-04-01")
    val overlapping = files.count(r => r.getString(2) >= lo && r.getString(1) < hi)
    // one quarter of a ~7-year span ~ 1/28 of rows: at most 2 of 16
    // range-partitioned files may straddle it (interior boundary files)
    assert(overlapping <= 2, s"$overlapping of ${files.length} files overlap the quarter")
    // and the per-file ranges are pairwise near-disjoint: total overlap
    // pairs bounded by adjacency (range partitioner boundaries)
    val ranges = files.map(r => (r.getString(1), r.getString(2))).sortBy(_._1)
    val disjoint = ranges.zip(ranges.tail).count { case ((_, aHi), (bLo, _)) => aHi <= bLo }
    assert(disjoint >= ranges.length - 2)
  }
}
