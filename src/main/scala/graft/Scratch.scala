package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

// Throwaway experiment harness (not part of the library surface).
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = GraftSession.local(32)
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val brute = time("v1") { Similarity.v1KnnBrute(s, d).collect() }
    val full = time("v7 nProbe=16") { Similarity.v7KnnIvf(s, d, nProbe = 16).collect() }
    println(s"[scratch] full-probe equals brute: ${brute.toSeq == full.toSeq}")
    val ivf = time("v7 nProbe=4") { Similarity.v7KnnIvf(s, d).collect() }
    val bruteSet = brute.map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfSet = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    println(f"[scratch] recall@5 nProbe=4: ${(bruteSet & ivfSet).size.toDouble / bruteSet.size}%.2f")
    s.stop()
  }
}
