package graft

import org.scalatest.funsuite.AnyFunSuite

/** PlanLint as a COMMITTED GATE over the whole query surface (round-13
  * VERDICT item 3): every `SparkEntry.queries` plan is linted and the
  * warning inventory must match `src/test/resources/lint_expected.tsv`
  * exactly — a new scale cliff (global window, cartesian, growable
  * nested-loop build side) in ANY query turns the suite red, and an
  * intentional new scalar-fanout BNLJ must be added to the committed
  * list deliberately (regenerate with GRAFT_LINT_REGEN=1, then review
  * the diff like any code change).
  *
  * Inventory format: one line per query with warnings,
  * `name<TAB>category=count[,category=count...]`, categories
  * window/cartesian/bnlj. Queries absent from the file must lint clean.
  */
class LintSurfaceSpec extends AnyFunSuite {
  import TestSession._

  private val expectedPath = "src/test/resources/lint_expected.tsv"

  private def categorize(w: String): String =
    if (w.contains("GLOBAL WINDOW")) "window"
    else if (w.contains("CARTESIAN")) "cartesian"
    else if (w.contains("NESTED-LOOP")) "bnlj"
    else "other"

  test("PlanLint inventory over every SparkEntry query matches the committed expectation") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val actual: Map[String, Map[String, Int]] = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val warnings =
          try graft.plans.PlanLint.lint(fn(spark, sf))
          catch {
            case e: Throwable =>
              failures += s"$name: failed to build: ${e.getMessage}"
              Nil
          }
        val counts = warnings.groupBy(categorize).view.mapValues(_.size).toMap
        if (counts.isEmpty) None else Some(name -> counts)
    }.toMap
    assert(failures.isEmpty, failures.mkString("\n"))

    def render(m: Map[String, Map[String, Int]]): String =
      m.toSeq
        .sortBy(_._1)
        .map { case (n, cs) =>
          n + "\t" + cs.toSeq.sortBy(_._1).map { case (c, k) => s"$c=$k" }.mkString(",")
        }
        .mkString("\n") + "\n"

    if (sys.env.get("GRAFT_LINT_REGEN").contains("1")) {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(expectedPath), render(actual))
      info(s"regenerated $expectedPath with ${actual.size} flagged queries")
    } else {
      val expected: Map[String, Map[String, Int]] =
        java.nio.file.Files
          .readAllLines(java.nio.file.Paths.get(expectedPath))
          .toArray(Array.empty[String])
          .filter(_.nonEmpty)
          .map { line =>
            val Array(n, cs) = line.split("\t", 2)
            n -> cs
              .split(",")
              .map { kv => val Array(c, k) = kv.split("="); c -> k.toInt }
              .toMap
          }
          .toMap
      val newly = actual.keySet.diff(expected.keySet)
      val cleared = expected.keySet.diff(actual.keySet)
      val drifted = (actual.keySet intersect expected.keySet).filter(k => actual(k) != expected(k))
      assert(
        newly.isEmpty && cleared.isEmpty && drifted.isEmpty,
        s"lint inventory drift — newly flagged: ${newly.toSeq.sorted.map(k => s"$k=${actual(k)}")}; " +
          s"cleared (update the committed list): ${cleared.toSeq.sorted}; " +
          s"changed: ${drifted.toSeq.sorted.map(k => s"$k ${expected(k)} -> ${actual(k)}")}"
      )
    }
  }
}
