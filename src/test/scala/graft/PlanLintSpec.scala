package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan lint over EVERY declared query: builds each plan at sf0.001 and
  * rejects physical-plan anti-patterns unless the query is on the
  * documented allowlist. Guards future edits from silently introducing a
  * scale-killer (an unconstrained cartesian product) into the catalog. */
class PlanLintSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  /** Queries whose plan legitimately contains a cartesian join:
    * documented BOUNDED cross joins (both sides capped by an id filter) or
    * broadcast of a 1-row aggregate relation. Everything else must not. */
  private val cartesianAllowed: Set[String] = Set(
    "d13_jaccard_pairs",       // bounded doc_id < 60 both sides (documented)
    "d21_embedding_neardups")  // bounded vec_id < 300 both sides (documented)

  test("no declared query plans an unexpected CartesianProduct") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct") && !cartesianAllowed(name))
          Some(name -> "CartesianProduct")
        else None
      } catch {
        case e: Throwable => Some(name -> s"plan build failed: ${e.getMessage}")
      }
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
