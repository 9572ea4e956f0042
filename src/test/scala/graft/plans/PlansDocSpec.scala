package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** PLANS.md (the human-review dump of bench headline physical plans)
  * must track the headline set — it went stale twice when queries
  * joined the bench list without a regenerated section. This gate
  * compares the section names against the registry; on failure,
  * regenerate with `Test/runMain graft.tools.ExplainDump`.
  */
class PlansDocSpec extends AnyFunSuite {
  test("PLANS.md sections match the bench headline set (regenerate " +
      "with Test/runMain graft.tools.ExplainDump on failure)") {
    val md = java.nio.file.Files.readString(
      java.nio.file.Paths.get("PLANS.md"))
    val sections = "(?m)^## (.+)$".r.findAllMatchIn(md)
      .map(_.group(1).trim).toSet
    val headline = graft.queries.Registry.all.filter(_.bench)
      .map(_.name).toSet
    assert(sections === headline,
      s"PLANS.md is stale — missing sections: ${headline -- sections}; " +
        s"dropped queries still documented: ${sections -- headline}")
  }
}
