package graft

/** Claim-drift guard: SURVEY.md §2 is the coverage contract the rounds
  * are judged on — every table row must be a real, registered operator,
  * and every registered operator must be documented there. */
class SurveySpec extends SparkSpec {

  private lazy val surveyRows: Map[String, String] = {
    val lines = scala.io.Source.fromFile("SURVEY.md", "UTF-8").getLines().toSeq
    val section = lines
      .dropWhile(!_.startsWith("## §2")).takeWhile(!_.startsWith("## §3"))
    val Row = """\|\s*`([a-z0-9_]+)`(?:\s*\(`([a-z0-9_]+)`\))?\s*\|.*\|\s*([a-z, ()]+?)\s*\|""".r
    section.collect {
      case Row(key, alias, oracle) =>
        (Option(alias).getOrElse(key), oracle) // g_export (`g_viz_export`) → alias
    }.toMap
  }

  test("every SURVEY §2 row is a registered query and vice versa") {
    val declared = surveyRows.keySet
    val registered = SparkEntry.queries.keySet
    assert(declared == registered,
      s"survey-only: ${declared -- registered}; unregistered: ${registered -- declared}")
  }

  test("every row claiming a sql oracle has one, and no oracle is orphaned") {
    val sqlDeclared = surveyRows.collect {
      case (k, o) if o.startsWith("sql") => k
    }.toSet
    val withOracle = SparkEntry.oracleSql.keySet
    assert(sqlDeclared == withOracle,
      s"claimed-sql-without-oracle: ${sqlDeclared -- withOracle}; " +
        s"oracle-not-claimed: ${withOracle -- sqlDeclared}")
  }

  test("flagship entry returns rows on the smoke SF") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
