package graft

import graft.ops.{CoreQueries, ExtQueries, WindowQueries}

/** Contract guards for the driver-facing query registry. */
class RegistrySpec extends SparkSpec {

  private val all = CoreQueries.all ++ WindowQueries.all ++ ExtQueries.all

  test("query names are unique") {
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
  }

  test("every registry entry reaches the driver maps consistently") {
    assert(SparkEntry.queries.keySet == all.map(_.name).toSet)
    // every declared oracle belongs to a declared query
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // EVERY query is oracle-checked (a8's sketches verify via exact values
    // + within-bound booleans since r7) — new entries must ship an oracle
    val oracleLess = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(oracleLess.isEmpty, oracleLess)
  }

  test("oracle SQL references only driver-provided tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // negative lookbehind: `IS [NOT] DISTINCT FROM x` is an operator, not a
    // table reference
    val fromRe = "(?i)(?<!distinct\\s)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)\\b".r
    // CTE names defined inside each query are legal references too
    val cteRe = "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*\\(".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val ctes = cteRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val refs = fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = refs -- tables -- ctes
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }
}
