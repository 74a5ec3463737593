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

  test("oracle SQL has no bare aggregate SUM (DuckDB HUGEINT vs Spark hash)") {
    // DuckDB's integer SUM returns HUGEINT (int128); Spark's returns BIGINT.
    // Values compare equal but the driver hashes TYPED values, so a bare
    // SUM(bigint_col) in an oracle is a guaranteed hash mismatch — exactly
    // the six r15 failures. Every aggregate SUM must carry an explicit
    // outer CAST (CAST(SUM(…) AS BIGINT/DOUBLE), the dsumSql convention).
    // Window SUMs (SUM(…) OVER …) used as island ids inside CTEs are exempt:
    // their HUGEINT result feeds GROUP BY, never the hashed output.
    def matchingClose(s: String, open: Int): Int = {
      var depth = 0; var i = open
      while (i < s.length) {
        s.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) return i
          case _ =>
        }
        i += 1
      }
      -1
    }
    val sumRe = "(?i)\\bSUM\\s*\\(".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      sumRe.findAllMatchIn(sql).foreach { m =>
        val before = sql.substring(0, m.start)
        val castWrapped = "(?i)CAST\\s*\\(\\s*$".r.findFirstIn(before).isDefined
        if (!castWrapped) {
          val close = matchingClose(sql, sql.indexOf('(', m.start))
          val after = if (close >= 0) sql.substring(close + 1).trim else ""
          val isWindow = after.toUpperCase.startsWith("OVER")
          assert(isWindow,
            s"$name: bare SUM at offset ${m.start} — wrap in CAST(SUM(…) AS " +
              s"BIGINT/DOUBLE) so the DuckDB result type matches Spark's: " +
              sql.substring(m.start, math.min(sql.length, m.start + 60)))
        }
      }
    }
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
