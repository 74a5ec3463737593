package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SQL-text MERGE INTO → LakeTable.merge translation: Spark's parser, the
 *  engine's merge — no Catalyst surgery. */
class LakeSqlSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): LakeTable = {
    val t = LakeTable(spark, s"${tmpDir(name)}/t")
    t.append(Seq((1L, "a", 1), (2L, "b", 1)).toDF("k", "v", "seq"))
    t
  }

  test("guarded UPDATE SET * / INSERT * upserts through SQL text") {
    val t = fresh("sql_merge")
    LakeSql.register("tgt_table", t)
    Seq((2L, "b2", 2), (3L, "c", 2), (1L, "stale", 0))
      .toDF("k", "v", "seq").createOrReplaceTempView("updates_v")
    try {
      LakeSql.merge(spark,
        """MERGE INTO tgt_table AS t0
           USING updates_v AS u
           ON t0.k = u.k
           WHEN MATCHED AND u.seq >= t0.seq THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""")
    } finally {
      LakeSql.unregister("tgt_table")
      spark.catalog.dropTempView("updates_v")
    }
    // k=1 guard-rejected (stale), k=2 updated, k=3 inserted
    assert(t.read.orderBy("k").as[(Long, String, Int)].collect().toSeq ==
      Seq((1L, "a", 1), (2L, "b2", 2), (3L, "c", 2)))
  }

  test("no MATCHED clause → insert-only; unaliased names and subquery sources work") {
    val t = fresh("sql_insert_only")
    LakeSql.register("tgt2", t)
    Seq((2L, "CLOBBER", 9), (4L, "d", 1)).toDF("k", "v", "seq")
      .createOrReplaceTempView("updates2")
    try {
      LakeSql.merge(spark,
        """MERGE INTO tgt2
           USING (SELECT * FROM updates2 WHERE seq <= 9) AS u
           ON tgt2.k = u.k
           WHEN NOT MATCHED THEN INSERT *""")
    } finally {
      LakeSql.unregister("tgt2")
      spark.catalog.dropTempView("updates2")
    }
    // matched k=2 kept its target version; only k=4 inserted
    assert(t.read.orderBy("k").as[(Long, String, Int)].collect().toSeq ==
      Seq((1L, "a", 1), (2L, "b", 1), (4L, "d", 1)))
  }

  test("unsupported statement shapes fail loudly with the clause named") {
    val t = fresh("sql_errors")
    LakeSql.register("tgt3", t)
    Seq((9L, "z", 1)).toDF("k", "v", "seq").createOrReplaceTempView("updates3")
    def bad(sql: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](LakeSql.merge(spark, sql))
      assert(e.getMessage.toLowerCase.contains(needle), e.getMessage)
    }
    try {
      bad("""MERGE INTO nowhere AS t0 USING updates3 AS u ON t0.k = u.k
             WHEN NOT MATCHED THEN INSERT *""", "no lake table registered")
      bad("""MERGE INTO tgt3 AS t0 USING updates3 AS u ON t0.k >= u.k
             WHEN NOT MATCHED THEN INSERT *""", "conjunction of column equalities")
      bad("""MERGE INTO tgt3 AS t0 USING updates3 AS u ON t0.k = u.seq
             WHEN NOT MATCHED THEN INSERT *""", "differently-named")
      bad("""MERGE INTO tgt3 AS t0 USING updates3 AS u ON t0.k = u.k
             WHEN MATCHED THEN UPDATE SET v = u.v
             WHEN NOT MATCHED THEN INSERT *""", "update set *")
      bad("""MERGE INTO tgt3 AS t0 USING updates3 AS u ON t0.k = u.k
             WHEN MATCHED THEN DELETE
             WHEN NOT MATCHED THEN INSERT *""", "update set *")
      bad("""MERGE INTO tgt3 AS t0 USING updates3 AS u ON t0.k = u.k
             WHEN MATCHED THEN UPDATE SET *""", "insert *")
      bad("""MERGE INTO tgt3 AS t0 USING updates3 AS u ON t0.k = u.k
             WHEN NOT MATCHED THEN INSERT *
             WHEN NOT MATCHED BY SOURCE THEN DELETE""", "not matched by source")
      // the table is untouched by all of the rejected statements
      assert(t.read.count() == 2)
    } finally {
      LakeSql.unregister("tgt3")
      spark.catalog.dropTempView("updates3")
    }
  }

  test("DELETE / UPDATE / OPTIMIZE / DESCRIBE DETAIL statements dispatch") {
    val t = fresh("sql_dml")
    LakeSql.register("dml_t", t)
    try {
      val del = LakeSql.sql(spark, "DELETE FROM dml_t WHERE k = 1")
      assert(del.as[Long].head() == 1L)
      assert(t.read.as[(Long, String, Int)].collect().toSeq == Seq((2L, "b", 1)))
      // merge-on-read delete left a live vector; OPTIMIZE materializes it
      assert(t.deleteVectorDirs.nonEmpty)
      val opt = LakeSql.sql(spark, "OPTIMIZE dml_t")
      assert(opt.columns.toSeq ==
        Seq("files_rewritten", "files_linked", "bytes_rewritten"))
      assert(t.deleteVectorDirs.isEmpty)
      val upd = LakeSql.sql(spark,
        "UPDATE dml_t SET v = concat(v, '!') WHERE k >= 2 AND k <= 9")
      assert(upd.as[Long].head() == 1L)
      assert(t.read.as[(Long, String, Int)].collect().toSeq == Seq((2L, "b!", 1)))
      val det = LakeSql.sql(spark, "DESCRIBE DETAIL dml_t").collect().head
      assert(det.getAs[String]("last_operation") == "update")
      assert(det.getAs[Long]("num_files") >= 1L)
      // ZORDER form routes to compactZOrder
      val z = LakeSql.sql(spark, "OPTIMIZE dml_t ZORDER BY (k)")
      assert(z.select("zorder_by").as[String].head() == "k")
      assert(t.read.as[(Long, String, Int)].collect().toSeq == Seq((2L, "b!", 1)))
    } finally LakeSql.unregister("dml_t")
  }

  test("table-qualified column references in DELETE/UPDATE bind to the snapshot") {
    val t = fresh("sql_qualified")
    LakeSql.register("q_t", t)
    try {
      // CoW update first (a live deletion vector would refuse it), MoR delete after
      assert(LakeSql.sql(spark,
        "UPDATE q_t SET v = upper(q_t.v) WHERE q_t.k >= 2 AND q_t.k <= 2")
        .as[Long].head() == 1L)
      assert(LakeSql.sql(spark, "DELETE FROM q_t WHERE q_t.k = 1")
        .as[Long].head() == 1L)
      assert(t.read.as[(Long, String, Int)].collect().toSeq == Seq((2L, "B", 1)))
    } finally LakeSql.unregister("q_t")
  }

  test("VACUUM / RESTORE / DESCRIBE HISTORY statements dispatch") {
    val t = fresh("sql_lifecycle")                        // v0: append
    LakeSql.register("lc_t", t)
    try {
      t.overwrite(Seq((9L, "z", 9)).toDF("k", "v", "seq")) // v1: bad overwrite
      val hist = LakeSql.sql(spark, "DESCRIBE HISTORY lc_t").collect()
      assert(hist.map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((0L, "append"), (1L, "overwrite")))
      val res = LakeSql.sql(spark, "RESTORE TABLE lc_t TO VERSION AS OF 0")
      assert(res.as[(Long, Long)].head() == ((0L, 2L)))    // v2: the restore
      assert(t.read.orderBy("k").as[(Long, String, Int)].collect().toSeq ==
        Seq((1L, "a", 1), (2L, "b", 1)))
      LakeSql.sql(spark, "VACUUM lc_t RETAIN 1 VERSIONS")
      // v1's overwrite-only data is reclaimed; the restored snapshot reads
      intercept[IllegalArgumentException](t.readVersion(1).collect())
      assert(t.read.count() == 2)
    } finally LakeSql.unregister("lc_t")
  }

  test("ALTER TABLE ADD CONSTRAINT parses through Spark and enforces on write") {
    val t = fresh("sql_constraint")
    LakeSql.register("con_t", t)
    try {
      val res = LakeSql.sql(spark,
        "ALTER TABLE con_t ADD CONSTRAINT positive_seq CHECK (seq > 0)")
      assert(res.as[(String, String)].head() == (("positive_seq", "seq > 0")))
      assert(t.checkConstraints.contains("positive_seq"))
      // the constraint is live: a violating append is rejected atomically
      assert(scala.util.Try(
        t.append(Seq((5L, "bad", -1)).toDF("k", "v", "seq"))).isFailure)
      assert(t.read.count() == 2)
      t.append(Seq((5L, "ok", 3)).toDF("k", "v", "seq"))
      assert(t.read.count() == 3)
    } finally LakeSql.unregister("con_t")
  }

  test("DML statement shapes outside the contract fail loudly") {
    val t = fresh("sql_dml_errors")
    LakeSql.register("dml_e", t)
    def bad(sql: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](LakeSql.sql(spark, sql))
      assert(e.getMessage.toLowerCase.contains(needle), e.getMessage)
    }
    try {
      bad("DELETE FROM nowhere WHERE k = 1", "no lake table registered")
      bad("UPDATE dml_e SET v = 'x'", "without where")
      // non-zone-expressible WHERE (strict inequality) is rejected, not
      // silently run as a full scan
      bad("UPDATE dml_e SET v = 'x' WHERE k > 1", "conjunction")
      bad("UPDATE dml_e SET v = 'x' WHERE k = 1 OR k = 2", "conjunction")
      bad("OPTIMIZE dml_e ZORDER BY ( )", "names no columns")
      bad("SELECT * FROM dml_e", "supports merge / delete / update")
      // identical target/source aliases cannot disambiguate guard refs
      Seq((9L, "z", 1)).toDF("k", "v", "seq").createOrReplaceTempView("dml_u")
      bad("""MERGE INTO dml_e AS x USING dml_u AS x ON x.k = x.k
             WHEN NOT MATCHED THEN INSERT *""", "aliases must differ")
      spark.catalog.dropTempView("dml_u")
      assert(t.read.count() == 2) // nothing mutated by rejected statements
    } finally LakeSql.unregister("dml_e")
  }

  test("composite keys and swapped equality sides resolve") {
    val root = tmpDir("sql_composite")
    val t = LakeTable(spark, s"$root/t")
    t.append(Seq((1L, "x", "old"), (1L, "y", "old")).toDF("k1", "k2", "v"))
    LakeSql.register("comp", t)
    Seq((1L, "x", "new"), (2L, "z", "new")).toDF("k1", "k2", "v")
      .createOrReplaceTempView("comp_updates")
    try {
      LakeSql.merge(spark,
        """MERGE INTO comp AS t0
           USING comp_updates AS u
           ON t0.k1 = u.k1 AND u.k2 = t0.k2
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""")
    } finally {
      LakeSql.unregister("comp")
      spark.catalog.dropTempView("comp_updates")
    }
    assert(t.read.orderBy("k1", "k2").as[(Long, String, String)].collect().toSeq ==
      Seq((1L, "x", "new"), (1L, "y", "old"), (2L, "z", "new")))
  }
}
