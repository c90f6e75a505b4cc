package graft

import graft.sources.LakeTable

/** SQL MERGE INTO / UPDATE over graftlake catalog tables — the planner
  * extension (graft.plans.LakeDml) lowering onto the lake's
  * transactional keyed merge/delete: semantics per clause, one atomic
  * version per statement, loud refusals for the unsupported surface,
  * and non-graftlake targets untouched. */
class LakeDmlSpec extends SparkSpec {

  private def freshRoot(tag: String): String = {
    val p = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_lakedml_$tag").toString
    LakeTable.deleteRecursively(new java.io.File(p))
    p
  }

  private def setupCatalog(tag: String): String = {
    val root = freshRoot(tag)
    spark.conf.set(s"spark.sql.catalog.dml_$tag",
      classOf[graft.sources.GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.dml_$tag.warehouse", root)
    root
  }

  private def stateOf(cat: String): Set[(Long, String, Long)] =
    spark.sql(s"SELECT k, s, v FROM $cat.t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("MERGE INTO: matched rows update, unmatched insert, one version per statement") {
    import spark.implicits._
    val root = setupCatalog("upsert")
    spark.sql("CREATE TABLE dml_upsert.t (k BIGINT, s STRING, v BIGINT) " +
      "TBLPROPERTIES ('keys'='k')")
    (1L to 100L).map(k => (k, "base", k)).toDF("k", "s", "v")
      .createOrReplaceTempView("dml_base")
    spark.sql("INSERT INTO dml_upsert.t SELECT * FROM dml_base")
    // source: updates for k % 10 = 3, plus brand-new keys
    ((1L to 100L).filter(_ % 10 == 3).map(k => (k, "M", k * 2)) ++
      Seq((201L, "N", 1L), (202L, "N", 2L))).toDF("k", "s", "v")
      .createOrReplaceTempView("dml_src")
    val v0 = LakeTable.latestVersion(s"$root/t")
    spark.sql("""MERGE INTO dml_upsert.t AS tg USING dml_src AS src
      ON tg.k = src.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(LakeTable.latestVersion(s"$root/t") == v0 + 1,
      "update ∪ insert must commit as ONE merge version")
    val expect = (1L to 100L).map(k =>
      if (k % 10 == 3) (k, "M", k * 2) else (k, "base", k)).toSet ++
      Set((201L, "N", 1L), (202L, "N", 2L))
    assert(stateOf("dml_upsert") == expect)
    // conditional matched update: source-only condition scopes the class
    spark.sql("""MERGE INTO dml_upsert.t AS tg USING dml_src AS src
      ON tg.k = src.k
      WHEN MATCHED AND src.k < 30 THEN UPDATE SET *""")
    assert(stateOf("dml_upsert") == expect, "idempotent re-merge changed rows")
    // WHEN MATCHED THEN DELETE erases exactly the matched keys
    Seq(Tuple1(13L), Tuple1(201L), Tuple1(999L)).toDF("k")
      .createOrReplaceTempView("dml_doomed")
    spark.sql("""MERGE INTO dml_upsert.t AS tg USING dml_doomed AS d
      ON tg.k = d.k WHEN MATCHED THEN DELETE""")
    assert(stateOf("dml_upsert") ==
      expect.filterNot(r => r._1 == 13L || r._1 == 201L))
  }

  test("UPDATE: partial SET with target-row expressions; key reassignment refused") {
    import spark.implicits._
    val root = setupCatalog("upd")
    spark.sql("CREATE TABLE dml_upd.t (k BIGINT, s STRING, v BIGINT) " +
      "TBLPROPERTIES ('keys'='k')")
    (1L to 50L).map(k => (k, "base", k)).toDF("k", "s", "v")
      .createOrReplaceTempView("dml_upd_base")
    spark.sql("INSERT INTO dml_upd.t SELECT * FROM dml_upd_base")
    // partial SET, value an expression over the target row
    spark.sql("UPDATE dml_upd.t SET s = 'Z', v = v + 1000 WHERE k BETWEEN 10 AND 12")
    assert(stateOf("dml_upd") == (1L to 50L).map(k =>
      if (k >= 10 && k <= 12) (k, "Z", k + 1000) else (k, "base", k)).toSet)
    // merge-identity columns cannot be reassigned
    val e = intercept[UnsupportedOperationException] {
      spark.sql("UPDATE dml_upd.t SET k = k + 1 WHERE k = 1")
    }
    assert(e.getMessage.contains("identity"))
    // copy-on-write held: the 3-key update carried most v2 files
    val v2f = LakeTable.manifestFiles(s"$root/t", 2).toSet
    val v3f = LakeTable.manifestFiles(s"$root/t", 3).toSet
    assert(v2f.intersect(v3f).nonEmpty, "UPDATE rewrote the whole table")
  }

  test("unsupported MERGE shapes and non-lake targets are refused/untouched correctly") {
    import spark.implicits._
    setupCatalog("refuse")
    spark.sql("CREATE TABLE dml_refuse.t (k BIGINT, s STRING, v BIGINT) " +
      "TBLPROPERTIES ('keys'='k')")
    Seq((1L, "a", 1L)).toDF("k", "s", "v").createOrReplaceTempView("dml_r_src")
    spark.sql("INSERT INTO dml_refuse.t SELECT * FROM dml_r_src")
    // ON must cover the merge identity
    val e1 = intercept[UnsupportedOperationException] {
      spark.sql("""MERGE INTO dml_refuse.t AS tg USING dml_r_src AS src
        ON tg.s = src.s WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(e1.getMessage.contains("merge identity"))
    // NOT MATCHED BY SOURCE is out of the supported surface
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql("""MERGE INTO dml_refuse.t AS tg USING dml_r_src AS src
        ON tg.k = src.k WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    }
    assert(e2.getMessage.contains("NOT MATCHED BY SOURCE"))
    // a non-graftlake V2 target still gets Spark's own refusal, not ours
    val e3 = intercept[Exception] {
      spark.sql("""MERGE INTO dml_r_src AS tg USING dml_r_src AS src
        ON tg.k = src.k WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(!e3.isInstanceOf[UnsupportedOperationException] ||
      !e3.getMessage.startsWith("graftlake"))
  }
}
