package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  /** Runs `f` in a second session (shared SparkContext) with graft
    * extensions active; the shared test session stays extension-free so
    * golden-parity suites never see the pow rewrite. */
  private def withExtSession[T](f: SparkSession => T): T = {
    val orig = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder().withExtensions(new GraftExtensions()).getOrCreate()
    try f(s)
    finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("graft_polyhash is SQL-callable with identical semantics") {
    withExtSession { s =>
      s.sql("SELECT graft_polyhash('ab')").collect().head.getLong(0) shouldBe 3105L
      // per-step mod 100: (0*31+97)%100=97; (97*31+98)%100=5
      s.sql("SELECT graft_polyhash('ab', 100)").collect().head.getLong(0) shouldBe 5L
      intercept[Exception] { s.sql("SELECT graft_polyhash()").collect() }
    }
  }

  // literal inputs constant-fold away, so probe with a parquet column
  private val srcSql = "SELECT l_quantity AS x FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`"

  test("SquarePowToMult rewrites pow(x,2) to x*x, leaves pow(x,3) alone") {
    withExtSession { s =>
      val df = s.sql(s"SELECT pow(x, 2) AS sq FROM ($srcSql)")
      val optimized = df.queryExecution.optimizedPlan.toString
      optimized should include("l_quantity#")
      (optimized should not).include("pow(")
      optimized should include("*")
      df.limit(1).collect().head.getDouble(0) should be >= 1.0
      val cubed = s.sql(s"SELECT pow(x, 3) AS c FROM ($srcSql)")
      cubed.queryExecution.optimizedPlan.toString should include("pow(")
    }
  }

  test("extension-free sessions are unaffected (no pow rewrite)") {
    val p = spark.sql(s"SELECT pow(x, 2) AS sq FROM ($srcSql)")
      .queryExecution.optimizedPlan.toString
    p should include("pow(")
  }
}
