package graft.plans

import graft.SparkSpec
import graft.llm.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Exercises the SparkSessionExtensions surface on a second session that
  * shares the test SparkContext (extensions bind at session build time,
  * so the shared default session can't be used). */
class GraftExtensionsSpec extends SparkSpec {

  private def withExtendedSession(body: SparkSession => Unit): Unit = {
    val base = spark // force init of the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try body(s2)
      finally {
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("graft_poly_hash is callable from SQL and matches the Column API") {
    withExtendedSession { s =>
      val viaSql = s.sql("SELECT graft_poly_hash('hello world') AS h").head().getLong(0)
      val viaCol = s.range(1)
        .select(graft.functions.PolyHash(lit("hello world"), TextAnalysis.FpMod).as("h"))
        .head().getLong(0)
      viaSql shouldBe viaCol
      // explicit modulus form
      val small = s.sql("SELECT graft_poly_hash('hello world', 97) AS h").head().getLong(0)
      small should (be >= 0L and be < 97L)
    }
  }

  test("graft_poly_hash pins exact per-step-mod semantics") {
    withExtendedSession { s =>
      // 'a'=97, 'b'=98: (0*31+97)=97; (97*31+98)=3105
      s.sql("SELECT graft_poly_hash('ab')").head().getLong(0) shouldBe 3105L
      // per-step mod 100: 97%100=97; (97*31+98)%100=5 — NOT 3105%100=5 by
      // coincidence alone: mod is applied at every step (overflow safety)
      s.sql("SELECT graft_poly_hash('ab', 100)").head().getLong(0) shouldBe 5L
      intercept[Exception] { s.sql("SELECT graft_poly_hash()").collect() }
    }
  }

  test("graft_dot / graft_l2sq are callable from SQL") {
    withExtendedSession { s =>
      val r = s.sql(
        "SELECT graft_dot(array(1d,2d,3d), array(4d,5d,6d)) AS d, " +
          "graft_l2sq(array(1d,2d), array(4d,6d)) AS l").head()
      r.getDouble(0) shouldBe 32.0
      r.getDouble(1) shouldBe 25.0
    }
  }

  test("RewritePowSquare turns pow(x,2) into x*x in the optimized plan") {
    withExtendedSession { s =>
      // parquet-backed column: literal inputs would be constant-folded
      // before the rewrite could be observed
      val df = s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(pow(col("l_quantity"), 2).as("sq"), col("l_quantity"))
      val optimized = df.queryExecution.optimizedPlan.toString()
      optimized.toLowerCase should not include "power("
      df.select(max(col("sq") === col("l_quantity") * col("l_quantity"))).head().getBoolean(0) shouldBe true
    }
  }

  test("pow with non-square exponent is left alone") {
    withExtendedSession { s =>
      val df = s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(pow(col("l_quantity"), 3).as("cube"))
      df.queryExecution.optimizedPlan.toString().toLowerCase should include("power(")
    }
  }

  test("the shared session is untouched: no graft_ functions, pow survives") {
    intercept[Exception] {
      spark.sql("SELECT graft_poly_hash('x')").collect()
    }
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(pow(col("l_quantity"), 2).as("sq"))
    df.queryExecution.optimizedPlan.toString().toLowerCase should include("power(")
  }
}
