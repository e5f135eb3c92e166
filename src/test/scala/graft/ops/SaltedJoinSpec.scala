package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-identical to the plain join on a skewed key") {
    // one hot key carrying most of the fact side + unmatched keys on
    // both sides (inner semantics must drop them identically)
    val fact = (Seq.tabulate(5000)(i => (1L, i.toLong)) ++
      Seq.tabulate(100)(i => (i.toLong % 7 + 2, i.toLong)) ++
      Seq((99L, -1L))).toDF("key", "fv").repartition(8)
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (42L, "orphan"))
      .toDF("key", "dv")
    val plain = fact.join(dim, Seq("key"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = SaltedJoin.inner(fact, dim, "key", salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    salted shouldBe plain
    plain.length shouldBe 5044 // 5000 hot + 44 small-key matches; orphans dropped
  }

  test("the dimension side explodes to one copy per salt") {
    val dim = Seq((1L, "x")).toDF("key", "dv")
    dim.withColumn("_salt", explode(sequence(lit(0), lit(7)))).count() shouldBe 8L
  }

  test("a hot key confined to ONE input partition still fans out across salts") {
    // the spark_partition_id() salt's failure mode: a single-partition
    // fact gets a single salt and the skew mitigation silently no-ops.
    // The row-local salt must spread the hot key regardless of layout.
    val fact = Seq.tabulate(1024)(i => (1L, i.toLong)).toDF("key", "fv").coalesce(1)
    val salted = fact.withColumn(
      "_salt", pmod(hash(monotonically_increasing_id()), lit(8)))
    salted.select("_salt").distinct().count() shouldBe 8L
    // and the join remains row-identical to plain on that layout
    val dim = Seq((1L, "hot")).toDF("key", "dv")
    SaltedJoin.inner(fact, dim, "key", salts = 8).count() shouldBe 1024L
  }
}
