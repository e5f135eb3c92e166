package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant equi join for a LARGE skewed fact side against a
  * SMALL-but-not-broadcastable dimension side. A plain shuffle join
  * sends every row of a hot key to one task; salting appends a salt
  * component to the join key — the fact side derives its salt from
  * `spark_partition_id()` (deterministic, free, spreads any key that
  * spans input partitions), and the dimension side explodes into
  * `salts` copies so every salted fact key still finds its match. The
  * result is row-identical to the plain join; only the shuffle layout
  * changes (hot key fan-out: 1 task → `salts` tasks).
  *
  * This is the MANUAL form of what AQE skew-join does at runtime
  * (AqeSkewSpec pins that path); it exists for the cases AQE can't
  * reach — skew hidden behind a cached/streaming boundary, or a
  * deliberately static plan. `salts` multiplies the dimension side's
  * shuffle volume, so size it to the hot-key fan-out needed, not to
  * cluster width.
  */
object SaltedJoin {

  /** Inner equi join of `fact` and `dim` on `key` with a salted
    * shuffle. Both inputs must carry the column `key`; `dim`'s other
    * column names must not collide with `fact`'s. */
  def inner(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val f = fact.withColumn("_salt", pmod(spark_partition_id(), lit(salts)))
    val d = dim.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, Seq(key, "_salt")).drop("_salt")
  }
}
