package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator: each partition keeps at most k
  * (score, id) candidates, partials merge by re-trimming — so a per-key
  * top-k costs O(rows·log k) memory-bounded work with NO full sort of
  * the key group (the window row_number formulation sorts every
  * candidate of every key). At 100 TB the difference is a full shuffle
  * sort of the scored pair space vs k rows per key crossing the wire.
  *
  * Ordering: score descending, id ascending on ties — identical to the
  * window formulation's ORDER BY sim DESC, neighbor_id.
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  /** better(a, b): a ranks before b */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortWith(better).take(k)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size < k) trim(buf :+ in)
    else if (better(in, buf.last)) trim(buf :+ in)
    else buf

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(buf)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
