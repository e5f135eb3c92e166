package graft.kmeans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed re-centering (A1/A2) as an Aggregator[Point, partial, Point]:
  * the partial is the CORRECT (sums, count) decomposition — the
  * reference's combiner instead emitted partial means
  * (reference `Task4.java:117-134`), which breaks for unequal partial
  * group sizes; this type makes the right algebra explicit and is the
  * typed-Dataset twin of `Recenter.recenter`.
  */
object CentroidAggregator extends Aggregator[Point, (Double, Double, Double, Long), Point] {

  override def zero: (Double, Double, Double, Long) = (0.0, 0.0, 0.0, 0L)

  override def reduce(b: (Double, Double, Double, Long), p: Point): (Double, Double, Double, Long) =
    (b._1 + p.x, b._2 + p.y, b._3 + p.z, b._4 + 1)

  override def merge(a: (Double, Double, Double, Long), b: (Double, Double, Double, Long)): (Double, Double, Double, Long) =
    (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4)

  override def finish(b: (Double, Double, Double, Long)): Point =
    Point(b._1 / b._4, b._2 / b._4, b._3 / b._4)

  override def bufferEncoder: Encoder[(Double, Double, Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Point] = Encoders.product[Point]
}
