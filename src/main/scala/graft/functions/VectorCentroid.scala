package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY §2.10): elementwise mean of dense vectors
  * — the centroid of an embedding cluster (IVF codebook refinement, class
  * prototypes, dedup-cluster representatives).
  *
  * Classic `Aggregator[IN, BUF, OUT]`: the buffer is (runningSum, count);
  * `reduce` folds rows within a partition, `merge` combines partition
  * buffers — so at 100 TB only one 64-double buffer per group crosses the
  * shuffle, never the vectors. FP note: distributed double summation is
  * order-dependent across partitions, so centroid queries are rows-only
  * checked (never hash-compared against a serial oracle).
  */
object VectorCentroid extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Double]): (Array[Double], Long) = {
    if (b._2 == 0L) (v.clone(), 1L)
    else {
      val s = b._1
      var i = 0
      while (i < s.length && i < v.length) { s(i) += v(i); i += 1 }
      (s, b._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._2 == 0L) b
    else if (b._2 == 0L) a
    else {
      val s = a._1
      var i = 0
      while (i < s.length && i < b._1.length) { s(i) += b._1(i); i += 1 }
      (s, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0L) Array.emptyDoubleArray else r._1.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
