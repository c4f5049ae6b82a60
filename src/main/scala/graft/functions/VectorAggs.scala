package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed aggregators (UDAF surface) for vector columns.
  *
  * [[VectorMeanAgg]] computes the element-wise mean of an ARRAY<FLOAT>
  * column in ONE pass with map-side partial aggregation — the shuffle
  * carries a single (sum-vector, count) buffer per group instead of the
  * posexplode alternative's dim-fold row blow-up (one row per element per
  * input row, then a second shuffle to reassemble). This is the centroid
  * update step of k-means ([[graft.operators.IvfSearch.train]]).
  */
object VectorAggs {

  final case class MeanBuf(sums: Array[Double], n: Long)

  object VectorMeanAgg extends Aggregator[Seq[Float], MeanBuf, Seq[Double]] {
    override def zero: MeanBuf = MeanBuf(Array.emptyDoubleArray, 0L)

    override def reduce(b: MeanBuf, v: Seq[Float]): MeanBuf = {
      if (v == null) b
      else {
        val sums = if (b.n == 0L) new Array[Double](v.length) else b.sums
        require(sums.length == v.length,
          s"vector length mismatch: ${sums.length} vs ${v.length}")
        var i = 0
        while (i < v.length) { sums(i) += v(i).toDouble; i += 1 }
        MeanBuf(sums, b.n + 1)
      }
    }

    override def merge(a: MeanBuf, b: MeanBuf): MeanBuf =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        require(a.sums.length == b.sums.length)
        val sums = a.sums.clone()
        var i = 0
        while (i < sums.length) { sums(i) += b.sums(i); i += 1 }
        MeanBuf(sums, a.n + b.n)
      }

    override def finish(r: MeanBuf): Seq[Double] =
      if (r.n == 0L) Nil else r.sums.map(_ / r.n).toSeq

    override def bufferEncoder: Encoder[MeanBuf] = Encoders.product[MeanBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Column form of [[VectorMeanAgg]]. */
  def vectorMean(v: Column): Column = {
    implicit val enc: Encoder[Seq[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
    udaf(VectorMeanAgg).apply(v)
  }
}
