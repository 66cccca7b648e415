package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: bounded top-k collector — keeps the k best
  * (value desc, id asc) ids per group with an O(k) buffer.
  *
  * The scale story vs the window form (`row_number() <= k`): a window
  * sorts every group's full row set; this aggregator's partial buffers
  * cap at k entries per group per partition and merge map-side, so a
  * billion-row group costs O(n·log k) compute and O(k) shuffle bytes
  * instead of an O(n·log n) sort and O(n) shuffle.
  *
  * Input rows are (id, value); output is the ids, best first —
  * deterministic via the (value desc, id asc) total order.
  */
class TopKIds(k: Int) extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[Long]] {

  private def trim(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.sortBy { case (v, id) => (-v, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(b: Seq[(Double, Long)],
      a: (Long, Double)): Seq[(Double, Long)] = {
    // fast path: full buffer and the new row can't displace the current
    // worst entry — one comparison instead of a re-sort (this is what
    // makes the scan O(n log k) rather than O(n·k log k))
    if (b.length == k) {
      val (wv, wid) = b.last // trim keeps the buffer sorted, worst last
      if (a._2 < wv || (a._2 == wv && a._1 >= wid)) return b
    }
    trim(b :+ ((a._2, a._1)))
  }

  override def merge(b1: Seq[(Double, Long)],
      b2: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(b1 ++ b2)

  override def finish(r: Seq[(Double, Long)]): Seq[Long] =
    trim(r).map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
