package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: bounded top-k collector that carries a payload —
  * keeps the k best (score desc, id asc) `(id, score)` pairs per group
  * with an O(k) buffer. The payload-carrying sibling of [[TopKIds]],
  * built for KNN-style ranking where the score column must survive into
  * the output (VectorOps top-k: id = neighbor id, score = integer dot).
  *
  * Scale story vs `row_number() OVER (PARTITION BY group ORDER BY …)`:
  * the window form shuffles the ENTIRE scored set into |group| partitions
  * and sorts each — for brute-force KNN that is the full |Q|×|C| cross
  * product funneled through |Q| tasks. This aggregator's partial buffers
  * cap at k entries per group per partition and merge map-side, so the
  * shuffle carries O(|Q|·k) bytes no matter how large the corpus.
  *
  * Input rows are (id, score); buffer is kept sorted best-first, worst
  * last; output is the ranked (id, score) list, best first —
  * deterministic via the (score desc, id asc) total order.
  */
class TopKPairs(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  // buffer entries are (id, score), ordered (score desc, id asc)
  private def trim(b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    b.sortBy { case (id, s) => (-s, id) }.take(k)

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(b: Seq[(Long, Long)],
      a: (Long, Long)): Seq[(Long, Long)] = {
    // fast path: full buffer and the new row can't displace the current
    // worst entry — one comparison instead of a re-sort (O(n log k) scan)
    if (b.length == k) {
      val (wid, ws) = b.last
      if (a._2 < ws || (a._2 == ws && a._1 >= wid)) return b
    }
    trim(b :+ a)
  }

  override def merge(b1: Seq[(Long, Long)],
      b2: Seq[(Long, Long)]): Seq[(Long, Long)] = trim(b1 ++ b2)

  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = trim(r)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
