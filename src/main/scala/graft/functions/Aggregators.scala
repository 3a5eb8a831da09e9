package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAFs (`Aggregator`) — the user-defined-aggregate surface of the
  * engine. Each must be deterministic and merge-order-independent so
  * results reproduce under any partial-aggregation plan (and against the
  * DuckDB oracle).
  */
object Aggregators {

  /** Argmax with a total tie-break: the (value, id) pair with the largest
    * value, smallest id on ties — order-independent because the comparison
    * is a total order on the pairs. Buffer (Long.MinValue, Long.MaxValue)
    * means "no rows seen".
    */
  val longestDoc: Aggregator[(Long, Long), (Long, Long), (Long, Long)] =
    new Aggregator[(Long, Long), (Long, Long), (Long, Long)] {
      // input and buffer are (id, value) / (value, id)
      override def zero: (Long, Long) = (Long.MinValue, Long.MaxValue)
      private def better(b: (Long, Long), value: Long, id: Long): (Long, Long) =
        if (value > b._1 || (value == b._1 && id < b._2)) (value, id) else b
      override def reduce(b: (Long, Long), in: (Long, Long)): (Long, Long) =
        better(b, in._2, in._1)
      override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
        better(a, b._1, b._2)
      override def finish(b: (Long, Long)): (Long, Long) = b
      override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      override def outputEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    }
}
