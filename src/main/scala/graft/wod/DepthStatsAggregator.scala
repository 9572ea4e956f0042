package graft.wod

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-group depth-profile summary as a typed
  * `org.apache.spark.sql.expressions.Aggregator` — the type-safe custom
  * aggregation API (compile-time checked input, mergeable buffer →
  * map-side partial aggregation like any built-in agg).
  */
object DepthStatsAggregator
    extends Aggregator[Cast, DepthStatsBuffer, DepthStats] {

  override def zero: DepthStatsBuffer = DepthStatsBuffer(0L, 0L, Double.NaN)

  override def reduce(b: DepthStatsBuffer, cast: Cast): DepthStatsBuffer = {
    var maxDepth = b.maxDepth
    var levels = b.levels
    for (d <- cast.depths) {
      levels += 1
      if (d.depth != null &&
        (maxDepth.isNaN || d.depth.doubleValue() > maxDepth))
        maxDepth = d.depth.doubleValue()
    }
    DepthStatsBuffer(b.casts + 1, levels, maxDepth)
  }

  override def merge(a: DepthStatsBuffer, b: DepthStatsBuffer): DepthStatsBuffer =
    DepthStatsBuffer(a.casts + b.casts, a.levels + b.levels,
      if (a.maxDepth.isNaN) b.maxDepth
      else if (b.maxDepth.isNaN) a.maxDepth
      else math.max(a.maxDepth, b.maxDepth))

  override def finish(r: DepthStatsBuffer): DepthStats =
    DepthStats(r.casts, r.levels,
      if (r.maxDepth.isNaN) null else r.maxDepth)

  override def bufferEncoder: Encoder[DepthStatsBuffer] =
    Encoders.product[DepthStatsBuffer]
  override def outputEncoder: Encoder[DepthStats] =
    Encoders.product[DepthStats]
}

final case class DepthStatsBuffer(casts: Long, levels: Long, maxDepth: Double)
final case class DepthStats(casts: Long, levels: Long,
    maxDepth: java.lang.Double)
