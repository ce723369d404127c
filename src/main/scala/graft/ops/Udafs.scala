package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregators (SURVEY.md §2.D6 / §2.K2) — the Spark analogue
  * of a user-defined Flink `AggregateFunction<IN, ACC, OUT>`.
  *
  * Determinism: Spark merges partial aggregation buffers in a
  * partition-dependent order. Accumulating raw doubles would make the result
  * run-dependent (float addition is not associative), so the buffer holds
  * exact `BigDecimal`s, each input rounded to 6 decimal places first —
  * byte-identical to the engine-wide `dsum` contract
  * ([[graft.Tables.dsum]]) and to the DuckDB oracle's
  * `SUM(CAST(x AS DECIMAL(18,6)))`.
  */
object Udafs {

  /** Weighted average: sum(v*w)/sum(w), both sums exact in decimal. */
  object WeightedAvg extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {
    private def d6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
    override def reduce(b: (BigDecimal, BigDecimal), in: (Double, Double)): (BigDecimal, BigDecimal) =
      (b._1 + d6(in._1 * in._2), b._2 + d6(in._2))
    override def merge(a: (BigDecimal, BigDecimal), b: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (BigDecimal, BigDecimal)): Double =
      b._1.toDouble / b._2.toDouble
    override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
      Encoders.product[(BigDecimal, BigDecimal)]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-API entry point: weightedAvg(value, weight). */
  def weightedAvg(value: Column, weight: Column): Column =
    udaf(WeightedAvg).apply(value, weight)
}
