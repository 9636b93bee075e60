package graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

/** Exponentially-weighted moving aggregations (reference
  * `ewm_mean/ewm_variance/ewm_standard_deviation`, series.ex:5344-5464;
  * Rust opts series.rs:754-830). Polars/pandas-compatible semantics,
  * verified against the reference's test vectors
  * (test/explorer/series_test.exs:4660-4770):
  *
  *  - `adjust = true`: y_t = Σ (1-α)^(t-i) x_i / Σ (1-α)^(t-i)
  *  - `adjust = false`: y_t = (1-α) y_{t-1} + α x_t (y_0 = x_0)
  *  - null inputs propagate to the output; `ignoreNils = true` skips them
  *    in the state entirely, `false` still decays the weights
  *  - `minPeriods`: output null until that many non-null observations
  *  - variance/std use the debiased (bias=false) weighted estimator
  *
  * An EWM is a sequential scan, so it cannot be a Spark window expression.
  * Scale design: rows are hash-partitioned by the group keys and sorted
  * within partitions — each group's scan runs sequentially but groups run
  * in parallel across executors (the same contract as any
  * `mapGroups`-style stateful op). With no keys the scan is a single
  * partition — inherently so, same as the single-node reference. */
object Ewm {

  def ewmMean(df: DataFrame, keys: Seq[String], order: Seq[Column],
      value: String, alpha: Double = 0.5, adjust: Boolean = true,
      ignoreNils: Boolean = true, minPeriods: Int = 1,
      out: String = "ewm_mean"): DataFrame =
    run(df, keys, order, value, alpha, adjust, ignoreNils, minPeriods,
      Seq(out), wants = Seq("mean"))

  def ewmVariance(df: DataFrame, keys: Seq[String], order: Seq[Column],
      value: String, alpha: Double = 0.5, adjust: Boolean = true,
      ignoreNils: Boolean = true, minPeriods: Int = 1,
      out: String = "ewm_var"): DataFrame =
    run(df, keys, order, value, alpha, adjust, ignoreNils, minPeriods,
      Seq(out), wants = Seq("var"))

  def ewmStandardDeviation(df: DataFrame, keys: Seq[String],
      order: Seq[Column], value: String, alpha: Double = 0.5,
      adjust: Boolean = true, ignoreNils: Boolean = true,
      minPeriods: Int = 1, out: String = "ewm_std"): DataFrame =
    run(df, keys, order, value, alpha, adjust, ignoreNils, minPeriods,
      Seq(out), wants = Seq("std"))

  private def run(df: DataFrame, keys: Seq[String], order: Seq[Column],
      value: String, alpha: Double, adjust: Boolean, ignoreNils: Boolean,
      minPeriods: Int, outNames: Seq[String], wants: Seq[String]): DataFrame = {
    val sorted =
      if (keys.nonEmpty)
        df.repartition(keys.map(F.col): _*)
          .sortWithinPartitions(keys.map(F.col) ++ order: _*)
      else df.coalesce(1).sortWithinPartitions(order: _*)

    val outSchema = StructType(df.schema.fields ++
      outNames.map(n => StructField(n, DoubleType, nullable = true)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val vIdx = df.schema.fieldIndex(value)
    val kIdx = keys.map(df.schema.fieldIndex)
    val a = alpha

    sorted.mapPartitions { rows =>
      var curKey: Seq[Any] = null
      // weighted-Welford state; old weights decay by (1-α) per step
      var sumW, sumW2, mean, m2 = 0.0
      var nObs = 0
      rows.map { r =>
        val key = kIdx.map(r.get)
        if (curKey == null || key != curKey) {
          curKey = key; sumW = 0; sumW2 = 0; mean = 0; m2 = 0; nObs = 0
        }
        val isNull = r.isNullAt(vIdx)
        if (!isNull) {
          val x = r.get(vIdx) match {
            case d: java.lang.Double => d.doubleValue()
            case f: java.lang.Float => f.doubleValue()
            case n: java.lang.Number => n.doubleValue()
          }
          val decay = 1.0 - a
          val w = if (adjust || nObs == 0) 1.0 else a
          val scale = if (adjust || nObs > 0) decay else 1.0
          if (nObs > 0) { sumW *= scale; sumW2 *= scale * scale; m2 *= scale }
          val newSumW = sumW + w
          val delta = x - mean
          mean += (w / newSumW) * delta
          m2 += w * delta * (x - mean)
          sumW = newSumW
          sumW2 += w * w
          nObs += 1
        } else if (!ignoreNils && nObs > 0) {
          // decay-only step: weights age, no observation added
          val decay = 1.0 - a
          sumW *= decay; sumW2 *= decay * decay; m2 *= decay
        }
        val emit = !isNull && nObs >= minPeriods
        val outVals = wants.map {
          case "mean" => if (emit) mean else null
          case "var" | "std" =>
            if (!emit) null
            else {
              val denom = sumW - sumW2 / sumW // debiased (bias = false)
              if (denom <= 0) if (nObs >= 1) java.lang.Double.valueOf(0.0) else null
              else {
                val v = m2 / denom
                if (wants.head == "std") math.sqrt(math.max(v, 0.0)) else v
              }
            }
        }
        Row.fromSeq(r.toSeq ++ outVals)
      }
    }(enc)
  }
}
