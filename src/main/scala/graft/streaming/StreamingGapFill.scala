package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of q49's time-series resampling: regularize each
  * series onto a dense bin grid AT INGEST, emitting gap bins with the
  * last observed value carried forward as soon as a later observation
  * proves the gap closed.
  *
  * Batch q49 builds the spine after the fact (sequence over
  * min..max); a stream cannot — the spine grows with the watermark.
  * Here the state per series is just (last bin, last value): when an
  * observation for bin b arrives and the state says the previous
  * observation was (b0, v0), the operator emits the missing bins
  * b0+1 .. b−1 as LOCF rows (value v0, is_gap=true) followed by the
  * observed row, then advances the state. Emission happens on the
  * closing observation, so output is exactly the batch spine minus
  * any trailing gap after the final observation (nothing has proven
  * those bins closed yet) — `StreamingGapFillSpec` pins that
  * equivalence against the batch derivation per micro-batch.
  *
  * Scale shape: state is two longs per series (not per bin — a
  * series silent for a week costs nothing until it speaks), output
  * per observation is the gap run it closes, and the stateful shuffle
  * partitions by series key. Observations must arrive per-series in
  * bin order (pre-aggregate per (series, bin) upstream with a
  * watermarked window; late rows belong in that aggregation, not
  * here). A gap run longer than `maxGapBins` emits only the LAST
  * `maxGapBins` bins — a poisoned series (one stray decades-old bin)
  * must not make one key emit millions of rows in one trigger.
  */
object StreamingGapFill {

  case class Obs(series: String, bin: Long, value: Long)
  case class Filled(series: String, bin: Long, value: Long, is_gap: Boolean)
  case class SeriesState(lastBin: Long, lastValue: Long)

  def fill(obs: Dataset[Obs], maxGapBins: Long = 100000L): Dataset[Filled] = {
    val session = obs.sparkSession
    import session.implicits._
    obs.groupByKey(_.series)
      .flatMapGroupsWithState[SeriesState, Filled](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (series, rows, state) =>
          // bin order makes within-batch processing deterministic
          // (micro-batch row order is not)
          val sorted = rows.toSeq.sortBy(_.bin)
          val out = Seq.newBuilder[Filled]
          var st = state.getOption
          sorted.foreach { r =>
            st match {
              case Some(SeriesState(b0, v0)) if r.bin > b0 =>
                val gapFrom = math.max(b0 + 1L, r.bin - maxGapBins)
                (gapFrom until r.bin).foreach { b =>
                  out += Filled(series, b, v0, is_gap = true)
                }
                out += Filled(series, r.bin, r.value, is_gap = false)
                st = Some(SeriesState(r.bin, r.value))
              case Some(_) =>
                // replay or out-of-order: state already covers this bin
                ()
              case None =>
                out += Filled(series, r.bin, r.value, is_gap = false)
                st = Some(SeriesState(r.bin, r.value))
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  /** Batch reference for the same semantics (the q49 spine+LOCF
    * shape, truncated at each series' last observation) — the parity
    * target the spec compares the streamed output against.
    */
  def batchReference(obs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val observed = obs.select(col("series"), col("bin"), col("value"))
    val spine = observed.groupBy("series")
      .agg(min(col("bin")).as("b0"), max(col("bin")).as("b1"))
      .select(col("series"),
        explode(sequence(col("b0"), col("b1"))).as("bin"))
    val wRun = Window.partitionBy("series").orderBy("bin")
    val joined = spine.join(observed, Seq("series", "bin"), "left")
      .withColumn("grp", count(col("value")).over(wRun))
    val wGrp = Window.partitionBy("series", "grp")
    joined.select(col("series"), col("bin"),
      max(col("value")).over(wGrp).as("value"),
      col("value").isNull.as("is_gap"))
  }
}
