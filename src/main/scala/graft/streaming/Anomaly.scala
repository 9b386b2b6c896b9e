package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming per-key anomaly detection: each key keeps Welford running
 * moments (count, mean, M2) in the checkpointed state store and every
 * observation is z-scored against the state BEFORE it — an observation
 * never vouches for itself, so a level shift is flagged on arrival
 * instead of being absorbed into the baseline first. The batch analogue
 * is q_zscore_outliers; this is its continuous form, with state bounded
 * by the number of live keys (three doubles each), not by traffic.
 *
 * Observations inside a micro-batch replay in `seq` order, and the state
 * carries the last ABSORBED seq so a redelivered observation (an
 * at-least-once source) is dropped instead of double-counted into the
 * moments — the full [[StatefulFeed]] discipline, not just the
 * within-batch sort. An anomalous value still UPDATES the moments after
 * being flagged (the alternative — quarantining outliers from the
 * baseline — is a policy choice; this operator reports, it does not
 * filter). Non-finite observations (NaN/±Inf) are skipped entirely: one
 * NaN absorbed into the moments would poison mean and M2 for the key
 * FOREVER (every later healthy value mis-flagged), and a z-score against
 * a NaN value is meaningless.
 */
object Anomaly {

  /** One observation. `seq` must be monotone per key. */
  final case class Obs(key: String, seq: Long, value: Double)

  /** Welford accumulator: mean + sum of squared deviations, plus the
    * highest seq already absorbed (the redelivery guard). */
  final case class Moments(n: Long, mean: Double, m2: Double, lastSeq: Long)

  /** A flagged observation with the z-score that flagged it. */
  final case class Flag(key: String, seq: Long, value: Double, z: Double)

  implicit private val mEnc: Encoder[Moments] = Encoders.product[Moments]
  implicit private val fEnc: Encoder[Flag] = Encoders.product[Flag]
  implicit private val sEnc: Encoder[String] = Encoders.STRING

  /** Flags observations with |z| >= `zThreshold` against at least
    * `minSamples` PRIOR observations of the same key. */
  def detect(obs: Dataset[Obs], minSamples: Int = 5,
             zThreshold: Double = 3.0): Dataset[Flag] = {
    // n-1 sample-variance divisor: one prior observation would divide by
    // zero (NaN sd) and misroute into the zero-variance branch, flagging
    // ANY second value as infinitely anomalous
    require(minSamples >= 2, "minSamples must be >= 2 (sample variance)")
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Obs], state: GroupState[Moments]) =>
          var m = state.getOption.getOrElse(Moments(0L, 0.0, 0.0, Long.MinValue))
          // the sentinel lastSeq == Long.MinValue guards only once a key
          // HAS state: a first observation carrying seq = Long.MinValue
          // must not be swallowed by the sentinel comparing equal to it
          // (the ShiftQueue hasSeq discipline)
          var hasSeq = state.getOption.isDefined
          val out = scala.collection.mutable.ArrayBuffer.empty[Flag]
          it.toSeq.sortBy(_.seq)
            // non-finite observations never reach the moments — see class doc
            .filter(o => java.lang.Double.isFinite(o.value))
            .foreach { o =>
            // redelivery guard INSIDE the fold, against the live high-water
            // seq: a strict pre-filter reads the batch-initial value, so a
            // duplicated observation within one micro-batch would be
            // absorbed into the moments twice (double-weighted outlier)
            if (!hasSeq || o.seq > m.lastSeq) {
              hasSeq = true
              if (m.n >= minSamples) {
                val variance = m.m2 / (m.n - 1) // sample variance
                val sd = math.sqrt(variance)
                if (sd > 0) {
                  val z = (o.value - m.mean) / sd
                  if (math.abs(z) >= zThreshold) out += Flag(key, o.seq, o.value, z)
                } else if (o.value != m.mean) {
                  // zero-variance history: ANY deviation is infinitely
                  // surprising — flag with the sign carrying the direction
                  out += Flag(key, o.seq, o.value,
                    if (o.value > m.mean) Double.PositiveInfinity
                    else Double.NegativeInfinity)
                }
              }
              val d = o.value - m.mean
              val mean2 = m.mean + d / (m.n + 1)
              m = Moments(m.n + 1, mean2, m.m2 + d * (o.value - mean2), o.seq)
            }
          }
          state.update(m)
          out.iterator
      }
  }
}
