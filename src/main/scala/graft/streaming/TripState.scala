package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Custom streaming state (SURVEY.md O-STREAM extension; prompt list:
  * `KeyValueGroupedDataset.mapGroupsWithState` for custom state): running
  * per-trip track statistics maintained across micro-batches — the
  * incremental version of the export stage's per-trip aggregation, for a
  * live PDS point feed.
  *
  * State per trip: point count, position sums, latest event time. Works
  * identically on a batch Dataset (state spans the whole input) and a
  * stream (state persists across batches in the state store).
  */
object TripState {

  case class PointEvent(Trip: Long, Time: Timestamp, Lat: Double, Lng: Double)

  case class RunningState(n: Long, sumLat: Double, sumLng: Double, lastMillis: Long)

  case class TripStats(Trip: Long, n_points: Long, lat: Double, lon: Double,
                       last_time: Timestamp)

  private def fold(s: RunningState, e: PointEvent): RunningState =
    RunningState(s.n + 1, s.sumLat + e.Lat, s.sumLng + e.Lng,
      math.max(s.lastMillis, e.Time.getTime))

  def updateTrip(trip: Long, events: Iterator[PointEvent],
                 state: GroupState[RunningState]): TripStats = {
    val s = events.foldLeft(state.getOption.getOrElse(RunningState(0, 0.0, 0.0, 0L)))(fold)
    state.update(s)
    TripStats(trip, s.n, s.sumLat / s.n, s.sumLng / s.n, new Timestamp(s.lastMillis))
  }

  /** Running stats per trip; on a stream, pair with outputMode("update"). */
  def runningTripStats(points: Dataset[PointEvent]): Dataset[TripStats] = {
    implicit val stateEnc = Encoders.product[RunningState]
    implicit val outEnc = Encoders.product[TripStats]
    points.groupByKey(_.Trip)(Encoders.scalaLong)
      .mapGroupsWithState[RunningState, TripStats](GroupStateTimeout.NoTimeout)(updateTrip)
  }
}
