package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned interval (range) join, shared by the batch query (q63) and the
  * streaming operator. Spark has no inequality-join physical operator —
  * a naive spelling becomes a per-user cross join (quadratic on hot
  * users; in a stream it nested-loops the static side every
  * micro-batch). Binning the time axis AT THE WINDOW LENGTH makes every
  * window [st, st+winSec) cover AT MOST TWO bins, so the join is an
  * equi-join on (user, bin) with a residual range test — shuffle keyed
  * on bounded buckets, never all-pairs. The bin width MUST stay equal to
  * the window length: any other width lets windows span more than two
  * bins and the equi-join silently misses matches. This invariant lives
  * only here.
  */
object IntervalJoin {

  /** Expand windows `(user_id, st)` meaning [st, st+winSec) to their at
    * most two covering bins (array_distinct collapses the aligned case).
    */
  def bins(incidents: DataFrame, winSec: Long): DataFrame =
    incidents.select(
      col("user_id").as("i_user"), col("st"),
      explode(array_distinct(array(
        expr(s"st div $winSec"),
        expr(s"(st + ${winSec - 1}) div $winSec")))).as("i_bin"))

  /** Events (with columns `user_id`, `sec`) that fall inside ANY window
    * of the same user — a LEFT SEMI equi-join, identical for batch
    * frames and stream-static joins.
    */
  def flag(events: DataFrame, incidents: DataFrame, winSec: Long): DataFrame = {
    val b = bins(incidents, winSec)
    val binned = events.withColumn("bin", expr(s"sec div $winSec"))
    binned.join(b,
      binned("user_id") === b("i_user") && binned("bin") === b("i_bin") &&
        binned("sec") >= b("st") && binned("sec") < b("st") + lit(winSec),
      "left_semi")
      .drop("bin")
  }
}
