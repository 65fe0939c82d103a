package graft.functions

import java.time.{Instant, LocalDate, LocalDateTime, ZoneId}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** DST-exact local-time bucketing (SURVEY §2 R4) — the one scalar Spark's
  * built-ins genuinely cannot express: `date_trunc` in a session timezone
  * resolves DST gaps/overlaps by the JDK's default rules, while the
  * reference pins specific choices
  * (/root/reference/borsa-core/src/timeseries/resample.rs:212-277):
  *
  *  - day/week bucket: local midnight of the local date (week: Monday);
  *    ambiguous midnight (fall-back across midnight) → the EARLIER instant;
  *    nonexistent midnight (spring-forward across midnight) → UTC day start
  *  - minute bucket: floor of seconds-since-local-midnight; ambiguous →
  *    the mapping whose UTC offset matches the ORIGINAL instant's offset
  *    (keeps the two halves of a fall-back hour in distinct buckets);
  *    nonexistent → plain UTC bucket
  *
  * Implemented as a native `UnaryExpression` over epoch seconds with
  * `doGenCode` (a static kernel call — no virtual eval dispatch, stays
  * inside whole-stage codegen), null-intolerant, foldable when the child
  * is. Input/output are epoch SECONDS (LongType) to match the engine's
  * integer-time convention.
  */
object TzBucketKernel {
  // day: 0, week: 1, minutes: step in seconds (>= 60)
  def bucket(secs: Long, zone: ZoneId, mode: Long): Long = {
    val instant = Instant.ofEpochSecond(secs)
    val local = instant.atZone(zone)
    if (mode <= 1L) {
      val date0 = local.toLocalDate
      val date = if (mode == 1L) date0.minusDays(date0.getDayOfWeek.getValue - 1L) else date0
      val midnight = LocalDateTime.of(date, java.time.LocalTime.MIDNIGHT)
      val offsets = zone.getRules.getValidOffsets(midnight)
      if (offsets.isEmpty) {
        // DST gap swallowed midnight → conservative UTC day start of ts
        Math.floorDiv(secs, 86400L) * 86400L
      } else {
        // ambiguous → earlier instant = the offset BEFORE the transition
        midnight.toEpochSecond(offsets.get(0))
      }
    } else {
      val step = mode
      val sinceMidnight = local.toLocalTime.toSecondOfDay.toLong
      val bucketSec = sinceMidnight - Math.floorMod(sinceMidnight, step)
      val localBucket = LocalDateTime.of(local.toLocalDate, java.time.LocalTime.MIDNIGHT)
        .plusSeconds(bucketSec)
      val offsets = zone.getRules.getValidOffsets(localBucket)
      if (offsets.isEmpty) {
        secs - Math.floorMod(secs, step) // gap → UTC bucket
      } else if (offsets.size == 1) {
        localBucket.toEpochSecond(offsets.get(0))
      } else {
        // overlap → pick the mapping matching the instant's own offset
        val tsOffset = local.getOffset
        val chosen = if (offsets.contains(tsOffset)) tsOffset else offsets.get(0)
        localBucket.toEpochSecond(chosen)
      }
    }
  }
}

case class TzBucket(child: Expression, zoneId: String, mode: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tz_bucket"

  @transient private lazy val zone: ZoneId = ZoneId.of(zoneId)

  override def nullSafeEval(input: Any): Any =
    TzBucketKernel.bucket(input.asInstanceOf[Long], zone, mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val zoneRef = ctx.addReferenceObj("zone", zone, classOf[ZoneId].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TzBucketKernel.bucket($c, $zoneRef, ${mode}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TzBucket {
  /** Local-midnight day bucket (epoch secs). */
  def localDay(secs: Column, tz: String): Column =
    GraftSqlBridge.column(TzBucket(GraftSqlBridge.expression(secs), tz, 0L))

  /** Local Monday-midnight week bucket. */
  def localWeek(secs: Column, tz: String): Column =
    GraftSqlBridge.column(TzBucket(GraftSqlBridge.expression(secs), tz, 1L))

  /** Local N-minute bucket with DST-exact overlap/gap handling. */
  def localMinutes(secs: Column, tz: String, minutes: Int): Column = {
    require(minutes > 0, "minutes must be positive")
    GraftSqlBridge.column(TzBucket(GraftSqlBridge.expression(secs), tz, minutes.toLong * 60L))
  }
}
