package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AsOfJoin vs the naive inequality-join oracle: a left join on
  * `keys AND right.ts <= left.ts`, keeping per left row the match with the
  * greatest right ts, then applying the tolerance. The naive form is what a
  * user would write (and what Spark plans as a nested-loop join) — the
  * union-carry operator must produce identical rows on every fixture,
  * including the null-payload and multi-column-payload shapes the round-5
  * oracle query could not reach.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  /** The naive oracle: per left row (identified by `lid`), the single best
    * match by greatest right ts, tolerance applied post-hoc.
    */
  private def naiveAsOf(
      left: DataFrame,
      right: DataFrame,
      tolerance: Option[Long]): DataFrame = {
    val r = right
      .withColumnRenamed("ts", "m_ts")
      .withColumnRenamed("p1", "m_p1")
      .withColumnRenamed("p2", "m_p2")
    val j = left.join(r, left("k") === r("k") && col("m_ts") <= left("ts"), "left")
      .drop(r("k"))
    val w = Window.partitionBy("lid").orderBy(col("m_ts").desc_nulls_last)
    val best = j.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
    val inTol = tolerance match {
      case Some(tol) => col("m_ts").isNotNull && (col("ts") - col("m_ts") <= tol)
      case None      => col("m_ts").isNotNull
    }
    best.select(col("k"), col("ts"), col("lid"), col("lval"),
      when(inTol, col("m_ts")).as("matched_ts"),
      when(inTol, col("m_p1")).as("p1"),
      when(inTol, col("m_p2")).as("p2"))
  }

  private def asRowSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def checkAgainstOracle(
      left: DataFrame, right: DataFrame, tolerance: Option[Long]): Unit = {
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts",
      Seq("p1", "p2"), tolerance)
    val want = naiveAsOf(left, right, tolerance)
    assert(got.columns.sorted.toSeq == want.columns.sorted.toSeq)
    val g = asRowSet(got.select(want.columns.map(col): _*))
    val w = asRowSet(want)
    assert(g == w,
      s"asof mismatch (tol=$tolerance): only-got=${(g -- w).take(5)} only-want=${(w -- g).take(5)}")
  }

  // left: (k, ts, lid, lval); right: (k, ts, p1 nullable, p2), unique (k, ts)
  private def randomFixture(seed: Long): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(seed)
    val keys = Vector("aa", "bb", "cc")
    val left = (0 until 200).map { i =>
      (keys(rnd.nextInt(3)), rnd.nextInt(500).toLong, i.toLong, rnd.nextInt(100))
    }.toDF("k", "ts", "lid", "lval")
    val right = rnd.shuffle((0 until 500).toVector).take(150).flatMap { t =>
      val k = keys(rnd.nextInt(3))
      val p1: Option[Long] = if (rnd.nextInt(10) < 3) None else Some(rnd.nextInt(1000).toLong)
      Some((k, t.toLong, p1, s"s${rnd.nextInt(5)}"))
    }.toDF("k", "ts", "p1", "p2")
      // distinct (k, ts): keep one row per key+ts (fixture may repeat keys)
      .groupBy("k", "ts").agg(first("p1").as("p1"), first("p2").as("p2"))
    (left, right)
  }

  test("property: matches the naive inequality-join oracle (random fixtures, null + multi-col payloads)") {
    for (seed <- 1L to 4L; tol <- Seq(None, Some(0L), Some(10L), Some(50L))) {
      val (l, r) = randomFixture(seed)
      checkAgainstOracle(l, r, tol)
    }
  }

  test("null payload on the matched row is emitted as NULL, never back-filled from an older row") {
    // the round-5 bug: __m pointed at ts=10 while p1 carried 7L from ts=5
    val right = Seq(
      ("aa", 5L, Some(7L), "old"),
      ("aa", 10L, Option.empty[Long], "new")
    ).toDF("k", "ts", "p1", "p2")
    val left = Seq(("aa", 12L, 0L, 1)).toDF("k", "ts", "lid", "lval")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"))
      .select("matched_ts", "p1", "p2").collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 10L, "must match the newest right row")
    assert(out(0).isNullAt(1), "payload must be the matched row's NULL, not the older 7")
    assert(out(0).getString(2) == "new")
  }

  test("equal timestamps match inclusively; tolerance boundary is inclusive") {
    val right = Seq(("aa", 10L, Some(1L), "x")).toDF("k", "ts", "p1", "p2")
    val left = Seq(
      ("aa", 10L, 0L, 0), // equal ts -> match
      ("aa", 15L, 1L, 0), // ts - m = 5 = tol -> match
      ("aa", 16L, 2L, 0)  // ts - m = 6 > tol -> null
    ).toDF("k", "ts", "lid", "lval")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"),
        tolerance = Some(5L))
      .orderBy("lid").select("matched_ts").collect()
    assert(out(0).getLong(0) == 10L)
    assert(out(1).getLong(0) == 10L)
    assert(out(2).isNullAt(0))
  }

  test("duplicate right timestamps: pre-aggregated right side joins deterministically") {
    // the documented contract: right must be unique per (keys, ts) — the
    // caller pre-aggregates; here max_by(arrival) picks p1=30
    val raw = Seq(
      ("aa", 10L, 20L, 1L),
      ("aa", 10L, 30L, 2L),
      ("aa", 4L, 5L, 1L)
    ).toDF("k", "ts", "p1", "arrival")
    val right = raw.groupBy("k", "ts")
      .agg(max_by(col("p1"), col("arrival")).as("p1"), lit("z").as("p2"))
    val left = Seq(("aa", 11L, 0L, 0)).toDF("k", "ts", "lid", "lval")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"))
      .select("matched_ts", "p1").collect()
    assert(out(0).getLong(0) == 10L && out(0).getLong(1) == 30L)
  }

  test("timestamp-typed ts columns work with tolerance (interpreted in seconds)") {
    val right = Seq(("aa", 100L, 1L)).toDF("k", "es", "p1")
      .select(col("k"), timestamp_seconds(col("es")).as("ts"), col("p1"), lit("x").as("p2"))
    val left = Seq(("aa", 130L, 0L, 0), ("aa", 9999L, 1L, 0)).toDF("k", "es", "lid", "lval")
      .select(col("k"), timestamp_seconds(col("es")).as("ts"), col("lid"), col("lval"))
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"),
        tolerance = Some(60L))
      .orderBy("lid").select("p1").collect()
    assert(out(0).getLong(0) == 1L, "within 60s -> match")
    assert(out(1).isNullAt(0), "beyond 60s -> null")
  }

  test("left rows with no prior right row get all-null match columns") {
    val right = Seq(("aa", 100L, Some(1L), "x")).toDF("k", "ts", "p1", "p2")
    val left = Seq(("aa", 50L, 0L, 9), ("zz", 500L, 1L, 9)).toDF("k", "ts", "lid", "lval")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"))
      .orderBy("lid").select("matched_ts", "p1", "p2").collect()
    out.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2)) }
  }

  /** Naive forward oracle: per left row, the single best match by SMALLEST
    * right ts >= left ts, tolerance `m_ts - ts <= tol` post-hoc.
    */
  private def naiveForward(
      left: DataFrame,
      right: DataFrame,
      tolerance: Option[Long]): DataFrame = {
    val r = right
      .withColumnRenamed("ts", "m_ts")
      .withColumnRenamed("p1", "m_p1")
      .withColumnRenamed("p2", "m_p2")
    val j = left.join(r, left("k") === r("k") && col("m_ts") >= left("ts"), "left")
      .drop(r("k"))
    val w = Window.partitionBy("lid").orderBy(col("m_ts").asc_nulls_last)
    val best = j.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
    val inTol = tolerance match {
      case Some(tol) => col("m_ts").isNotNull && (col("m_ts") - col("ts") <= tol)
      case None      => col("m_ts").isNotNull
    }
    best.select(col("k"), col("ts"), col("lid"), col("lval"),
      when(inTol, col("m_ts")).as("matched_ts"),
      when(inTol, col("m_p1")).as("p1"),
      when(inTol, col("m_p2")).as("p2"))
  }

  test("forward property: matches the naive oracle (time-reversal of the backward carry)") {
    for (seed <- 10L to 12L; tol <- Seq(None, Some(0L), Some(10L), Some(50L))) {
      val (l, r) = randomFixture(seed)
      val got = AsOfJoin.forward(l, r, Seq("k"), "ts", "ts", Seq("p1", "p2"), tol)
      val want = naiveForward(l, r, tol)
      val g = asRowSet(got.select(want.columns.map(col): _*))
      val w = asRowSet(want)
      assert(g == w,
        s"forward asof mismatch (tol=$tol): only-got=${(g -- w).take(5)} only-want=${(w -- g).take(5)}")
    }
  }

  test("forward: equal ts matches; tolerance boundary inclusive; timestamps rejected") {
    val right = Seq(("aa", 10L, Some(1L), "x")).toDF("k", "ts", "p1", "p2")
    val left = Seq(
      ("aa", 10L, 0L, 0), // equal ts -> match
      ("aa", 5L, 1L, 0),  // m - ts = 5 = tol -> match
      ("aa", 4L, 2L, 0),  // m - ts = 6 > tol -> null
      ("aa", 11L, 3L, 0)  // no right row at/after -> null
    ).toDF("k", "ts", "lid", "lval")
    val out = AsOfJoin.forward(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"),
        tolerance = Some(5L))
      .orderBy("lid").select("matched_ts", "ts").collect()
    assert(out(0).getLong(0) == 10L && out(1).getLong(0) == 10L)
    assert(out(2).isNullAt(0) && out(3).isNullAt(0))
    assert(out.map(_.getLong(1)).toSeq == Seq(10L, 5L, 4L, 11L), "left ts must round-trip the negation")
    val tsL = left.select(col("k"), timestamp_seconds(col("ts")).as("ts"), col("lid"), col("lval"))
    val tsR = right.select(col("k"), timestamp_seconds(col("ts")).as("ts"), col("p1"), col("p2"))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.forward(tsL, tsR, Seq("k"), "ts", "ts", Seq("p1", "p2"))
    }
    assert(e.getMessage.contains("numeric"))
  }

  /** Naive nearest oracle: min |m_ts - ts| within tolerance on both sides,
    * ties broken backward (m_ts <= ts preferred).
    */
  private def naiveNearest(
      left: DataFrame,
      right: DataFrame,
      tolerance: Option[Long]): DataFrame = {
    val r = right
      .withColumnRenamed("ts", "m_ts")
      .withColumnRenamed("p1", "m_p1")
      .withColumnRenamed("p2", "m_p2")
    val tolOk = tolerance.map(t => abs(col("m_ts") - left("ts")) <= t).getOrElse(lit(true))
    val j = left.join(r, left("k") === r("k") && tolOk, "left").drop(r("k"))
    val w = Window.partitionBy("lid").orderBy(
      abs(col("m_ts") - col("ts")).asc_nulls_last,
      // tie → backward: among equal distances the SMALLER m_ts is the
      // backward candidate
      col("m_ts").asc_nulls_last)
    j.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("k"), col("ts"), col("lid"), col("lval"),
        col("m_ts").as("matched_ts"), col("m_p1").as("p1"), col("m_p2").as("p2"))
  }

  test("nearest property: min |distance| within tolerance, ties backward, one window pass") {
    for (seed <- 20L to 22L; tol <- Seq(None, Some(0L), Some(10L), Some(50L))) {
      val (l, r) = randomFixture(seed)
      val got = AsOfJoin.nearest(l, r, Seq("k"), "ts", "ts", Seq("p1", "p2"), tol)
      val want = naiveNearest(l, r, tol)
      val g = asRowSet(got.select(want.columns.map(col): _*))
      val w = asRowSet(want)
      assert(g == w,
        s"nearest mismatch (tol=$tol): only-got=${(g -- w).take(5)} only-want=${(w -- g).take(5)}")
    }
  }

  test("nearest: tie prefers backward; tolerance excludes both sides independently") {
    val right = Seq(
      ("aa", 5L, Some(1L), "before"),
      ("aa", 15L, Some(2L), "after")
    ).toDF("k", "ts", "p1", "p2")
    val left = Seq(
      ("aa", 10L, 0L, 0), // equidistant (5 vs 5) -> backward row wins
      ("aa", 13L, 1L, 0), // after is nearer (2 vs 8)
      ("aa", 30L, 2L, 0)  // nearest is 'after' at distance 15 > tol -> null
    ).toDF("k", "ts", "lid", "lval")
    val out = AsOfJoin.nearest(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"),
        tolerance = Some(10L))
      .orderBy("lid").select("p2").collect()
    assert(out(0).getString(0) == "before", "tie must break backward")
    assert(out(1).getString(0) == "after")
    assert(out(2).isNullAt(0))
  }

  test("forward: null payload on the matched row is emitted as NULL, never back-filled from a later row") {
    // time-reversal of the r5 backward bug: the EARLIEST row at/after has a
    // null payload; the value from the row after it must not leak in
    val right = Seq(
      ("aa", 10L, Option.empty[Long], "near"),
      ("aa", 20L, Some(7L), "far")
    ).toDF("k", "ts", "p1", "p2")
    val left = Seq(("aa", 8L, 0L, 1)).toDF("k", "ts", "lid", "lval")
    val out = AsOfJoin.forward(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"))
      .select("matched_ts", "p1", "p2").collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 10L, "must match the earliest at/after row")
    assert(out(0).isNullAt(1), "payload must be the matched row's NULL, not 7 from ts=20")
    assert(out(0).getString(2) == "near")
  }

  test("nearest: equidistant tie with a null-payload backward candidate still breaks backward") {
    // backward candidate (distance 5) carries NULL; forward candidate at the
    // SAME distance carries a value — pandas semantics pick backward, so the
    // output payload must be the NULL, not the forward row's value
    val right = Seq(
      ("aa", 5L, Option.empty[Long], "before"),
      ("aa", 15L, Some(9L), "after")
    ).toDF("k", "ts", "p1", "p2")
    val left = Seq(("aa", 10L, 0L, 0)).toDF("k", "ts", "lid", "lval")
    val out = AsOfJoin.nearest(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"))
      .select("matched_ts", "p1", "p2").collect()
    assert(out(0).getLong(0) == 5L && out(0).isNullAt(1) && out(0).getString(2) == "before")
  }

  test("nearest/forward reject non-numeric ts types (date, string) with a clear error") {
    val l = Seq(("aa", 1L, 0L, 0)).toDF("k", "ts", "lid", "lval")
    val r = Seq(("aa", 1L, Option(1L), "x")).toDF("k", "ts", "p1", "p2")
    def asDate(df: DataFrame) = df.withColumn("ts", to_date(lit("2024-01-01")))
    def asStr(df: DataFrame) = df.withColumn("ts", col("ts").cast("string"))
    for (mut <- Seq(asDate _, asStr _)) {
      val e1 = intercept[IllegalArgumentException] {
        AsOfJoin.nearest(mut(l), mut(r), Seq("k"), "ts", "ts", Seq("p1", "p2"))
      }
      assert(e1.getMessage.contains("numeric"))
      val e2 = intercept[IllegalArgumentException] {
        AsOfJoin.forward(mut(l), mut(r), Seq("k"), "ts", "ts", Seq("p1", "p2"))
      }
      assert(e2.getMessage.contains("numeric"))
    }
  }

  test("nearest plans exactly ONE exchange (both carries share the sort)") {
    // right side already unique per (k, ts) — no fixture pre-aggregation
    // polluting the exchange count
    val l = Seq(("aa", 1L, 0L, 1), ("aa", 5L, 1L, 2)).toDF("k", "ts", "lid", "lval")
    val r = Seq(("aa", 2L, Option(1L), "x"), ("aa", 9L, Option(2L), "y"))
      .toDF("k", "ts", "p1", "p2")
    val plan = AsOfJoin.nearest(l, r, Seq("k"), "ts", "ts", Seq("p1", "p2"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"no join node expected:\n$plan")
  }

  test("salted property: backwardSalted == backward for every span (random fixtures, tolerances)") {
    for (seed <- 30L to 32L; span <- Seq(7L, 50L, 1000L); tol <- Seq(None, Some(10L))) {
      val (l, r) = randomFixture(seed)
      val got = asRowSet(AsOfJoin.backwardSalted(l, r, Seq("k"), "ts", "ts",
        Seq("p1", "p2"), span = span, tolerance = tol))
      val want = asRowSet(AsOfJoin.backward(l, r, Seq("k"), "ts", "ts",
        Seq("p1", "p2"), tolerance = tol))
      assert(got == want,
        s"salted mismatch (seed=$seed span=$span tol=$tol): " +
          s"only-got=${(got -- want).take(5)} only-want=${(want -- got).take(5)}")
    }
  }

  test("salted: a single hot key splits across time buckets — the carry partitions on (key, bucket)") {
    // one key, long timeline: the plain carry serializes this into ONE
    // partition; the salted carry must partition on (k, __bkt)
    val rnd = new scala.util.Random(7)
    val left = (0 until 2000).map(i => ("hot", i.toLong * 3, i.toLong, rnd.nextInt(100)))
      .toDF("k", "ts", "lid", "lval")
    val right = (0 until 1000).map(i => ("hot", i.toLong * 7, Option(i.toLong), s"s$i"))
      .toDF("k", "ts", "p1", "p2")
    val out = AsOfJoin.backwardSalted(left, right, Seq("k"), "ts", "ts",
      Seq("p1", "p2"), span = 500L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(k#") && plan.contains("__bkt"),
      s"main carry must partition on (k, __bkt):\n$plan")
    // and the rows really spread: >1 bucket partition holds data
    val buckets = out.select((col("ts") / 500).cast("long")).distinct().count()
    assert(buckets > 10, s"fixture must span many buckets, got $buckets")
    // output equality on the hot fixture too
    assert(asRowSet(out) == asRowSet(
      AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"))))
  }

  test("forwardSalted property: equals forward for every span (negation keeps buckets monotonic)") {
    for (seed <- 40L to 41L; span <- Seq(7L, 300L); tol <- Seq(None, Some(10L))) {
      val (l, r) = randomFixture(seed)
      val got = asRowSet(AsOfJoin.forwardSalted(l, r, Seq("k"), "ts", "ts",
        Seq("p1", "p2"), span = span, tolerance = tol))
      val want = asRowSet(AsOfJoin.forward(l, r, Seq("k"), "ts", "ts",
        Seq("p1", "p2"), tolerance = tol))
      assert(got == want, s"forwardSalted mismatch (seed=$seed span=$span tol=$tol): " +
        s"only-got=${(got -- want).take(5)} only-want=${(want -- got).take(5)}")
    }
  }

  test("auto: skewed input dispatches to the salted carry with a detector-sized span") {
    // one dominant key (>5% of rows by far): auto must plan (k, __bkt)
    // partitioning — and still equal the plain backward join
    val rnd = new scala.util.Random(11)
    val left = ((0 until 1500).map(i => ("hot", i.toLong * 3, i.toLong, rnd.nextInt(100))) ++
        (0 until 50).map(i => (s"c${i % 10}", i.toLong * 5, 10000L + i, rnd.nextInt(100))))
      .toDF("k", "ts", "lid", "lval")
    val right = (0 until 700).map(i => ("hot", i.toLong * 7, Option(i.toLong), s"s$i"))
      .toDF("k", "ts", "p1", "p2")
    val out = AsOfJoin.auto(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(k#") && plan.contains("__bkt"),
      s"skewed input must take the salted carry:\n${plan.take(2000)}")
    assert(asRowSet(out) == asRowSet(
      AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"))))
  }

  test("auto: uniform input stays on the plain single-exchange carry") {
    // 50 keys, ~2% of rows each — all under the 5% default threshold
    val rnd = new scala.util.Random(12)
    val left = (0 until 1000).map(i => (s"k${i % 50}", i.toLong * 3, i.toLong, rnd.nextInt(100)))
      .toDF("k", "ts", "lid", "lval")
    val right = (0 until 500).map(i => (s"k${i % 50}", i.toLong * 7, Option(i.toLong), s"s$i"))
      .toDF("k", "ts", "p1", "p2")
    val out = AsOfJoin.auto(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("__bkt"), s"uniform input must stay plain:\n${plan.take(2000)}")
    assert(asRowSet(out) == asRowSet(
      AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"))))
  }

  test("autoForward: skew dispatches salted, uniform stays plain, both equal forward") {
    val rnd = new scala.util.Random(13)
    val skewLeft = (0 until 1200).map(i => ("hot", i.toLong * 3, i.toLong, rnd.nextInt(100)))
      .toDF("k", "ts", "lid", "lval")
    val skewRight = (0 until 600).map(i => ("hot", i.toLong * 7, Option(i.toLong), s"s$i"))
      .toDF("k", "ts", "p1", "p2")
    val skewed = AsOfJoin.autoForward(skewLeft, skewRight, Seq("k"), "ts", "ts", Seq("p1", "p2"))
    assert(skewed.queryExecution.executedPlan.toString.contains("__bkt"))
    assert(asRowSet(skewed) == asRowSet(
      AsOfJoin.forward(skewLeft, skewRight, Seq("k"), "ts", "ts", Seq("p1", "p2"))))

    val uniLeft = (0 until 1000).map(i => (s"k${i % 50}", i.toLong * 3, i.toLong, rnd.nextInt(100)))
      .toDF("k", "ts", "lid", "lval")
    val uniRight = (0 until 500).map(i => (s"k${i % 50}", i.toLong * 7, Option(i.toLong), s"s$i"))
      .toDF("k", "ts", "p1", "p2")
    val uniform = AsOfJoin.autoForward(uniLeft, uniRight, Seq("k"), "ts", "ts", Seq("p1", "p2"))
    assert(!uniform.queryExecution.executedPlan.toString.contains("__bkt"))
    assert(asRowSet(uniform) == asRowSet(
      AsOfJoin.forward(uniLeft, uniRight, Seq("k"), "ts", "ts", Seq("p1", "p2"))))
  }

  test("auto: null timestamps don't poison the span sizing and output still equals backward") {
    val rnd = new scala.util.Random(14)
    // hot key with a sprinkle of null-ts rows: detection must size the span
    // from the non-null range, and the join output must match plain backward
    val left = ((0 until 800).map(i => ("hot", Option(i.toLong * 3), i.toLong, rnd.nextInt(50))) ++
        (0 until 20).map(i => ("hot", Option.empty[Long], 9000L + i, rnd.nextInt(50))))
      .toDF("k", "ts", "lid", "lval")
    val right = (0 until 400).map(i => ("hot", i.toLong * 7, Option(i.toLong), s"s$i"))
      .toDF("k", "ts", "p1", "p2")
    val out = AsOfJoin.auto(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"))
    assert(out.queryExecution.executedPlan.toString.contains("__bkt"), "hot key must still salt")
    assert(asRowSet(out) == asRowSet(
      AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"))))
  }

  test("auto: timestamp ts rejected eagerly; dispatch never widens the input domain") {
    val l = Seq(("aa", 1L, 0L, 0)).toDF("k", "ts", "lid", "lval")
      .withColumn("ts", timestamp_seconds(col("ts")))
    val r = Seq(("aa", 1L, Option(1L), "x")).toDF("k", "ts", "p1", "p2")
      .withColumn("ts", timestamp_seconds(col("ts")))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.auto(l, r, Seq("k"), "ts", "ts", Seq("p1", "p2"))
    }
    assert(e.getMessage.contains("integral"))
  }

  test("floorBucket: uniform span-wide buckets on both sides of the origin") {
    // truncating `div` would give bucket 0 double width over (-span, span);
    // floor division keeps every bucket exactly `span` wide — including the
    // boundary cases at the origin and at exact multiples
    val span = 10L
    val ts = Seq(-21L, -20L, -11L, -10L, -1L, 0L, 1L, 9L, 10L, 19L, 20L)
    val got = ts.toDF("__t").select(AsOfJoin.floorBucket(span).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(-3L, -2L, -2L, -1L, -1L, 0L, 0L, 0L, 1L, 1L, 2L),
      s"floor bucketing mismatch: ${ts.zip(got)}")
    // each bucket holds exactly span consecutive timestamps
    val wide = (-100L until 100L).toDF("__t")
      .select(AsOfJoin.floorBucket(span).as("b")).groupBy("b").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSeq
    assert(wide == Seq(span), s"bucket widths must be uniform, got $wide")
  }

  test("forwardSalted: timestamp ts rejected eagerly with the curated guard message") {
    val l = Seq(("aa", 1L, 0L, 0)).toDF("k", "ts", "lid", "lval")
      .withColumn("ts", timestamp_seconds(col("ts")))
    val r = Seq(("aa", 1L, Option(1L), "x")).toDF("k", "ts", "p1", "p2")
      .withColumn("ts", timestamp_seconds(col("ts")))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.forwardSalted(l, r, Seq("k"), "ts", "ts", Seq("p1", "p2"), span = 10L)
    }
    assert(e.getMessage.contains("numeric"))
  }

  test("salted: left-only buckets still receive the boundary handoff; guards reject bad inputs") {
    // right rows only in bucket 0 (ts<10); left rows alone in far buckets
    val right = Seq(("aa", 5L, Option(42L), "x")).toDF("k", "ts", "p1", "p2")
    val left = Seq(("aa", 9999L, 0L, 0), ("aa", 100000L, 1L, 0)).toDF("k", "ts", "lid", "lval")
    val out = AsOfJoin.backwardSalted(left, right, Seq("k"), "ts", "ts",
        Seq("p1", "p2"), span = 10L)
      .orderBy("lid").select("matched_ts", "p1").collect()
    out.foreach(r => assert(r.getLong(0) == 5L && r.getLong(1) == 42L,
      "the bucket-boundary state must reach every later left-only bucket"))
    intercept[IllegalArgumentException] {
      AsOfJoin.backwardSalted(left, right, Seq("k"), "ts", "ts", Seq("p1", "p2"), span = 0L)
    }
    val tsL = left.select(col("k"), timestamp_seconds(col("ts")).as("ts"), col("lid"), col("lval"))
    val tsR = right.select(col("k"), timestamp_seconds(col("ts")).as("ts"), col("p1"), col("p2"))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backwardSalted(tsL, tsR, Seq("k"), "ts", "ts", Seq("p1", "p2"), span = 10L)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("collision guards reject ambiguous shapes with a clear error") {
    val l = Seq(("aa", 1L, 0L, 0)).toDF("k", "ts", "lid", "lval")
    val r = Seq(("aa", 1L, 1L)).toDF("k", "ts", "p1")
    // payload name already on the left
    val rBad = r.withColumnRenamed("p1", "lval")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, rBad, Seq("k"), "ts", "ts", Seq("lval"))
    }
    assert(e1.getMessage.contains("lval"))
    // matchedTs shadows a left column
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, Seq("k"), "ts", "ts", Seq("p1"), matchedTs = "lid")
    }
    assert(e2.getMessage.contains("lid"))
    // reserved internal name in an input
    val e3 = intercept[IllegalArgumentException] {
      AsOfJoin.backward(l.withColumn("__side", lit(1)), r, Seq("k"), "ts", "ts", Seq("p1"))
    }
    assert(e3.getMessage.contains("__side"))
    // missing key
    val e4 = intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, Seq("nope"), "ts", "ts", Seq("p1"))
    }
    assert(e4.getMessage.contains("nope"))
  }
}
