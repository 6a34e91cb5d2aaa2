package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

class MergeSpec extends SparkSpecBase with Matchers {
  import spark.implicits._

  private val snapshot = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "name", "bal")

  private def merged(changes: Seq[(Long, String, String, Double)]) =
    Merge.applyChanges(snapshot,
        changes.toDF("k", "op", "name", "bal"), "k", "op")
      .as[(Long, String, Double)].collect().toSeq.sortBy(_._1)

  test("applyChanges: update, delete, insert, and untouched rows in one " +
      "batch — every outcome class") {
    merged(Seq(
      (2L, "U", "b2", 22.0),  // update existing
      (3L, "D", "", 0.0),     // delete existing
      (9L, "U", "i9", 99.0),  // insert new key
      (8L, "D", "", 0.0)      // delete absent key: no-op
    )) shouldBe Seq(
      (1L, "a", 10.0), (2L, "b2", 22.0), (4L, "d", 40.0), (9L, "i9", 99.0))
  }

  test("applyChanges: empty batch is identity; all-delete batch empties " +
      "exactly the targeted keys") {
    merged(Seq.empty) shouldBe Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    merged(Seq((1L, "D", "", 0.0), (2L, "D", "", 0.0),
      (3L, "D", "", 0.0), (4L, "D", "", 0.0))) shouldBe Seq.empty
  }

  test("applyChanges matches an in-memory reference merge on seeded " +
      "random snapshot/batch pairs (all outcome classes randomized)") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 5) {
      val snapKeys = (0 until 20).filter(_ => rnd.nextBoolean()).map(_.toLong)
      val snap = snapKeys.map(k => (k, s"s$k", rnd.nextInt(100).toDouble))
      // unique change keys over a range OVERLAPPING and EXCEEDING the
      // snapshot's, random op per key
      val chKeys = (0 until 30).filter(_ => rnd.nextBoolean()).map(_.toLong)
      val ch = chKeys.map(k =>
        (k, if (rnd.nextBoolean()) "U" else "D", s"c$k",
          rnd.nextInt(100).toDouble))
      val chMap = ch.map(c => c._1 -> c).toMap
      val reference = (
        snap.flatMap { case (k, nm, b) =>
          chMap.get(k) match {
            case Some((_, "D", _, _)) => None
            case Some((_, "U", nm2, b2)) => Some((k, nm2, b2))
            case _ => Some((k, nm, b))
          }
        } ++ ch.collect {
          case (k, "U", nm, b) if !snapKeys.contains(k) => (k, nm, b)
        }).sortBy(_._1)
      val got = Merge.applyChanges(
          snap.toDF("k", "name", "bal"),
          ch.toDF("k", "op", "name", "bal"), "k", "op")
        .as[(Long, String, Double)].collect().toSeq.sortBy(_._1)
      got shouldBe reference
    }
  }

  test("applyChanges rejects a change batch missing payload columns " +
      "at plan time") {
    val bad = Seq((1L, "U")).toDF("k", "op")
    val e = intercept[IllegalArgumentException](
      Merge.applyChanges(snapshot, bad, "k", "op"))
    e.getMessage should include("name")
  }

  test("compactLastWins: one winner per key by ts; deterministic under " +
      "ts ties via lexicographic struct order; composes with applyChanges") {
    val feed = Seq(
      (2L, 10L, "U", "old", 1.0), (2L, 20L, "U", "new", 2.0),
      (3L, 5L, "U", "res", 9.0), (3L, 7L, "D", "", 0.0),
      (6L, 1L, "U", "zz", 3.0), (6L, 1L, "U", "aa", 4.0) // ts tie
    ).toDF("k", "ts", "op", "name", "bal")
    val compact = Merge.compactLastWins(feed, "k", "ts")
      .as[(Long, Long, String, String, Double)].collect().toSeq.sortBy(_._1)
    compact shouldBe Seq(
      (2L, 20L, "U", "new", 2.0),   // last wins
      (3L, 7L, "D", "", 0.0),       // a later delete beats the upsert
      (6L, 1L, "U", "zz", 3.0))     // tie -> lexicographic max of rest
    Merge.applyChanges(snapshot, compact.toDF("k", "ts", "op", "name", "bal")
        .drop("ts"), "k", "op")
      .as[(Long, String, Double)].collect().toSeq.sortBy(_._1) shouldBe Seq(
      (1L, "a", 10.0), (2L, "new", 2.0), (4L, "d", 40.0), (6L, "zz", 3.0))
  }

  test("compactLastWins plan: map-side partial collapse + ONE exchange " +
      "of (key, winner) pairs; no Window over the raw feed") {
    val feed = Seq((1L, 1L, "U", "x", 1.0)).toDF("k", "ts", "op", "name", "bal")
    val plan = Merge.compactLastWins(feed, "k", "ts")
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should include("partial_max")
    "Exchange".r.findAllIn(plan).size shouldBe 1
  }

  test("scd2Intervals: per-key validity chain — contiguous, open-ended " +
      "last version flagged current; single-version keys immediately " +
      "current") {
    val feed = Seq(
      (1L, 10L, 100.0), (1L, 20L, 150.0), (1L, 30L, 90.0),
      (5L, 7L, 55.0))
      .toDF("k", "ts", "price")
    val got = Merge.scd2Intervals(feed, "k", "ts")
      .select("k", "ts", "valid_to", "is_current", "price")
      .as[(Long, Long, Option[Long], Boolean, Double)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    got shouldBe Seq(
      (1L, 10L, Some(20L), false, 100.0),
      (1L, 20L, Some(30L), false, 150.0),
      (1L, 30L, None, true, 90.0),
      (5L, 7L, None, true, 55.0))
    // intervals tile: every non-current valid_to == the next valid_from
    got.groupBy(_._1).values.foreach { h =>
      h.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => a._3 shouldBe Some(b._2)
        case _ => ()
      }
    }
  }

  test("scd2Intervals plan: ONE exchange (the key partition) feeding " +
      "one Window — no join, no second shuffle") {
    val feed = Seq((1L, 10L, 100.0)).toDF("k", "ts", "price")
    val plan = Merge.scd2Intervals(feed, "k", "ts")
      .queryExecution.executedPlan.toString
    "Exchange".r.findAllIn(plan).size shouldBe 1
    "Window".r.findAllIn(plan).size shouldBe 1
    plan should not include "Join"
  }

  test("applyChanges plan: snapshot is never shuffled — both joins " +
      "broadcast, no SortMergeJoin, no full-outer") {
    val changes = Seq((2L, "U", "b2", 22.0), (9L, "U", "i9", 99.0))
      .toDF("k", "op", "name", "bal")
    val plan = Merge.applyChanges(snapshot, changes, "k", "op")
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    plan should not include "FullOuter"
  }

  test("pointInTimeJoin: events see the version valid AT THEIR ts — " +
      "live / tombstoned / no-history all distinguished, deletes never " +
      "resurrect a stale version") {
    // key 1: U@10(v=1.0) -> D@30 -> U@50(v=5.0); key 2: never changed
    val feed = Seq(
      (1L, 10L, "U", 1.0), (1L, 30L, "D", 99.0), (1L, 50L, "U", 5.0))
      .toDF("k", "ts", "op", "v")
    val events = Seq(
      (100L, 1L, 5L),   // before any version -> no history
      (101L, 1L, 10L),  // at the U instant -> sees v=1.0 (inclusive)
      (102L, 1L, 29L),  // inside first version -> v=1.0
      (103L, 1L, 40L),  // after D, before next U -> tombstone, NOT v=1.0
      (104L, 1L, 60L),  // after second U -> v=5.0
      (105L, 2L, 40L))  // key with no history at all
      .toDF("eid", "k", "ts")
    val out = Merge.pointInTimeJoin(events, feed, "k", "ts", "op")
      .select("eid", "right_v", "right_dim_live")
      .as[(Long, Option[Double], Option[Boolean])]
      .collect().sortBy(_._1).toSeq
    out shouldBe Seq(
      (100L, None, None),
      (101L, Some(1.0), Some(true)),
      (102L, Some(1.0), Some(true)),
      (103L, None, Some(false)), // the leakage case: stale v=1.0 rejected
      (104L, Some(5.0), Some(true)),
      (105L, None, None))
  }

  test("snapshotDiff: added/removed/changed classified, unchanged keys " +
      "silent, null transitions register null-safely") {
    val oldS = Seq(
      (1L, Option("a"), Option(10.0)),   // unchanged
      (2L, Option("b"), Option(20.0)),   // bal changes
      (3L, Option("c"), Option(30.0)),   // removed
      (4L, Option.empty[String], Option(40.0))) // name null -> value
      .toDF("k", "name", "bal")
    val newS = Seq(
      (1L, Option("a"), Option(10.0)),
      (2L, Option("b"), Option(21.0)),
      (4L, Option("d4"), Option.empty[Double]), // bal value -> null
      (5L, Option("e"), Option(50.0)))   // added
      .toDF("k", "name", "bal")
    val out = Merge.snapshotDiff(oldS, newS, "k", Seq("name", "bal"))
      .select(col("k"), col("change_type"),
        concat_ws(",", col("changed_cols")).as("cc"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    out shouldBe Seq(
      (2L, "changed", "bal"),
      (3L, "removed", ""),
      (4L, "changed", "name,bal"),
      (5L, "added", ""))
  }

  test("diffToChanges round-trip: applyChanges(old, diff(old,new)) == new " +
      "and the batch is minimal (touched keys only)") {
    val oldS = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal")
    val newS = Seq(
      (1L, "a", 10.0),     // unchanged
      (2L, "b2", 20.0),    // changed
      (4L, "d", 41.0),     // changed
      (9L, "i", 90.0))     // added; 3 removed
      .toDF("k", "name", "bal")
    val batch = Merge.diffToChanges(oldS, newS, "k")
    batch.select("k", "op").as[(Long, String)].collect().sortBy(_._1)
      .toSeq shouldBe Seq((2L, "U"), (3L, "D"), (4L, "U"), (9L, "U"))
    val rebuilt = Merge.applyChanges(oldS, batch, "k", "op")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    rebuilt shouldBe newS.as[(Long, String, Double)].collect()
      .sortBy(_._1).toSeq
  }

  test("incrementalCountSum: inserts add, deletes subtract, zero-count " +
      "keys leave, new keys appear — equals a from-scratch recompute; " +
      "bad feeds raise loudly") {
    val dec = org.apache.spark.sql.types.DecimalType(28, 4)
    def agg(rows: Seq[(String, Double)]) = rows.toDF("k", "v")
      .groupBy("k").agg(count(lit(1)).as("n"),
        sum(col("v").cast(dec)).cast(dec).as("s"))
    val baseRows = Seq(("a", 1.5), ("a", 2.5), ("b", 5.0), ("c", 7.25))
    val feed = Seq(
      ("I", "a", 3.0),   // a grows to n=3, s=7.0
      ("D", "b", 5.0),   // b count hits 0 -> leaves the snapshot
      ("I", "d", 9.75),  // brand-new key appears
      ("I", "d", 0.25)).toDF("op", "k", "v")
    val out = Merge.incrementalCountSum(agg(baseRows), feed, Seq("k"),
        "op", "v")
      .select(col("k"), col("n"), col("s").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    out shouldBe Seq(("a", 3L, 7.0), ("c", 1L, 7.25), ("d", 2L, 10.0))
    // the maintained snapshot equals the from-scratch recompute over
    // base - deletes + inserts
    val survivors = Seq(("a", 1.5), ("a", 2.5), ("c", 7.25),
      ("a", 3.0), ("d", 9.75), ("d", 0.25))
    out shouldBe agg(survivors)
      .select(col("k"), col("n"), col("s").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    def msg(f: => Array[_]): String = {
      val e = intercept[Exception](f)
      e.getMessage + Option(e.getCause).map(_.getMessage).mkString
    }
    // unknown op raises
    val badOp = Seq(("U", "a", 1.0)).toDF("op", "k", "v")
    msg(Merge.incrementalCountSum(agg(baseRows), badOp, Seq("k"), "op", "v")
      .collect()) should include("unknown op")
    // deleting from a key the base never had drives the count negative
    val phantom = Seq(("D", "zz", 1.0)).toDF("op", "k", "v")
    msg(Merge.incrementalCountSum(agg(baseRows), phantom, Seq("k"), "op",
      "v").collect()) should include("negative")
  }

  test("incrementalMinMax: inserts fold exactly, interior deletes are " +
      "exact no-ops, a delete touching (or outside) a stored extremum " +
      "raises NAMING the key — never a silent wrong extreme") {
    def agg(rows: Seq[(String, Long)]) =
      rows.toDF("k", "v").groupBy(col("k"))
        .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    val base = agg(Seq(("a", 1L), ("a", 5L), ("a", 9L), ("b", 4L)))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    // inserts extend extremes; interior delete (a,5) is a no-op; a new
    // key starts at its own extremes
    val feed = Seq(("I", "a", 12L), ("D", "a", 5L), ("I", "b", 2L),
      ("I", "c", 7L)).toDF("op", "k", "v")
    rows(Merge.incrementalMinMax(base, feed, Seq("k"), "op", "v")) shouldBe
      Seq(("a", 1L, 12L), ("b", 2L, 4L), ("c", 7L, 7L))
    def msg(f: => Array[_]): String = {
      val e = intercept[Exception](f)
      e.getMessage + Option(e.getCause).map(_.getMessage).mkString
    }
    // deleting the stored max: the runner-up was never stored
    msg(Merge.incrementalMinMax(base,
      Seq(("D", "a", 9L)).toDF("op", "k", "v"), Seq("k"), "op", "v")
      .collect()) should include("touches a stored extremum")
    // deleting BELOW the stored min = a row the base never had
    msg(Merge.incrementalMinMax(base,
      Seq(("D", "a", 0L)).toDF("op", "k", "v"), Seq("k"), "op", "v")
      .collect()) should include("touches a stored extremum")
    // delete for an unknown key
    msg(Merge.incrementalMinMax(base,
      Seq(("D", "zz", 1L)).toDF("op", "k", "v"), Seq("k"), "op", "v")
      .collect()) should include("key the base never had")
    // unknown op
    msg(Merge.incrementalMinMax(base,
      Seq(("U", "a", 1L)).toDF("op", "k", "v"), Seq("k"), "op", "v")
      .collect()) should include("unknown op")
    an[IllegalArgumentException] should be thrownBy
      Merge.incrementalMinMax(base.drop("mx"), feed, Seq("k"), "op", "v")
  }

  test("joinViewDelta: the three delta legs reproduce the from-scratch " +
      "join exactly, duplicates and multiplicities included; the " +
      "old-join-old leg is never needed") {
    val aOld = Seq((1L, "a1"), (2L, "a2")).toDF("k", "pa")
    val dA = Seq((2L, "a2b"), (3L, "a3")).toDF("k", "pa")
    val bOld = Seq((1L, 10L), (1L, 11L), (3L, 30L)).toDF("k", "pb")
    val dB = Seq((2L, 20L), (3L, 31L), (3L, 31L)).toDF("k", "pb")
    val folded = aOld.join(bOld, Seq("k"))
      .unionByName(Merge.joinViewDelta(aOld, dA, bOld, dB, Seq("k")))
    val scratch = aOld.unionByName(dA).join(bOld.unionByName(dB), Seq("k"))
    folded.exceptAll(scratch).count() shouldBe 0
    scratch.exceptAll(folded).count() shouldBe 0
    // non-vacuous: every leg contributed rows
    Merge.joinViewDelta(aOld, dA, bOld, dB, Seq("k")).count() should be >
      dA.join(bOld, Seq("k")).count()
  }

  test("joinViewRetract: anti-joins retire exactly the removed source " +
      "rows, a both-sides removal retires once, and the view's own " +
      "column ORDER survives (using-joins move keys to the front)") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "pa")
    val b = Seq((1L, 7L, 100L), (2L, 7L, 200L), (2L, 8L, 201L),
      (3L, 7L, 300L)).toDF("k", "ln", "pb")
    val view = a.join(b, Seq("k"))
    val rmA = Seq(2L).toDF("k")
    val rmB = Seq((2L, 7L), (3L, 7L)).toDF("k", "ln")
    val got = Merge.joinViewRetract(view, rmA, Seq("k"), rmB,
      Seq("k", "ln"))
    got.columns.toSeq shouldBe view.columns.toSeq
    val surv = a.where(col("k") =!= 2)
      .join(b.where(!(col("k") === 2 && col("ln") === 7) &&
        !(col("k") === 3 && col("ln") === 7)), Seq("k"))
    got.exceptAll(surv).count() shouldBe 0
    surv.exceptAll(got).count() shouldBe 0
    // unknown ids are an idempotent no-op
    Merge.joinViewRetract(view, Seq(99L).toDF("k"), Seq("k"),
      Seq((99L, 1L)).toDF("k", "ln"), Seq("k", "ln"))
      .exceptAll(view).count() shouldBe 0
  }

  test("joinViewDelta loud guards: payload-column collision and " +
      "delta-schema drift are rejected at plan time") {
    val a = Seq((1L, "x")).toDF("k", "p")
    val b = Seq((1L, "y")).toDF("k", "p")
    val e1 = intercept[IllegalArgumentException] {
      Merge.joinViewDelta(a, a, b, b, Seq("k"))
    }
    e1.getMessage should include("collision-free")
    val b2 = Seq((1L, "y")).toDF("k", "pb")
    val e2 = intercept[IllegalArgumentException] {
      Merge.joinViewDelta(a, a.select(col("p"), col("k")), b2, b2,
        Seq("k"))
    }
    e2.getMessage should include("exact schema")
    // TYPE drift with matching names must also be rejected — implicit
    // casts in the joins would corrupt the view silently
    val e3 = intercept[IllegalArgumentException] {
      Merge.joinViewDelta(a,
        a.select(col("k").cast("int").as("k"), col("p")), b2, b2,
        Seq("k"))
    }
    e3.getMessage should include("exact schema")
  }

  test("left-join view maintenance: counts fold + change feed " +
      "reproduce the from-scratch LEFT join through both null-" +
      "extension transitions; retraction re-nulls zeroed lefts") {
    // a2 is null-extended until dB brings its first match (0 -> >0);
    // a5 arrives unmatched (new null row); a3 never matches.
    val aOld = Seq((1L, 10L, "a1"), (2L, 20L, "a2"), (3L, 30L, "a3"))
      .toDF("k", "aid", "pa")
    val dA = Seq((1L, 40L, "a4"), (9L, 50L, "a5")).toDF("k", "aid", "pa")
    val bOld = Seq((1L, 1L, "b11"), (1L, 2L, "b12")).toDF("k", "ln", "pb")
    val dB = Seq((2L, 1L, "b21"), (1L, 3L, "b13")).toDF("k", "ln", "pb")
    val aAll = aOld.unionByName(dA)
    val bAll = bOld.unionByName(dB)
    val viewOld = aOld.join(bOld, Seq("k"), "left")
    val counts0 = Merge.leftJoinMatchCounts(aOld, bOld, Seq("k"),
      Seq("aid"))
    counts0.as[(Long, Long)].collect().toMap shouldBe
      Map(10L -> 2L, 20L -> 0L, 30L -> 0L)
    // fold
    val changes = Merge.leftJoinViewChanges(counts0, aOld, dA, bOld, dB,
      Seq("k"), Seq("aid"))
    val dels = changes.where(col("__op") === "D")
      .select("aid").as[Long].collect().toSet
    dels shouldBe Set(20L) // a2's stale null row
    val view1 = viewOld
      .join(changes.where(col("__op") === "D").select("aid").distinct(),
        Seq("aid"), "left_anti")
      .select(viewOld.columns.map(col): _*)
      .unionByName(changes.where(col("__op") === "I").drop("__op")
        .select(viewOld.columns.map(col): _*))
    val scratch = aAll.join(bAll, Seq("k"), "left")
    view1.exceptAll(scratch).count() shouldBe 0
    scratch.exceptAll(view1).count() shouldBe 0
    // counts fold == from-scratch counts on the grown tables
    val counts1 = Merge.leftJoinCountsFold(counts0, aOld, dA, bOld, dB,
      Seq("k"), Seq("aid"))
    counts1.as[(Long, Long)].collect().toMap shouldBe
      Merge.leftJoinMatchCounts(aAll, bAll, Seq("k"), Seq("aid"))
        .as[(Long, Long)].collect().toMap
    // retract: drop a1 entirely and kill a2's only match (re-null) +
    // one of a4's three matches (no transition)
    val rmA = Seq(10L).toDF("aid")
    val rmB = Seq((2L, 1L), (1L, 1L)).toDF("k", "ln")
    val retracted = Merge.leftJoinViewRetract(view1, counts1, aAll,
      rmA, rmB, Seq("k"), Seq("aid"), Seq("k", "ln"))
    val aSurv = aAll.where(col("aid") =!= 10L)
    val bSurv = bAll.where(!(col("k") === 2L && col("ln") === 1L) &&
      !(col("k") === 1L && col("ln") === 1L))
    val scratch2 = aSurv.join(bSurv, Seq("k"), "left")
    retracted.exceptAll(scratch2).count() shouldBe 0
    scratch2.exceptAll(retracted).count() shouldBe 0
    // the re-nulled row is really there
    retracted.where(col("aid") === 20L && col("ln").isNull)
      .count() shouldBe 1L
    // a REPLAYED takedown feed (duplicate tombstones) must not change
    // the outcome: the zeroed computation dedups by b-row id exactly
    // like the kept path's anti-join
    val rmBDup = rmB.unionByName(rmB)
    val retracted2 = Merge.leftJoinViewRetract(view1, counts1, aAll,
      rmA, rmBDup, Seq("k"), Seq("aid"), Seq("k", "ln"))
    retracted2.exceptAll(scratch2).count() shouldBe 0
    scratch2.exceptAll(retracted2).count() shouldBe 0
  }

  test("joinAggFold + joinAggRetract maintain a join-aggregate with " +
      "no stored view: fold then retract equals the from-scratch " +
      "aggregate of the surviving corpus; a both-sides removal counts " +
      "once; zeroed groups leave") {
    val dec = org.apache.spark.sql.types.DecimalType(28, 4)
    def aggOf(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      a.join(b, Seq("k")).groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast(dec)).cast(dec).as("s"))
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select(col("g"), col("n"), col("s").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val aOld = Seq((1L, "x", "g1"), (2L, "y", "g1"), (5L, "w", "g3"))
      .toDF("k", "pa", "g")
    val dA = Seq((3L, "z", "g2")).toDF("k", "pa", "g")
    val bOld = Seq((1L, 10L, 100L), (5L, 70L, 500L)).toDF("k", "ln", "v")
    val dB = Seq((2L, 20L, 200L), (3L, 30L, 300L), (1L, 11L, 101L))
      .toDF("k", "ln", "v")
    val base = aggOf(aOld, bOld)
    val folded = Merge.joinAggFold(base, aOld, dA, bOld, dB, Seq("k"),
      Seq("g"), "v")
    rows(folded) shouldBe
      rows(aggOf(aOld.unionByName(dA), bOld.unionByName(dB)))
    // retract: a-row k=1 (kills both its matches), b-row (5, 70) —
    // g3's only match, so g3 reaches count 0 and leaves the aggregate
    val aAll = aOld.unionByName(dA)
    val bAll = bOld.unionByName(dB)
    val retracted = Merge.joinAggRetract(folded, aAll,
      Seq(1L).toDF("k"), Seq("k"), bAll, Seq((5L, 70L)).toDF("k", "ln"),
      Seq("k", "ln"), Seq("k"), Seq("g"), "v")
    val survA = aAll.where(col("k") =!= 1)
    val survB = bAll.where(!(col("k") === 5 && col("ln") === 70))
    rows(retracted) shouldBe rows(aggOf(survA, survB))
    retracted.where(col("g") === "g3").count() shouldBe 0
    // a row removed on BOTH sides retires exactly once: drop a-row
    // k=2 AND its only match b-row (2, 20) in one call
    val retr2 = Merge.joinAggRetract(folded, aAll, Seq(2L).toDF("k"),
      Seq("k"), bAll, Seq((2L, 20L)).toDF("k", "ln"), Seq("k", "ln"),
      Seq("k"), Seq("g"), "v")
    rows(retr2) shouldBe rows(aggOf(aAll.where(col("k") =!= 2),
      bAll.where(!(col("k") === 2 && col("ln") === 20))))
  }

  test("leftJoinCountsCompact is pure layout: a follow-up fold off the " +
      "compacted counts equals one off the originals") {
    val aOld = Seq((1L, "a1"), (2L, "a2")).toDF("k", "pa")
    val bOld = Seq((1L, 1L)).toDF("k", "ln")
    val counts = Merge.leftJoinMatchCounts(aOld, bOld, Seq("k"), Seq("k"))
    val compacted = Merge.leftJoinCountsCompact(counts, Seq("k"))
    compacted.as[(Long, Long)].collect().toMap shouldBe
      counts.as[(Long, Long)].collect().toMap
    val dA = Seq((3L, "a3")).toDF("k", "pa")
    val dB = Seq((2L, 2L), (3L, 1L)).toDF("k", "ln")
    Merge.leftJoinCountsFold(compacted, aOld, dA, bOld, dB, Seq("k"),
        Seq("k")).as[(Long, Long)].collect().toMap shouldBe
      Merge.leftJoinCountsFold(counts, aOld, dA, bOld, dB, Seq("k"),
        Seq("k")).as[(Long, Long)].collect().toMap
    intercept[IllegalArgumentException] {
      Merge.leftJoinCountsCompact(counts.drop("n"), Seq("k"))
    }.getMessage should include("not a counts table")
  }
}
