package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC MERGE: apply a change batch (upserts + deletes) to a snapshot —
  * the `MERGE INTO` shape every incremental pipeline needs (refresh a
  * curated corpus from a feed, fold a day's crawl into the master
  * table). (LLM-data-pipeline extension; the reference is a stateless
  * record-at-a-time transformer — SURVEY §2.3.)
  */
object Merge {

  /** Merge `changes` into `snapshot` by `keyCol`. `changes` carries the
    * snapshot's full schema plus `opCol` in {'U','D'}: 'U' upserts
    * (update the payload when the key exists, insert the row when it
    * doesn't), 'D' deletes. At most ONE change row per key (the usual
    * CDC compaction contract — enforce upstream with a last-wins
    * window if the feed has more); a 'D' for an absent key is a no-op.
    *
    * Scale shape — the change batch is assumed << snapshot (the CDC
    * regime), so the snapshot is NEVER shuffled:
    *  1. update/delete pass: snapshot LEFT-joins the BROADCAST change
    *     set; each snapshot row keeps, rewrites, or drops itself
    *     map-side.
    *  2. insert residue: matched keys come from a second broadcast
    *     probe of the snapshot (map-side semi), leaving
    *     `changes ANTI matched` — a tiny-vs-tiny anti join (bounded by
    *     the batch size on BOTH sides, since matched ⊆ change keys).
    *  3. union — no exchange: both legs are already final.
    * Two narrow snapshot scans, zero snapshot shuffles, every join
    * broadcast. The naive alternative — FULL OUTER snapshot|><|changes —
    * shuffles the full snapshot on the merge key (a full outer can
    * never broadcast either side). */
  /** Compact a raw CDC feed to the [[applyChanges]] contract: at most
    * one change per key, last-wins by `tsCol`. ONE aggregate with
    * map-side partials — the winning row rides the aggregation buffer
    * as a struct `max` (lexicographic over (ts, remaining columns), so
    * the winner is deterministic even under ts ties; struct max plans
    * as SortAggregate, sorted by the GROUP key only). The point vs the
    * row_number-window phrasing: partials collapse each map partition
    * to one row per key BEFORE the exchange, so only (key, winner)
    * pairs shuffle — a Window must ship and sort every raw feed row.
    * At 100 TB a day's feed compacts with one slim shuffle. */
  def compactLastWins(changes: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val rest = changes.columns.filterNot(c => c == keyCol || c == tsCol).toSeq
    val ordered = tsCol +: rest
    changes.groupBy(col(keyCol))
      .agg(max(struct(ordered.map(col): _*)).as("_w"))
      .select(col(keyCol) +: ordered.map(c => col(s"_w.$c").as(c)): _*)
  }

  /** SCD2 dimension history from a change feed: each change row
    * becomes a validity interval `[tsCol, valid_to)`, with `valid_to`
    * the key's next change ts (null = open / current version, also
    * flagged `is_current`). Requires a unique `tsCol` per key — ties
    * make "next" ill-defined; compact them away first (e.g.
    * [[compactLastWins]] at a finer ts). One hash exchange on the key
    * + a per-partition sort for the single `lead` window — the interval
    * construction needs each key's changes adjacent and ordered, so
    * this is the floor, and the summary/window phrasing reuses the one
    * partitioning. Scale-safe as long as no single key's history
    * exceeds a partition (dimension keys at 100 TB are fine; event-
    * grade hot keys belong in [[EventAnalytics.sessionize]]-style
    * bucketing instead). */
  def scd2Intervals(changes: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** POINT-IN-TIME enrichment against a versioned dimension: each
    * event row joins the dim version that was valid AT ITS OWN
    * TIMESTAMP — the feature-correctness primitive for training data
    * (joining the CURRENT dim row leaks future state into past
    * examples; this is the leakage-safe join). `dimChanges` is a
    * compacted CDC feed `(keyCol, tsCol, opCol, payload...)` with op
    * in {'U','D'}: a 'U' opens a version at its ts; a 'D' closes the
    * key — events between a delete and the next 'U' get NULL dim
    * columns instead of a resurrected stale version, implemented by
    * turning 'D' rows into TOMBSTONE versions (payload nulled) that
    * the as-of carry picks up like any other version. The emitted
    * `right_<liveCol>` boolean distinguishes the three states:
    * true = live version, false = tombstoned at event time,
    * null = key had no history yet.
    *
    * Scale shape: exactly [[AsOfJoin.asOf]] — one shuffle+sort of
    * |events|+|versions| slim rows, no per-key quadratics, no
    * interval range join (SCD2 intervals from [[scd2Intervals]] are
    * CONTIGUOUS per key, so "valid_from <= ts < valid_to" reduces to
    * "latest valid_from <= ts", which is the as-of). Same contracts as
    * asOf: unique (key, ts) on the feed ([[compactLastWins]] first),
    * hot keys -> bucketedAsOf phrasing. */
  def pointInTimeJoin(events: DataFrame, dimChanges: DataFrame,
      keyCol: String, tsCol: String, opCol: String,
      tolerance: Option[Long] = None,
      liveCol: String = "dim_live"): DataFrame = {
    val payload = dimChanges.columns
      .filterNot(c => c == keyCol || c == tsCol || c == opCol).toSeq
    require(payload.nonEmpty, "dimChanges needs payload columns")
    require(!dimChanges.columns.contains(liveCol),
      s"dimChanges already has a `$liveCol` column — pass another liveCol")
    val versions = dimChanges.select(
      (Seq(col(keyCol), col(tsCol)) ++
        payload.map(p => when(col(opCol) =!= "D", col(p)).as(p)) :+
        (col(opCol) =!= "D").as(liveCol)): _*)
    AsOfJoin.asOf(events, versions, keyCol, tsCol, tolerance)
  }

  /** Snapshot DIFF — the inverse direction of [[applyChanges]]: given
    * two versions of a keyed table, emit one row per key that changed,
    * with `change_type` in {'added','removed','changed'} and
    * `changed_cols` (the compared columns whose values differ, in
    * `compareCols` order — comparison is null-safe, so NULL->value and
    * value->NULL both register). Unchanged keys emit nothing: at
    * 100 TB the diff output is change-sized, not snapshot-sized. The
    * audit/regression primitive the CDC family was missing — "what did
    * yesterday's pipeline run actually change?" — and the generator
    * behind [[diffToChanges]].
    *
    * Scale shape: ONE full-outer join on the key — the floor for an
    * unordered keyed diff (neither side can broadcast); both sides
    * pre-project to key + compared columns so only slim rows shuffle.
    * On [[Bucketing]]-bucketed tables the exchange vanishes entirely.
    * CONTRACT: `keyCol` unique per side (the snapshot contract). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val missing = compareCols.filterNot(c =>
      oldDf.columns.contains(c) && newDf.columns.contains(c))
    require(missing.isEmpty,
      s"compareCols absent from a side: ${missing.mkString(", ")}")
    val o = oldDf.select((keyCol +: compareCols).map(col): _*).as("o")
    val n = newDf.select((keyCol +: compareCols).map(col): _*).as("n")
    val joined = o.join(n, col(s"o.$keyCol") === col(s"n.$keyCol"),
      "full_outer")
    val diffs = array_compact(array(compareCols.map(c =>
      when(!(col(s"o.$c") <=> col(s"n.$c")), lit(c))): _*))
    joined
      .select(
        coalesce(col(s"o.$keyCol"), col(s"n.$keyCol")).as(keyCol),
        when(col(s"o.$keyCol").isNull, "added")
          .when(col(s"n.$keyCol").isNull, "removed")
          .when(size(diffs) > 0, "changed")
          .as("change_type"),
        when(col(s"o.$keyCol").isNotNull && col(s"n.$keyCol").isNotNull,
          diffs).otherwise(typedLit(Seq.empty[String]))
          .as("changed_cols"))
      .where(col("change_type").isNotNull)
  }

  /** Derive the MINIMAL change batch that transforms `oldDf` into
    * `newDf`: added/changed keys become 'U' rows carrying the new
    * payload, removed keys become 'D' rows (payload nulled), unchanged
    * keys emit nothing — so `applyChanges(oldDf, diffToChanges(oldDf,
    * newDf), keyCol, opCol)` equals `newDf` exactly (the round-trip is
    * pinned in MergeSpec). The snapshot-reconciliation primitive: when
    * a table is rebuilt from scratch but downstream consumers want a
    * CDC feed, this closes the loop. Same one-full-outer-join shape and
    * unique-key contract as [[snapshotDiff]]; note [[applyChanges]]
    * broadcasts its batch, so feed it diffs in the CDC regime (batch <<
    * snapshot), not a 100% rewrite. */
  def diffToChanges(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      opCol: String = "op"): DataFrame = {
    require(oldDf.columns.toSet == newDf.columns.toSet,
      s"snapshot schemas differ: ${oldDf.columns.toSet.diff(newDf.columns.toSet).mkString(", ")} / " +
        newDf.columns.toSet.diff(oldDf.columns.toSet).mkString(", "))
    require(!oldDf.columns.contains(opCol),
      s"snapshot already has a `$opCol` column — pass another opCol")
    val payload = newDf.columns.filterNot(_ == keyCol).toSeq
    val o = oldDf.as("o")
    val n = newDf.as("n")
    val anyDiff = payload.map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, col(s"o.$keyCol") === col(s"n.$keyCol"), "full_outer")
      .select(
        coalesce(col(s"o.$keyCol"), col(s"n.$keyCol")).as(keyCol) +:
          when(col(s"n.$keyCol").isNull, "D")
            .when(col(s"o.$keyCol").isNull || anyDiff, "U")
            .as(opCol) +:
          payload.map(c => col(s"n.$c").as(c)): _*)
      .where(col(opCol).isNotNull)
  }

  def applyChanges(snapshot: DataFrame, changes: DataFrame,
      keyCol: String, opCol: String): DataFrame = {
    val payload = snapshot.columns.filterNot(_ == keyCol).toSeq
    require(payload.forall(changes.columns.contains),
      s"changes must carry the snapshot schema; missing: " +
        payload.filterNot(changes.columns.contains).mkString(", "))
    val s = snapshot.as("s")
    // The batch is referenced THREE times (update/delete probe, matched
    // keys, insert residue); pin it so a derived feed computes once —
    // unpinned, each reference re-executed the whole upstream subplan
    // (measured: q_merge_upsert re-scanned orders per reference). The
    // batch is small by the CDC contract, so the pin is one cheap pass.
    val c = changes.localCheckpoint().as("c")
    val upserted = s.join(broadcast(c),
        col(s"s.$keyCol") === col(s"c.$keyCol"), "left")
      .where(col(s"c.$opCol").isNull || col(s"c.$opCol") =!= "D")
      .select(col(s"s.$keyCol").as(keyCol) +: payload.map(p =>
        when(col(s"c.$opCol") === "U", col(s"c.$p"))
          .otherwise(col(s"s.$p")).as(p)): _*)
    val matched = s.join(broadcast(c.select(col(s"c.$keyCol"))),
        Seq(keyCol), "left_semi")
      .select(col(keyCol))
    val inserts = c.where(col(s"c.$opCol") === "U")
      .join(matched, Seq(keyCol), "left_anti")
      .select(col(keyCol) +: payload.map(p => col(s"c.$p").as(p)): _*)
    upserted.unionByName(inserts)
  }

  /** INCREMENTAL AGGREGATE MAINTENANCE — apply an insert/delete change
    * feed to a per-key (count, sum) snapshot WITHOUT rescanning the
    * base: the 100 TB contract is that the nightly job touches the
    * |keys|-sized aggregate and the |changes|-sized feed, never the
    * row-count-sized history that produced them. Count and DECIMAL sum
    * are the self-maintainable aggregates (signed contributions
    * compose; min/max are NOT — a deleted extremum forces a rescan,
    * which is why they are deliberately absent here). The change feed
    * carries `opCol` ∈ {'I','D'}; any other op RAISES (a silently
    * ignored change is corruption), as does a key whose maintained
    * count would go negative (a delete for a row the base never had).
    * Keys whose count reaches exactly 0 leave the snapshot.
    *
    * Determinism: contributions are ±1 counts and ±DECIMAL values —
    * exact, order-independent, map-side-partial-able; the result is
    * the pure function "base ⊎ signed deltas".
    *
    * Scale shape: ONE aggregate over the change feed (map-side
    * partials), then ONE full-outer key join against the snapshot —
    * |keys| + |change-keys| rows, no history scan. Returns
    * `(keyCols..., countCol, sumCol)` with the sum DECIMAL(28,4); the
    * base snapshot must already carry its aggregates under those names
    * (defaults `n`/`s`) — checked loudly, because an absent column
    * would otherwise surface as an unrelated-looking unresolved-column
    * analysis error. */
  def incrementalCountSum(base: DataFrame, changes: DataFrame,
      keyCols: Seq[String], opCol: String, valCol: String,
      countCol: String = "n", sumCol: String = "s"): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(base.columns.contains(countCol) && base.columns.contains(sumCol),
      s"incrementalCountSum: base snapshot must carry aggregate " +
        s"columns `$countCol`/`$sumCol` — got " +
        s"(${base.columns.mkString(", ")}); pass countCol/sumCol for " +
        "a snapshot built with different names")
    val dec = org.apache.spark.sql.types.DecimalType(28, 4)
    val sign = when(col(opCol) === "I", lit(1L))
      .when(col(opCol) === "D", lit(-1L))
      .otherwise(raise_error(concat(
        lit(s"incrementalCountSum: unknown op in `$opCol`: "),
        col(opCol).cast("string"))))
    val delta = changes
      .groupBy(keyCols.map(col): _*)
      .agg(sum(sign).as("__dn"),
        sum(sign * col(valCol).cast(dec)).as("__ds"))
    base.join(delta, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col(countCol), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as(countCol),
        (coalesce(col(sumCol), lit(0L).cast(dec)) +
          coalesce(col("__ds"), lit(0L).cast(dec))).cast(dec).as(sumCol)): _*)
      .select(keyCols.map(col) ++ Seq(
        when(col(countCol) < 0,
          raise_error(lit("incrementalCountSum: maintained count went " +
            "negative — the feed deletes rows the base never had")))
          .otherwise(col(countCol)).as(countCol),
        col(sumCol)): _*)
      .where(col(countCol) =!= 0)
  }

  /** INCREMENTAL MIN/MAX MAINTENANCE — the aggregate
    * [[incrementalCountSum]] deliberately omits, now present with its
    * honest contract instead of absent: min/max are NOT fully
    * self-maintainable (they forget the runner-up), but the two
    * maintainable cases cover almost all nightly traffic and the
    * third raises rather than rescans silently.
    *
    *  - INSERTS fold exactly: `least`/`greatest` against the stored
    *    extremes (a new key starts at its own extremes).
    *  - A DELETE of a NON-EXTREME value is an exact no-op on min/max
    *    (the extremum is still present).
    *  - A DELETE that TOUCHES a stored extremum RAISES, naming the
    *    key: the runner-up was never stored, so only a rescan of that
    *    KEY's surviving rows can restore the invariant — the caller
    *    reruns the full aggregate for the named keys only (O(hot
    *    keys), not O(history)) or routes them to the rebuild window.
    *    Deleting a key entirely is the caller's
    *    [[incrementalCountSum]]-count-reaching-0 signal, not this
    *    op's.
    *
    * Track row multiplicity separately ([[incrementalCountSum]]):
    * this op maintains extremes only, and a delete of ONE copy of a
    * duplicated extreme value still raises (value equality with the
    * stored extremum is all it can see — conservative in the only
    * safe direction). The checks ride INSIDE the projected columns
    * (raising when-branches — the winnowIndexRetract filter-reorder
    * lesson). Change feed: `opCol` ∈ {'I','D'} (anything else
    * raises), `valCol` LONG-castable. Returns
    * `(keyCols..., minCol, maxCol)`. */
  def incrementalMinMax(base: DataFrame, changes: DataFrame,
      keyCols: Seq[String], opCol: String, valCol: String,
      minCol: String = "mn", maxCol: String = "mx"): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(base.columns.contains(minCol) && base.columns.contains(maxCol),
      s"incrementalMinMax: base snapshot must carry `$minCol`/`$maxCol`" +
        s" — got (${base.columns.mkString(", ")})")
    val v = col(valCol).cast(org.apache.spark.sql.types.LongType)
    val opOk = when(col(opCol).isin("I", "D"), v)
      .otherwise(raise_error(concat(
        lit(s"incrementalMinMax: unknown op in `$opCol`: "),
        col(opCol).cast("string"))))
    val delta = changes
      .select(keyCols.map(col) :+ col(opCol) :+ opOk.as("__v"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(min(when(col(opCol) === "I", col("__v"))).as("__imn"),
        max(when(col(opCol) === "I", col("__v"))).as("__imx"),
        min(when(col(opCol) === "D", col("__v"))).as("__dmn"),
        max(when(col(opCol) === "D", col("__v"))).as("__dmx"))
    base.join(delta, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        // a delete touching a stored extremum: the runner-up was never
        // stored — raise with the key, the caller rescans THAT key
        // <=/>= not just equality: a delete BELOW the stored min (or
        // above the max) is a row the base never had — same breach
        when(col(minCol).isNotNull &&
            ((col("__dmn").isNotNull && col("__dmn") <= col(minCol)) ||
             (col("__dmx").isNotNull && col("__dmx") >= col(maxCol))),
          raise_error(concat(
            lit("incrementalMinMax: a delete touches a stored extremum " +
              "for key ("),
            concat_ws(", ",
              keyCols.map(col(_).cast("string")): _*),
            lit(") — the runner-up was never stored; rescan this key's " +
              "surviving rows (or route it to the rebuild window)"))))
          // a delete on a key the base never had is the count
          // violation, not a silent insert of nothing
          .when(col(minCol).isNull && col("__imn").isNull,
            raise_error(concat(
              lit("incrementalMinMax: delete for a key the base never " +
                "had ("),
              concat_ws(", ", keyCols.map(col(_).cast("string")): _*),
              lit(")"))))
          .otherwise(least(col(minCol), col("__imn"))).as(minCol),
        greatest(col(maxCol), col("__imx")).as(maxCol)): _*)
  }

  /** INCREMENTAL EQUI-JOIN VIEW MAINTENANCE — the JOIN member of the
    * incremental-artifact family, by the classic delta rule: with
    * stored snapshots A, B and their materialized view A ⋈ B,
    * tonight's inserts ΔA, ΔB add EXACTLY
    * `ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB` — the old⋈old leg, the one whose cost
    * grows with history, is never re-executed. Returns ONLY the view
    * DELTA (the new matched rows): the caller appends it to the
    * stored view files, so the maintenance cost is O(|Δ| ⋈ old), the
    * view itself is never rescanned, and at 100 TB the nightly spend
    * is three joins each touching ONE old side once (a small delta
    * broadcasts onto a single scan of that side; strategy is left to
    * Catalyst/AQE — both shapes skip A⋈B).
    *
    * Contracts: `deltaA` must be row-disjoint from `aOld` (same for
    * B) — the ivfPqIndexAppend snapshot contract; a re-keyed /
    * re-valued row goes through [[joinViewRetract]] FIRST (the upsert
    * composition, as ivfPqIndexUpsert does for ANN codes). Non-key
    * columns of the two sides must not collide (the view's schema is
    * the natural-join schema; a collision would silently alias —
    * rejected loudly here). */
  def joinViewDelta(aOld: DataFrame, deltaA: DataFrame, bOld: DataFrame,
      deltaB: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "joinViewDelta: keyCols must be non-empty")
    val aPayload = aOld.columns.filterNot(keyCols.contains).toSet
    val bPayload = bOld.columns.filterNot(keyCols.contains).toSet
    val clash = aPayload.intersect(bPayload)
    require(clash.isEmpty,
      s"joinViewDelta: non-key columns ${clash.mkString(", ")} exist on " +
        "both sides — rename upstream, the view schema must be " +
        "collision-free")
    // names AND types: a name-only check would let a type-drifted
    // delta slip through the joins' implicit casts and corrupt the
    // maintained view silently
    def shape(df: DataFrame) = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    require(shape(aOld) == shape(deltaA) && shape(bOld) == shape(deltaB),
      "joinViewDelta: each delta must carry its snapshot's exact " +
        "schema (names and types, in order)")
    Seq(deltaA.join(bOld, keyCols),
      aOld.join(deltaB, keyCols),
      deltaA.join(deltaB, keyCols))
      .reduce(_ unionByName _)
  }

  // ------------------------------------- aggregate-over-join views
  //
  // The natural composition of the two incremental halves (round-19
  // delivery): maintain `SELECT g, count(*), sum(v) FROM A ⋈ B GROUP
  // BY g` WITHOUT ever materializing the joined view — the delta of
  // the aggregate is the aggregate of the delta legs, so the three
  // [[joinViewDelta]] joins feed [[incrementalCountSum]] directly as
  // signed contributions. The old⋈old join (the only leg whose cost
  // grows with history) is never re-executed, and no view is stored
  // at all: the maintained state is the |groups|-sized aggregate.

  /** Fold tonight's inserts into a stored join-aggregate: the three
    * delta legs (ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB) become 'I' contributions to the
    * per-group (count, DECIMAL sum). Contracts are [[joinViewDelta]]'s
    * (row-disjoint deltas, exact snapshot schemas) plus
    * [[incrementalCountSum]]'s (agg carries `countCol`/`sumCol`).
    * Scale shape: three delta-sized joins + the |groups| + |touched
    * groups| full-outer fold — never A⋈B, never a stored view. */
  def joinAggFold(agg: DataFrame, aOld: DataFrame, deltaA: DataFrame,
      bOld: DataFrame, deltaB: DataFrame, keyCols: Seq[String],
      groupCols: Seq[String], valCol: String,
      countCol: String = "n", sumCol: String = "s"): DataFrame = {
    val legs = joinViewDelta(aOld, deltaA, bOld, deltaB, keyCols)
      .select((groupCols :+ valCol).map(col): _*)
      .withColumn("__op", lit("I"))
    incrementalCountSum(agg, legs, groupCols, "__op", valCol,
      countCol, sumCol)
  }

  /** Retract deleted source rows from a stored join-aggregate: the
    * view rows a takedown removes — `rmA⋈B ∪ (A∖rmA)⋈rmB`, the
    * disjoint split that counts a row removed on BOTH sides exactly
    * once — become 'D' contributions. `aAll`/`bAll` are the CURRENT
    * snapshots (post-fold); tombstones are id sets against
    * `aIdCols`/`bIdCols`, which must identify rows uniquely (the
    * [[joinViewRetract]] contract). Cost: two tombstone-driven joins
    * each touching one snapshot once + the slim fold — the aggregate
    * is never rebuilt and no view exists to rescan. Groups whose
    * count reaches 0 leave the aggregate; a delete the sources never
    * had raises via [[incrementalCountSum]]'s negative-count guard. */
  def joinAggRetract(agg: DataFrame, aAll: DataFrame,
      removedA: DataFrame, aIdCols: Seq[String], bAll: DataFrame,
      removedB: DataFrame, bIdCols: Seq[String], keyCols: Seq[String],
      groupCols: Seq[String], valCol: String,
      countCol: String = "n", sumCol: String = "s"): DataFrame = {
    require(aIdCols.nonEmpty && bIdCols.nonEmpty,
      "joinAggRetract: id column lists must be non-empty")
    val rmA = removedA.select(aIdCols.map(col): _*).distinct()
    val rmB = removedB.select(bIdCols.map(col): _*).distinct()
    val removedARows = aAll.join(rmA, aIdCols, "left_semi")
    val survivorsA = aAll.join(rmA, aIdCols, "left_anti")
    val removedBRows = bAll.join(rmB, bIdCols, "left_semi")
    val removedView = removedARows.join(bAll, keyCols)
      .unionByName(survivorsA.join(removedBRows, keyCols))
    val dels = removedView.select((groupCols :+ valCol).map(col): _*)
      .withColumn("__op", lit("D"))
    incrementalCountSum(agg, dels, groupCols, "__op", valCol,
      countCol, sumCol)
  }

  /** Retire view rows whose source rows were deleted: anti-join the
    * stored view on each side's removed ROW-ID set — the per-row
    * member of the deletion taxonomy ([[Dedup.lshIndexRetract]]'s
    * shape), exact because every view row names the source rows it
    * came from (the view must carry both sides' row-id columns — the
    * price of retractability, paid at view definition time). A row
    * removed on BOTH sides retires once (anti-joins compose
    * idempotently); removed ids that never matched cost nothing.
    * Tombstone sets are takedown-sized — they broadcast. */
  def joinViewRetract(view: DataFrame, removedA: DataFrame,
      aIdCols: Seq[String], removedB: DataFrame,
      bIdCols: Seq[String]): DataFrame = {
    require(aIdCols.nonEmpty && bIdCols.nonEmpty,
      "joinViewRetract: id column lists must be non-empty")
    view.join(removedA.select(aIdCols.map(col): _*).distinct(),
        aIdCols, "left_anti")
      .join(removedB.select(bIdCols.map(col): _*).distinct(),
        bIdCols, "left_anti")
      // using-column joins move the keys to the front — restore the
      // view's own column order so the output IS the view's schema
      // (positional consumers: unions, except-based audits, writers)
      .select(view.columns.map(col): _*)
  }

  // ------------------------------------------------- LEFT-join views
  //
  // A LEFT join view is not maintainable from the delta legs alone:
  // an unmatched left row sits in the view NULL-EXTENDED, and that
  // null extension must DISAPPEAR the night its first match arrives
  // and REAPPEAR the night its last match retracts — transitions the
  // matched rows themselves cannot reveal. The classic fix (the
  // COUNTING algorithm of incremental view maintenance, Gupta/Mumick/
  // Subrahmanian 1993) keeps a slim per-left-row MATCH-COUNT artifact
  // `(aIdCols..., n)` next to the view; folds update counts in
  // O(|touched keys|) and the 0-transitions drive the null-row
  // changes. The ops below emit CHANGE FEEDS (`__op` ∈ {'I','D'})
  // against the stored view rather than rewriting it — the caller
  // appends/deletes, the view is never rescanned; the counts table is
  // the only state read in full, and it is two columns.

  /** Initial per-left-row match counts for [[leftJoinViewChanges]]:
    * `(aIdCols..., n)` with `n = 0` for unmatched left rows — built
    * once when the view is first materialized, then maintained by
    * [[leftJoinCountsFold]]. `aIdCols` must identify left rows
    * uniquely (they are the retraction handle too). */
  /** Build-parameter identity of a counts artifact: the column lists
    * it was built over. Two counts tables keyed differently (or with
    * different left-row ids) fold into garbage silently — the n sums
    * still add — so the (keyCols, aIdCols) pair is hashed into the
    * [[ArtifactStamp]] and checked at plan time by every maintenance
    * verb (round-20; the last unstamped artifact family).
    * MurmurHash3.orderedHash over the names is deterministic across
    * JVMs; the separator keeps ([a,b],[c]) distinct from ([a],[b,c]). */
  private def countsKeyHash(keyCols: Seq[String],
      aIdCols: Seq[String]): Long =
    scala.util.hashing.MurmurHash3
      .orderedHash(keyCols ++ Seq("\u0000") ++ aIdCols).toLong

  def leftJoinMatchCounts(a: DataFrame, b: DataFrame,
      keyCols: Seq[String], aIdCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && aIdCols.nonEmpty,
      "leftJoinMatchCounts: keyCols and aIdCols must be non-empty")
    ArtifactStamp.stamp(
      a.select((keyCols ++ aIdCols).distinct.map(col): _*)
        .join(b.groupBy(keyCols.map(col): _*)
            .agg(count(lit(1)).as("__bn")),
          keyCols, "left")
        .select(aIdCols.map(col) :+
          coalesce(col("__bn"), lit(0L)).as("n"): _*),
      "n", "leftjoin_counts",
      "key_hash" -> countsKeyHash(keyCols, aIdCols))
  }

  /** COMPACT a stored match-counts artifact ([[leftJoinMatchCounts]] /
    * [[leftJoinCountsFold]] output) after N nightly folds: the counts
    * table is the ONLY state the LEFT-join maintenance reads in full
    * every night, so its layout is the family's hot path —
    * range-rewrite by the left-row id ([[graft.ops.Layout
    * .compactByKey]]) so the fold's full-outer join co-partitions with
    * freshly-built deltas instead of re-shuffling a small-file pile.
    * Pure layout (MergeSpec proves a follow-up fold off the compacted
    * table equals one off the original). */
  def leftJoinCountsCompact(counts: DataFrame,
      aIdCols: Seq[String]): DataFrame = {
    require(counts.columns.contains("n"),
      s"leftJoinCountsCompact: not a counts table — columns " +
        s"(${counts.columns.mkString(", ")})")
    // op-only check (the compact signature carries no keyCols to hash
    // against); compactByKey is pure layout and preserves the stamp
    ArtifactStamp.check(counts, "n", "leftjoin_counts",
      "leftJoinCountsCompact")
    graft.ops.Layout.compactByKey(counts, aIdCols)
  }

  /** Fold tonight's inserts into the match-count artifact: counts for
    * OLD left rows grow by their ΔB matches, NEW left rows enter at
    * their match count against B ∪ ΔB (zero included — that zero is
    * tonight's new null extension). Same disjoint-snapshot contract
    * as [[joinViewDelta]]. Cost: two delta-sized join-aggregates +
    * one full-outer fold over the slim counts table — never the view,
    * never A⋈B. */
  def leftJoinCountsFold(counts: DataFrame, aOld: DataFrame,
      deltaA: DataFrame, bOld: DataFrame, deltaB: DataFrame,
      keyCols: Seq[String], aIdCols: Seq[String]): DataFrame = {
    ArtifactStamp.check(counts, "n", "leftjoin_counts",
      "leftJoinCountsFold", "key_hash" -> countsKeyHash(keyCols, aIdCols))
    val dOld = aOld.select((keyCols ++ aIdCols).distinct.map(col): _*)
      .join(deltaB.groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("__dn")),
        keyCols)
      .select(aIdCols.map(col) :+ col("__dn"): _*)
    val dNew = leftJoinMatchCounts(deltaA, bOld.unionByName(deltaB),
      keyCols, aIdCols).select(aIdCols.map(col) :+
        col("n").as("__dn"): _*)
    ArtifactStamp.stamp(
      counts.join(dOld.unionByName(dNew), aIdCols, "full_outer")
        .select(aIdCols.map(col) :+
          (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
            .as("n"): _*),
      "n", "leftjoin_counts",
      "key_hash" -> countsKeyHash(keyCols, aIdCols))
  }

  /** Null-extend `rows` (a left-side frame) with the b-side payload
    * columns of `b` (its columns minus the join keys), typed from b's
    * schema — the LEFT-join null-extension row constructor shared by
    * the fold and the retract. */
  private def nullExtended(rows: DataFrame, b: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val bPayload = b.schema.fields.filterNot(f => keyCols.contains(f.name))
    rows.select(rows.columns.map(col) ++
      bPayload.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
  }

  /** The CHANGE FEED that folds tonight's inserts into a stored
    * LEFT-join view — one frame in the VIEW's schema plus `__op` ∈
    * {'I','D'}: 'I' rows are [[joinViewDelta]]'s three matched legs
    * plus ΔA's own unmatched rows null-extended; 'D' rows are the
    * now-STALE null extensions of old left rows whose count was 0 and
    * gained their first match tonight (the 0 → >0 transition the
    * counts artifact exists to reveal). Apply as append + delete-by-
    * left-id-where-b-null; fold the counts with [[leftJoinCountsFold]]
    * in the same batch. The view itself is never read. */
  def leftJoinViewChanges(counts: DataFrame, aOld: DataFrame,
      deltaA: DataFrame, bOld: DataFrame, deltaB: DataFrame,
      keyCols: Seq[String], aIdCols: Seq[String]): DataFrame = {
    ArtifactStamp.check(counts, "n", "leftjoin_counts",
      "leftJoinViewChanges", "key_hash" -> countsKeyHash(keyCols, aIdCols))
    val matches = joinViewDelta(aOld, deltaA, bOld, deltaB, keyCols)
    val newUnmatched = nullExtended(
      deltaA.join(bOld.unionByName(deltaB)
          .select(keyCols.map(col): _*).distinct(),
        keyCols, "left_anti"), bOld, keyCols)
    // old zero-count lefts that matched tonight: their stored
    // null-extended row is stale
    val gained = matches.select(aIdCols.map(col): _*).distinct()
      .join(counts.where(col("n") === 0), aIdCols, "left_semi")
    val staleNulls = nullExtended(
      aOld.join(gained, aIdCols, "left_semi"), bOld, keyCols)
    matches.select(matches.columns.map(col) :+ lit("I").as("__op"): _*)
      .unionByName(newUnmatched
        .select(newUnmatched.columns.map(col) :+ lit("I").as("__op"): _*))
      .unionByName(staleNulls
        .select(staleNulls.columns.map(col) :+ lit("D").as("__op"): _*))
  }

  /** Retract deleted source rows from a stored LEFT-join view,
    * returning the NEW view (the [[joinViewRetract]] shape — one pass
    * over the view against broadcast tombstones; retraction is the
    * rare verb, so the view scan is the accepted family cost):
    * removed LEFT rows drop entirely (matched and null-extended
    * alike); removed B rows drop their matched rows (a null-extended
    * row's null b-ids never equal a tombstone, so those survive the
    * anti-join untouched); and every SURVIVING left row whose matches
    * ALL retired tonight — old count == removed-match count, read off
    * the counts artifact — re-enters NULL-EXTENDED, with its payload
    * taken from `aAll` (the left snapshot). `removedB` must carry the
    * b rows' join keys and id columns, and `bIdCols` must identify b
    * rows UNIQUELY — tombstones are deduped by id (a replayed takedown
    * feed must not double-count), so a non-unique id would both retire
    * every sharer in the kept pass and under-count removals in the
    * zeroed pass. Rebuild or fold the counts artifact alongside; this
    * op returns the view only. */
  def leftJoinViewRetract(view: DataFrame, counts: DataFrame,
      aAll: DataFrame, removedA: DataFrame, removedB: DataFrame,
      keyCols: Seq[String], aIdCols: Seq[String],
      bIdCols: Seq[String]): DataFrame = {
    ArtifactStamp.check(counts, "n", "leftjoin_counts",
      "leftJoinViewRetract", "key_hash" -> countsKeyHash(keyCols, aIdCols))
    val kept = view
      .join(removedA.select(aIdCols.map(col): _*).distinct(),
        aIdCols, "left_anti")
      .join(removedB.select(bIdCols.map(col): _*).distinct(),
        bIdCols, "left_anti")
      .select(view.columns.map(col): _*)
    // surviving lefts zeroed tonight: count == removed matches. The
    // removed set is DEDUPED by b-row id first, exactly as the kept
    // path dedups its anti-join — a replayed takedown feed delivering
    // the same tombstone twice must not inflate __rn past n (which
    // would re-null a left that still has live matches) or past a
    // truly-zeroed left's n (which would silently skip its re-null)
    val zeroed = aAll
      .join(removedB.select((keyCols ++ bIdCols).distinct.map(col): _*)
          .distinct()
          .groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("__rn")),
        keyCols)
      .join(removedA.select(aIdCols.map(col): _*).distinct(),
        aIdCols, "left_anti")
      .join(counts, aIdCols)
      .where(col("n") === col("__rn"))
      .select(aAll.columns.map(col): _*)
    val bSide = view.schema.fields
      .filterNot(f => aAll.columns.contains(f.name))
    val reNulled = zeroed.select(zeroed.columns.map(col) ++
      bSide.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    kept.unionByName(reNulled.select(view.columns.map(col): _*))
  }
}
