package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lake.TxTable

/** Incremental view maintenance of AGGREGATE state from a change feed.
  *
  * [[graft.lake.TxTable.applyChanges]] maintains keyed PROJECTIONS (a
  * feed row replaces the row with its key); a maintained aggregate needs
  * arithmetic instead of replacement: each feed slice folds into the
  * running (count, sum) per group as +1/+value for inserts and
  * −1/−value for deletes — an update's delete+insert pair thereby moves
  * a row between groups or adjusts its value without recomputing either
  * group from the base table. This is the standard delta-propagation
  * rule for distributive aggregates (count/sum, and avg = sum/count at
  * read time). Min/max are NOT maintainable by deltas alone — a
  * retraction of the current extremum needs the base table — so
  * [[foldCountSumMinMax]] detects exactly those retractions and
  * recomputes JUST the affected groups through the stats/bloom-pruned
  * multi-key read; every other change stays delta-propagated.
  *
  * Scale posture: one slice fold costs a keyed aggregation of the slice
  * (small), a LEFT join of those delta groups against the state table
  * (only the touched groups are read — never the whole state), and one
  * applyChanges commit that rewrites only the state files containing
  * touched groups. Nothing scans the base table (min/max retraction
  * reads only the pruned files of the retracted groups); the state
  * table's size is the GROUP cardinality, not the row count.
  */
object Ivm {

  /** Null-safe left join on `keys` (`<=>` per key): a NULL group key is
    * a legitimate group (SQL GROUP BY keeps it), so every state probe
    * here must match it — plain-equality joins would treat an existing
    * null-keyed group as brand new and silently desync its state. The
    * right side's keys are renamed pre-join and dropped after. */
  private def nullSafeLeft(left: DataFrame, right: DataFrame,
      keys: Seq[String]): DataFrame = {
    val r = right.select(right.columns.map(c =>
      if (keys.contains(c)) col(c).as(s"__ns_$c") else col(c))
      .toIndexedSeq: _*)
    left.join(r, keys.map(k => col(k) <=> col(s"__ns_$k")).reduce(_ && _),
        "left")
      .drop(keys.map(k => s"__ns_$k"): _*)
  }

  /** Fold one change-feed slice (schema: key cols + `valueCol` +
    * `_change_type`) into a (count, sum) aggregate state table keyed by
    * `keyCols` with columns `countName` and `sumName`. `valueCol` must
    * be integral (long cents, token counts…): exact arithmetic is what
    * makes maintained state bit-identical to a batch recompute —
    * floating-point retraction would drift. Groups whose count reaches
    * zero are deleted from the state. Returns the state table's new
    * version.
    */
  def foldCountSum(state: TxTable, slice: DataFrame, keyCols: Seq[String],
      valueCol: String, countName: String, sumName: String): Long = {
    // a feed row of an unknown change type must fail loudly — sum()
    // would otherwise silently skip its null and desync the state. An
    // update's pre/postimage pair is a retraction + addition: together
    // they move a row between groups or adjust its value.
    val sgn = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
      .otherwise(raise_error(
        concat(lit("Ivm.foldCountSum: unknown _change_type "),
          col("_change_type"))))
    val delta = slice
      .groupBy(keyCols.map(col): _*)
      .agg(sum(sgn).as("_d_n"),
        sum(sgn * col(valueCol).cast("long")).as("_d_sum"))
    // only the touched groups: delta drives the join, state is probed
    val cur = state.read()
      .select((keyCols :+ countName :+ sumName).map(col): _*)
    val folded = nullSafeLeft(delta, cur, keyCols)
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col(countName), lit(0L)) + col("_d_n")).as(countName),
        (coalesce(col(sumName), lit(0L)) + coalesce(col("_d_sum"), lit(0L)))
          .as(sumName)): _*)
    val changes = folded.withColumn("_change_type",
      when(col(countName) === 0L, lit("delete")).otherwise(lit("insert")))
    state.applyChanges(changes, keyCols)
  }

  /** [[foldCountSum]] extended with maintained MIN and MAX — the
    * aggregates delta propagation alone cannot maintain: an insert can
    * only tighten an extremum (`least`/`greatest` with the incoming
    * values), but a DELETE (or an update's preimage) of the group's
    * current extremum leaves the new extremum unknowable from the
    * slice. Those groups — and ONLY those groups, detected by comparing
    * the slice's retracted-value range against the stored extrema —
    * recompute min/max from the `base` table at `baseAsOf` via the
    * stats/bloom-pruned multi-key read
    * ([[graft.lake.TxTable.readEqualsAny]] on the first key column):
    * one Spark job over just the files that can hold the affected
    * groups, never a base-table scan. Count and sum stay purely
    * delta-propagated (they are exact either way). A multi-column key
    * falls back to a semi-joined base read for the affected groups
    * (file pruning needs a single stats column).
    *
    * `baseAsOf` must be the base version whose feed `slice` is — the
    * recompute and the delta describe the same instant or the state
    * desyncs.
    */
  def foldCountSumMinMax(state: TxTable, base: TxTable, baseAsOf: Long,
      slice: DataFrame, keyCols: Seq[String], valueCol: String,
      countName: String, sumName: String,
      minName: String, maxName: String): Long = {
    val sgn = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
      .otherwise(raise_error(
        concat(lit("Ivm.foldCountSumMinMax: unknown _change_type "),
          col("_change_type"))))
    val v = col(valueCol).cast("long")
    val delta = slice
      .groupBy(keyCols.map(col): _*)
      .agg(sum(sgn).as("_d_n"),
        sum(sgn * v).as("_d_sum"),
        min(when(sgn === 1L, v)).as("_ins_min"),
        max(when(sgn === 1L, v)).as("_ins_max"),
        min(when(sgn === -1L, v)).as("_del_min"),
        max(when(sgn === -1L, v)).as("_del_max"))
    val cur = state.read()
      .select((keyCols ++ Seq(countName, sumName, minName, maxName))
        .map(col): _*)
    val folded = nullSafeLeft(delta, cur, keyCols)
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col(countName), lit(0L)) + col("_d_n")).as(countName),
        (coalesce(col(sumName), lit(0L)) + coalesce(col("_d_sum"), lit(0L)))
          .as(sumName),
        least(col(minName), col("_ins_min")).as(minName),
        greatest(col(maxName), col("_ins_max")).as(maxName),
        // the retraction test: a deleted value at-or-past the stored
        // extremum means the extremum itself may be gone (multiplicity
        // is unknowable from the slice) — recompute that group. A group
        // folding down to count 0 just deletes; a brand-new group's
        // extrema are the insert extrema exactly.
        (col(minName).isNotNull &&
          ((col("_del_min").isNotNull && col("_del_min") <= col(minName)) ||
           (col("_del_max").isNotNull && col("_del_max") >= col(maxName))))
          .as("_needs_base")): _*)
      .withColumn("_needs_base",
        col("_needs_base") && col(countName) =!= 0L)
      .cache()
    try {
      // bounded driver metadata: only groups whose extremum was hit —
      // a subset of the slice's own group count, never the state size
      val marked = folded.where(col("_needs_base"))
        .select(keyCols.map(col): _*).collect().toSeq
      val recomputed =
        if (marked.isEmpty) folded.where(col("_needs_base")) // empty frame
          .select(keyCols.map(col) ++ Seq(
            lit(null).cast("long").as("_r_min"),
            lit(null).cast("long").as("_r_max")): _*)
        else {
          val affected =
            if (keyCols.size == 1) {
              // a NULL group key never matches isin()/a bloom probe —
              // route it through an explicit IS NULL read (stats can't
              // prune nulls, so this is the full-file-set filter; null
              // groups with retracted extrema are the rare case that
              // must stay CORRECT, not the hot one)
              val k = keyCols.head
              val (nullKeyed, defined) = marked.partition(_.isNullAt(0))
              val reads =
                (if (defined.isEmpty) Nil
                 else Seq(base.readEqualsAny(k, defined.map(_.get(0)),
                   asOf = Some(baseAsOf)))) ++
                (if (nullKeyed.isEmpty) Nil
                 else Seq(base.read(asOf = Some(baseAsOf))
                   .where(col(k).isNull)))
              reads.reduce(_ unionByName _)
            } else {
              // null-safe semi join: a null-keyed marked group must
              // still select its base rows
              val m = folded.where(col("_needs_base"))
                .select(keyCols.map(k => col(k).as(s"__mk_$k")): _*)
              val b = base.read(asOf = Some(baseAsOf))
              b.join(m, keyCols.map(k => col(k) <=> col(s"__mk_$k"))
                .reduce(_ && _), "left_semi")
            }
          affected.groupBy(keyCols.map(col): _*)
            .agg(min(col(valueCol).cast("long")).as("_r_min"),
              max(col(valueCol).cast("long")).as("_r_max"))
        }
      val merged = nullSafeLeft(folded, recomputed, keyCols)
        .select(keyCols.map(col) ++ Seq(
          col(countName), col(sumName),
          when(col("_needs_base"), col("_r_min"))
            .otherwise(col(minName)).as(minName),
          when(col("_needs_base"), col("_r_max"))
            .otherwise(col(maxName)).as(maxName)): _*)
      val changes = merged.withColumn("_change_type",
        when(col(countName) === 0L, lit("delete")).otherwise(lit("insert")))
      state.applyChanges(changes, keyCols)
    } finally { folded.unpersist(); () }
  }
}
