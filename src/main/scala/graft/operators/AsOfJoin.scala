package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark has no native form of
  * (SURVEY.md §2.3 notes the reference has none either; this is part of
  * the training-pipeline extension surface: event attribution, "state as
  * of time t" lookups).
  *
  * Semantics: for every left row (key, ts), attach the right row with the
  * greatest right.ts <= left.ts for the same key (ties on ts broken by
  * the largest right tiebreak column, deterministically), or nulls when
  * no such row exists (left-outer).
  *
  * Implementation is the distributed merge formulation, NOT a range/theta
  * join: tag both inputs, union them, and run one `last_value(...,
  * ignoreNulls)` window per key ordered by (ts, side, tiebreak) — right
  * rows sort before left rows at equal ts, so `<=` is inclusive.
  *
  * Scale: a single hash-partition-by-key + per-partition sort (exactly
  * the shuffle a sort-merge join would do), zero row expansion — a
  * range-join formulation (`l JOIN r ON r.ts <= l.ts AND ...` + argmax)
  * explodes to O(|matches|) intermediate rows and re-aggregates; this
  * stays O(|L| + |R|). Skew = per-key row volume; salting the key with a
  * coarse time bucket is the standard mitigation at extreme key skew.
  */
object AsOfJoin {

  /** @param left      probe side; every row appears exactly once in output
    * @param right     build side, columns to attach; rows with a NULL ts
    *                  never match (same as SQL `right.ts <= left.ts`)
    * @param key       equality key column (present in both)
    * @param ts        event-time column (present in both)
    * @param tiebreak  right column ordering simultaneous right rows
    *                  (largest wins); must be a non-null NUMERIC column —
    *                  enforced, because a silent cast-to-null would turn
    *                  the documented determinism into an arbitrary pick
    * @param rightPrefix prefix for attached right columns in the output
    */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
      tiebreak: String, rightPrefix: String = "r_"): DataFrame = {
    require(right.schema(tiebreak).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"as-of tiebreak column '$tiebreak' must be numeric, got " +
        right.schema(tiebreak).dataType.simpleString)
    val rightCols = right.columns.filterNot(c => c == key).toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    // left rows keep a typed-null __tb: __side already separates the
    // sides in the window order, so the sentinel never competes with a
    // right tiebreak — and the tiebreak keeps its ORIGINAL numeric type
    // (a cast("long") here once truncated fractional tiebreaks, turning
    // the documented largest-wins determinism into an arbitrary pick
    // for double/decimal columns)
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast(right.schema(tiebreak).dataType))
      .withColumn("__payload", lit(null).cast(payloadType))
    // a NULL right ts would sort NULLS FIRST into every frame and be
    // attached as a "match" — SQL comparison semantics say it never matches
    val r = right.filter(col(ts).isNotNull).select(
      Seq(col(key), col(ts), lit(0).as("__side"),
        col(tiebreak).as("__tb"),
        struct(rightCols.map(col): _*).as("__payload")): _*)
    // align schemas: right rows carry null left columns (never read back)
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val leftOut = left.columns.toSeq.map(col)
    val rightOut = rightCols.map(c =>
      col("__match").getField(c).as(rightPrefix + c))
    matched.select(leftOut ++ rightOut: _*)
  }
}
