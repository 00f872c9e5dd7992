package graft

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.functions._

import graft.queries.Relational

/** Independent check of the SCD2 segmentation against a naive per-user
  * stream fold, on synthetic events DESIGNED to collide: repeated
  * timestamps within a user, a same-type run split by a same-ts event
  * of another type, and two same-type segments of one user sharing a
  * valid_from — the tie the (valid_from, event_type, grp) total order
  * exists for. The fold below shares no structure with the engine's
  * window formulation or the DuckDB oracle. */
class Scd2Spec extends SparkSpec {
  private val sess = SparkSpec.spark
  import sess.implicits._

  test("segments match a naive stream fold; valid_to chains are consistent") {
    // (user, sec, event_id, type): user 1 yields TWO (A, t=100) segments
    // (events 1 vs 3+4) — identical user/status/valid_from, distinct grp
    val rows = Seq(
      (1L, 100L, 1L, "A"), (1L, 100L, 2L, "B"), (1L, 100L, 3L, "A"),
      (1L, 200L, 4L, "A"), (1L, 300L, 5L, "B"), (1L, 300L, 6L, "B"),
      (2L, 50L, 7L, "X"), (2L, 60L, 8L, "Y"), (2L, 70L, 9L, "X"))

    // naive fold: walk each user's stream in (ts, event_id) order,
    // open a new segment on every type change
    val naive: Seq[(Long, String, Long, Long)] =
      rows.groupBy(_._1).toSeq.flatMap { case (user, evs) =>
        val segs = ListBuffer.empty[(Long, String, Long, Long)]
        var prevType = ""
        evs.sortBy(e => (e._2, e._3)).foreach { case (_, sec, _, et) =>
          if (et == prevType) {
            val l = segs.remove(segs.size - 1)
            segs += ((user, et, l._3, l._4 + 1))
          } else segs += ((user, et, sec, 1L))
          prevType = et
        }
        segs.toList
      }

    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    def fmtSec(s: Long) = fmt.format(java.time.Instant.ofEpochSecond(s))

    val df = rows.toDF("user_id", "sec", "event_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .select("user_id", "ts", "event_id", "event_type")
    val got = Relational.scd2Of(df).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getLong(4)))

    // multiset of segments (ignoring valid_to) matches the naive fold —
    // including the two structurally-identical (1, A, 100) segments
    val gotSegs = got.map(g => (g._1, g._2, g._3, g._5)).toSeq
    val wantSegs = naive
      .map { case (u, st, sec, n) => (u, st, fmtSec(sec), n) }
    assert(gotSegs.groupBy(identity).view.mapValues(_.length).toMap ==
      wantSegs.groupBy(identity).view.mapValues(_.length).toMap,
      s"got $gotSegs\nwant $wantSegs")

    // valid_to chain: per user exactly one open segment (null valid_to),
    // and every non-null valid_to equals some segment's valid_from
    got.groupBy(_._1).foreach { case (user, segs) =>
      assert(segs.count(_._4.isEmpty) == 1, s"user $user open segments")
      val froms = segs.map(_._3).toSet
      segs.flatMap(_._4).foreach(to =>
        assert(froms.contains(to), s"user $user dangling valid_to $to"))
    }
  }

  test("point-in-time lookup picks the prevailing segment under same-ts collisions") {
    // user 1: a view and a purchase at the SAME second t=100 — two
    // segments share valid_from=100, so the lookup must resolve by the
    // documented (valid_from, seg_rank) argmax, where seg_rank orders
    // (valid_from, status, grp): purchase@100 ranks before view@100, so
    // the purchase at t=100 sees the VIEW segment (highest rank at ts).
    val rows = Seq(
      (1L, 100L, 1L, "view"), (1L, 100L, 2L, "purchase"),
      (1L, 200L, 3L, "view"), (1L, 250L, 4L, "purchase"),
      (2L, 50L, 5L, "purchase"))
    val df = rows.toDF("user_id", "sec", "event_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .select("user_id", "ts", "event_id", "event_type")
    val got = Relational.scd2LookupOf(df).collect()
      .map(r => r.getLong(0) -> ((r.getString(3), r.getString(4)))).toMap
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    def f(s: Long) = fmt.format(java.time.Instant.ofEpochSecond(s))
    assert(got == Map(
      // same-ts tie at t=100: view@100 outranks purchase@100 in the
      // (valid_from, seg_rank) argmax (seg_rank orders status ASC, so
      // view is the later rank) -> the purchase sees "view"
      2L -> (("view", f(100L))),
      // a purchase OPENS its own segment at its own ts, and the
      // inclusive as-of (valid_from <= ts) picks it up (self-lookup)
      4L -> (("purchase", f(250L))),
      5L -> (("purchase", f(50L)))),
      got.toString)
  }
}
