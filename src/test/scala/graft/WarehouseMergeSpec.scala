package graft

import org.apache.spark.sql.functions._

/** MERGE/CDC apply semantics (graft.operators.Warehouse.mergeUpsert +
  * the streaming ValueState twin's fold order): every MERGE arm on a
  * hand-built change batch, keep-last collapse across a churned key,
  * and the (seq, op, v) tie-break total order. */
class WarehouseMergeSpec extends SparkSpec {
  import spark.implicits._

  private def run(target: Seq[(Long, Long)],
      source: Seq[(Long, Long, String, Long)]): Map[Long, (Long, String)] =
    graft.operators.Warehouse.mergeUpsert(
        target.toDF("k", "v"), source.toDF("k", "seq", "op", "v"),
        "k", "v", "seq", "op")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap

  test("mergeUpsert resolves every MERGE arm") {
    val out = run(
      target = Seq(1L -> 10L, 2L -> 20L, 3L -> 30L, 6L -> 60L),
      source = Seq(
        (2L, 1L, "upsert", 21L),            // matched update
        (3L, 1L, "delete", 0L),             // matched delete
        (4L, 1L, "upsert", 40L),            // unmatched insert
        (5L, 1L, "delete", 0L),             // delete of absent key: no-op
        (6L, 1L, "upsert", 61L),            // churn: upsert then...
        (6L, 2L, "delete", 0L),             // ...a later delete wins
        (7L, 1L, "delete", 0L),             // churn on absent key:
        (7L, 2L, "upsert", 70L)))           // ...a later upsert inserts
    assert(out === Map(
      1L -> ((10L, "kept")), 2L -> ((21L, "updated")),
      4L -> ((40L, "inserted")), 7L -> ((70L, "inserted"))))
  }

  test("seq ties resolve by the (op, v) lexicographic tail — " +
      "'upsert' > 'delete', then max value — in both engines' order") {
    // same seq: upsert beats delete, and the larger value beats the
    // smaller, because the collapse orders by struct(seq, op, v)
    val out = run(
      target = Seq(1L -> 10L),
      source = Seq(
        (1L, 1L, "delete", 0L), (1L, 1L, "upsert", 11L),
        (2L, 1L, "upsert", 5L), (2L, 1L, "upsert", 9L)))
    assert(out === Map(1L -> ((11L, "updated")), 2L -> ((9L, "inserted"))))
  }

  test("empty change batch keeps the snapshot verbatim") {
    val out = run(target = Seq(1L -> 10L, 2L -> 20L),
      source = Seq.empty)
    assert(out === Map(1L -> ((10L, "kept")), 2L -> ((20L, "kept"))))
  }

  test("snapshotDiff reports exactly the non-identical rows") {
    val before = Seq(1L -> 10L, 2L -> 20L, 3L -> 30L).toDF("k", "v")
    val after = Seq(1L -> 10L, 2L -> 21L, 4L -> 40L).toDF("k", "v")
    val out = graft.operators.Warehouse.snapshotDiff(before, after, "k", "v")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getString(3)))).toMap
    assert(out === Map(
      2L -> ((Some(20L), Some(21L), "changed")),
      3L -> ((Some(30L), None, "removed")),
      4L -> ((None, Some(40L), "added"))))
  }

  test("diff of a snapshot against its merged state == the merge's actions") {
    val target = Seq(1L -> 10L, 2L -> 20L, 3L -> 30L).toDF("k", "v")
    val source = Seq((2L, 1L, "upsert", 21L), (3L, 1L, "delete", 0L),
      (4L, 1L, "upsert", 40L)).toDF("k", "seq", "op", "v")
    val after = graft.operators.Warehouse.mergeUpsert(
      target, source, "k", "v", "seq", "op")
    val diff = graft.operators.Warehouse.snapshotDiff(target, after, "k", "v")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(diff === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("transitions: adjacent steps per key, probabilities per from-type") {
    val ev = Seq(
      (1L, "A", 1L, 101L), (1L, "B", 2L, 102L),
      (1L, "A", 3L, 103L), (1L, "C", 4L, 104L),
      (2L, "A", 1L, 201L), (2L, "B", 2L, 202L),
      (3L, "Z", 9L, 301L))  // single event: no step
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = graft.operators.Warehouse.transitions(
        ev, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out === Map(
      ("A", "B") -> ((2L, 3L, 2.0 / 3.0)),
      ("A", "C") -> ((1L, 3L, 1.0 / 3.0)),
      ("B", "A") -> ((1L, 1L, 1.0))))
  }

  test("incrementalAgg: refresh from state == full recompute; delta-only keys appear") {
    val hist = Seq(("a", 1.5), ("a", 2.5), ("b", 10.0)).toDF("k", "v")
    val delta = Seq(("a", 6.0), ("c", 1.0)).toDF("k", "v")
    val state = graft.operators.Warehouse.aggState(hist, "k", "v")
    val out = graft.operators.Warehouse.incrementalAgg(state, delta, "k", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val full = graft.operators.Warehouse.aggState(hist.unionAll(delta), "k", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.view.mapValues(t => (t._1, t._2)).toMap === full)
    assert(out("a") === ((3L, 10000000L, 10.0 / 3.0)))
    assert(out("c") === ((1L, 1000000L, 1.0)))
    // empty delta: refresh is the state itself
    val id = graft.operators.Warehouse.incrementalAgg(state,
        delta.filter(lit(false)), "k", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(id === Map("a" -> 2L, "b" -> 1L))
  }

  test("collapse aggregate keeps map-side partials (scale contract)") {
    val plan = graft.operators.Warehouse.mergeUpsert(
      Seq(1L -> 10L).toDF("k", "v"),
      Seq((1L, 1L, "upsert", 11L)).toDF("k", "seq", "op", "v"),
      "k", "v", "seq", "op").queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by") || plan.contains("partial_maxby")
      || plan.toLowerCase.contains("partial"),
      s"keep-last collapse must aggregate partially before the shuffle:\n$plan")
  }
}
