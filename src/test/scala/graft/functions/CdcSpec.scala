package graft.functions

import org.apache.spark.sql.functions._

class CdcSpec extends graft.SparkSpec {
  import spark.implicits._

  private def snap = Seq(
    (1L, "alice", "A"), (2L, "bob", "B"), (3L, "carol", "A"), (4L, "dan", "C")
  ).toDF("id", "name", "seg")

  test("applyChanges: upsert replaces, delete drops, insert appears, untouched passes") {
    val chg = Seq(
      (2L, "bob2", "B2", 1L, "u"),   // upsert existing
      (3L, "x", "x", 1L, "D"),       // delete existing
      (9L, "nina", "N", 1L, "u"),    // insert new key
      (8L, "x", "x", 1L, "delete")   // delete of a missing key: no-op
    ).toDF("id", "name", "seg", "seq", "op")
    val got = Cdc.applyChanges(snap, chg, Seq("id"), "seq", "op")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, "alice", "A"), (2L, "bob2", "B2"),
      (4L, "dan", "C"), (9L, "nina", "N")))
  }

  test("applyChanges: latest seq wins per key, including delete-then-upsert") {
    val chg = Seq(
      (1L, "v1", "S", 1L, "u"), (1L, "v2", "S", 3L, "u"), (1L, "x", "x", 2L, "d"),
      (2L, "gone", "S", 5L, "u"), (2L, "x", "x", 7L, "d")
    ).toDF("id", "name", "seg", "seq", "op")
    val got = Cdc.applyChanges(snap, chg, Seq("id"), "seq", "op")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    // id=1: seq3 upsert beats the seq2 delete; id=2: seq7 delete wins
    assert(got.toSeq == Seq((1L, "v2"), (3L, "carol"), (4L, "dan")))
  }

  test("applyChanges: null op counts as upsert; missing columns reject") {
    val chg = Seq((1L, "vn", "S", 1L, null.asInstanceOf[String]))
      .toDF("id", "name", "seg", "seq", "op")
    val got = Cdc.applyChanges(snap, chg, Seq("id"), "seq", "op")
      .filter($"id" === 1L).collect()
    assert(got.head.getString(1) == "vn")

    val bad = Seq((1L, 1L, "u")).toDF("id", "seq", "op")
    val e = intercept[IllegalArgumentException] {
      Cdc.applyChanges(snap, bad, Seq("id"), "seq", "op")
    }
    assert(e.getMessage.contains("missing columns"), e.getMessage)
  }

  test("applyChanges plan: latest-per-key gets map-side partial aggregation") {
    val chg = Seq((2L, "bob2", "B2", 1L, "u")).toDF("id", "name", "seg", "seq", "op")
    val plan = Cdc.applyChanges(snap, chg, Seq("id"), "seq", "op")
      .queryExecution.executedPlan.toString
    // partial + final aggregate pair around the exchange (ObjectHashAggregate
    // or HashAggregate depending on the struct type), never a window rank
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("Aggregate"), plan)
  }

  test("scd2: intervals chain, is_current marks the tail") {
    val chg = Seq(
      (1L, 10L, "open"), (1L, 20L, "held"), (1L, 30L, "closed"),
      (2L, 5L, "open")
    ).toDF("id", "seq", "status")
    val got = Cdc.scd2(chg, Seq("id"), "seq")
      .select("id", "seq", "valid_from", "valid_to", "is_current")
      .orderBy("id", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, 10L, Some(20L), false), (1L, 20L, Some(30L), false),
      (1L, 30L, None, true), (2L, 5L, None, true)))
  }

  test("scd2 change_only: re-stated rows collapse and intervals bridge them") {
    val chg = Seq(
      (1L, 10L, "open"), (1L, 20L, "open"), (1L, 30L, "closed"), (1L, 40L, "closed")
    ).toDF("id", "seq", "status")
    val got = Cdc.scd2(chg, Seq("id"), "seq", changeOnly = true)
      .select("seq", "valid_to").orderBy("seq").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
    // 20 and 40 are re-statements; 10's interval runs to 30
    assert(got.toSeq == Seq((10L, Some(30L)), (30L, None)))
  }

  test("scd2 plan: change-only filter adds no second exchange") {
    val chg = Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("id", "seq", "status")
    val plan = Cdc.scd2(chg, Seq("id"), "seq", changeOnly = true)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("YAML dispatch: apply_changes and scd2 run from declared operations") {
    val eng = new graft.engine.Engine(spark)
    val chg = Seq((2L, "bob2", "B2", 1L, "u")).toDF("id", "name", "seg", "seq", "op")
    val merged = eng.applyOperation(snap,
      Map("operation" -> "apply_changes", "sources" -> List("$transformations.chg"),
        "key_columns" -> List("id"), "seq_column" -> "seq", "op_column" -> "op"),
      Map("transformations.chg" -> chg), "spec")
    assert(merged.filter($"id" === 2L).collect().head.getString(1) == "bob2")

    val hist = eng.applyOperation(
      Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("id", "seq", "status"),
      Map("operation" -> "scd2", "key_columns" -> List("id"),
        "seq_column" -> "seq", "change_only" -> "true"),
      Map.empty, "spec")
    assert(hist.columns.contains("valid_to") && hist.count() == 2)
  }
}
