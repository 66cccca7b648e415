package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("backward as-of: latest at-or-before match, ties, and no-match nulls") {
    import spark.implicits._
    val left = Seq(
      ("u1", 100L, 10L), // matches right at 100 (equal time visible)
      ("u1", 250L, 11L), // matches latest at-or-before: 200
      ("u2", 50L, 12L),  // u2 has no right rows ≤ 50 → null
      ("u3", 500L, 13L)  // u3 has no right rows at all → null
    ).toDF("user_id", "t", "left_id")
    val right = Seq(
      ("u1", 100L, 1L, "a"),
      ("u1", 100L, 2L, "b"), // equal-time tie → highest id (2) wins
      ("u1", 200L, 3L, "c"),
      ("u1", 300L, 4L, "d"), // future, never visible
      ("u2", 60L, 5L, "e")
    ).toDF("user_id", "t", "rid", "v")

    val out = AsOfJoin.backward(left, right, key = "user_id",
      leftTime = "t", rightTime = "t", rightId = "rid",
      rightCols = Map("v" -> "matched_v"))
      .collect()
      .map(r => (r.getLong(2),
        Option(r.getAs[String]("matched_v")),
        Option(r.getAs[Any]("matched_rid"))))
      .sortBy(_._1)

    assert(out.toSeq === Seq(
      (10L, Some("b"), Some(2L)),
      (11L, Some("c"), Some(3L)),
      (12L, None, None),
      (13L, None, None)))
  }

  test("backward as-of: non-integral rightId fails at analysis, not silently") {
    import spark.implicits._
    val left = Seq(("u1", 100L, 10L)).toDF("user_id", "t", "left_id")
    val right = Seq(("u1", 50L, "r1", "a")).toDF("user_id", "t", "rid", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, key = "user_id", leftTime = "t",
        rightTime = "t", rightId = "rid", rightCols = Map("v" -> "matched_v"))
    }
    assert(e.getMessage.contains("integral"))
  }

  test("backward as-of: NULL right times never match (no nulls-first fallback)") {
    import spark.implicits._
    val left = Seq(("u1", 100L, 10L)).toDF("user_id", "t", "left_id")
    val right = Seq(
      ("u1", Option.empty[Long], 1L, "null-time"), // must never be visible
      ("u1", Option(200L), 2L, "future")           // after leftTime
    ).toDF("user_id", "t", "rid", "v")
    val out = AsOfJoin.backward(left, right, key = "user_id",
      leftTime = "t", rightTime = "t", rightId = "rid",
      rightCols = Map("v" -> "matched_v")).collect()
    assert(out.length === 1)
    assert(Option(out.head.getAs[String]("matched_v")).isEmpty)
  }

  test("backward as-of: NULL keys follow equi-join semantics (no match)") {
    import spark.implicits._
    val left = Seq(
      (Option.empty[String], 100L, 10L), // NULL key → unmatched
      (Option("u1"), 100L, 11L)
    ).toDF("user_id", "t", "left_id")
    val right = Seq(
      (Option.empty[String], 50L, 1L, "null-key"), // dropped
      (Option("u1"), 50L, 2L, "ok")
    ).toDF("user_id", "t", "rid", "v")
    val out = AsOfJoin.backward(left, right, key = "user_id",
      leftTime = "t", rightTime = "t", rightId = "rid",
      rightCols = Map("v" -> "matched_v"))
      .collect()
      .map(r => (r.getLong(2), Option(r.getAs[String]("matched_v"))))
      .sortBy(_._1)
    assert(out.toSeq === Seq((10L, None), (11L, Some("ok"))))
  }
}
