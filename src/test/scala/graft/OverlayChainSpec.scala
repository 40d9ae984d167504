package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Chain, Geo}

class OverlayChainSpec extends SparkSpec {
  import spark.implicits._

  test("cellOverlay derives all set ops from one join") {
    val zones = Seq((1, 10), (1, 11), (1, 12), (2, 20)).toDF("zone", "cell")
    val overlay = Seq(11, 12, 99, 99).toDF("cell") // 99 duplicated → deduped
    val out = Geo.cellOverlay(zones, "zone", "cell", overlay, "cell", cellArea = 2.0)
      .collect()
    val z1 = out.find(_.getInt(0) == 1).get
    assert(z1.getAs[Long]("n_cells") == 3L)
    assert(z1.getAs[Long]("n_intersection") == 2L)
    assert(z1.getAs[Long]("n_difference") == 1L)
    assert(z1.getAs[Long]("n_union") == 4L)          // 3 + 3 - 2
    assert(z1.getAs[Long]("n_sym_difference") == 2L) // 3 + 3 - 4
    assert(z1.getAs[Double]("coverage_pct") == 200.0 / 3)
    assert(z1.getAs[Double]("intersection_area") == 4.0)
    val z2 = out.find(_.getInt(0) == 2).get
    assert(z2.getAs[Long]("n_intersection") == 0L)
    assert(z2.getAs[Double]("coverage_pct") == 0.0)
  }

  test("Chain threads named step outputs and returns the last") {
    val input = Seq((1, 2.0), (1, 4.0), (2, 10.0)).toDF("k", "v")
    val out = Chain.run(input, Seq[(String, Chain.Step)](
      "sums" -> (ctx => ctx("input").groupBy("k").agg(sum("v").as("s"))),
      "big" -> (ctx => ctx("sums").filter(col("s") > 5.0)),
      // later step can still reach EARLIER outputs, not just the previous
      "joined" -> (ctx => ctx("sums").join(ctx("big").select(col("k")), "k"))))
    assert(out.collect().map(r => (r.getInt(0), r.getDouble(1))).toSet ==
      Set((1, 6.0), (2, 10.0)))
  }

  test("Chain rejects duplicate and reserved step names") {
    val input = Seq(1).toDF("x")
    val id: Chain.Step = ctx => ctx("input")
    intercept[IllegalArgumentException](
      Chain.run(input, Seq("a" -> id, "a" -> id)))
    intercept[IllegalArgumentException](
      Chain.run(input, Seq[(String, Chain.Step)]("input" -> id)))
  }

  test("Chain composes into one lazy plan (no intermediate actions)") {
    val input = Seq((1, 2.0)).toDF("k", "v")
    val out: DataFrame = Chain.run(input, Seq[(String, Chain.Step)](
      "a" -> (ctx => ctx("input").filter(col("v") > 0)),
      "b" -> (ctx => ctx("a").select(col("k")))))
    // the composed plan prunes v out of the scan — optimizer sees through steps
    val schema = out.queryExecution.optimizedPlan.schema.fieldNames.toSeq
    assert(schema == Seq("k"))
  }
}
