package graft

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BoundedAggs
import graft.functions.BoundedAggs.{BottomKDistinct, Scored, TopKScored}

/** Bounded-heap aggregators: distributed result must equal the naive
  * sort-and-take reference on the same data, for any partitioning. */
class BoundedAggsSpec extends AnyFunSuite with SparkSpec {

  private def forAllSamples[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  test("TopKScored equals sort-take reference (property)") {
    val topkOrd: Ordering[(Double, Long)] = { (a, b) =>
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
    val gen = Gen.listOf(Gen.zip(
      Gen.chooseNum(-1.0, 1.0), Gen.chooseNum(0L, 50L)))
    forAllSamples(gen) { xs =>
      val agg = new TopKScored(5)
      // split into two partial buffers, reduce, merge — the distributed path
      val (l, r) = xs.splitAt(xs.size / 2)
      def fold(p: Seq[(Double, Long)]) =
        p.foldLeft(agg.zero)((b, x) => agg.reduce(b, Scored(x._1, x._2)))
      val got = agg.finish(agg.merge(fold(l), fold(r))).items
      val want = xs.sorted(topkOrd).take(5).map(x => Scored(x._1, x._2))
      assert(got == want)
    }
  }

  test("BottomKDistinct equals distinct-sort-take reference (property)") {
    val gen = Gen.listOf(Gen.chooseNum(0L, 30L))
    forAllSamples(gen) { xs =>
      val agg = new BottomKDistinct(4)
      val (l, r) = xs.splitAt(xs.size / 2)
      def fold(p: Seq[Long]) = p.foldLeft(agg.zero)(agg.reduce)
      val got = agg.finish(agg.merge(fold(l), fold(r))).items
      assert(got == xs.distinct.sorted.take(4))
    }
  }

  test("TopKScored as a DataFrame udaf reproduces the window top-k") {
    import spark.implicits._
    val rows = (1 to 200).map { i =>
      (i % 7L, math.sin(i.toDouble), i.toLong) // (key, score, id)
    }.toDF("k", "score", "id").repartition(4)
    val topk = udaf(new TopKScored(3), Encoders.product[Scored])
    val got = rows.groupBy("k")
      .agg(topk(col("score"), col("id")).as("tk"))
      .select(col("k"), posexplode(col("tk.items")).as(Seq("pos", "it")))
      .select(col("k"), col("it.id").as("id"), col("it.score").as("score"),
        (col("pos") + 1).as("rank"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("score").desc, col("id"))
    val want = rows
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select("k", "id", "score", "rank")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }
}
