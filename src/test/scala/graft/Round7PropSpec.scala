package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the round-7 analytics folds, driven
  * with arbitrary (small, collision-heavy) event sets rather than the
  * driver fixtures: the funnel's sequential-min fold and the cohort
  * bucketing are compared against direct Scala reference
  * implementations. Fixed-seed sampling (the MergePropertiesSpec
  * pattern — only scalatest+scalacheck jars are available). */
class Round7PropSpec extends AnyFunSuite with SparkSpec {

  private def forAllSamples[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    var seed = Seed(7L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  // small domains force timestamp ties and repeated stages
  private val eventsGen: Gen[List[(Long, Long, Int)]] =
    Gen.listOfN(30, for {
      u <- Gen.choose(0L, 4L)
      ts <- Gen.choose(0L, 15L)
      tp <- Gen.choose(0, 3)
    } yield (u, ts, tp))

  /** Reference funnel: earliest stage-i event strictly after t(i-1). */
  private def refStages(evs: Seq[(Long, Int)]): Seq[Long] = {
    var times = Vector.empty[Long]
    evs.sortBy(e => (e._1, e._2)).foreach { case (ts, tp) =>
      if (tp == times.length && times.length < 4 &&
          (times.isEmpty || ts > times.last)) times :+= ts
    }
    times
  }

  test("funnel fold matches the reference on arbitrary event sets") {
    forAllSamples(eventsGen) { rows =>
      val df = spark.createDataFrame(rows).toDF("user_id", "tsus", "tp")
      val got = graft.ext.EventOps.funnelStages(df)
        .select(col("user_id"), col("st.t1"), col("st.t2"),
          col("st.t3"), col("st.t4"))
        .collect()
        .map(r => r.getLong(0) -> (1 to 4).flatMap(i =>
          if (r.isNullAt(i)) None else Some(r.getLong(i))))
        .toMap
      val expect = rows.groupBy(_._1).map { case (u, es) =>
        u -> refStages(es.map(e => (e._2, e._3)))
      }
      assert(got.keySet == expect.keySet)
      got.foreach { case (u, ts) =>
        assert(ts == expect(u), s"user $u: $ts != ${expect(u)}")
        // stage times strictly increase
        assert(ts.sliding(2).forall {
          case Seq(a, b) => a < b; case _ => true })
      }
    }
  }

  // tiny vocab + short docs force passage collisions within and
  // across documents
  private val docsGen: Gen[List[(Long, String)]] =
    Gen.listOfN(8, for {
      n <- Gen.choose(0, 35)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield ws.mkString(" ")).map(_.zipWithIndex.map {
      case (t, i) => (i.toLong, t) })

  test("passage dedup matches the reference on arbitrary token streams") {
    forAllSamples(docsGen, n = 40) { rows =>
      val df = spark.createDataFrame(rows).toDF("doc_id", "text")
      val got = graft.ext.DedupOps.passageDedupOf(df).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // reference: 10-token tiles, global occurrence counts
      val passages = rows.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).grouped(10)
          .map(_.mkString(" ")).toList
      }.filter(_._2.nonEmpty)
      val counts = passages.flatMap(_._2).groupBy(identity)
        .map { case (p, xs) => p -> xs.length }
      val expect = passages.map { case (id, ps) =>
        id -> (ps.length.toLong, ps.count(counts(_) >= 2).toLong)
      }.toMap
      assert(got == expect)
    }
  }

  // dense small graphs: every pair has a ~50% edge, so triangles and
  // open wedges are both plentiful
  private val edgesGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(20, for {
      a <- Gen.choose(0L, 7L)
      b <- Gen.choose(0L, 7L)
    } yield (math.min(a, b), math.max(a, b))).map(
      _.filter(e => e._1 != e._2).distinct)

  test("oriented triangle counts match brute force on random graphs") {
    forAllSamples(edgesGen, n = 40) { edges =>
      if (edges.nonEmpty) {
        val df = spark.createDataFrame(edges).toDF("p1", "p2")
        val (degDf, counts) = graft.graph.GraphOps.trianglesWithDeg(df)
        val got = counts.collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
          .map { case (v, es) => v -> es.map(_._2).toSet }
        val verts = adj.keys.toSeq.sorted
        val expect = verts.map { v =>
          val nb = adj(v).toSeq
          v -> (for {
            i <- nb.indices; j <- i + 1 until nb.length
            if adj(nb(i)).contains(nb(j))
          } yield 1).size.toLong
        }.filter(_._2 > 0).toMap
        assert(got == expect)
        val deg = degDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(deg == adj.map { case (v, nb) => v -> nb.size.toLong })
      }
    }
  }

  private val daysGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(40, for {
      u <- Gen.choose(0L, 5L)
      day <- Gen.choose(0L, 30L)
    } yield (u, day))

  test("cohort bucketing matches the reference on arbitrary day sets") {
    forAllSamples(daysGen) { rows =>
      val distinctRows = rows.distinct
      val df = spark.createDataFrame(distinctRows).toDF("user_id", "day")
      val got = graft.ext.EventOps.cohortsFromDays(df)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      // reference: per user, cohort = first-day week; offsets from d0
      val byUser = distinctRows.groupBy(_._1).map { case (u, ds) =>
        val d0 = ds.map(_._2).min
        u -> ds.map(d => (d0 / 7, (d._2 - d0) / 7)).distinct
      }
      val cells = byUser.values.flatten.groupBy(identity).map {
        case (cell, xs) => cell -> xs.size.toLong
      }
      val sizes = cells.collect { case ((cw, 0L), n) => cw -> n }
      assert(got.keySet == cells.keySet)
      got.foreach { case ((cw, off), (n, ppm)) =>
        assert(n == cells((cw, off)))
        assert(ppm == n * 1000000L / sizes(cw))
        if (off == 0) assert(ppm == 1000000L)
      }
    }
  }
}
