package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 operators: training-sequence packing (t64), semantic dedup
  * over the trained quantizer (d61), filtered vector search (s82).
  * Each test asserts a semantic invariant the DuckDB hash-compare
  * can't express (manual recomputation, cross-operator consistency,
  * plan shape).
  */
class Round11Spec extends AnyFunSuite with SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("t64 offsets are the shard prefix sums and packs tile the stream") {
    val cap = graft.ext.TextOps.packCap
    val rows = graft.ext.TextOps.sequencePacking(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._2, r._3)).foreach { case ((_, _), shard) =>
      val ordered = shard.sortBy(_._1)
      // running offset recomputed from scratch
      var off = 0L
      ordered.foreach { case (doc, _, _, n, startOff, pack, straddles) =>
        assert(startOff == off, s"doc $doc offset $startOff != $off")
        assert(pack == startOff / cap)
        val expectStraddle = n > 0 && (startOff + n - 1) / cap > pack
        assert(straddles == expectStraddle, s"doc $doc straddle flag")
        off += n
      }
      // concat-and-chunk tiling: the shard's documents span exactly
      // ceil(total/cap) packs (every pack except the last is full)
      val total = ordered.map(_._4).sum
      if (total > 0) {
        val lastTokenPack = (total - 1) / cap
        val firstPacks = ordered.map(_._6).distinct
        assert(firstPacks.max <= lastTokenPack)
      }
    }
    // shards are bounded: never more docs than packShard in one
    rows.groupBy(r => (r._2, r._3)).foreach { case (_, s) =>
      assert(s.size <= graft.ext.TextOps.packShard)
    }
  }

  test("d61 drops exactly the vectors with a lower-id τ-neighbor in-cluster") {
    val tau = graft.ext.DedupOps.semTau
    val kept = graft.ext.DedupOps.semanticDedup(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(kept.nonEmpty)
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byCluster = kept.groupBy(_._2)
    byCluster.foreach { case (_, members) =>
      val ids = members.map(_._1).sorted
      members.foreach { case (vid, _, keep) =>
        val hasLowerNeighbor = ids.exists(o =>
          o < vid && cosine(vecs(o), vecs(vid)) >= tau)
        assert(keep == !hasLowerNeighbor,
          s"vec $vid keep=$keep lowerNeighbor=$hasLowerNeighbor")
      }
    }
    // blocking really is the s66 model: cluster census must agree
    val census = graft.ext.SimilarityOps.kmeansCensus(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCluster.view.mapValues(_.size.toLong).toMap == census)
  }

  test("s82 equals brute-force top-5 under the predicate, pushed to scan") {
    val out = graft.ext.SimilarityOps.filteredKnn(spark, d)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val allowed = emb.filter(e => Set(1, 3, 5).contains(e._2))
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byQuery = rows.groupBy(_._1)
    emb.filter(_._1 < 10).foreach { case (qid, _, qv) =>
      val truth = allowed.filter(_._1 != qid)
        .map { case (cid, _, cv) => (cid, cosine(qv, cv)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(5)
      val got = byQuery(qid).sortBy(_._4).map(r => (r._2, r._3))
      assert(got.toSeq == truth.toSeq, s"query $qid")
    }
    // every candidate satisfies the predicate (pre-filter, not post)
    val labels = emb.map(e => e._1 -> e._2).toMap
    rows.foreach { case (_, cid, _, _) =>
      assert(Set(1, 3, 5).contains(labels(cid)))
    }
    // and the predicate reached the parquet scan as a pushed filter
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(label"),
      "label IN predicate not pushed to the candidate scan")
  }
}
