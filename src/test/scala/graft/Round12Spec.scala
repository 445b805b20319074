package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 operators: sliding-window chunking (t65) and its streaming
  * twin (e107), the greedy WebDataset-style shard manifest (m77), and
  * the split drift report (v74). Each test asserts a semantic invariant
  * the DuckDB hash-compare can't express (manual recomputation,
  * batch/stream parity, greedy-walk replay).
  */
class Round12Spec extends AnyFunSuite with SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("t65 chunk spans tile each document with the declared overlap") {
    import spark.implicits._
    val size = graft.ext.TextOps.chunkTokens
    val stride = graft.ext.TextOps.chunkStride
    // adversarial lengths around the window/stride boundaries:
    // empty, 1, size-1, size, size+1, exact tiling, trailing tail
    val docs = Seq(
      (0L, "s", ""),
      (1L, "s", "a"),
      (2L, "s", (1L until size).map("t" + _).mkString(" ")),
      (3L, "s", (0L until size).map("t" + _).mkString(" ")),
      (4L, "s", (0L to size).map("t" + _).mkString(" ")),
      (5L, "s", (0L until size + 2 * stride).map("t" + _).mkString(" ")),
      (6L, "s", (0L until 3 * stride + 7).map("t" + _).mkString(" ")))
      .toDF("doc_id", "source", "text")
    val rows = graft.ext.TextOps.chunkOverlapOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    val byDoc = rows.groupBy(_._1)
    assert(!byDoc.contains(0L), "empty doc must yield no chunks")
    // expected chunk count: 1 + ceil(max(n-size,0)/stride)
    def expectChunks(n: Long): Long =
      1L + math.max((n - size + stride - 1) / stride, 0L)
    val nTokens = Map(1L -> 1L, 2L -> (size - 1), 3L -> size,
      4L -> (size + 1), 5L -> (size + 2 * stride), 6L -> (3 * stride + 7))
    nTokens.foreach { case (doc, n) =>
      val chunks = byDoc(doc).sortBy(_._2)
      assert(chunks.length == expectChunks(n), s"doc $doc chunk count")
      chunks.zipWithIndex.foreach { case ((_, idx, start, len, _), i) =>
        assert(idx == i)
        assert(start == i * stride)
        assert(len == math.min(size, n - start))
        assert(len > 0, s"doc $doc chunk $i empty")
      }
      // the last chunk must reach the document's end
      val (_, _, lastStart, lastLen, _) = chunks.last
      assert(lastStart + lastLen == n, s"doc $doc tail not covered")
      // adjacent chunks overlap by exactly size - stride (when full)
      chunks.sliding(2).foreach {
        case Array((_, _, s1, l1, _), (_, _, s2, _, _)) =>
          assert(s2 - s1 == stride)
          if (l1 == size) assert(s1 + l1 - s2 == size - stride)
        case _ =>
      }
    }
    // chunk_md5 really is the md5 of the joined token slice
    val doc6 = (0L until 3 * stride + 7).map("t" + _)
    val c1 = byDoc(6L).sortBy(_._2).apply(1)
    val expectText = doc6.slice(stride.toInt, (stride + size).toInt)
      .mkString(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expectText.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(c1._5 == md)
  }

  test("e107 streaming chunker matches the batch chunk manifest") {
    val batch = graft.ext.TextOps.chunkOverlap(spark, d)
      .collect().map(_.toSeq).toSet
    val streamed = graft.streaming.StreamingOps.streamChunkOverlap(spark, d)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("m77 greedy shard walk replays exactly and respects the budget") {
    val budget = graft.ext.Multimodal.shardBudget
    val rows = graft.ext.Multimodal.shardManifest(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._2, r._3)).foreach { case ((kind, block), g) =>
      val ordered = g.sortBy(_._1)
      // sequential replay of the greedy close-on-overflow walk
      var shard = 0L; var used = 0L
      ordered.foreach { case (id, _, _, nb, sh, off) =>
        if (used > 0 && used + nb > budget) { shard += 1; used = 0 }
        assert(sh == shard, s"media $id shard")
        assert(off == used, s"media $id offset")
        used += nb
      }
      // budget honored except for oversize single samples
      ordered.groupBy(_._5).foreach { case (_, inShard) =>
        val total = inShard.map(_._4).sum
        if (inShard.length > 1)
          assert(total <= budget,
            s"($kind,$block) multi-sample shard over budget: $total")
      }
      // shards are contiguous ordinals starting at 0
      val shards = ordered.map(_._5).distinct.sorted
      assert(shards == (0L until shards.length).toArray.toSeq ||
        shards.sameElements(0L until shards.length))
    }
    // block bounds: never more rows than shardBlock in a group
    rows.groupBy(r => (r._2, r._3)).foreach { case (_, g) =>
      assert(g.size <= graft.ext.Multimodal.shardBlock)
    }
  }

  test("v74 drift stats recompute from the raw corpus") {
    val rep = graft.ingest.Validation.driftReport(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rep.map(_._1).toSet == Set("train", "validation", "test"))
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("n_chars"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rep.map(_._2).sum == docs.length)
    // recompute one split end-to-end with the t48 hash rule
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % 100
    }
    val train = docs.filter(t => bucket(t._1) < 80)
    val trainRow = rep.find(_._1 == "train").get
    assert(trainRow._2 == train.length)
    assert(trainRow._3 == train.map(_._2).sum * 100 / train.length)
    assert(trainRow._4 ==
      train.count(_._2 < 100).toLong * 10000 / train.length)
    assert(trainRow._5 == train.map(_._3).distinct.length)
    val gMean = docs.map(_._2).sum * 100 / docs.length
    assert(trainRow._6 == (trainRow._3 - gMean) * 1000000 / gMean)
  }

  test("t66 bpe pair counts replay by hand on a tiny vocab") {
    import spark.implicits._
    // vocab: "abab" x3, "bc" x2, "a" x5 (dropped: single char)
    val docs = Seq((0L, "abab bc a a"), (1L, "abab bc a"),
      (2L, "abab a a")).toDF("doc_id", "text")
    val rows = graft.ext.TextOps.bpePairsOf(docs)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // abab (n=3) pairs: ab, ba, ab -> ab:6, ba:3; bc (n=2) -> bc:2
    assert(rows.toList == List(("ab", 6L), ("ba", 3L), ("bc", 2L)))
  }

  test("s84 neighbor lists are ranked, self-free, and correctly scored") {
    val rows = graft.ext.SimilarityOps.knnGraph(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (v, _, nbr, _) => assert(v != nbr) }
    // ranks contiguous from 1 and cosine non-increasing per vector
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toList == (1L to g.length).toList)
      assert(sorted.map(_._4).toList == sorted.map(_._4).sortBy(-_).toList)
    }
    // spot-check the scoring wiring: recompute cosine for 20 edges
    val vecs = Tables.embeddings(spark, d)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    rows.take(20).foreach { case (a, _, b, cos) =>
      val (va, vb) = (vecs(a), vecs(b))
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum
      val exp = dot / (math.sqrt(va.map(x => x * x).sum) *
        math.sqrt(vb.map(x => x * x).sum))
      assert(math.abs(BigDecimal(exp).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble - cos) < 1e-9)
    }
  }

  test("s85 bm25 scores replay exactly from the raw corpus") {
    val rows = graft.ext.SimilarityOps.bm25TopK(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.length == 20) // 4 queries x top-5
    val toks = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[ \t\n\f\r]+")
          .filter(_.nonEmpty).toSeq)
      .filter(_._2.nonEmpty).toMap
    val n = toks.size.toLong
    val sumDl = toks.values.map(_.length.toLong).sum
    val queries = Map(0L -> Seq("spark", "query"), 1L -> Seq("filter",
      "join"), 2L -> Seq("hash", "table"), 3L -> Seq("stream", "window"))
    val dfOf = queries.values.flatten.map(t =>
      t -> toks.values.count(_.contains(t)).toLong).toMap
    def bm25(q: Long, doc: Long): Long = {
      val dl = toks(doc).length.toLong
      queries(q).map { t =>
        val tf = toks(doc).count(_ == t).toLong
        if (tf == 0) 0L
        else {
          val idfU = math.round(
            math.log(2.0 * (n + 1) / (2 * dfOf(t) + 1)) * 1000000)
          val tfnU = math.round(22.0 * tf * sumDl * 1000000 /
            (10 * sumDl * tf + 3 * sumDl + 9 * dl * n))
          idfU * tfnU
        }
      }.sum
    }
    rows.foreach { case (q, _, doc, scoreU) =>
      assert(scoreU == bm25(q, doc), s"query $q doc $doc")
    }
    // ranks strictly follow (score desc, doc_id asc) within each query
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._2).toList == (1L to g.length).toList)
      val key = byRank.map(r => (-r._4, r._3)).toList
      assert(key == key.sorted)
    }
  }

  test("s86 hybrid rrf fuses independently recomputed dense and lexical ranks") {
    val rows = graft.ext.SimilarityOps.hybridRrf(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val vecs = Tables.embeddings(spark, d)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dt = a.zip(b).map { case (x, y) => x * y }.sum
      val r = dt / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val shOf = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val t = r.getString(1).toLowerCase.split("[ \t\n\f\r]+")
          .filter(_.nonEmpty).toSeq
        r.getLong(0) -> t.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }.toMap
    val expected = (0L until 10L).flatMap { q =>
      val dense = vecs.keys.filter(_ != q).toSeq
        .map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (c, s) => (-s, c) }.take(10).map(_._1)
      val lex = shOf.keys.filter(_ != q).toSeq
        .map { c =>
          val inter = (shOf(q) & shOf(c)).size.toLong
          (c, if (inter == 0) -1L else
            inter * 1000000 / (shOf(q).size + shOf(c).size - inter))
        }
        .filter(_._2 >= 0)
        .sortBy { case (c, s) => (-s, c) }.take(10).map(_._1)
      val cands = (dense ++ lex).distinct
      cands.map { c =>
        val rd = dense.indexOf(c); val rl = lex.indexOf(c)
        val score = (if (rd >= 0) 1000000L / (60 + rd + 1) else 0L) +
          (if (rl >= 0) 1000000L / (60 + rl + 1) else 0L)
        (q, c, score)
      }.sortBy { case (_, c, s) => (-s, c) }.take(5).zipWithIndex
        .map { case ((qq, c, s), i) => (qq, i + 1L, c, s) }
    }
    assert(rows.sortBy(r => (r._1, r._2)).toList == expected.toList)
  }

  test("s87 artifact serving and e108 stream scoring match inline s85 frames") {
    val inline = graft.ext.SimilarityOps.bm25TopK(spark, d).collect().toList
    val served = graft.ext.SimilarityOps.bm25Served(spark, d).collect().toList
    assert(served == inline, "artifact round trip must preserve ranking")
    val streamed = graft.streaming.StreamingOps.streamBm25(spark, d)
      .collect().toList
    assert(streamed == inline, "frozen-index stream scoring must match batch")
  }
}
