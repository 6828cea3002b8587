package graft

import graft.multimodal.Multimodal
import graft.similarity.Knn

/** Similarity-search semantics: exact ranking, LSH bucket recall on easy
  * cases, blocked pair mining; multimodal decode/frame plumbing. */
class SimilaritySpec extends SparkSpec {

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  private def embeddings = {
    import spark.implicits._
    Seq(
      (0L, vec(1.0, 0.0, 0.0, 0.0), 0),
      (1L, vec(0.9, 0.1, 0.0, 0.0), 0),  // nearly parallel to query
      (2L, vec(0.0, 1.0, 0.0, 0.0), 0),  // orthogonal
      (3L, vec(-1.0, 0.0, 0.0, 0.0), 1), // opposite
      (4L, vec(0.5, 0.5, 0.0, 0.0), 0)
    ).toDF("vec_id", "embedding", "label")
  }

  test("brute-force top-k ranks by exact cosine with deterministic ties") {
    import spark.implicits._
    val top = Knn.bruteForceTopK(embeddings, "vec_id", "embedding", queryId = 0L, k = 4)
      .as[(Long, Double)].collect()
    assert(top.map(_._1).toSeq === Seq(1L, 4L, 2L, 3L))
    assert(top(0)._2 > 0.99 && math.abs(top(1)._2 - math.sqrt(0.5)) < 0.01)
    assert(math.abs(top(2)._2) < 0.01 && top(3)._2 < -0.99)
  }

  test("sign-LSH buckets colinear vectors together; probe finds the near neighbor") {
    import spark.implicits._
    val top = Knn.lshTopK(embeddings, "vec_id", "embedding", queryId = 0L, k = 4, planes = 6)
      .as[(Long, Double)].collect()
    // vec 1 points the same way as the query → identical projection signs →
    // same bucket → must be found
    assert(top.map(_._1).contains(1L))
    // the opposite vector can never share the bucket
    assert(!top.map(_._1).contains(3L))
  }

  test("blocked similar-pairs mines within blocks only") {
    import spark.implicits._
    val pairs = Knn.similarPairsWithinBlocks(embeddings, "vec_id", "embedding", "label", minCosine = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L))) // only near-parallel pair in label 0
  }

  test("multimodal features flow into similarity search end-to-end") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta gamma " * 10), (1L, "alpha beta gamma " * 10),
      (2L, "totally different payload bytes here")).toDF("doc_id", "text")
    val feats = Multimodal.featureExtractStub(Multimodal.assetsFromText(docs, "doc_id", "text"))
    assert(feats.schema("embedding").dataType.typeName === "array")
    // identical payloads → identical features → cosine 1 with the query
    val top = Knn.bruteForceTopK(feats, "asset_id", "embedding", queryId = 0L, k = 2)
      .as[(Long, Double)].collect()
    assert(top.head._1 === 1L && math.abs(top.head._2 - 1.0) < 1e-9)
  }

  test("multimodal: stub decode is deterministic; frame sampling slices payloads") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij" * 20), (2L, "xyz")).toDF("doc_id", "text")
    val assets = Multimodal.assetsFromText(docs, "doc_id", "text")
    val meta = Multimodal.decodeAssets(assets).collect().map(m => m.asset_id -> m).toMap
    assert(meta(1L).n_bytes === 200 && meta(2L).n_bytes === 3)
    assert(meta(1L).channels === 3 && meta(1L).width >= 16 && meta(1L).height >= 16)
    // determinism: same payload → same fake dims
    val meta2 = Multimodal.decodeAssets(assets).collect().map(m => m.asset_id -> m).toMap
    assert(meta(1L).width === meta2(1L).width && meta(1L).height === meta2(1L).height)

    val frames = Multimodal.sampleFrames(assets, frameSize = 16, stride = 4)
    val f1 = frames.filter($"asset_id" === 1L).count()
    assert(f1 === (200 - 1) / 64 + 1) // every 4th 16-byte frame
  }

  // ---------------------------------------------------------------- q170

  test("IVF recall sweep: monotone in nprobe, exact at nprobe=all") {
    val sfDir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q170_ivf_recall_sweep")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    // recall never decreases as more cells are probed
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted)
    for ((_, h, ppm) <- got) assert(h >= 0 && h <= 10 && ppm == h * 100000L)
    // probing every cell IS brute force: the q32 identity, measured
    assert(got.last._2 == 10L && got.last._3 == 1000000L)
    // cross-check one point against the library calls directly
    val emb = Tables.embeddings(spark, sfDir)
    val (a, c) = graft.similarity.Ivf.build(emb, "vec_id", "embedding", k = 8)
    val brute = Knn.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val p2 = graft.similarity.Ivf.probeTopK(a, c, 0L, 10, 2)
      .collect().map(_.getLong(0)).toSet
    assert(got(1)._2 == (p2 & brute).size.toLong)
  }

  // ---------------------------------------------------------------- q173

  test("dim-truncation recall matches driver-side brute force; exact at full width") {
    val sfDir = "/root/testdata/sf0.001"
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def q(x: Float): Long = math.floor(x.toDouble * 512 + 0.5).toLong
    def topk(d: Int): Set[Long] = {
      val qv = vecs(0L).take(d).map(q)
      vecs.toSeq.filter(_._1 != 0L)
        .flatMap { case (id, v) =>
          val xs = v.take(d).map(q)
          val dot = xs.zip(qv).map { case (a, b) => a * b }.sum
          val (na, nb) = (xs.map(x => x * x).sum, qv.map(x => x * x).sum)
          if (na == 0L || nb == 0L) None
          else Some(id -> dot.toDouble / math.sqrt(na.toDouble * nb.toDouble))
        }
        .sortBy { case (id, cos) => (-cos, id) }.take(10).map(_._1).toSet
    }
    val truth = topk(64)
    val got = SparkEntry.queries("q173_dim_truncation_recall")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(8L, 16L, 32L, 64L))
    for ((d, hits, ppm) <- got) {
      assert(hits == (topk(d.toInt) & truth).size.toLong, s"d=$d")
      assert(ppm == hits * 100000L)
    }
    assert(got.last._2 == 10L, "full width IS the truth")
  }

  // ---------------------------------------------------------------- q174

  test("hybrid RRF matches driver-side fusion of vector and lexical rankings") {
    val sfDir = "/root/testdata/sf0.001"
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def qz(x: Float): Long = math.floor(x.toDouble * 512 + 0.5).toLong
    val qv = vecs(0L).map(qz)
    val vecRank: Map[Long, Long] = vecs.toSeq.filter(_._1 != 0L)
      .flatMap { case (id, v) =>
        val xs = v.map(qz)
        val dot = xs.zip(qv).map { case (a, b) => a * b }.sum
        val (na, nb) = (xs.map(x => x * x).sum, qv.map(x => x * x).sum)
        if (na == 0L || nb == 0L) None
        else Some(id -> dot.toDouble / math.sqrt(na.toDouble * nb.toDouble))
      }
      .sortBy { case (id, c) => (-c, id) }.take(20).map(_._1)
      .zipWithIndex.map { case (id, i) => id -> (i + 1).toLong }.toMap
    val mod = 1000000007L
    def tokHashes(t: String): Set[Long] =
      t.split(' ').filter(_.nonEmpty)
        .map(_.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % mod))
        .toSet
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val qt = tokHashes(texts(0L))
    val lexRank: Map[Long, Long] = texts.toSeq.filter(_._1 != 0L)
      .map { case (id, t) => id -> (tokHashes(t) & qt).size.toLong }
      .sortBy { case (id, ov) => (-ov, id) }.take(20).map(_._1)
      .zipWithIndex.map { case (id, i) => id -> (i + 1).toLong }.toMap
    val expected = (vecRank.keySet ++ lexRank.keySet).toSeq
      .map { id =>
        val (rv, rl) = (vecRank.getOrElse(id, 0L), lexRank.getOrElse(id, 0L))
        val score = (if (rv > 0) 1000000L / (60 + rv) else 0L) +
          (if (rl > 0) 1000000L / (60 + rl) else 0L)
        (id, rv, rl, score)
      }
      .sortBy { case (id, _, _, s) => (-s, id) }.take(10)
    val got = SparkEntry.queries("q174_hybrid_rrf")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q189

  test("RBO rank agreement matches driver-side exact-rational brute force") {
    val sfDir = "/root/testdata/sf0.001"
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def qz(x: Float): Long = math.floor(x.toDouble * 512 + 0.5).toLong
    val qv = vecs(0L).map(qz)
    val vecRank: Map[Long, Long] = vecs.toSeq.filter(_._1 != 0L)
      .flatMap { case (id, v) =>
        val xs = v.map(qz)
        val dot = xs.zip(qv).map { case (a, b) => a * b }.sum
        val (na, nb) = (xs.map(x => x * x).sum, qv.map(x => x * x).sum)
        if (na == 0L || nb == 0L) None
        else Some(id -> dot.toDouble / math.sqrt(na.toDouble * nb.toDouble))
      }
      .sortBy { case (id, c) => (-c, id) }.take(20).map(_._1)
      .zipWithIndex.map { case (id, i) => id -> (i + 1).toLong }.toMap
    val mod = 1000000007L
    def tokHashes(t: String): Set[Long] =
      t.split(' ').filter(_.nonEmpty)
        .map(_.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % mod))
        .toSet
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val qt = tokHashes(texts(0L))
    val lexRank: Map[Long, Long] = texts.toSeq.filter(_._1 != 0L)
      .map { case (id, t) => id -> (tokHashes(t) & qt).size.toLong }
      .sortBy { case (id, ov) => (-ov, id) }.take(20).map(_._1)
      .zipWithIndex.map { case (id, i) => id -> (i + 1).toLong }.toMap
    val D = BigInt(122050345697280L)
    def term(d: Int): BigInt = D / (BigInt(1) << (d - 1)) / d
    def w(m: Int): BigInt = (m to 20).map(term).sum
    val common = vecRank.keySet & lexRank.keySet
    val s = common.toSeq.map(id => w(math.max(vecRank(id), lexRank(id)).toInt)).sum
    val expectedPpm = (s * 1000000 / (2 * D)).toLong
    val row = SparkEntry.queries("q189_rbo_rank_agreement")(spark, sfDir).collect().head
    assert(row.getLong(0) == common.size.toLong)
    assert(row.getLong(1) == expectedPpm)
    // RBO is a fraction of the full-agreement mass
    assert(row.getLong(1) >= 0L && row.getLong(1) <= 1000000L)
  }

  // ---------------------------------------------------------------- q178

  test("adjacent cosine histogram matches driver-side binning") {
    val sfDir = "/root/testdata/sf0.001"
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def qz(x: Float): Long = math.floor(x.toDouble * 512 + 0.5).toLong
    val bins = vecs.keys.toSeq.sorted.flatMap { i =>
      vecs.get(i + 1).flatMap { w =>
        val (a, b) = (vecs(i).map(qz), w.map(qz))
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val (na, nb) = (a.map(x => x * x).sum, b.map(x => x * x).sum)
        if (na == 0L || nb == 0L) None
        else {
          val cos = dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
          Some(math.min(math.floor((cos + 1) * 8).toLong, 15L))
        }
      }
    }
    val expected = bins.groupBy(identity).view
      .mapValues(_.size.toLong).toMap.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q178_adjacent_cosine_histogram")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expected)
    assert(got.map(_._2).sum == bins.size.toLong)
  }
}
