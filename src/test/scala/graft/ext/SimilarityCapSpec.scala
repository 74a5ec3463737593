package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hot-cell cap for SemDeDup-style within-cell pair generation
 *  ([[Similarity.cellCappedPairs]]): a degenerate embedding distribution
 *  (mass collapse onto one centroid) must NOT make pair work quadratic —
 *  the oversized cell is hash-re-split so total pairs stay O(n·cap) — while
 *  cells at or under the cap remain exhaustively (and identically) paired. */
class SimilarityCapSpec extends SparkSpec {
  import spark.implicits._

  test("a planted 90% mass collapse keeps the pair count O(n·cap), not O(n²)") {
    val n = 500
    // ids 1..450 are the SAME vector → every stride-seeded centroid (ids
    // 1,101,201,301,401 all ≤ 450) is that vector, every row's argmax-cosine
    // ties, and the deterministic min-cent_id tiebreak funnels ALL n rows
    // into ONE cell — the worst case the cap exists for.
    val rows = (1 to n).map { i =>
      val v = if (i <= 450) Array(1.0f, 0.0f, 0.0f, 0.0f)
              else Array(0.0f, 1.0f, 0.001f * i, 0.0f)
      (i.toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val assigned = Similarity.ivfCells(emb, "vec_id", "embedding",
      centStride = 100, kmeansIters = 1).persist()
    try {
      val cellSizes = assigned.groupBy("cell").count()
        .as[(Long, Long)].collect().toMap
      assert(cellSizes.values.max >= 450, s"collapse not planted: $cellSizes")

      val cap = 50
      val capped = Similarity.cellCappedPairs(assigned, "vec_id", cap).count()
      val uncapped = cellSizes.values.map(s => s * (s - 1) / 2).sum
      // the raw self-join is ~n²/2; the capped one is bounded by n·cap
      assert(uncapped > (n.toLong * n) / 4, s"uncapped=$uncapped")
      assert(capped <= n.toLong * cap, s"capped=$capped exceeds n*cap")
      assert(capped < uncapped / 4,
        s"capped=$capped barely below uncapped=$uncapped — cap not engaging")
      // every emitted pair is still a genuine within-cell candidate
      assert(Similarity.cellCappedPairs(assigned, "vec_id", cap)
        .join(assigned.select(col("vec_id").as("id_a"), col("cell").as("ca")), "id_a")
        .join(assigned.select(col("vec_id").as("id_b"), col("cell").as("cb")), "id_b")
        .filter(col("ca") =!= col("cb")).count() == 0L)
    } finally { assigned.unpersist(); () }
  }

  test("cells at or under the cap are paired exhaustively — capped ≡ raw self-join") {
    // two well-separated clusters, both far under the cap: the capped path
    // must emit EXACTLY the raw within-cell pair set (no loss, no dupes)
    val rows = (1 to 80).map { i =>
      val v = if (i % 2 == 0) Array(1.0f, 0.01f * i, 0.0f, 0.0f)
              else Array(0.0f, 0.0f, 1.0f, 0.01f * i)
      (i.toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val assigned = Similarity.ivfCells(emb, "vec_id", "embedding",
      centStride = 40, kmeansIters = 1).persist()
    try {
      val capped = Similarity.cellCappedPairs(assigned, "vec_id", 100)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val a = assigned.select(col("vec_id").as("id_a"), col("cell"))
      val b = assigned.select(col("vec_id").as("id_b"), col("cell"))
      val raw = a.join(b, "cell").filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(capped == raw)
      assert(raw.nonEmpty)
    } finally { assigned.unpersist(); () }
  }
}
