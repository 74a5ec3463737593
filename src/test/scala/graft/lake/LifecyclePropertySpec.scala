package graft.lake

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Model-based randomized lifecycle test: a LakeTable driven through random
 * op sequences must stay row-identical to a trivial in-memory relational
 * model after EVERY step. This is the whole-system invariant the individual
 * specs can't state — appends, merge-on-read deletes, bin-packing,
 * full compaction, overwrites, metadata-only COLUMN RENAMES (of data AND
 * partition columns) and property commits COMPOSE in any order without
 * losing, duplicating, resurrecting, or mis-mapping a row.
 */
case class Rw(k: Long, v: Double, pt: String)

class LifecyclePropertySpec extends SparkSpec {
  import spark.implicits._

  test("random append/deleteWhere/optimize/compact/overwrite/rename/property " +
      "sequences match the model") {
    for (seed <- 1 to 3) {
      val rng = new Random(seed)
      val root = s"${tmpDir(s"life_$seed")}/t"
      val t = LakeTable(spark, root)
      t.create(Seq(Rw(0L, 0.0, "p0")).toDF("k", "v", "pt").schema,
        partitionBy = Some("pt"), statsColumns = Seq("k"))
      var model = Vector.empty[Rw]
      var nextK = 1L
      // current LOGICAL names of the model's v/pt columns — renames cycle
      // them; k stays fixed so delete predicates stay simple
      var vName = "v"
      var ptName = "pt"
      def freshBatch(): Seq[Rw] = {
        val n = 1 + rng.nextInt(40)
        val rows = (0 until n).map { _ =>
          val r = Rw(nextK, math.floor(rng.nextDouble() * 100) / 100, s"p${rng.nextInt(3)}")
          nextK += 1
          r
        }
        rows
      }
      def check(step: String): Unit = {
        val got = t.read.withColumnRenamed(vName, "v").withColumnRenamed(ptName, "pt")
          .select("k", "v", "pt")
          .as[Rw].collect().toVector.sortBy(r => (r.k, r.v, r.pt))
        val want = model.sortBy(r => (r.k, r.v, r.pt))
        assert(got == want,
          s"seed=$seed after $step: table=${got.size} rows, model=${want.size}; " +
            s"first diff=${got.zipAll(want, null, null).find(p => p._1 != p._2)}")
      }
      (1 to 16).foreach { step =>
        rng.nextInt(8) match {
          case 0 | 1 => // append skews the mix toward accumulation
            val b = freshBatch()
            t.append(b.toDF("k", vName, ptName))
            model = model ++ b
          case 2 => // merge-on-read delete with a random predicate family
            val (cond, pred) = rng.nextInt(3) match {
              case 0 =>
                val x = math.floor(rng.nextDouble() * 100) / 100
                (s"$vName < $x", (r: Rw) => r.v < x)
              case 1 =>
                val mod = 2 + rng.nextInt(5)
                (s"k % $mod = 0", (r: Rw) => r.k % mod == 0)
              case 2 =>
                val p = s"p${rng.nextInt(3)}"
                val x = math.floor(rng.nextDouble() * 100) / 100
                (s"$ptName = '$p' AND $vName >= $x", (r: Rw) => r.pt == p && r.v >= x)
            }
            val deleted = t.deleteWhere(cond)
            val expected = model.count(pred)
            assert(deleted == expected,
              s"seed=$seed step=$step deleteWhere($cond): got $deleted, want $expected")
            model = model.filterNot(pred)
          case 3 =>
            t.optimizeCompact(targetFileBytes = 64 * 1024)
          case 4 =>
            t.compact()
          case 5 => // overwrite resets to a fresh batch
            val b = freshBatch()
            t.overwrite(b.toDF("k", vName, ptName), partitionBy = Some(ptName))
            model = b.toVector
          case 6 => // metadata-only rename of the VALUE or PARTITION column:
            // zero data movement, every later op must speak the new name
            if (rng.nextBoolean()) {
              val nv = if (vName == "v") "score" else "v"
              t.renameColumn(vName, nv)
              vName = nv
            } else {
              val np = if (ptName == "pt") "part_key" else "pt"
              t.renameColumn(ptName, np)
              ptName = np
            }
          case 7 => // property commits are data-invisible
            if (rng.nextBoolean())
              t.setTableProperties(Map(s"k${rng.nextInt(3)}" -> s"v$step"))
            else t.unsetTableProperties(Seq(s"k${rng.nextInt(3)}"))
        }
        // every third step, a FULL SYNC merge (UPDATE SET * + INSERT * +
        // NOT MATCHED BY SOURCE DELETE): semantically "table := source",
        // but through the join path — keys matched, unmatched inserted,
        // target-only rows reconciled away. The model equivalent is trivial
        // assignment, so any leak/dup/ghost in the clause plumbing diverges.
        if (step % 3 == 0) {
          // half the surviving keys re-valued (matched updates — partition
          // moves included: the sync path reads every partition) + fresh
          // keys (inserts); everything else reconciled away
          val kept = model.take(model.size / 2).map(r => r.copy(
            v = math.floor(rng.nextDouble() * 100) / 100,
            pt = s"p${rng.nextInt(3)}"))
          val b = kept ++ freshBatch()
          t.merge(b.toDF("k", vName, ptName), keys = Seq("k"),
            deleteUnmatchedTarget = Some("true"))
          model = b.toVector
        }
        check(s"step $step")
      }
      // end state also survives a cold re-open and a vacuum
      t.vacuum(keepVersions = 1)
      val cold = LakeTable(spark, root)
      assert(cold.read.withColumnRenamed(vName, "v").withColumnRenamed(ptName, "pt")
        .select("k", "v", "pt")
        .as[Rw].collect().toVector.sortBy(r => (r.k, r.v, r.pt)) ==
        model.sortBy(r => (r.k, r.v, r.pt)), s"seed=$seed after vacuum+reopen")
    }
  }
}
