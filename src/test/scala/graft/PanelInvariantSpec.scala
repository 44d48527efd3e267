package graft

import org.apache.spark.sql.Row

/** Semantic invariants of the tuning/audit panels — properties the DuckDB
  * oracle can't express (it replays the same arithmetic, so a WRONG shared
  * semantic would still hash-match): sweep curves must be monotone in the
  * threshold, pre-filtering must dominate post-filtering, the cluster-keyed
  * split must leak zero pairs, confusion-matrix cells must partition the
  * corpus. All at sf0.001 through the declared query surface. */
class PanelInvariantSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def rows(q: String): Array[Row] =
    SparkEntry.queries(q)(spark, sf).collect()

  test("x36: both sweep curves are non-increasing in t and survivors complement drops") {
    val r = rows("x36_dedup_threshold_sweep")
      .map(x => (x.getDouble(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .sortBy(_._1)
    assert(r.length === 19)
    r.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, s"n_pairs_dup rose at t=${b._1}")
      assert(b._3 <= a._3, s"n_docs_dropped rose at t=${b._1}")
    }
    // survivors + drops = constant corpus size at every threshold
    assert(r.map(x => x._3 + x._4).distinct.length === 1)
    // the ladder does real work on this corpus: some threshold separates
    assert(r.head._3 > r.last._3)
  }

  test("z45: keep counts are non-increasing in the threshold") {
    val r = rows("z45_threshold_sweep")
      .map(x => (x.getInt(0), x.getLong(1))).sortBy(_._1)
    assert(r.length === 11)
    r.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, s"n_keep rose at t=${b._1}")
    }
    assert(r.head._2 > r.last._2)
  }

  test("y14: pre-filtering dominates post-filtering on every query") {
    val r = rows("y14_filtered_ann")
    assert(r.nonEmpty)
    r.foreach { x =>
      val (nTruth, nPre, nPreHit, nPost, nPostHit) =
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))
      assert(nTruth <= 5 && nPre <= 5 && nPost <= 5)
      assert(nPost <= nPre, s"post found more than pre at q=${x.getLong(0)}")
      assert(nPostHit <= nPreHit, s"post out-recalled pre at q=${x.getLong(0)}")
      assert(nPreHit <= nPre && nPostHit <= nPost)
      assert(nPreHit <= nTruth && nPostHit <= nTruth)
    }
    // the starvation the panel exists to show: somewhere post < pre
    assert(r.exists(x => x.getLong(4) < x.getLong(2)))
  }

  test("z47: the cluster-keyed split leaks zero pairs; the doc-keyed baseline leaks") {
    val r = rows("z47_leakage_split")
    assert(r.map(_.getString(0)).sorted.toSeq === Seq("test", "train", "val"))
    r.foreach { x =>
      assert(x.getLong(4) === 0L, "cluster-keyed split leaked a pair")
      assert(x.getLong(5) > 0L, "baseline shows no leakage — panel is vacuous")
    }
    val corpus = Tables.documents(spark, sf).count()
    assert(r.map(_.getLong(1)).sum === corpus)
  }

  test("x38: confusion cells partition the held-out half and frac matches the cells") {
    val r = rows("x38_gate_agreement")
    assert(r.nonEmpty)
    r.foreach { x =>
      val (n, bk, lm, cl, bd) =
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))
      assert(bk + lm + cl + bd === n, s"cells don't partition lang=${x.getString(0)}")
      assert(x.getDouble(6) === (bk + bd).toDouble / n)
    }
    val oddCount = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1).count()
    assert(r.map(_.getLong(1)).sum === oddCount)
  }
}
