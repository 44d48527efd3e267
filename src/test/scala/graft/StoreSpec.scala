package graft

import graft.sources.{Ingest, Store}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

class StoreSpec extends SparkSpec {
  import spark.implicits._

  private def season(yr: Int, n: Int) =
    (1 to n).map(i => (s"g${yr}_$i", yr, i * 1.0)).toDF("game_id", "season", "epa")

  test("rebuild destroys then appends batch-by-batch; counts per partition verify") {
    val store = Store(spark, tmpDir("store_rebuild"), "season")
    store.rebuild(Iterator(season(1999, 3), season(2000, 4)))
    val counts = store.countsByPartition.as[(Int, Long)].collect().toMap
    assert(counts === Map(1999 -> 3L, 2000 -> 4L))
    // rebuild again: destroy-first means no doubling
    store.rebuild(Iterator(season(1999, 3)))
    assert(store.countsByPartition.as[(Int, Long)].collect().toMap === Map(1999 -> 3L))
  }

  test("materialized shard run survives a restart: fresh handle re-reads the plan exactly") {
    // the x41 contract in miniature: shard-assign a manifest, land it
    // through a shard-partitioned store, then simulate a writer restart —
    // a FRESH handle (new Store instance, read from path only) must see
    // exactly the planned per-shard totals, and re-materializing from
    // scratch must land bit-identical content (the plan is deterministic,
    // so a crashed-and-restarted run converges to the same table)
    val docs = (1L to 200L).map(i => (i, (i * 7919 % 97) + 1)).toDF("doc_id", "toks")
    val plan = graft.operators.Sampling.shardAssign(docs, Seq("doc_id"), "toks", 8)
    val planTotals = plan.groupBy("shard")
      .agg(count(lit(1)).as("n"), sum("toks").as("t"))
      .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val path = tmpDir("store_run_restart")
    Store(spark, path, "shard").rebuild(Iterator(plan))
    // restart: a brand-new handle with no lineage back to `plan`
    val reread = Store(spark, path, "shard").read
    assert(reread.groupBy("shard").agg(count(lit(1)).as("n"), sum("toks").as("t"))
      .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap === planTotals)
    assert(planTotals.keySet === (0 until 8).toSet)
    // re-materialization after a destroy lands the identical row set
    // (collect the first landing BEFORE the destroy — the frame is lazy)
    val firstRun = reread.as[(Long, Long, Int)].collect().toSet
    val store2 = Store(spark, path, "shard")
    store2.rebuild(Iterator(
      graft.operators.Sampling.shardAssign(docs, Seq("doc_id"), "toks", 8)))
    assert(store2.read.as[(Long, Long, Int)].collect().toSet === firstRun)
  }

  test("readChanges reads exactly the delta versions; (0, v] equals readVersion(v)") {
    val path = tmpDir("store_cdf") + "/t"
    val store = Store(spark, path, "season")
    (1 to 3).foreach(i => store.appendVersioned(season(1998 + i, i)))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("game_id").as[String].collect().toSet
    // each single-version range is that batch's rows, nothing else
    assert(ids(store.readChanges(1, 2)) === ids(store.readVersion(2))
      -- ids(store.readVersion(1)))
    assert(ids(store.readChanges(2, 3)).size === 3)
    // from-the-beginning range reproduces the snapshot
    assert(ids(store.readChanges(0, 3)) === ids(store.readVersion(3)))
    // invalid ranges fail loudly
    intercept[IllegalArgumentException] { store.readChanges(2, 2) }
    intercept[IllegalArgumentException] { store.readChanges(1, 9) }
  }

  test("upsertScd2 chains versions across batches and restarts; as-of reads match a rebuild") {
    // (user, type) change feed in three batches, with a WRITER RESTART
    // before the third (fresh Store handle, no lineage): the incremental
    // interval-closing merge must land the exact history a one-shot lead
    // window derives over the full feed, tile without gaps, and keep
    // exactly one open version per key.
    def feed(rows: Seq[(Long, String, Long, Double)]) =
      rows.toDF("user_id", "event_type", "ts_us", "value")
    val b1 = feed(Seq((1L, "a", 100L, 1.0), (1L, "a", 200L, 2.0), // in-batch chain
      (2L, "a", 150L, 5.0), (3L, "b", 120L, 7.0)))
    val b2 = feed(Seq((1L, "a", 300L, 3.0), (3L, "b", 320L, 8.0)))
    val b3 = feed(Seq((2L, "a", 400L, 6.0), (4L, "b", 410L, 9.0))) // new key late
    val path = tmpDir("store_scd2") + "/t"
    val store = Store(spark, path, "event_type")
    val keys = Seq("user_id", "event_type")
    store.upsertScd2(b1, keys, "ts_us")
    store.upsertScd2(b2, keys, "ts_us")
    // restart: a brand-new handle continues the same history
    val store2 = Store(spark, path, "event_type")
    store2.upsertScd2(b3, keys, "ts_us")
    val hist = store2.read
      .select("user_id", "event_type", "ts_us", "value", "valid_from", "valid_to")
    // one open version per key, and it is the key's LAST update
    val open = hist.filter(col("valid_to").isNull)
      .select("user_id", "event_type", "value")
      .as[(Long, String, Double)].collect().toSet
    assert(open === Set((1L, "a", 3.0), (2L, "a", 6.0), (3L, "b", 8.0), (4L, "b", 9.0)))
    // full history == one-shot window derivation over the concatenated feed
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy(col("ts_us").asc)
    val derived = b1.unionByName(b2).unionByName(b3)
      .withColumn("valid_from", col("ts_us"))
      .withColumn("valid_to", lead(col("ts_us"), 1).over(w))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("event_type"), col("value"),
        col("valid_from"), coalesce(col("valid_to"), lit(-1L)))
      .as[(Long, String, Double, Long, Long)].collect().toSet
    assert(rows(hist) === rows(derived), "incremental SCD2 diverged from the rebuild")
    // as-of probes replay history point-in-time
    def asOf(ts: Long) = store2.readAsOf(ts)
      .select("user_id", "event_type", "value")
      .as[(Long, String, Double)].collect().toSet
    assert(asOf(110L) === Set((1L, "a", 1.0)))
    assert(asOf(250L) === Set((1L, "a", 2.0), (2L, "a", 5.0), (3L, "b", 7.0)))
    assert(asOf(500L) === open)
    // intervals tile: each closed version's valid_to is the next valid_from
    val gaps = hist.as("h1").join(hist.as("h2"),
        col("h1.user_id") === col("h2.user_id")
          && col("h1.event_type") === col("h2.event_type")
          && col("h1.valid_to") === col("h2.valid_from"), "left_anti")
      .filter(col("h1.valid_to").isNotNull)
    assert(gaps.count() === 0L, "a closed version's valid_to matches no successor")
  }

  test("tail-split artifact survives a restart: the sketch is derived state") {
    // the x55 lifecycle's restart property: only the exact+tail ROWS are
    // durable; the serving CMS is DERIVED state a fresh process rebuilds
    // from the stored tail keys in O(artifact), never the corpus — and the
    // next merge, run entirely from the re-read artifact plus the
    // re-derived sketch, lands exactly the from-scratch split of
    // base ∪ batch.
    val base = Seq.tabulate(400)(i =>
      (i.toLong, if (i % 5 == 0) 3L else 1L)).toDF("k", "df")
    val path = tmpDir("store_tailsplit") + "/t"
    Store(spark, path, "part")
      .append(base.withColumn("part", pmod(col("k"), lit(4))))
    // ---- restart: a fresh handle with no lineage back to `base` ----
    val art = Store(spark, path, "part").read.drop("part")
    val sk = art.filter(col("df") === 1)
      .select(col("k").cast("string").as("key"))
      .agg(expr("count_min_sketch(key, CAST(0.0001 AS DOUBLE), " +
        "CAST(0.99 AS DOUBLE), 42)"))
      .head().getAs[Array[Byte]](0)
    // day-1 batch: 40 tail crossings (k%10=1, b=1), 40 exact updates
    // (k%10=0, b=1), 30 fresh singletons (400..429), 10 fresh exact
    // (430..439 at b=2)
    val batch = ((0L until 400L).filter(k => k % 10 == 0 || k % 10 == 1).map((_, 1L))
      ++ (400L until 430L).map((_, 1L)) ++ (430L until 440L).map((_, 2L)))
      .toDF("k", "b")
    val exact = art.filter(col("df") >= 2)
    val tailK = art.filter(col("df") === 1)
    val probed = batch
      .join(exact.select(col("k"), col("df").as("dfe")), Seq("k"), "left")
      .withColumn("est", when(col("dfe").isNull,
          call_function("graft_cms_estimate", lit(sk), col("k").cast("string")))
        .otherwise(lit(0L)))
    val estFlag = when(col("est") >= 1, 1L).otherwise(0L)
    val maintained = exact.join(batch, Seq("k"), "left")
      .select(col("k"), (col("df") + coalesce(col("b"), lit(0L))).as("df"))
      .union(probed.filter(col("dfe").isNull && estFlag + col("b") >= 2)
        .select(col("k"), (estFlag + col("b")).as("df")))
      .union(tailK.join(
          probed.filter(col("dfe").isNull && estFlag + col("b") >= 2).select("k"),
          Seq("k"), "left_anti")
        .select(col("k"), col("df")))
      .union(probed.filter(col("dfe").isNull && col("b") === 1 && col("est") < 1)
        .select(col("k"), lit(1L).as("df")))
    val scratch = base.join(batch, Seq("k"), "full")
      .select(col("k"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("b"), lit(0L))).as("df"))
    assert(maintained.as[(Long, Long)].collect().toSet
      === scratch.as[(Long, Long)].collect().toSet,
      "restart merge from the stored artifact diverged from the rebuild")
  }

  test("purgeRestartLineage removes content from history and restarts the epoch") {
    val path = tmpDir("store_purge") + "/t"
    val store = Store(spark, path, "season")
    (1 to 3).foreach(i => store.appendVersioned(season(1998 + i, i + 1)))
    assert(store.epoch === 1L && store.versions === Seq(1L, 2L, 3L))
    // takedown hits the versioned lineage: restart it
    assert(store.purgeRestartLineage(col("season") === 2000) === 2L)
    assert(store.epoch === 2L)
    // the new lineage has exactly ONE version — the post-purge state —
    // and the removed season is readable in no snapshot
    assert(store.versions === Seq(1L))
    assert(store.readVersion(1).filter(col("season") === 2000).count() === 0L)
    assert(store.read.count() === 6L) // 1999 (2 rows) + 2001 (4 rows)
    // pre-purge version numbers no longer resolve — by design
    intercept[IllegalArgumentException] { store.readVersion(2) }
    // the removed bytes are OFF THE DISK, not merely unreferenced
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    assert(!walk(new java.io.File(path)).exists(_.getPath.contains("season=2000")),
      "purged partition files survived the lineage restart")
    // no stale purge tmp left beside the table
    assert(!new java.io.File(path + "__purge_tmp").exists())
    // the new epoch keeps versioning normally
    store.appendVersioned(season(2002, 1))
    assert(store.versions === Seq(1L, 2L) && store.epoch === 2L)
    // purging everything still commits: v1 of epoch 3 is a TYPED empty
    assert(store.purgeRestartLineage(lit(true)) === 3L)
    assert(store.readVersion(1).count() === 0L)
    assert(store.readVersion(1).schema.fieldNames.toSet
      === Set("game_id", "season", "epa"))
    // unversioned tables refuse the purge (use the plain takedown rewrite)
    val plain = Store(spark, tmpDir("store_purge_plain"), "season")
    plain.append(season(1999, 2))
    intercept[IllegalArgumentException] { plain.purgeRestartLineage(lit(true)) }
  }

  test("collapseHistory bounds the addressable lineage without touching data") {
    val path = tmpDir("store_collapse") + "/t"
    val store = Store(spark, path, "season")
    (1 to 4).foreach(i => store.appendVersioned(season(1998 + i, i)))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("game_id").as[String].collect().toSet
    val v2Before = ids(store.readVersion(2))
    val v4Before = ids(store.readVersion(4))
    val d23Before = ids(store.readChanges(2, 3))
    store.collapseHistory(2)
    // surviving reads are identical; the log just got shorter
    assert(store.versions === Seq(2L, 3L, 4L))
    assert(ids(store.readVersion(2)) === v2Before)
    assert(ids(store.readVersion(4)) === v4Before)
    assert(ids(store.readChanges(2, 3)) === d23Before)
    // versions below the retention floor stop resolving — the promise
    intercept[IllegalArgumentException] { store.readVersion(1) }
    // the lineage keeps appending normally after the collapse
    store.appendVersioned(season(2003, 2))
    assert(store.versions === Seq(2L, 3L, 4L, 5L))
    assert(ids(store.readVersion(5)).size === (1 + 2 + 3 + 4 + 2))
    // collapsing a single-entry prefix is a no-op; unknown versions refuse
    store.collapseHistory(2)
    assert(store.versions === Seq(2L, 3L, 4L, 5L))
    intercept[IllegalArgumentException] { store.collapseHistory(99) }
    // no hidden merge tmp left behind
    assert(!new java.io.File(s"$path/_log/.v2_merged").exists())
  }

  test("deleteWhere rewrites only touched partitions and clears emptied ones") {
    def listFiles(p: String, part: String): Set[(String, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).filter(f => f.getPath.contains(part)
        && f.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.lastModified())).toSet
    }
    val path = tmpDir("store_delete") + "/t"
    val store = Store(spark, path, "season")
    store.append(season(1999, 3).union(season(2000, 4)).union(season(2001, 2)))
    val untouched = listFiles(path, "season=1999")
    // a delete confined to 2000 rewrites ONLY that partition
    assert(store.deleteWhere(col("season") === 2000 && col("epa") <= 2.0) === 1L)
    assert(store.read.count() === 3L + 2L + 2L)
    assert(listFiles(path, "season=1999") === untouched,
      "an untouched partition was rewritten")
    // a predicate matching nothing is a no-op
    assert(store.deleteWhere(col("epa") > 100.0) === 0L)
    // a fully-emptied partition's directory disappears (dynamic overwrite
    // only replaces partitions present in the written frame)
    assert(store.deleteWhere(col("season") === 2001) === 1L)
    assert(store.read.filter(col("season") === 2001).count() === 0L)
    assert(!new java.io.File(s"$path/season=2001").exists(),
      "an emptied partition directory survived")
    assert(!new java.io.File(path + "__delete_tmp").exists())
    // versioned tables refuse (purgeRestartLineage is their form)
    val v = Store(spark, tmpDir("store_delete_v") + "/t", "season")
    v.appendVersioned(season(1999, 1))
    intercept[IllegalArgumentException] { v.deleteWhere(lit(true)) }
  }

  test("readChanges merges schemas across an evolution boundary") {
    val path = tmpDir("store_cdf_evo") + "/t"
    val store = Store(spark, path, "season")
    store.appendVersioned(season(1999, 2)) // pre-evolution: no `grade`
    store.appendVersioned(season(2000, 3).withColumn("grade", col("epa") * 2))
    // a range straddling the boundary surfaces the new column as NULL on
    // pre-evolution rows instead of failing or pinning one file's schema
    val delta = store.readChanges(0, 2, mergeSchema = true)
    assert(delta.columns.contains("grade"))
    assert(delta.filter(col("season") === 1999 && col("grade").isNull).count() === 2L)
    assert(delta.filter(col("season") === 2000 && col("grade").isNotNull).count() === 3L)
    // a post-boundary-only range needs no merge and still carries the column
    assert(store.readChanges(1, 2).columns.contains("grade"))
  }

  test("upsertScd2 refuses out-of-order batches and no-ops on duplicate re-delivery") {
    def feed(rows: Seq[(Long, String, Long, Double)]) =
      rows.toDF("user_id", "event_type", "ts_us", "value")
    def listParquet(p: String): Set[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.lastModified(), f.length())).toSet
    }
    val path = tmpDir("store_scd2_guard") + "/t"
    val store = Store(spark, path, "event_type")
    val keys = Seq("user_id", "event_type")
    val b1 = feed(Seq((1L, "a", 200L, 1.0), (2L, "a", 210L, 5.0)))
    store.upsertScd2(b1, keys, "ts_us")
    // a batch whose timestamp precedes key 1's open valid_from must be
    // refused LOUDLY — applying it would close the open interval at 100,
    // i.e. write valid_to=100 < valid_from=200 (an inverted interval that
    // readAsOf silently never matches)
    val err = intercept[IllegalArgumentException] {
      store.upsertScd2(feed(Seq((1L, "a", 100L, 9.9))), keys, "ts_us")
    }
    assert(err.getMessage.contains("out-of-order"))
    // the refused merge left the table untouched and the tiling uninverted
    assert(store.read.count() === 2L)
    assert(store.read.filter(col("valid_to") < col("valid_from")).count() === 0L)
    // full duplicate re-delivery is a TRUE no-op: zero partition rewrites
    // (the same data files, byte counts, and mtimes remain on disk)
    val filesBefore = listParquet(path)
    store.upsertScd2(b1, keys, "ts_us")
    assert(listParquet(path) === filesBefore, "duplicate batch rewrote partitions")
    // a mixed batch (one recorded row + one fresh) still merges the fresh
    // row, and the tiling stays uninverted afterwards
    store.upsertScd2(feed(Seq((1L, "a", 200L, 1.0), (1L, "a", 300L, 2.0))),
      keys, "ts_us")
    val open = store.read.filter(col("valid_to").isNull)
      .select("user_id", "value").as[(Long, Double)].collect().toSet
    assert(open === Set((1L, 2.0), (2L, 5.0)))
    assert(store.read.filter(col("valid_to") < col("valid_from")).count() === 0L)
  }

  test("stats sidecar tracks appends and partition overwrites, invisible to reads") {
    val store = Store(spark, tmpDir("store_stats"), "season")
    val M = lit(2147483647L)
    val term = (col("epa").cast("long") % M) * ((col("epa").cast("long") + 5) % M) % M
    def scanStats = store.statsOf(store.read, term)
      .as[(Int, Long, Long)].collect().toSet
    def sidecar = store.readStats
      .select(col("season").cast("int"), col("n_rows"), col("checksum"))
      .as[(Int, Long, Long)].collect().toSet
    // additive merge across appends that share partitions
    store.appendTracked(season(1999, 3), term)
    store.appendTracked(season(1999, 2).union(season(2000, 4)), term)
    assert(sidecar === scanStats)
    assert(sidecar.map(_._1) === Set(1999, 2000))
    // overwrite REPLACES the touched partition's stats (the re-run shrank it)
    store.overwritePartitionsTracked(season(1999, 1), term)
    assert(sidecar === scanStats)
    assert(sidecar.find(_._1 == 1999).get._2 === 1L)
    // an empty tracked append is a metadata no-op
    val before = sidecar
    store.appendTracked(season(1999, 3).limit(0), term)
    assert(sidecar === before)
    // the sidecar is invisible to the table read (underscore-prefixed dir)
    assert(store.read.columns.toSet === Set("game_id", "season", "epa"))
    assert(store.read.count() === 5L)
    // destroy removes table and sidecar together
    store.destroy()
    assert(!store.statsExist)
  }

  test("snapshot versions reconstruct every batch prefix; overwrite is rejected") {
    val store = Store(spark, tmpDir("store_tt"), "season")
    assert(store.versions.isEmpty)
    assert(store.appendVersioned(season(1999, 2)) === 1L)
    assert(store.appendVersioned(season(2000, 3)) === 2L)
    assert(store.appendVersioned(season(1999, 1)) === 3L) // same partition grows
    assert(store.versions === Seq(1L, 2L, 3L))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("game_id").as[String].collect().toSet
    assert(ids(store.readVersion(1)) === ids(season(1999, 2)))
    assert(ids(store.readVersion(2)) === ids(season(1999, 2).union(season(2000, 3))))
    // the latest snapshot IS the live table, partition columns recovered
    assert(ids(store.readVersion(3)) === ids(store.read))
    assert(store.readVersion(3).select("season").distinct().as[Int].collect().toSet
      === Set(1999, 2000))
    // old snapshots survive later appends (the reproducibility property)
    assert(ids(store.readVersion(1)) === ids(season(1999, 2)))
    // rewriting files referenced by snapshots is refused
    intercept[IllegalArgumentException] {
      store.overwritePartitions(season(1999, 1))
    }
    intercept[IllegalArgumentException] { store.readVersion(9L) }
  }

  test("an all-empty snapshot prefix reconstructs as a typed empty relation") {
    // the all-dup ingest day: a zero-row versioned append lands no data
    // files, but 'what did run R train on' must stay answerable
    val store = Store(spark, tmpDir("store_tt_empty"), "season")
    assert(store.appendVersioned(season(1999, 2).limit(0)) === 1L)
    val v1 = store.readVersion(1)
    assert(v1.count() === 0L)
    assert(v1.columns.toSet === Set("game_id", "season", "epa"))
    // later data doesn't leak into the empty snapshot
    store.appendVersioned(season(2000, 3))
    assert(store.readVersion(1).count() === 0L)
    assert(store.readVersion(2).count() === 3L)
  }

  test("tracked writes refuse to certify a pre-existing untracked table") {
    val store = Store(spark, tmpDir("store_bootstrap"), "season")
    val term = col("epa").cast("long")
    store.append(season(1999, 2)) // untracked history
    // a tracked write here would create a sidecar covering ONLY its batch,
    // then statsExist=true would certify the table as fully tracked —
    // refused, pointing at the trackFrom bootstrap
    intercept[IllegalArgumentException] { store.appendTracked(season(2000, 1), term) }
    intercept[IllegalArgumentException] {
      store.overwritePartitionsTracked(season(1999, 1), term)
    }
    assert(!store.statsExist) // the refused writes left no partial sidecar
    store.trackFrom(store.read, term) // bootstrap: one full scan, once
    store.appendTracked(season(2000, 1), term)
    assert(store.readStats.select("n_rows").as[Long].collect().sum === 3L)
    // nothing under-counted: sidecar == a from-scratch scan
    assert(store.statsOf(store.read, term).as[(Int, Long, Long)].collect().toSet ===
      store.readStats.select(col("season").cast("int"), col("n_rows"), col("checksum"))
        .as[(Int, Long, Long)].collect().toSet)
  }

  test("sidecar writes commit via versioned children; junk and tmp dirs are ignored") {
    val store = Store(spark, tmpDir("store_stats_atomic"), "season")
    val term = col("epa").cast("long")
    store.appendTracked(season(1999, 2), term)
    val f = new org.apache.hadoop.fs.Path(store.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // plant a legacy aborted sibling tmp; the next sidecar write sweeps it
    val legacyTmp = new org.apache.hadoop.fs.Path(s"${store.path}__stats_tmp")
    f.mkdirs(legacyTmp)
    store.appendTracked(season(2000, 1), term)
    assert(!f.exists(legacyTmp))
    // superseded sidecar versions are pruned after commit, RETAINING one
    // generation (a lazily-held readStats frame must survive exactly one
    // subsequent write — the documented consume-promptly contract)
    val sd = new org.apache.hadoop.fs.Path(s"${store.path}/_stats")
    assert(f.listStatus(sd).map(_.getPath.getName).count(_.startsWith("v")) === 2)
    // a markerless (crashed-mid-write) child is invisible to readers:
    // no _SUCCESS means no commit, the previous version stays live
    f.mkdirs(new org.apache.hadoop.fs.Path(sd, "v99"))
    assert(store.statsExist)
    assert(store.readStats.select("n_rows").as[Long].collect().sum === 3L)
    // and later writes keep committing past the junk; a frame held across
    // ONE write still executes (one-generation grace window)
    val held = store.readStats
    store.appendTracked(season(2001, 1), term)
    assert(held.select("n_rows").as[Long].collect().sum === 3L)
    assert(store.readStats.select("n_rows").as[Long].collect().sum === 4L)
    // v1 (two generations back) is gone; v2 + v3 + the junk child remain
    assert(!f.exists(new org.apache.hadoop.fs.Path(sd, "v1")))
  }

  test("appendVersioned refuses orphan data files; adoptOrphans repairs the log") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("game_id").as[String].collect().toSet
    val store = Store(spark, tmpDir("store_orphans"), "season")
    store.append(season(1999, 2)) // pre-existing UNVERSIONED data
    // recording a version now would silently exclude the pre-existing
    // files from every snapshot — readVersion(latest) != read, forever
    intercept[IllegalArgumentException] { store.appendVersioned(season(2000, 3)) }
    assert(store.versions.isEmpty) // refused before any data landed
    assert(store.read.count() === 2L)
    // repair: adopt the orphans as version 1, then versioning proceeds
    assert(store.adoptOrphans() === Some(1L))
    assert(ids(store.readVersion(1)) === ids(season(1999, 2)))
    val v2 = store.appendVersioned(season(2000, 3))
    assert(ids(store.readVersion(v2)) === ids(store.read))
    // the crash shape: data files landed but the log write never happened
    // (a plain append on a versioned table is exactly that state)
    store.append(season(2001, 1))
    intercept[IllegalArgumentException] { store.appendVersioned(season(2002, 1)) }
    store.adoptOrphans()
    assert(ids(store.readVersion(store.versions.last)) === ids(store.read))
    assert(store.adoptOrphans() === None) // idempotent: nothing left to adopt
  }

  test("plain writes are refused on a tracked table (stale-sidecar guard)") {
    val store = Store(spark, tmpDir("store_guard"), "season")
    val term = col("epa").cast("long")
    store.appendTracked(season(1999, 2), term)
    intercept[IllegalArgumentException] { store.append(season(2000, 1)) }
    intercept[IllegalArgumentException] { store.overwritePartitions(season(1999, 1)) }
    // tracked writes still work and keep the sidecar truthful
    store.appendTracked(season(2000, 1), term)
    assert(store.readStats.select("n_rows").as[Long].collect().sum === 3L)
    // compaction preserves rows exactly, so it stays allowed and the
    // sidecar stays valid
    store.compact(1)
    assert(store.statsOf(store.read, term)
      .as[(Int, Long, Long)].collect().toSet ===
      store.readStats.select(col("season").cast("int"), col("n_rows"), col("checksum"))
        .as[(Int, Long, Long)].collect().toSet)
  }

  test("a version-pinned run re-materializes identically after the corpus advances") {
    // the reproducibility story s23 exists for: a training run records the
    // corpus VERSION it read; re-deriving the run from that snapshot must
    // be bit-identical even after later ingest days appended new batches
    import graft.operators.Sampling
    val corpus = Store(spark, tmpDir("store_vpin"), "season")
    val v1 = corpus.appendVersioned(season(1999, 4))
    def materialize(v: Long) = Sampling.shardAssign(
        corpus.readVersion(v).withColumn("t", col("epa").cast("long")),
        Seq("game_id"), "t", nShards = 4)
      .select("game_id", "shard").as[(String, Int)].collect().toSet
    val runA = materialize(v1)
    val v2 = corpus.appendVersioned(season(2000, 5)) // the corpus moves on
    assert(materialize(v1) === runA, "pinned-version run drifted after an append")
    assert(materialize(v2).size === runA.size + 5)
  }

  test("update appends only unseen keys and is idempotent") {
    val store = Store(spark, tmpDir("store_update"), "season")
    store.rebuild(Iterator(season(2023, 2)))
    val incoming = season(2023, 3) // g2023_1, g2023_2 already present
    assert(store.update(incoming, Seq("game_id")) === 1L)
    assert(store.update(incoming, Seq("game_id")) === 0L) // idempotent
    assert(store.read.count() === 3L)
    val recent = store.recentKeys("game_id", 2).as[String].collect()
    assert(recent.toSeq === Seq("g2023_3", "g2023_2"))
  }

  test("update on a missing table bootstraps it") {
    val store = Store(spark, tmpDir("store_boot") + "/tbl", "season")
    assert(!store.exists)
    assert(store.update(season(2024, 2), Seq("game_id")) === 2L)
    assert(store.exists && store.read.count() === 2L)
  }

  test("overwritePartitions replaces only the partitions present in the batch") {
    val store = Store(spark, tmpDir("store_dyn"), "season")
    store.rebuild(Iterator(season(1999, 3), season(2000, 4)))
    store.overwritePartitions(season(2000, 1)) // re-land season 2000 only
    val counts = store.countsByPartition.as[(Int, Long)].collect().toMap
    assert(counts === Map(1999 -> 3L, 2000 -> 1L))
  }

  test("compact collapses accreted small files without changing content") {
    val store = Store(spark, tmpDir("store_compact") + "/tbl", "season")
    (1 to 5).foreach(_ => store.update(season(2024, 0), Seq("game_id"))) // no-op appends
    (1 to 4).foreach(i =>
      store.append((i to i).map(j => (s"g2024_x$j$i", 2024, 1.0)).toDF("game_id", "season", "epa")))
    val before = store.read.select("game_id").as[String].collect().sorted
    def fileCount = new java.io.File(store.path + "/season=2024")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(fileCount >= 4)
    store.compact()
    assert(fileCount === 1)
    assert(store.read.select("game_id").as[String].collect().sorted.toSeq === before.toSeq)
  }

  test("compactByRows lands exactly the s19-planned file count per partition") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = tmpDir("compact_rows") + "/docs"
    Store.compactByRows(docs, out, "source", targetRows = 7)
    val planned = docs.groupBy("source").count()
      .select(col("source"), expr("(count + 6) div 7").as("pf"))
      .as[(String, Long)].collect().toMap
    for ((src, pf) <- planned) {
      val n = new java.io.File(s"$out/source=$src")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(n === pf, s"partition $src: planned $pf files, wrote $n")
    }
    // content survives the rewrite
    assert(spark.read.parquet(out).count() === docs.count())
  }

  test("upsert merges last-writer-wins and touches only affected partitions") {
    val store = Store(spark, tmpDir("store_upsert"), "season")
    store.rebuild(Iterator(season(1999, 3), season(2000, 4)))
    val filesBefore1999 = new java.io.File(store.path + "/season=1999")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    // batch: update one 2000 row, insert one new 2000 row
    val batch = Seq(("g2000_2", 2000, 99.0), ("g2000_9", 2000, 9.0))
      .toDF("game_id", "season", "epa")
    store.upsert(batch, Seq("game_id"))
    val rows = store.read.as[(String, Double, Int)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(rows.size === 8) // 3 + 4 + 1 inserted
    assert(rows("g2000_2") === 99.0) // updated in place
    assert(rows("g2000_9") === 9.0)  // inserted
    assert(rows("g2000_1") === 1.0)  // untouched neighbor survives
    // untouched partition's files are bit-identical (never rewritten)
    val filesAfter1999 = new java.io.File(store.path + "/season=1999")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(filesAfter1999 === filesBefore1999)
    // idempotent re-apply
    store.upsert(batch, Seq("game_id"))
    assert(store.read.count() === 8L)
  }

  test("incremental LSH over a persisted signature table equals recompute from text") {
    // the 100-TB ingest shape: corpus minhash signatures live in a Store
    // table (written once, appended per ingest); an arriving batch pairs
    // against the READ table — identical pairs to recomputing the corpus
    // signatures from text, without touching the corpus text again
    import graft.operators.{Dedup, TextAnalysis}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def sig(df: org.apache.spark.sql.DataFrame) = {
      val sh = df.select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(TextAnalysis.shinglesExpr("ws", 3)).as("sh"))
        .select(col("doc_id"), TextAnalysis.hash32(col("sh")).as("hv")).distinct()
      Dedup.minhashSignature(sh, "doc_id", 8)
    }
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val sigDir = tmpDir("sig_store")
    sig(corpus).write.mode("overwrite").parquet(sigDir)
    def pairs(base: org.apache.spark.sql.DataFrame) =
      Dedup.lshCandidatesAgainst(sig(batch), base, "doc_id", 8, maxBucket = Some(16L))
        .as[(Long, Long)].collect().toSet
    assert(pairs(spark.read.parquet(sigDir)) === pairs(sig(corpus)))
  }

  test("writeSorted produces files with disjoint key ranges (skippable footers)") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val dir = tmpDir("store_sorted") + "/tbl"
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"))
    Store.writeSorted(df, dir, "user_id", files = 4)
    val conf = spark.sparkContext.hadoopConfiguration
    val ranges = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val in = HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val reader = ParquetFileReader.open(in)
        try {
          val stats = reader.getFooter.getBlocks.get(0).getColumns.asScala
            .find(_.getPath.toDotString == "user_id").get.getStatistics
          (stats.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            stats.genericGetMax.asInstanceOf[java.lang.Long].longValue())
        } finally reader.close()
      }
      .sortBy(_._1)
    assert(ranges.size === 4)
    // every file's range ends before the next begins → a user_id predicate
    // can skip all but one file on footer stats alone
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(aMax <= bMin, ranges.toString)
      case _ =>
    }
    // content survives the rewrite
    assert(spark.read.parquet(dir).count() === df.count())
  }

  test("ANN over a persisted IVF index equals recompute from vectors") {
    // index-build once (the corpus-wide anchor scan), store, then serve
    // query batches against the read-back table — same results as
    // assigning the corpus per query job
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val anchors = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
    val idxDir = tmpDir("ivf_index")
    Similarity.ivfAssign(e, anchors, "vec_id", "embedding")
      .withColumn("nrm", Similarity.norm("embedding"))
      .write.mode("overwrite").parquet(idxDir)
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "rank", "c_id").as[(Long, Int, Long)].collect().toSet
    for (nprobe <- Seq(1, 3)) {
      val fromIndex = Similarity.ivfTopKAssigned(spark.read.parquet(idxDir),
        anchors, id => id % 50 === 0, "vec_id", "embedding", k = 5, nprobe = nprobe)
      val recomputed = Similarity.ivfTopK(e, anchors,
        id => id % 50 === 0, "vec_id", "embedding", k = 5, nprobe = nprobe)
      assert(res(fromIndex) === res(recomputed), s"nprobe=$nprobe")
    }
  }

  test("fitted IVF lifecycle: kmeans anchors -> stored index -> serve equals recompute") {
    // the y3d path: serve MUST run off the read-back table, and the store
    // hop (cell-partitioned parquet) must be lossless — assignment rows
    // and the served top-k both equal the in-memory recompute
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val seed = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"))
    val fit = Similarity.kmeansFit(e, seed, "vec_id", "embedding", maxIters = 3, eps = 0.0)
    assert(fit.history.nonEmpty && fit.history.last.nCells === 8L)
    val index = Similarity.ivfAssign(e, fit.anchors, "vec_id", "embedding")
      .withColumn("nrm", Similarity.norm("embedding")).drop("cell_d2")
    val store = Store(spark, tmpDir("ivf_fitted"), "cell")
    store.append(index)
    val back = store.read
    assert(back.select("vec_id", "cell").as[(Long, Long)].collect().toSet ===
      index.select("vec_id", "cell").as[(Long, Long)].collect().toSet)
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "rank", "c_id", "cosine").as[(Long, Int, Long, Double)].collect().toSet
    val served = Similarity.ivfTopKAssigned(back, fit.anchors,
      id => id % 50 === 0, "vec_id", "embedding", k = 5, nprobe = 2)
    val recomputed = Similarity.ivfTopKAssigned(index, fit.anchors,
      id => id % 50 === 0, "vec_id", "embedding", k = 5, nprobe = 2)
    assert(res(served) === res(recomputed))
    Housekeeping.releaseAllBlocks(spark)
  }

  test("schema evolution: a later batch with a new column reads back null-padded") {
    // the store lifecycle must survive a column added mid-history (the
    // reference's pbp schema grew across seasons) — old rows null-fill,
    // new rows keep the value, and the evolved read sees one schema
    val store = Store(spark, tmpDir("store_evolve"), "season")
    store.append(season(1999, 2))
    store.append(season(2000, 2).withColumn("xpass", lit(0.7)))
    val evolved = store.read(mergeSchema = true)
    assert(evolved.columns.toSet === Set("game_id", "season", "epa", "xpass"))
    val byYear = evolved.groupBy("season")
      .agg(count(lit(1)).as("n"), count(col("xpass")).as("n_xpass"))
      .as[(Int, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byYear(1999) === ((2L, 0L))) // pre-evolution rows: column null
    assert(byYear(2000) === ((2L, 2L)))
  }

  test("stop-shingle cap drops boilerplate postings but keeps true near-dups") {
    import graft.operators.{Dedup, TextAnalysis}
    val docs = Seq(
      (1L, "common common common alpha beta gamma"),
      (2L, "common common common alpha beta delta"),
      (3L, "common common common zeta eta theta")
    ).toDF("doc_id", "text").withColumn("blk", lit("all"))
    val sh = docs.select(col("doc_id"), col("blk"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("blk"), explode(TextAnalysis.shinglesExpr("ws", 3)).as("sh"))
      .distinct()
    // "common common common" appears in all 3 docs; cap at 2 removes it
    val pairs = Dedup.shingleJaccardPairs(sh, "doc_id", "blk", maxDocFreq = Some(2))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))   // still share "alpha beta" shingles
    assert(!pairs.contains((1L, 3L)))  // only the capped boilerplate linked them
  }

  test("materialized flagship panel variants equal the declared e1/e2/e3 DAGs") {
    val sf = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val fromStore = graft.queries.FlagshipQueries.materializedStabilityMatrices(
      spark, sf, tmpDir("store_panel"))
    for ((variant, declared) <- Seq(
        "e1" -> "e1_stability_matrix",
        "e2" -> "e2_stability_switchers",
        "e3" -> "e3_stability_newpc")) {
      assert(rows(fromStore(variant)) === rows(SparkEntry.queries(declared)(spark, sf)),
        s"store-backed $variant diverged from $declared")
    }
  }

  test("partition pruning reaches the file scan for season-filtered reads") {
    val store = Store(spark, tmpDir("store_prune"), "season")
    store.rebuild(Iterator(season(1999, 3), season(2000, 4)))
    val plan = store.read.filter(col("season") === 2000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(season"), plan)
  }

  test("deleteWhere keeps rows whose predicate is UNKNOWN (SQL three-valued delete)") {
    // SQL DELETE removes predicate-TRUE rows only: a NULL predicate input
    // is UNKNOWN, neither deleted nor treated as deletable — the old
    // filter(!remove) retain silently dropped such rows in touched
    // partitions while identical rows in untouched partitions survived
    val rows = Seq(
      ("a", 1999, Some(5.0)), ("b", 1999, None), // 1999 touched: b is UNKNOWN
      ("c", 2000, None)                          // 2000 untouched entirely
    ).map { case (g, s, e) => (g, s, e.map(Double.box).orNull) }
      .toDF("game_id", "season", "epa")
      .select(col("game_id"), col("season"), col("epa").cast("double"))
    val path = tmpDir("store_delete_3vl") + "/t"
    val store = Store(spark, path, "season")
    store.append(rows)
    assert(store.deleteWhere(col("epa") > 2.0) === 1L) // touches 1999 only
    val left = store.read.select("game_id").as[String].collect().toSet
    assert(left === Set("b", "c"),
      "null-predicate rows must survive a delete (UNKNOWN is not TRUE)")
    // purgeRestartLineage applies the same retain rule
    val vp = tmpDir("store_purge_3vl") + "/t"
    val vstore = Store(spark, vp, "season")
    vstore.appendVersioned(rows)
    vstore.purgeRestartLineage(col("epa") > 2.0)
    assert(vstore.read.select("game_id").as[String].collect().toSet === Set("b", "c"))
  }

  test("deleteWhere escapes partition directories (special chars, null values)") {
    // Spark writes partition dirs Hive-escaped (space → %20, colon → %3A,
    // null → __HIVE_DEFAULT_PARTITION__); the emptied-partition path
    // delete must build the SAME names or removed rows stay readable
    val rows = Seq(
      ("a1", "has space", 1.0), ("a2", "has space", 9.0),
      ("b1", "x:y", 1.0),
      ("c1", null, 1.0), ("c2", null, 9.0)
    ).toDF("game_id", "src", "epa")
    val path = tmpDir("store_delete_esc") + "/t"
    val store = Store(spark, path, "src")
    store.append(rows)
    // partial delete inside the space partition AND the null partition:
    // the null-safe semi-join must include the null partition's retained
    // rows in the rewrite (plain equi-join would drop the whole directory)
    assert(store.deleteWhere(col("epa") > 2.0) === 2L)
    assert(store.read.select("game_id").as[String].collect().toSet
      === Set("a1", "b1", "c1"))
    // now empty both escaped partitions outright: directories must go
    assert(store.deleteWhere(col("src") <=> "has space" || col("src").isNull) === 2L)
    assert(store.read.select("game_id").as[String].collect().toSet === Set("b1"))
    val dirs = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(!dirs.exists(_.contains("has")), dirs.toString)
    assert(!dirs.contains("__HIVE_DEFAULT_PARTITION__"), dirs.toString)
    assert(dirs.exists(_.startsWith("src=x")), dirs.toString)
  }

  test("deleteWhereTracked maintains the stats sidecar through the delete") {
    val store = Store(spark, tmpDir("store_delete_tracked"), "season")
    val M = lit(2147483647L)
    val term = (col("epa").cast("long") % M) * ((col("epa").cast("long") + 5) % M) % M
    store.appendTracked(season(1999, 3).union(season(2000, 4)).union(season(2001, 2)), term)
    // plain deleteWhere refuses a tracked table, naming the tracked form
    val err = intercept[IllegalArgumentException] { store.deleteWhere(lit(true)) }
    assert(err.getMessage.contains("deleteWhereTracked"))
    // partial delete in 2000 + full wipe of 2001 in one request
    assert(store.deleteWhereTracked(
      (col("season") === 2000 && col("epa") <= 2.0) || col("season") === 2001,
      term) === 2L)
    // the sidecar-only read equals a from-scratch recompute (the s22 gate)
    def sidecar = store.readStats
      .select(col("season").cast("int"), col("n_rows"), col("checksum"))
      .as[(Int, Long, Long)].collect().toSet
    assert(sidecar === store.statsOf(store.read, term)
      .as[(Int, Long, Long)].collect().toSet)
    // the emptied partition's sidecar row is GONE, not zeroed
    assert(sidecar.map(_._1) === Set(1999, 2000))
    // untouched partition's stats row survived verbatim
    assert(sidecar.find(_._1 == 1999).get._2 === 3L)
    // subsequent tracked writes keep composing
    store.appendTracked(season(2001, 1), term)
    assert(sidecar === store.statsOf(store.read, term)
      .as[(Int, Long, Long)].collect().toSet)
    // the tracked form on an UNTRACKED table refuses (plain form's job)
    val plain = Store(spark, tmpDir("store_delete_tracked_plain"), "season")
    plain.append(season(1999, 1))
    intercept[IllegalArgumentException] { plain.deleteWhereTracked(lit(true), term) }
  }

  test("collapseHistory crash windows serve complete data at every point") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("game_id").as[String].collect().toSet
    val path = tmpDir("store_collapse_crash") + "/t"
    val store = Store(spark, path, "season")
    (1 to 3).foreach(i => store.appendVersioned(season(1998 + i, i)))
    val v2Full = ids(store.readVersion(2))
    val v3Full = ids(store.readVersion(3))
    val logDir = new java.io.File(s"$path/_log")
    // preserve v1's entry so the mid-delete crash state can be restored
    val v1Bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/_log/v1"))
    store.collapseHistory(2)
    assert(ids(store.readVersion(2)) === v2Full)
    // ---- crash state A: between delete(v2) and rename(.v2_merged, v2) —
    // reconstruct it by moving the committed entry back to the recovery name
    assert(new java.io.File(logDir, "v2").renameTo(
      new java.io.File(logDir, ".v2_merged")))
    assert(store.versions === Seq(2L, 3L), "recovery artifact must list as v2")
    assert(ids(store.readVersion(2)) === v2Full,
      "readVersion must fall back to the .v2_merged recovery artifact")
    assert(ids(store.readVersion(3)) === v3Full)
    assert(ids(store.readChanges(2, 3)) === (v3Full -- v2Full))
    // finishing the interrupted collapse converges (idempotent repair)
    store.collapseHistory(2)
    assert(new java.io.File(logDir, "v2").exists()
      && !new java.io.File(logDir, ".v2_merged").exists())
    assert(ids(store.readVersion(2)) === v2Full)
    // ---- crash state B: merged entry committed, old entries not yet
    // deleted — duplicate file references must read ONCE (dedupe)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_log/v1"), v1Bytes)
    assert(store.versions === Seq(1L, 2L, 3L))
    assert(ids(store.readVersion(2)) === v2Full, "duplicate refs must dedupe")
    assert(store.readVersion(2).count() === v2Full.size.toLong,
      "a doubled file reference double-counted rows")
    assert(ids(store.readVersion(3)) === v3Full)
    // re-running the collapse sweeps the leftover and converges again
    store.collapseHistory(2)
    assert(store.versions === Seq(2L, 3L))
    assert(ids(store.readVersion(2)) === v2Full)
  }

  test("a second concurrent log committer errors instead of dropping history") {
    val path = tmpDir("store_swriter") + "/t"
    val store = Store(spark, path, "season")
    store.appendVersioned(season(1999, 2))
    // two writers both computed v = last+1 = 2; the winner commits first
    store.commitVersionEntry(2L, "game_id STRING", Seq("season=2000/w.parquet"))
    // the loser's commit must fail LOUDLY — silently overwriting v2 would
    // drop the winner's batch from every snapshot
    val err = intercept[IllegalStateException] {
      store.commitVersionEntry(2L, "game_id STRING", Seq("season=2000/l.parquet"))
    }
    assert(err.getMessage.contains("concurrent writer"))
    // the winner's entry survived untouched
    assert(store.versions === Seq(1L, 2L))
  }

  test("the purge epoch survives a crash between destroy and the marker write") {
    val path = tmpDir("store_epoch_crash") + "/t"
    val store = Store(spark, path, "season")
    (1 to 2).foreach(i => store.appendVersioned(season(1998 + i, i)))
    assert(store.purgeRestartLineage(col("season") === 1999) === 2L)
    // clean completion leaves no sibling and the in-tree marker rules
    assert(!new java.io.File(path + "__epoch").exists())
    assert(store.epoch === 2L)
    // ---- reconstruct the crash: the purge wrote the sibling, destroyed
    // the tree (taking _log/_epoch with it), then died before the marker
    java.nio.file.Files.write(java.nio.file.Paths.get(path + "__epoch"),
      "3".getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$path/_log/_epoch"))
    assert(store.epoch === 3L,
      "epoch reset to a pre-purge value after the crash — coordinate collision")
    // a no-effect purge (re-delivery shape: nothing left to remove) FINISHES
    // the crashed purge's metadata repair — recovered epoch committed to the
    // in-tree marker, sibling swept — WITHOUT burning a new epoch or paying
    // a rewrite (the request-keyed purge leg)
    assert(store.purgeRestartLineage(lit(false)) === 3L)
    assert(store.epoch === 3L)
    assert(!new java.io.File(path + "__epoch").exists())
    // the repair is durable in-tree: the marker alone now carries epoch 3
    assert(new java.io.File(s"$path/_log/_epoch").exists())
    // an EFFECTIVE purge still advances from the recovered coordinate
    assert(store.purgeRestartLineage(col("season") === 2000) === 4L)
    assert(store.epoch === 4L)
  }

  test("a keyed governance delta cannot double-subtract on re-delivery") {
    // the s33 discipline in isolation: state appends go through update()
    // keyed by (request_id, type), so the applied marker IS the state row
    // — re-delivering the same negative delta appends nothing and the
    // fold is byte-identical (no separate marker to crash between)
    def listParquet(p: String): Set[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.lastModified(), f.length())).toSet
    }
    val path = tmpDir("store_gov_idem") + "/t"
    val stt = Store(spark, path, "etype")
    val keys = Seq("request_id", "etype")
    def delta(rid: String, rows: Seq[(String, Long, Double)]) =
      rows.toDF("etype", "n", "s").withColumn("request_id", lit(rid))
    assert(stt.update(delta("pull_v1", Seq(("a", 10L, 5.0), ("b", 4L, 2.0))), keys) === 2L)
    assert(stt.update(delta("pull_v2", Seq(("a", 3L, 1.5))), keys) === 1L)
    val neg = delta("takedown_9", Seq(("a", -2L, -1.0), ("b", -1L, -0.5)))
    assert(stt.update(neg, keys) === 2L) // first delivery applies
    val filesAfter = listParquet(path)
    def fold = stt.read.groupBy("etype")
      .agg(sum("n").as("n"), sum("s").as("s"))
      .as[(String, Long, Double)].collect().toSet
    val foldOnce = fold
    assert(foldOnce === Set(("a", 11L, 5.5), ("b", 3L, 1.5)))
    // the SAME request re-delivered: zero rows, zero writes, same fold
    assert(stt.update(neg, keys) === 0L)
    assert(listParquet(path) === filesAfter, "re-delivery wrote files")
    assert(fold === foldOnce)
  }

  test("merge paths are null-safe on the partition column") {
    // a plain equi-semi-join never matches a null key: before the fix, a
    // batch touching the NULL partition excluded that partition's existing
    // rows from the merge input while the dynamic overwrite still replaced
    // the directory — silent row loss. All three merge paths (upsert,
    // upsertScd2, tracked overwrite + sidecar replace) use <=> now.
    val rows = Seq(("a", null, 1.0), ("b", null, 2.0), ("c", "x", 3.0))
      .toDF("game_id", "src", "epa")
    val p1 = tmpDir("store_null_upsert") + "/t"
    val st1 = Store(spark, p1, "src")
    st1.append(rows)
    st1.upsert(Seq(("a", null, 9.0), ("d", null, 4.0)).toDF("game_id", "src", "epa")
      .select(col("game_id"), col("src").cast("string").as("src"), col("epa")),
      Seq("game_id"))
    val got = st1.read.select("game_id", "epa")
      .as[(String, Double)].collect().toMap
    assert(got === Map("a" -> 9.0, "b" -> 2.0, "c" -> 3.0, "d" -> 4.0),
      s"null-partition neighbor rows must survive an upsert: $got")
    // upsertScd2: a second batch for a null-partition key must CLOSE the
    // existing open version, not orphan it out of the merge
    val p2 = tmpDir("store_null_scd2") + "/t"
    val st2 = Store(spark, p2, "etype")
    def feed(r: Seq[(Long, String, Long, Double)]) =
      r.toDF("user_id", "etype", "ts_us", "value")
        .select(col("user_id"), col("etype").cast("string").as("etype"),
          col("ts_us"), col("value"))
    st2.upsertScd2(feed(Seq((1L, null, 100L, 1.0), (2L, "a", 110L, 5.0))),
      Seq("user_id"), "ts_us")
    st2.upsertScd2(feed(Seq((1L, null, 200L, 2.0))), Seq("user_id"), "ts_us")
    val hist = st2.read
    assert(hist.count() === 3L, "a null-partition version vanished from history")
    assert(hist.filter(col("user_id") === 1L && col("valid_to") === 200L)
      .count() === 1L, "the null-partition open version was not closed")
    // tracked overwrite: the null partition's sidecar row is REPLACED,
    // never duplicated beside its replacement
    val st3 = Store(spark, tmpDir("store_null_tracked"), "src")
    val term = col("epa").cast("long")
    st3.appendTracked(rows, term)
    st3.overwritePartitionsTracked(
      Seq(("z", null, 7.0)).toDF("game_id", "src", "epa")
        .select(col("game_id"), col("src").cast("string").as("src"), col("epa")),
      term)
    val stats = st3.readStats.select(col("src"), col("n_rows"))
      .as[(String, Long)].collect()
    assert(stats.count(_._1 == null) === 1, s"duplicate null sidecar rows: ${stats.toSeq}")
    assert(stats.toMap.apply(null.asInstanceOf[String]) === 1L)
    assert(st3.statsOf(st3.read, term).as[(String, Long, Long)].collect().toSet ===
      st3.readStats.select(col("src"), col("n_rows"), col("checksum"))
        .as[(String, Long, Long)].collect().toSet)
  }

  test("a second concurrent sidecar committer errors instead of losing a batch's stats") {
    val store = Store(spark, tmpDir("store_stats_swriter"), "season")
    val term = col("epa").cast("long")
    store.appendTracked(season(1999, 2), term) // commits _stats/v1
    // a racing tracked writer that also computed next = 2 committed first:
    // reconstruct its effect by occupying the v2 slot
    val f = new org.apache.hadoop.fs.Path(store.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"${store.path}/_stats/v2"))
    val err = intercept[IllegalStateException] {
      store.appendTracked(season(2000, 1), term)
    }
    assert(err.getMessage.contains("concurrent tracked writer"))
    // the committed v1 sidecar is untouched (readers keep serving it)
    assert(store.readStats.select("n_rows").as[Long].collect().sum === 2L)
  }

  test("a governance request crashed mid-application converges on re-delivery") {
    // the s33 handler's crash window: the destructive legs ran, the keyed
    // state append did not. Re-delivery (marker absent → all legs re-run)
    // must converge to exactly the once-applied state: the purge PROBES
    // (its effect is already durable — no matching row — so it skips the
    // rewrite and keeps the epoch: the request-keyed purge leg, r12
    // verdict #2), deleteWhere matches nothing, and the keyed append
    // applies once. ONE rewrite total: the replayed leg's old price (a
    // second full rewrite + a phantom epoch) is gone.
    def ev(rows: Seq[(Long, String, Long, Double)]) =
      rows.toDF("user_id", "etype", "ts_us", "value")
    def listParquet(p: String): Set[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.lastModified(), f.length())).toSet
    }
    val base = tmpDir("store_gov_crash")
    val src = Store(spark, s"$base/src", "etype")
    val hst = Store(spark, s"$base/hist", "etype")
    val stt = Store(spark, s"$base/state", "etype")
    val req = Store(spark, s"$base/req", "etype")
    val feed = Seq((1L, "a", 100L, 2.0), (5L, "a", 110L, 4.0), // user 5: doomed
      (2L, "b", 120L, 6.0), (5L, "b", 130L, 8.0))
    src.appendVersioned(ev(feed))
    hst.upsertScd2(src.readChanges(0, 1), Seq("user_id", "etype"), "ts_us")
    stt.update(src.readChanges(0, 1).groupBy("etype")
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
      .withColumn("request_id", lit("pull_v1")), Seq("request_id", "etype"))
    val doomed = col("user_id") % 5 === 0
    // the request's delta, durable before any destructive leg
    req.append(ev(feed).filter(doomed).groupBy("etype")
      .agg((-count(lit(1))).as("n"), (-sum(col("value"))).as("s"))
      .withColumn("request_id", lit("td_1")))
    def deliver(): Long =
      if (stt.read.filter(col("request_id") === "td_1").limit(1).count() > 0) 0L
      else {
        src.purgeRestartLineage(doomed)
        hst.deleteWhere(doomed)
        stt.update(req.read.filter(col("request_id") === "td_1"),
          Seq("request_id", "etype"))
      }
    // ---- crashed first delivery: destructive legs land, append does not
    src.purgeRestartLineage(doomed)
    hst.deleteWhere(doomed)
    val srcFilesAfterPurge = listParquet(s"$base/src")
    // ---- re-delivery runs the FULL handler and converges
    assert(deliver() === 2L) // the keyed append applies exactly once
    assert(deliver() === 0L) // and a further re-delivery is a no-op
    assert(src.read.filter(doomed).count() === 0L)
    // ONE rewrite, ONE epoch: the replayed purge probed, found its effect
    // durable, and left both the data files and the coordinate alone
    assert(src.epoch === 2L,
      "replayed purge burned a phantom epoch despite a durable effect")
    assert(listParquet(s"$base/src") === srcFilesAfterPurge,
      "replayed purge rewrote the table despite a durable effect")
    assert(src.versions === Seq(1L))
    assert(hst.read.filter(doomed).count() === 0L)
    val fold = stt.read.groupBy("etype")
      .agg(sum("n").as("n"), sum("s").as("s"))
      .as[(String, Long, Double)].collect().toSet
    assert(fold === Set(("a", 1L, 2.0), ("b", 1L, 6.0)),
      s"state fold diverged from the once-applied truth: $fold")
  }

  test("upsertScd2 carries a schema evolution through the merge") {
    def feed(r: Seq[(Long, String, Long, Double)]) =
      r.toDF("user_id", "etype", "ts_us", "value")
    val path = tmpDir("store_scd2_evo") + "/t"
    val store = Store(spark, path, "etype")
    val keys = Seq("user_id", "etype")
    store.upsertScd2(feed(Seq((1L, "a", 100L, 1.0), (2L, "a", 110L, 5.0))),
      keys, "ts_us")
    val evolved = feed(Seq((1L, "a", 200L, 2.0)))
      .withColumn("grade", col("value") * 3)
    // without the flag, a column-name mismatch stays a LOUD caller error —
    // silent null-padding must be opt-in
    intercept[org.apache.spark.sql.AnalysisException] {
      store.upsertScd2(evolved, keys, "ts_us")
    }
    store.upsertScd2(evolved, keys, "ts_us", mergeSchema = true)
    val hist = store.read(mergeSchema = true)
    assert(hist.count() === 3L)
    // pre-evolution versions null-pad; the evolved version carries its value
    assert(hist.filter(col("ts_us") < 200L && col("grade").isNull).count() === 2L)
    assert(hist.filter(col("ts_us") === 200L && col("grade") === 6.0).count() === 1L)
    // the evolution did not break the interval tiling: key 1's
    // pre-evolution open version closed at the evolved batch's timestamp
    assert(hist.filter(col("user_id") === 1L && col("valid_from") === 100L
      && col("valid_to") === 200L).count() === 1L)
    assert(hist.filter(col("valid_to").isNull).count() === 2L)
    // a later same-schema merge on the evolved table keeps working
    store.upsertScd2(feed(Seq((2L, "a", 300L, 7.0)))
      .withColumn("grade", col("value") * 3), keys, "ts_us", mergeSchema = true)
    assert(store.read(mergeSchema = true).count() === 4L)
  }

  test("purge carries an evolved schema through the lineage restart") {
    // versions straddle a column add; the retained snapshot must read
    // with mergeSchema or the rewrite pins one file's schema and the
    // evolved column silently vanishes from the new epoch's v1
    val path = tmpDir("store_purge_evo") + "/t"
    val store = Store(spark, path, "season")
    store.appendVersioned(season(1999, 2)) // pre-evolution
    store.appendVersioned(season(2000, 3).withColumn("grade", col("epa") * 2))
    store.purgeRestartLineage(col("epa") > 2.0)
    val back = store.read
    assert(back.columns.contains("grade"),
      "evolved column lost through the purge")
    assert(back.filter(col("season") === 1999 && col("grade").isNull).count() === 2L)
    assert(back.filter(col("season") === 2000).count() === 2L)
    assert(store.readVersion(1).columns.contains("grade"))
  }

  test("deleteWhereTracked survives a full wipe without stranding the sidecar") {
    // r12 ADVICE: an all-matching predicate empties every partition; the
    // sidecar update must not die on a dataless table root (stranding
    // stats that certify rows no longer on disk) — it commits EMPTY stats
    val store = Store(spark, tmpDir("store_tracked_fullwipe"), "season")
    val term = col("epa").cast("long")
    store.appendTracked(season(1999, 3).union(season(2000, 2)), term)
    assert(store.deleteWhereTracked(lit(true), term) === 2L)
    // zero data files, and a sidecar that certifies exactly nothing
    assert(store.statsExist)
    assert(store.readStats.count() === 0L)
    // the table keeps working: a later tracked append re-populates both
    store.appendTracked(season(2001, 2), term)
    assert(store.readStats.select(col("season").cast("int"), col("n_rows"))
      .as[(Int, Long)].collect().toMap === Map(2001 -> 2L))
  }

  test("a change cursor below a collapse boundary gets the typed retention error") {
    val store = Store(spark, tmpDir("store_retention_cursor"), "season")
    (1 to 4).foreach(i => store.appendVersioned(season(1998 + i, i)))
    assert(store.earliestChangeVersion === 1L)
    store.collapseHistory(3)
    assert(store.earliestChangeVersion === 3L)
    // below the floor: the typed error names the boundary AND the repair
    val err = intercept[Store.RetentionBoundaryException] {
      store.readChanges(2, 4)
    }
    assert(err.earliestChangeVersion === 3L && err.fromVersion === 2L)
    assert(err.getMessage.contains("readVersion(3)"))
    // cursors AT and ABOVE the floor still resolve; 0 stays full history
    assert(store.readChanges(3, 4).count() === 4L)
    assert(store.readChanges(0, 4).count() === store.readVersion(4).count())
    // an unknown cursor ABOVE the floor keeps the generic error — it is a
    // bug or a corrupt log, not retention
    intercept[IllegalArgumentException] { store.readChanges(99, 100) }
    // the documented re-bootstrap (the s30 consumer's path back): rebuild
    // state from the boundary snapshot, resume the feed from the boundary
    // cursor — the folded result equals a from-scratch consumer
    val boundary = err.earliestChangeVersion
    val rebuilt = store.readVersion(boundary)
      .groupBy("season").agg(count(lit(1)).as("n"))
      .unionByName(store.readChanges(boundary, 4)
        .groupBy("season").agg(count(lit(1)).as("n")))
      .groupBy("season").agg(sum("n").cast("long").as("n"))
      .as[(Int, Long)].collect().toMap
    assert(rebuilt === store.read.groupBy("season").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap)
  }

  test("appendVersionedTracked maintains versions and sidecar in one commit") {
    val path = tmpDir("store_vt") + "/t"
    val store = Store(spark, path, "season")
    val term = col("epa").cast("long")
    def sidecar = store.readStats
      .select(col("season").cast("int"), col("n_rows"), col("checksum"))
      .as[(Int, Long, Long)].collect().toSet
    def scanStats = store.statsOf(store.read, term)
      .as[(Int, Long, Long)].collect().toSet
    assert(store.appendVersionedTracked(season(1999, 3), term) === 1L)
    assert(store.appendVersionedTracked(
      season(1999, 2).union(season(2000, 4)), term) === 2L)
    // both ledgers live on one table: time travel + CDC resolve, and the
    // sidecar equals a from-scratch recompute of current disk truth
    assert(store.readVersion(1).count() === 3L)
    assert(store.readChanges(1, 2).count() === 6L)
    assert(sidecar === scanStats)
    // each single-ledger write refuses the composed table, loudly — and
    // the keyed insert refuses any versioned table (its append would
    // orphan files from the log)
    intercept[IllegalArgumentException] { store.appendVersioned(season(2001, 1)) }
    intercept[IllegalArgumentException] { store.appendTracked(season(2001, 1), term) }
    intercept[IllegalArgumentException] {
      store.update(season(2001, 1), Seq("game_id"))
    }
    // an untracked purge refuses too: the sidecar must not silently vanish
    intercept[IllegalArgumentException] {
      store.purgeRestartLineage(col("season") === 1999)
    }
    // purge WITH the term: the lineage restarts AND the sidecar is rebuilt
    // over the new epoch's v1
    assert(store.purgeRestartLineage(col("season") === 1999, Some(term)) === 2L)
    assert(store.versions === Seq(1L))
    assert(sidecar === scanStats)
    assert(sidecar.map(_._1) === Set(2000))
    // the composition keeps appending on the new lineage
    assert(store.appendVersionedTracked(season(2001, 2), term) === 2L)
    assert(sidecar === scanStats)
    assert(store.readChanges(1, 2).count() === 2L)
  }

  test("a five-store governance ticket delivered twice leaves every store byte-identical") {
    // the x59 capstone's idempotency contract in spec form: ONE ticket
    // drives source purge, history delete, vector tombstones, index
    // rebuild + pointer promotion, and the keyed state append; the
    // applied marker is the state row (written LAST), so the second
    // delivery short-circuits to zero work and every store's on-disk
    // bytes — paths, sizes, mtimes — are identical to once-delivered
    def listParquet(p: String): Set[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.lastModified(), f.length())).toSet
    }
    def ev(rows: Seq[(Long, String, Long, Double)]) =
      rows.toDF("user_id", "etype", "ts_us", "value")
    val base = tmpDir("store_ticket5")
    val src = Store(spark, s"$base/src", "etype")
    val hst = Store(spark, s"$base/hist", "etype")
    val stt = Store(spark, s"$base/state", "etype")
    val req = Store(spark, s"$base/req", "etype")
    val tmb = Store(spark, s"$base/tomb", "part")
    val g2 = Store(spark, s"$base/gen2", "part")
    val ptr = Store(spark, s"$base/ptr", "part")
    val feed = Seq((1L, "a", 100L, 2.0), (5L, "a", 110L, 4.0),
      (2L, "b", 120L, 6.0), (5L, "b", 130L, 8.0))
    src.appendVersioned(ev(feed))
    hst.upsertScd2(src.readChanges(0, 1), Seq("user_id", "etype"), "ts_us")
    stt.update(src.readChanges(0, 1).groupBy("etype")
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
      .withColumn("request_id", lit("pull_v1")), Seq("request_id", "etype"))
    val doomed = col("user_id") % 5 === 0
    req.append(ev(feed).filter(doomed).groupBy("etype")
      .agg((-count(lit(1))).as("n"), (-sum(col("value"))).as("s"))
      .withColumn("request_id", lit("td_5")))
    def deliver(): Long =
      if (stt.read.filter(col("request_id") === "td_5").limit(1).count() > 0) 0L
      else {
        src.purgeRestartLineage(doomed)
        hst.deleteWhere(doomed)
        tmb.update(Seq((5L, 0)).toDF("vec_id", "part"), Seq("vec_id"))
        if (!g2.exists)
          g2.append(ev(feed).filter(!doomed).select(col("user_id"))
            .withColumn("part", lit(0)))
        ptr.update(Seq((2L, 0)).toDF("serving_gen", "part"), Seq("serving_gen"))
        stt.update(req.read.filter(col("request_id") === "td_5"),
          Seq("request_id", "etype"))
      }
    assert(deliver() === 2L, "first delivery must apply")
    val stores = Seq(s"$base/src", s"$base/hist", s"$base/state",
      s"$base/tomb", s"$base/gen2", s"$base/ptr")
    val once = stores.map(p => p -> listParquet(p)).toMap
    val epochOnce = src.epoch
    assert(deliver() === 0L, "second delivery must short-circuit")
    stores.foreach { p =>
      assert(listParquet(p) === once(p), s"re-delivery touched $p")
    }
    assert(src.epoch === epochOnce, "re-delivery burned an epoch")
    // the fold equals the once-applied truth
    val fold = stt.read.groupBy("etype")
      .agg(sum("n").as("n"), sum("s").as("s"))
      .as[(String, Long, Double)].collect().toSet
    assert(fold === Set(("a", 1L, 2.0), ("b", 1L, 6.0)))
  }

  test("compactVersioned keeps every snapshot readable; vacuum bounds history and sweeps") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select("game_id").as[String].collect().toSet
    def dataFiles(p: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(p))
        .filter(f => f.getName.endsWith(".parquet") && !f.getPath.contains("_log"))
        .map(_.getPath).toSet
    }
    val path = tmpDir("store_vcompact") + "/t"
    val store = Store(spark, path, "season")
    (1 to 3).foreach(i => store.appendVersioned(season(1998 + i, i)))
    val v3Ids = ids(store.readVersion(3))
    val filesBefore = dataFiles(path)
    // accreted layout: one file per (append, partition touched)
    assert(filesBefore.size >= 3)
    // ---- OPTIMIZE: lands v4 as a #base, old files stay for time travel
    assert(store.compactVersioned(1) === 4L)
    assert(store.isBaseEntry(4L) && !store.isBaseEntry(3L))
    assert(ids(store.readVersion(4)) === v3Ids, "compaction changed content")
    // every pre-compaction snapshot still resolves to its prefix content
    assert((1 to 3).map(v => store.readVersion(v).count()) === Seq(1L, 3L, 6L))
    assert(ids(store.readVersion(3)) === v3Ids)
    // dataChange = false: the rewrite adds NO rows to the change feed
    assert(store.readChanges(3, 4).count() === 0L)
    assert(ids(store.readChanges(0, 4)) === v3Ids) // full-history read resolves
    // ingest continues on top of the base
    store.appendVersioned(season(2002, 2))
    assert(ids(store.readChanges(4, 5)).size === 2)
    assert(ids(store.readVersion(5)) === v3Ids ++ ids(store.readChanges(4, 5)))
    // a cursor straddling the base sees exactly the ingested deltas
    assert(ids(store.readChanges(3, 5)) === ids(store.readChanges(4, 5)))
    // ---- VACUUM: drops pre-base entries, sweeps unreferenced files
    val swept = store.vacuum()
    assert(swept >= 3, s"expected the pre-compaction files swept, got $swept")
    assert(store.versions === Seq(4L, 5L))
    assert(store.earliestChangeVersion === 4L)
    intercept[IllegalArgumentException] { store.readVersion(2) }
    val err = intercept[Store.RetentionBoundaryException] { store.readChanges(2, 5) }
    assert(err.earliestChangeVersion === 4L)
    // surviving reads are untouched; no unreferenced files remain; re-run
    // is a no-op (idempotent repair)
    assert(ids(store.readVersion(5)) === v3Ids ++ ids(store.readChanges(4, 5)))
    assert(store.vacuum() === 0L)
    // plain read ≡ latest snapshot after the sweep
    assert(ids(store.read) === ids(store.readVersion(5)))
  }

  test("vacuum distinguishes compaction debris from a crashed append's data") {
    val path = tmpDir("store_vacuum_guard") + "/t"
    val store = Store(spark, path, "season")
    store.appendVersioned(season(1999, 2))
    // ---- a crashed APPEND: data files landed, log write never ran —
    // vacuum must REFUSE (the only copy of a batch), adoptOrphans repairs
    store.append(season(2000, 3))
    val err = intercept[IllegalArgumentException] { store.vacuum() }
    assert(err.getMessage.contains("adoptOrphans"))
    assert(store.adoptOrphans() === Some(2L))
    assert(store.vacuum() === 0L) // clean again
    // ---- a crashed COMPACTION: the intent marker marks the unlogged
    // files as rewrite DUPLICATES — vacuum sweeps them and content holds
    val preIds = store.read.select("game_id").as[String].collect().toSet
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.create(new org.apache.hadoop.fs.Path(s"$path/_log/.compacting"), true).close()
    // reconstruct the crash: compacted files landed, base entry never ran
    store.read.write.mode("append").partitionBy("season").parquet(path)
    val swept = store.vacuum()
    assert(swept > 0, "crashed compaction's duplicate files not swept")
    assert(store.read.select("game_id").as[String].collect().toSet === preIds)
    assert(!new java.io.File(s"$path/_log/.compacting").exists())
    // the lineage keeps working
    store.appendVersioned(season(2001, 1))
    assert(store.versions === Seq(1L, 2L, 3L))
  }

  test("compaction and vacuum preserve a tracked table's sidecar") {
    // the full composition matrix: versions × sidecar × OPTIMIZE/VACUUM —
    // compaction preserves rows exactly, so the per-partition counts and
    // lattice checksums are layout-invariant and the sidecar stays the
    // metadata truth through both operations
    val path = tmpDir("store_vt_compact") + "/t"
    val store = Store(spark, path, "season")
    val term = col("epa").cast("long")
    def sidecar = store.readStats
      .select(col("season").cast("int"), col("n_rows"), col("checksum"))
      .as[(Int, Long, Long)].collect().toSet
    (1 to 3).foreach(i =>
      store.appendVersionedTracked(season(1998 + i, i), term))
    val before = sidecar
    assert(store.compactVersioned(1) === 4L)
    assert(sidecar === before, "compaction changed the sidecar")
    assert(sidecar === store.statsOf(store.read, term)
      .as[(Int, Long, Long)].collect().toSet)
    store.vacuum()
    assert(sidecar === before, "vacuum changed the sidecar")
    assert(store.versions === Seq(4L))
    // the composed write path keeps working on the compacted lineage
    store.appendVersionedTracked(season(2002, 2), term)
    assert(sidecar === store.statsOf(store.read, term)
      .as[(Int, Long, Long)].collect().toSet)
    assert(store.readChanges(4, 5).count() === 2L)
  }

  test("batch-tagged versioned appends are re-delivery-safe") {
    val path = tmpDir("store_batch_tag") + "/t"
    val store = Store(spark, path, "season")
    assert(!store.hasBatchTag("b0"))
    store.appendVersioned(season(1999, 2), Some("b0"))
    assert(store.hasBatchTag("b0") && !store.hasBatchTag("b1"))
    // the writer's re-delivery discipline: probe, then skip
    if (!store.hasBatchTag("b0")) store.appendVersioned(season(1999, 2), Some("b0"))
    assert(store.versions === Seq(1L))
    assert(store.read.count() === 2L)
    // untagged and tagged appends interleave; tags survive a collapse of
    // OTHER versions and die with their own entry
    store.appendVersioned(season(2000, 3), Some("b1"))
    store.appendVersioned(season(2001, 1))
    assert(store.hasBatchTag("b1"))
    store.collapseHistory(2)
    assert(!store.hasBatchTag("b0") && !store.hasBatchTag("b1"),
      "tags must die with collapsed entries — a recycled batchId after a " +
        "checkpoint reset must not silently skip")
    assert(store.readVersion(3).count() === 6L)
  }

  test("adoptOrphans tags its version as a repair; the tag dies with the entry") {
    val path = tmpDir("store_repair_tag") + "/t"
    val store = Store(spark, path, "season")
    store.appendVersioned(season(1999, 2))
    // the crash shape: data files land, the log write never happens
    store.append(season(2000, 3))
    assert(store.adoptOrphans() === Some(2L))
    assert(store.isRepairVersion(2L), "repair version untagged")
    assert(!store.isRepairVersion(1L), "normal append tagged as repair")
    store.appendVersioned(season(2001, 1))
    assert(!store.isRepairVersion(3L))
    // the repair version reads like any other
    assert(store.readVersion(2).count() === 5L)
    // collapse dissolves the tag with the entry — the merged base is a
    // collapse artifact, not a repair
    store.collapseHistory(2)
    assert(!store.isRepairVersion(2L))
    assert(store.readVersion(2).count() === 5L)
  }
}

class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("csv sink + typed csv source round-trip") {
    val dir = tmpDir("csv_rt") + "/out"
    val df = Seq(("KC", 12, 0.31), ("SEA", 3, -0.05)).toDF("team", "week", "epa")
    Ingest.csvSink(df, dir)
    val schema = StructType(Seq(
      StructField("team", StringType), StructField("week", IntegerType),
      StructField("epa", DoubleType)))
    val back = Ingest.csv(spark, dir, schema)
    assert(back.as[(String, Int, Double)].collect().toSet ===
      Set(("KC", 12, 0.31), ("SEA", 3, -0.05)))
  }

  test("parseAndExplode flattens a nested array-of-structs JSON column") {
    val df = Seq(
      ("m1", """{"player":"p1","outcomes":[{"label":"over","odds":110},{"label":"under","odds":-130}]}"""))
      .toDF("mkt", "payload")
    val schema = StructType(Seq(
      StructField("player", StringType),
      StructField("outcomes", ArrayType(StructType(Seq(
        StructField("label", StringType), StructField("odds", IntegerType)))))))
    val got = Ingest.parseAndExplode(df, "payload", schema, "outcomes")
      .select("mkt", "label", "odds").as[(String, String, Int)].collect().toSet
    assert(got === Set(("m1", "over", 110), ("m1", "under", -130)))
  }

  test("corrupt JSON lines route to the corrupt-record column, good rows parse") {
    // PERMISSIVE schema-on-read: a malformed line must neither kill the
    // job (FAILFAST) nor vanish (DROPMALFORMED) — it lands whole in the
    // corrupt column for quarantine, the ETL answer to mid-feed garbage
    val dir = tmpDir("json_corrupt")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "feed.json"),
      java.util.Arrays.asList(
        """{"id": 1, "v": "a"}""",
        """{"id": 2, "v": """,
        """{"id": 3, "v": "c"}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    // Spark disallows selecting ONLY the corrupt column straight off the
    // raw file scan — materialize the parse first (the quarantine write
    // a real pipeline does anyway)
    val got = Ingest.jsonLines(spark, dir, schema).cache()
    got.count()
    val good = got.filter(col("_corrupt_record").isNull)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(good === Set((1L, "a"), (3L, "c")))
    val bad = got.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").as[String].collect()
    assert(bad.toSeq === Seq("""{"id": 2, "v": """))
  }

  test("cleanNames: janitor semantics — snake case, percent, x-prefix, dedupe") {
    val df = Seq((1, 2, 3, 4, 5)).toDF(
      "Pick No.", "Win %", "00-09", "Team", " team ")
    assert(Ingest.cleanNames(df).columns.toSeq ===
      Seq("pick_no", "win_percent", "x00_09", "team", "team_2"))
    // the minted suffix must not collide with a later already-clean name
    val clash = Ingest.cleanNames(Seq((1, 2, 3)).toDF("Team", "Team", "Team 2"))
    assert(clash.columns.toSeq.distinct.size === 3, clash.columns.mkString(","))
  }

  test("parseNumber: currency/grouping/percent strings, junk → null") {
    val got = Seq("$7,250", "93%", "-3.5", "4.5 (OVER)", "Team", "")
      .toDF("s").select(Ingest.parseNumber(col("s"))).collect().map(_.get(0))
    assert(got.toSeq === Seq(7250.0, 93.0, -3.5, 4.5, null, null))
  }

  test("parseNumber expands scientific notation like readr") {
    val got = Seq("1e3", "2.5E-2", "-1.2e2 pts", ".5e1", "7e", "E5")
      .toDF("s").select(Ingest.parseNumber(col("s"))).collect().map(_.get(0))
    // "7e": mantissa parses, dangling exponent marker is junk text after
    // the token; "E5": no mantissa → the 5 alone is the first number
    assert(got.toSeq === Seq(1000.0, 0.025, -120.0, 5.0, 7.0, 5.0))
  }

  test("dropJunkRows keeps only rows whose key parses (header repeats drop)") {
    val df = Seq(("1", "a"), ("Pick", "Pick"), ("2", "b")).toDF("pick", "v")
    assert(Ingest.dropJunkRows(df, col("pick")).count() === 2)
  }

  test("tolerantFanOut unions successes and reports failures (C4)") {
    val (out, fails) = Ingest.tolerantFanOut(Seq(1, 2, 3)) {
      case 2 => throw new RuntimeException("boom")
      case i => Seq((i, s"season$i")).toDF("id", "tag")
    }
    assert(out.get.count() === 2)
    assert(fails.map(_._1) === Seq(2))
  }
}
