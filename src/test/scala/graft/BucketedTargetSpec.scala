package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.ops.{BucketedTarget, Merge}

/** Delta-proportionality of the bucketed upsert target: a micro-batch
  * touching a few keys must rewrite only the buckets holding those keys
  * — every other bucket's files stay BYTE-IDENTICAL — while the merged
  * state stays equal to the one-shot latest-wins reduction.
  */
class BucketedTargetSpec extends SparkSpec {
  import spark.implicits._

  private val N = 16

  private def fileBytes(dir: String): Map[String, (Long, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else
      fs.listStatus(p).filter(_.isFile).map { st =>
        val in = fs.open(st.getPath)
        val buf = new Array[Byte](st.getLen.toInt)
        in.readFully(0, buf)
        in.close()
        st.getPath.getName -> (st.getLen, java.util.Arrays.hashCode(buf).toLong)
      }.toMap
  }

  test("upsert rewrites only delta-touched buckets; untouched bucket files byte-identical") {
    val root = java.nio.file.Files.createTempDirectory("graft_bt").toString + "/t"
    val bt = new BucketedTarget(spark, root, N, keys = Seq("k"), versionCols = Seq("v"))

    val seed = spark.range(2000L).select(col("id").as("k"), lit(0L).as("v"),
      concat(lit("seed"), col("id")).as("payload"))
    val s0 = bt.upsert(seed)
    assert(s0.touchedBuckets == N, "seed over 2000 keys should touch every bucket")

    val before = (0 until N).map(i => i -> fileBytes(s"$root/b$i")).toMap

    // delta: 3 keys → at most 3 buckets
    val delta = Seq((7L, 1L, "new7"), (8L, 1L, "new8"), (9L, 1L, "new9"))
      .toDF("k", "v", "payload")
    val s1 = bt.upsert(delta)
    assert(s1.touchedBuckets <= 3 && s1.touchedBuckets >= 1, s"got ${s1.touchedBuckets}")
    assert(s1.rewrittenFraction < 1.0)

    val touched = Seq(7L, 8L, 9L)
      .map(k => Math.floorMod(seed.filter(col("k") === k).select(
        pmod(hash(col("k")), lit(N))).as[Int].head(), N)).toSet
    (0 until N).foreach { i =>
      val after = fileBytes(s"$root/b$i")
      if (touched.contains(i)) assert(after != before(i), s"touched bucket b$i not rewritten")
      else assert(after == before(i), s"untouched bucket b$i changed")
    }

    // state == one-shot latest-wins over everything ever upserted
    val expected = Merge.latest(seed.unionByName(delta), Seq("k"), Seq("v"))
      .as[(Long, Long, String)].collect().toSet
    assert(bt.read().as[(Long, Long, String)].collect().toSet == expected)

    // replay idempotence: re-applying the same delta changes nothing
    bt.upsert(delta)
    assert(bt.read().as[(Long, Long, String)].collect().toSet == expected)
  }

  test("property: any seeded batch sequence == one-shot latest-wins of the union") {
    // the associativity/commutativity/idempotence claims, checked over
    // randomized (but seeded — deterministic) batch splits with
    // overlapping keys, duplicate versions and replayed batches
    val rnd = new scala.util.Random(421)
    val root = java.nio.file.Files.createTempDirectory("graft_bt_prop").toString + "/t"
    val bt = new BucketedTarget(spark, root, 8, keys = Seq("k"), versionCols = Seq("v"))
    val all = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    (1 to 5).foreach { b =>
      val batch = Seq.fill(rnd.nextInt(40) + 10)(
        (rnd.nextInt(20).toLong, rnd.nextInt(5).toLong, s"b$b-${rnd.nextInt(1000)}"))
      all ++= batch
      bt.upsert(batch.toDF("k", "v", "p"))
      if (rnd.nextBoolean()) bt.upsert(batch.toDF("k", "v", "p")) // replay
    }
    val expected = Merge.latest(all.toSeq.toDF("k", "v", "p"), Seq("k"), Seq("v"))
      .as[(Long, Long, String)].collect().toSet
    assert(bt.read().as[(Long, Long, String)].collect().toSet == expected)
  }

  test("lookup reads only the probed keys' buckets and returns exactly their rows") {
    val root = java.nio.file.Files.createTempDirectory("graft_bt_lk").toString + "/t"
    val bt = new BucketedTarget(spark, root, N, keys = Seq("k"), versionCols = Seq("v"))
    bt.upsert(spark.range(2000L).select(col("id").as("k"), lit(1L).as("v"),
      concat(lit("p"), col("id")).as("payload")))
    val probes = Seq(7L, 8L, 9L).toDF("k")
    val out = bt.lookup(probes)
    assert(out.as[(Long, Long, String)].collect().toSet ==
      Set((7L, 1L, "p7"), (8L, 1L, "p8"), (9L, 1L, "p9")))
    // plan-level witness: every scanned file lives in a probed bucket dir
    val probedDirs = Seq(7L, 8L, 9L).map(k =>
      Math.floorMod(spark.range(1).select(pmod(hash(lit(k)), lit(N))).as[Int].head(), N))
      .toSet.map((i: Int) => s"/b$i/")
    val scanned = out.inputFiles
    assert(scanned.nonEmpty && scanned.forall(f => probedDirs.exists(f.contains)),
      s"lookup scanned outside probed buckets: ${scanned.mkString(",")}")
    // mismatched probe columns fail loudly
    intercept[IllegalArgumentException] { bt.lookup(Seq(1L).toDF("wrong")) }
  }

  test("layout is pinned at first write: mismatched numBuckets/keys writer is rejected") {
    val root = java.nio.file.Files.createTempDirectory("graft_bt_meta").toString + "/t"
    val bt = new BucketedTarget(spark, root, 8, keys = Seq("k"), versionCols = Seq("v"))
    bt.upsert(Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "v", "p"))
    // a writer with the Sinks default 16 against an 8-bucket target must
    // fail at construction, not silently double keys across bucket dirs
    val e1 = intercept[IllegalArgumentException] {
      new BucketedTarget(spark, root, 16, keys = Seq("k"), versionCols = Seq("v"))
    }
    assert(e1.getMessage.contains("numBuckets"))
    val e2 = intercept[IllegalArgumentException] {
      new BucketedTarget(spark, root, 8, keys = Seq("p"), versionCols = Seq("v"))
    }
    assert(e2.getMessage.contains("keys"))
    // matching parameters still construct and read fine
    assert(new BucketedTarget(spark, root, 8, Seq("k"), Seq("v")).read().count() == 2)
  }

  test("pre-meta target backstop: on-disk bucket id >= numBuckets is a hard error") {
    val root = java.nio.file.Files.createTempDirectory("graft_bt_legacy").toString + "/t"
    val bt = new BucketedTarget(spark, root, 8, keys = Seq("k"), versionCols = Seq("v"))
    bt.upsert(spark.range(100L).select(col("id").as("k"), lit(1L).as("v")))
    // simulate a target written before _graft_meta.json existed
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$root/_graft_meta.json"), false)
    val e = intercept[IllegalArgumentException] {
      new BucketedTarget(spark, root, 4, keys = Seq("k"), versionCols = Seq("v"))
    }
    assert(e.getMessage.contains("layout mismatch"))
  }

  test("first batch matching zero rows leaves a readable EMPTY target") {
    val root = java.nio.file.Files.createTempDirectory("graft_bt_empty").toString + "/t"
    val bt = new BucketedTarget(spark, root, 4, keys = Seq("k"), versionCols = Seq("v"))
    val empty = Seq((1L, 1L, "x")).toDF("k", "v", "p").limit(0)
    val stats = bt.upsert(empty)
    assert(stats.touchedBuckets == 0)
    val out = bt.read()
    assert(out.count() == 0)
    assert(out.schema.fieldNames.toSeq == Seq("k", "v", "p"))
    // and the target is still upsertable afterwards
    bt.upsert(Seq((5L, 1L, "y")).toDF("k", "v", "p"))
    assert(bt.read().count() == 1)
  }

  test("recover heals a bucket left mid-swap (target missing, __old present)") {
    val root = java.nio.file.Files.createTempDirectory("graft_bt_rec").toString + "/t"
    val bt = new BucketedTarget(spark, root, 4, keys = Seq("k"), versionCols = Seq("v"))
    bt.upsert(Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)).toDF("k", "v"))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash between the two renames of some bucket that exists
    val b = (0 until 4).find(i => fs.exists(new Path(s"$root/b$i"))).get
    require(fs.rename(new Path(s"$root/b$b"), new Path(s"$root/b${b}__old")))
    bt.recover()
    assert(fs.exists(new Path(s"$root/b$b")) && !fs.exists(new Path(s"$root/b${b}__old")))
    assert(bt.read().count() == 4)
  }
}
