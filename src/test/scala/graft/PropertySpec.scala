package graft

import scala.util.Random
import graft.model._
import graft.engine.QueryBuilder
import graft.transform.Transforms

/** Property-style tests the reference never had (SURVEY §5): operator
  * algebra checked over seeded-random configurations against an
  * in-memory model (deterministic — fixed seed).
  */
class PropertySpec extends SparkSpec {

  private lazy val lineitem = {
    val df = QueryBuilder.scan(spark, sf001, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag").cache()
    df.count()
    df
  }
  private lazy val rows = lineitem.collect()
    .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq

  test("numeric filter operators agree with the in-memory model (25 random configs)") {
    val rnd = new Random(42)
    val ops = Seq("=", "!=", ">", ">=", "<", "<=")
    (1 to 25).foreach { _ =>
      val op = ops(rnd.nextInt(ops.length))
      val v = (rnd.nextInt(50) + 1).toDouble
      val got = QueryBuilder.build(spark, sf001, Connector(
        "lineitem", fields = Seq("l_orderkey"),
        filters = Seq(Filter("l_quantity", op, v)), limit = 0)).count()
      val want = rows.count { case (_, q, _) =>
        op match {
          case "="  => q == v
          case "!=" => q != v
          case ">"  => q > v
          case ">=" => q >= v
          case "<"  => q < v
          case "<=" => q <= v
        }
      }
      assert(got == want.toLong, s"$op $v")
    }
  }

  test("conjunctive filters equal intersection of single filters (10 random configs)") {
    val rnd = new Random(7)
    (1 to 10).foreach { _ =>
      val a = (rnd.nextInt(50) + 1).toDouble
      val b = (rnd.nextInt(50) + 1).toDouble
      val both = QueryBuilder.build(spark, sf001, Connector(
        "lineitem", filters = Seq(Filter("l_quantity", ">", a), Filter("l_quantity", "<=", b)),
        limit = 0)).count()
      val want = rows.count { case (_, q, _) => q > a && q <= b }
      assert(both == want.toLong, s"($a, $b]")
    }
  }

  test("limit/offset pagination tiles the sorted table without gaps or overlap") {
    val rnd = new Random(11)
    (1 to 8).foreach { _ =>
      val pageSize = rnd.nextInt(499) + 1
      val total = rows.length
      val pages = (0 until math.min(3, (total + pageSize - 1) / pageSize)).map { p =>
        QueryBuilder.build(spark, sf001, Connector(
          "lineitem", fields = Seq("l_orderkey", "l_quantity"),
          sort = Seq(Sort.asc("l_orderkey"), Sort.asc("l_quantity")),
          offset = p.toLong * pageSize, limit = pageSize)).count()
      }
      assert(pages.forall(_ <= pageSize))
      assert(pages.sum == math.min(pages.length.toLong * pageSize, total.toLong))
    }
  }

  test("uppercase/lowercase/trim are idempotent on random padded strings") {
    import spark.implicits._
    val rnd = new Random(3)
    val strs = (1 to 40).map(_ => "  " + rnd.alphanumeric.take(rnd.nextInt(12)).mkString + " ")
    val df = strs.toDF("v")
    def once(t: String) = Transforms.applyAll(df, Seq(Transformation(t, field = "v", to = "o")))
      .select("o").as[String].collect().toSeq
    def twice(t: String) = Transforms.applyAll(df, Seq(
      Transformation(t, field = "v", to = "o"),
      Transformation(t, field = "o", to = "o"))).select("o").as[String].collect().toSeq
    Seq("uppercase", "lowercase", "trim").foreach(t => assert(once(t) == twice(t), t))
  }

  test("toNumber matches JS parseFloat || 0 on random numeric-ish strings") {
    import spark.implicits._
    val rnd = new Random(99)
    val strs = (1 to 60).map { i =>
      i % 4 match {
        case 0 => (rnd.nextDouble() * 2e6 - 1e6).toString
        case 1 => s"${rnd.nextInt(10000)} junk"
        case 2 => rnd.alphanumeric.dropWhile(_.isDigit).take(8).mkString
        case _ => ""
      }
    }
    val got = Transforms.applyAll(strs.toDF("v"),
      Seq(Transformation("toNumber", field = "v", to = "n")))
      .select("n").as[Double].collect().toSeq
    val pat = "^[ \\t\\n]*([-+]?(?:[0-9]+\\.?[0-9]*(?:[eE][-+]?[0-9]+)?|\\.[0-9]+(?:[eE][-+]?[0-9]+)?))".r
    val want = strs.map { s =>
      pat.findFirstMatchIn(s).map(_.group(1).toDouble)
        .filter(d => d != 0.0 && !d.isNaN).getOrElse(0.0)
    }
    assert(got == want)
  }

  test("CUSUM telescoping ≡ the sequential recursion (20 random series)") {
    // S⁺_t = max(0, S⁺_{t-1} + d_t) must equal P_t − min(0, min_{j≤t} P_j)
    // — the identity q_ts_cusum's window form rests on
    val rnd = new Random(7)
    (1 to 20).foreach { _ =>
      val d = Seq.fill(rnd.nextInt(50) + 1)(rnd.nextInt(21) - 10L)
      val recursive = d.scanLeft(0L)((s, x) => math.max(0L, s + x)).tail
      val prefix = d.scanLeft(0L)(_ + _).tail
      val telescoped = prefix.zipWithIndex.map { case (p, i) =>
        p - math.min(0L, prefix.take(i + 1).min)
      }
      assert(recursive == telescoped, s"series $d")
    }
  }

  test("intervalJoin ≡ naive overlap filter on random interval sets (10 configs)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new Random(13)
    (1 to 10).foreach { i =>
      def mk(n: Int) = Seq.tabulate(n) { k =>
        val lo = rnd.nextInt(200).toLong
        (k.toLong, lo, lo + rnd.nextInt(30))
      }
      val a = mk(rnd.nextInt(30) + 5).toDF("aid", "a_lo", "a_hi")
      val b = mk(rnd.nextInt(30) + 5).toDF("bid", "b_lo", "b_hi")
      val bw = rnd.nextInt(20) + 1L
      val got = graft.ops.Joins.intervalJoin(a, "a_lo", "a_hi", b, "b_lo", "b_hi", bw)
        .select("aid", "bid").as[(Long, Long)].collect().toSeq
      val naive = a.crossJoin(b)
        .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
        .select("aid", "bid").as[(Long, Long)].collect().toSeq
      assert(got.sorted == naive.sorted, s"config $i binWidth $bw")
      assert(got.size == got.toSet.size, s"config $i produced duplicate pairs")
    }
  }

  test("JPEG header decoder round-trips random dimensions and component counts") {
    val rnd = new Random(99)
    import spark.implicits._
    val ids = Seq.fill(40)(rnd.nextInt(100000).toLong).distinct.toDF("id")
    import graft.ops.Multimodal
    val dims = Multimodal.extractJpegDims(Multimodal.syntheticJpeg(ids, "id"))
      .as[Multimodal.JpegDims].collect()
    dims.foreach { j =>
      val id = j.media_id
      assert(j.height == 16 + (id % 240).toInt && j.width == 32 + (id % 200).toInt)
      assert(j.n_components == (if (id % 2 == 0) 3 else 1))
      assert(j.n_skipped == 2 + (id % 2).toInt)
    }
  }
}
