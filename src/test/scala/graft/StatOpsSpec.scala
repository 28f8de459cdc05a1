package graft

import graft.core.Tables
import graft.operators.{StatOps, TextOps, VectorOps}
import org.apache.spark.sql.functions._

/** Semantic invariants for the statistical-monitoring ops (d2/d3/a22/m12)
  * plus the round-7 retrieval/corpus additions (v17 kNN graph, x39 n-gram
  * top-k). The DuckDB oracle covers value equality; these gates check the
  * *statistics* behave like the statistics they claim to be.
  */
class StatOpsSpec extends SparkSpec {

  import SparkSpec.spark.implicits._

  test("d2 PSI: 10-bin spine, counts conserve the row total, terms finite") {
    val out = StatOps.d2.build(spark, sf).collect()
    assert(out.length == 10)
    assert(out.map(_.getAs[Int]("bin")).sorted.toSeq == (0 until 10))
    val total = out.map(r => r.getAs[Long]("ref_n") + r.getAs[Long]("cur_n")).sum
    assert(total == Tables.events(spark, sf).count())
    assert(out.forall { r =>
      val t = r.getAs[Double]("psi_term")
      !t.isNaN && !t.isInfinite
    })
  }

  test("d3 KS: one row, statistic in [0, 1], sample sizes match the populations") {
    val out = StatOps.d3.build(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val ks = r.getAs[Double]("ks_stat")
    assert(ks >= 0.0 && ks <= 1.0)
    val byType = Tables.events(spark, sf).groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(r.getAs[Long]("n_a") == byType("click"))
    assert(r.getAs[Long]("n_b") == byType("error"))
  }

  test("a22 Welch t-test matches a local double recomputation within 1e-6") {
    val r = StatOps.a22.build(spark, sf).collect().head
    def sample(t: String): Array[Double] = Tables.events(spark, sf)
      .filter(col("event_type") === t).select("value").as[Double].collect()
    val (a, b) = (sample("click"), sample("error"))
    def meanVar(x: Array[Double]): (Double, Double) = {
      val m = x.sum / x.length
      (m, x.map(v => (v - m) * (v - m)).sum / (x.length - 1))
    }
    val ((m1, v1), (m2, v2)) = (meanVar(a), meanVar(b))
    val se2 = v1 / a.length + v2 / b.length
    val t = (m1 - m2) / math.sqrt(se2)
    val df = se2 * se2 /
      (math.pow(v1 / a.length, 2) / (a.length - 1) + math.pow(v2 / b.length, 2) / (b.length - 1))
    assert(r.getAs[Long]("n1") == a.length && r.getAs[Long]("n2") == b.length)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-6)
    assert(math.abs(r.getAs[Double]("df") - df) < 1e-3)
  }

  test("m12 CUSUM replays a local ordered fold; peak rows are exactly the max |cusum|") {
    val out = StatOps.m12.build(spark, sf).orderBy("bucket").collect()
    assert(out.nonEmpty)
    val n = out.map(_.getAs[Long]("n")).sum.toDouble
    val mu = out.map(r => r.getAs[Double]("x_mean") * r.getAs[Long]("n")).sum / n
    var acc = 0.0
    out.foreach { r =>
      acc += r.getAs[Long]("n") * (r.getAs[Double]("x_mean") - mu)
      assert(math.abs(r.getAs[Double]("cusum") - acc) < 5e-4,
        s"bucket ${r.getAs[Long]("bucket")}: ${r.getAs[Double]("cusum")} vs $acc")
    }
    val peak = out.map(r => math.abs(r.getAs[Double]("cusum"))).max
    val flagged = out.filter(_.getAs[Boolean]("is_peak"))
    assert(flagged.nonEmpty)
    assert(flagged.forall(r => math.abs(r.getAs[Double]("cusum")) == peak))
  }

  test("v17 kNN graph: <= 3 neighbors per node, cos in [-1, 1], no self-edges") {
    val edges = VectorOps.v17.build(spark, sf).collect()
    val bySrc = edges.groupBy(_.getAs[Long]("src_id"))
    assert(bySrc.values.forall(_.length <= 3))
    assert(edges.forall(r => r.getAs[Long]("src_id") != r.getAs[Long]("neighbor_id")))
    assert(edges.forall { r =>
      val c = r.getAs[Double]("cos"); c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12
    })
  }

  test("d4 chi-square: categories conserve totals, terms non-negative and finite") {
    val out = StatOps.d4.build(spark, sf).collect()
    val types = Tables.events(spark, sf).select("event_type").distinct()
      .as[String].collect().toSet
    assert(out.map(_.getAs[String]("event_type")).toSet == types)
    val total = out.map(r => r.getAs[Long]("ref_n") + r.getAs[Long]("cur_n")).sum
    assert(total == Tables.events(spark, sf).count())
    assert(out.forall { r =>
      val t = r.getAs[Double]("chi2_term")
      t >= 0.0 && !t.isNaN && !t.isInfinite
    })
  }

  test("d5 key-skew: totals match the table, hot key attains max_n, ratio >= 1") {
    val r = StatOps.d5.build(spark, sf).collect().head
    val li = Tables.lineitem(spark, sf)
    assert(r.getAs[Long]("total_n") == li.count())
    assert(r.getAs[Long]("n_keys") == li.select("l_partkey").distinct().count())
    val hotN = li.filter(col("l_partkey") === r.getAs[Long]("hot_key")).count()
    assert(hotN == r.getAs[Long]("max_n"))
    assert(r.getAs[Double]("skew_ratio") >= 1.0)
  }

  test("w8 sessionization: sessions partition events and respect the 6h gap rule") {
    val gapUs = 21600000000L
    val sess = graft.operators.Relational.w8.build(spark, sf).collect()
    assert(sess.map(_.getAs[Long]("n_events")).sum == Tables.events(spark, sf).count())
    // replay one user locally: break positions must match exactly
    val uid = sess.head.getAs[Long]("user_id")
    val times = Tables.events(spark, sf).filter(col("user_id") === uid)
      .select(unix_micros(col("ts"))).as[Long].collect().sorted
    val localSessions = times.foldLeft(List.empty[List[Long]]) {
      case (acc, t) if acc.nonEmpty && t - acc.head.head <= gapUs =>
        (t :: acc.head) :: acc.tail
      case (acc, t) => List(t) :: acc
    }
    val mine = sess.filter(_.getAs[Long]("user_id") == uid)
      .map(_.getAs[Long]("n_events")).sorted.toSeq
    assert(mine == localSessions.map(_.length).sorted)
  }

  test("w9 funnel: stage counts are monotone and match a local strict-order replay") {
    val r = graft.operators.Relational.w9.build(spark, sf).collect().head
    val (nv, nc, np) =
      (r.getAs[Long]("n_view"), r.getAs[Long]("n_click"), r.getAs[Long]("n_purchase"))
    assert(nv >= nc && nc >= np && np >= 0)
    // local replay over (user, type, ts)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)].collect()
    def firstAtOrAfter(u: Long, t: String, lo: Long): Option[Long] = {
      val c = ev.collect { case (`u`, `t`, ts) if ts >= lo => ts }
      if (c.isEmpty) None else Some(c.min)
    }
    val users = ev.map(_._1).distinct
    var (lv, lc, lp) = (0L, 0L, 0L)
    users.foreach { u =>
      firstAtOrAfter(u, "view", Long.MinValue).foreach { fv =>
        lv += 1
        firstAtOrAfter(u, "click", fv).foreach { fc =>
          lc += 1
          firstAtOrAfter(u, "purchase", fc).foreach(_ => lp += 1)
        }
      }
    }
    assert((nv, nc, np) == ((lv, lc, lp)))
  }

  test("m13 STL: one row per day, exact additive reconstruction, dow seasonal is centered-ish") {
    val out = StatOps.m13.build(spark, sf).collect()
    assert(out.length == Tables.events(spark, sf)
      .select(to_date(col("ts"))).distinct().count())
    out.foreach { r =>
      val recon = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(recon - r.getAs[Double]("daily_mean")) < 1e-9,
        s"day ${r.getAs[java.sql.Date]("day")}: reconstruction off")
    }
    // seasonal is a per-dow constant: each dow group carries one value
    val byDow = out.groupBy(r =>
      (r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay % 7).toInt)
    byDow.values.foreach { rs =>
      assert(rs.map(_.getAs[Double]("seasonal")).distinct.length == 1)
    }
  }

  test("x39 n-gram top-k: descending counts, well-formed bigrams, k rows") {
    val out = TextOps.x39.build(spark, sf).collect()
    assert(out.length == 20)
    val cnts = out.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    assert(out.forall(_.getAs[String]("bigram").matches("[a-z0-9]+ [a-z0-9]+")))
  }
}
