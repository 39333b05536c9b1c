package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Randomized parity: the distributed operators vs independent
  * single-threaded Scala reference implementations, over seeded random
  * fixtures (deterministic — every failure is reproducible from the
  * seed). These pin corner cases enumerated fixtures miss: timestamp
  * ties, repeated stage events, interleaved users, empty groups, docs
  * colliding into the same pack.
  */
class PropertyParitySpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  // -- reference helpers ----------------------------------------------------

  /** Independent reimplementation of EngineNeutral.hash60 (md5 hex head
    * as a 60-bit long) — deliberately NOT the library code path. */
  private def refHash60(x: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def refTokens(text: String): Seq[String] = {
    val t = text.trim
    if (t.isEmpty) Seq.empty else t.split("\\s+").toSeq
  }

  /** Reference funnel: stage 1 = min first-stage ms per user; stage k =
    * min stage-k ms at-or-after the user's stage-(k-1) completion. */
  private def refFunnel(events: Seq[(Long, String, Long)],
                        stages: Seq[String]): Map[Int, Long] = {
    val byUser = events.groupBy(_._1)
    var cur: Map[Long, Long] = byUser.flatMap { case (u, evs) =>
      val ms = evs.filter(_._2 == stages.head).map(_._3)
      if (ms.nonEmpty) Some(u -> ms.min) else None
    }
    val counts = scala.collection.mutable.ListBuffer(cur.size.toLong)
    for (stage <- stages.tail) {
      cur = byUser.flatMap { case (u, evs) =>
        cur.get(u).flatMap { prev =>
          val ms = evs.filter(e => e._2 == stage && e._3 >= prev).map(_._3)
          if (ms.nonEmpty) Some(u -> ms.min) else None
        }
      }
      counts += cur.size.toLong
    }
    counts.zipWithIndex.map { case (n, i) => (i + 1) -> n }.toMap
  }

  test("funnel matches a brute-force reference on random event sets") {
    val stages = Seq("view", "click", "purchase")
    val types = stages :+ "other"
    for (seed <- 1 to 10) {
      val rnd = new Random(seed)
      // small domains on purpose: collisions and ties must be common
      val events = Seq.fill(rnd.nextInt(40) + 5)(
        (rnd.nextInt(5).toLong + 1, types(rnd.nextInt(types.size)),
          rnd.nextInt(15).toLong))
      val got = Events.funnelFrom(events.toDF("user_id", "event_type", "ms"), stages)
        .collect().map(r => r.getLong(0).toInt -> r.getLong(2)).toMap
      assert(got === refFunnel(events, stages), s"seed=$seed events=$events")
    }
  }

  test("sequence packing matches a sequential reference on random corpora") {
    for (seed <- 1 to 6) {
      val rnd = new Random(100 + seed)
      val budget = rnd.nextInt(12) + 4L
      val docs = (1 to rnd.nextInt(30) + 10).map { id =>
        val text = Seq.fill(rnd.nextInt(10))("w" + rnd.nextInt(4)).mkString(" ")
        (id.toLong, "src" + rnd.nextInt(3), text)
      }
      // reference: per source, lay docs out by (hash, id), cumulative
      // token count, pack of the FIRST token = floor(before / budget)
      val expected = docs.groupBy(_._2).flatMap { case (src, ds) =>
        val ordered = ds.map { case (id, _, text) =>
          (id, refTokens(text.toLowerCase).size.toLong, refHash60(s"$id#pack"))
        }.sortBy { case (id, _, hk) => (hk, id) }
        var before = 0L
        val packOf = ordered.map { case (_, nTok, _) =>
          val p = before / budget; before += nTok; (p, nTok)
        }
        packOf.groupBy(_._1).map { case (p, xs) =>
          (src, p, xs.size.toLong, xs.map(_._2).sum)
        }
      }.toSet
      val got = TextAnalysis.packSequencesFrom(
          docs.toDF("doc_id", "source", "text"), budget)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === expected, s"seed=$seed budget=$budget docs=$docs")
    }
  }

  test("quality filter matches a sequential reference on random corpora") {
    def round6(d: Double): Double = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def refQuality(text: String): Double = {
      val toks = refTokens(text.toLowerCase)
      val nTok = toks.size.toDouble
      val alnum = text.replaceAll("[^A-Za-z0-9\\s]", "").length.toDouble
      val punct = (text.length.toDouble - alnum) / text.length.toDouble
      val stopList = Set("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
      val stop = if (nTok > 0) toks.count(stopList).toDouble / nTok else 0.0
      round6(math.min(nTok / 64.0, 1.0) * 0.4 + (1.0 - punct) * 0.3 + stop * 0.3)
    }
    for (seed <- 1 to 5) {
      val rnd = new Random(300 + seed)
      val words = Seq("the", "a", "w1", "w2", "w3!", "x.y", "zz")
      val docs = (1 to rnd.nextInt(25) + 8).map { id =>
        val text = Seq.fill(rnd.nextInt(7) + 1)(words(rnd.nextInt(words.size))).mkString(" ")
        (id.toLong, "src" + rnd.nextInt(3), text)
      }
      val expected = docs.groupBy(_._2).flatMap { case (_, ds) =>
        val qs = ds.map { case (id, _, text) => id -> refQuality(text) }
        val sorted = qs.map(_._2).sorted
        val n = sorted.size
        val median = round6(if (n % 2 == 1) sorted(n / 2)
          else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0)
        qs.filter(_._2 >= median).map(_._1)
      }.toSet
      val got = TextAnalysis.qualityFilterFrom(docs.toDF("doc_id", "source", "text"))
        .collect().map(_.getLong(0)).toSet
      assert(got === expected, s"seed=$seed docs=$docs")
    }
  }

  test("token-budget mix matches a sequential reference on random corpora") {
    for (seed <- 1 to 6) {
      val rnd = new Random(200 + seed)
      val budgets = Map("src0" -> rnd.nextInt(30).toLong,
        "src1" -> rnd.nextInt(10).toLong, "src2" -> 0L)
      val default = rnd.nextInt(15).toLong
      val docs = (1 to rnd.nextInt(30) + 10).map { id =>
        val text = Seq.fill(rnd.nextInt(8))("w" + rnd.nextInt(4)).mkString(" ")
        (id.toLong, "src" + rnd.nextInt(4), text)
      }
      // reference: per source, lay docs out by (hash, id); keep while the
      // tokens BEFORE the doc fit the source's budget
      val expected = docs.groupBy(_._2).flatMap { case (src, ds) =>
        val budget = budgets.getOrElse(src, default)
        val ordered = ds.map { case (id, _, text) =>
          (id, refTokens(text.toLowerCase).size.toLong, refHash60(s"$id#mix"))
        }.sortBy { case (id, _, hk) => (hk, id) }
        var before = 0L
        ordered.flatMap { case (id, nTok, _) =>
          val keep = before < budget
          before += nTok
          if (keep) Some((id, src, nTok, before)) else None
        }
      }.toSet
      val got = TextAnalysis.tokenBudgetMixFrom(
          docs.toDF("doc_id", "source", "text"), budgets, default)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === expected, s"seed=$seed budgets=$budgets default=$default docs=$docs")
    }
  }

  test("common spans matches a brute-force df reference on random corpora") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (w, minDf) = (3, 2)
    for (seed <- 1 to 6) {
      val rnd = new Random(300 + seed)
      // tiny vocab so shingles genuinely repeat across docs
      val docs = (1 to 25).map { id =>
        (id.toLong, Seq.fill(rnd.nextInt(10))("w" + rnd.nextInt(4)).mkString(" "))
      }
      def shingles(text: String): Seq[Long] = {
        val tk = refTokens(text.toLowerCase)
        if (tk.size < w) Seq.empty
        else tk.sliding(w).map(g => refHash60(g.mkString(" "))).toSeq.distinct
      }
      val df = docs.flatMap { case (_, t) => shingles(t) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected = docs.flatMap { case (id, t) =>
        val sh = shingles(t)
        if (sh.isEmpty) None
        else {
          val common = sh.count(g => df(g) >= minDf).toLong
          Some(id -> ((sh.size.toLong, common, round6(common.toDouble / sh.size))))
        }
      }.toMap
      val got = TextAnalysis.commonSpansFrom(docs.toDF("doc_id", "text"), w, minDf)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(got === expected, s"seed=$seed docs=$docs")
    }
  }

  test("unigram logprob matches a direct reference on random corpora") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (seed <- 1 to 6) {
      val rnd = new Random(400 + seed)
      val docs = (1 to 25).map { id =>
        (id.toLong, Seq.fill(rnd.nextInt(8))("w" + rnd.nextInt(5)).mkString(" "))
      }
      val all = docs.flatMap { case (_, t) => refTokens(t.toLowerCase) }
      val ctf = all.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      val total = all.size.toDouble
      val expected = docs.flatMap { case (id, t) =>
        val tk = refTokens(t.toLowerCase)
        if (tk.isEmpty) None
        else Some(id -> ((tk.size.toLong,
          round6(tk.map(x => -math.log(ctf(x) / total)).sum / tk.size))))
      }.toMap
      val got = TextAnalysis.unigramLogprobFrom(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      assert(got === expected, s"seed=$seed docs=$docs")
    }
  }

  test("repetition score matches a direct reference on random texts") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (seed <- 1 to 6) {
      val rnd = new Random(200 + seed)
      val docs = (1 to 20).map { id =>
        (id.toLong, Seq.fill(rnd.nextInt(12))("t" + rnd.nextInt(3)).mkString(" "))
      }
      val expected = docs.map { case (id, text) =>
        val tk = refTokens(text.toLowerCase)
        val bg = if (tk.size >= 2) tk.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
        def dupFrac(xs: Seq[String]) =
          if (xs.isEmpty) 0.0 else 1.0 - xs.distinct.size.toDouble / xs.size
        val top = if (bg.isEmpty) 0.0
          else bg.groupBy(identity).values.map(_.size).max.toDouble / bg.size
        id -> ((round6(dupFrac(tk)), round6(dupFrac(bg)), round6(top)))
      }.toMap
      val got = TextAnalysis.repetitionScoreFrom(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
        .toMap
      assert(got === expected, s"seed=$seed docs=$docs")
    }
  }
}
