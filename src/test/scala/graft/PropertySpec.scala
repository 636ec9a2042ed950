package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}

/** Property-based checks (ScalaCheck generators, deterministic seeds)
  * for the subtlest constructions in the engine — the ones where a
  * plausible-looking implementation can be silently wrong on inputs
  * the fixed specs never draw:
  *
  * - m10's GOP codec reconstructs P-frames by wraparound delta
  *   application; the DuckDB oracle only covers band-fill content, so
  *   the round-trip property drives it with random per-pixel frames
  *   where every byte pair (including negative-difference wraps)
  *   occurs.
  * - t24's greedy BPE merge is a gaps-and-islands rewrite of an
  *   inherently sequential left-to-right scan; overlapping runs
  *   ("aaa", "abab", odd/even lengths) are exactly where a rewrite
  *   slips. Random words over a 3-letter alphabet collide constantly,
  *   so every draw exercises ties, runs, and re-merges.
  * - q50's CUSUM uses the prefix-sum closed form S_d = P_d −
  *   min(0, min_{j≤d} P_j) in place of the recursion max(0, S+a);
  *   the identity is easy to state and easy to break (an off-by-one
  *   in the window frame, a missing min(0,·)).
  *
  * Each property replays the relational answer against a direct
  * imperative reference implementation. Seeds are fixed — failures
  * reproduce.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("graft-prop", cores = 4)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, rng.Seed(seed)).get

  // ---- reference BPE trainer (imperative, obviously-correct) ----------

  private def refBpe(words: Seq[String], iters: Int)
      : Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = words.groupBy(identity)
      .map { case (w, g) => w.map(_.toString).toVector -> g.size.toLong }
    val out = scala.collection.mutable.Buffer[(String, String, Long)]()
    var it = 0
    while (it < iters) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pc(k) = pc.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pc.isEmpty) return out.toSeq
      val ((ba, bb), cnt) = pc.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
      out += ((ba, bb, cnt))
      vocab = vocab.toSeq.map { case (syms, c) =>
        val res = scala.collection.mutable.Buffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == ba && syms(i + 1) == bb) {
            res += ba + bb; i += 2 // greedy: consume both, no overlap
          } else { res += syms(i); i += 1 }
        }
        res.toVector -> c
      }.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      it += 1
    }
    out.toSeq
  }

  test("property: relational BPE merges equal the imperative greedy trainer (30 random corpora)") {
    import spark.implicits._
    import graft.operators.TextOps
    val word = Gen.choose(2, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val corpus = Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, word))
    (1 to 30).foreach { seed =>
      val words = sample(corpus, seed.toLong)
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = TextOps.bpeMerges(docs, iters = 3).collect()
        .map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
          r.getAs[Long]("cnt"))).toSeq
      val want = refBpe(words, 3)
      assert(got == want,
        s"seed=$seed corpus=${words.mkString(",")}: got $got want $want")
    }
  }

  test("property: GOP encode→decode round-trips arbitrary frame content exactly (20 random clips)") {
    import spark.implicits._
    import graft.operators.Multimodal
    // Random per-pixel RGB frames — not the band fills the oracle
    // covers — so the wraparound-delta reconstruction is exercised on
    // every byte pair, including the negative-difference wraps a
    // clamped (lossy) codec would get wrong.
    val clip = for {
      w <- Gen.choose(2, 10); h <- Gen.choose(2, 8)
      nf <- Gen.choose(2, 7); g <- Gen.choose(1, 4)
      px <- Gen.listOfN(nf * w * h, Gen.choose(0, 0xffffff))
    } yield (w, h, nf, g, px)
    (1 to 20).foreach { seed =>
      val (w, h, nf, g, px) = sample(clip, seed.toLong)
      val frames = (0 until nf).map { f =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w)
          img.setRGB(x, y, px(f * w * h + y * w + x))
        img
      }
      val bytes = Multimodal.encodeGop(frames, g)
      val row = Multimodal.decodeGopFeatures(
        Seq((seed.toLong, bytes)).toDF("doc_id", "video")).collect().head
      // brute-force features over the ORIGINAL frames
      def ch(p: Int, s: Int) = (p >> s) & 0xff
      val want = (0 until nf).flatMap(f => px.slice(f * w * h, (f + 1) * w * h))
      val (sr, sg, sb) = (want.map(ch(_, 16).toLong).sum,
        want.map(ch(_, 8).toLong).sum, want.map(ch(_, 0).toLong).sum)
      val motion = (1 until nf).flatMap { f =>
        (0 until w * h).map { i =>
          val (c, p) = (px(f * w * h + i), px((f - 1) * w * h + i))
          (math.abs(ch(c, 16) - ch(p, 16)) + math.abs(ch(c, 8) - ch(p, 8)) +
            math.abs(ch(c, 0) - ch(p, 0))).toLong
        }
      }.sum
      assert(row.getAs[Boolean]("decode_ok"), s"seed=$seed decode failed")
      assert(row.getAs[Long]("n_frames") == nf.toLong &&
        row.getAs[Long]("n_key") == (0 until nf).count(_ % g == 0).toLong,
        s"seed=$seed frame/key counts")
      assert((row.getAs[Long]("sum_r"), row.getAs[Long]("sum_g"),
        row.getAs[Long]("sum_b")) == ((sr, sg, sb)),
        s"seed=$seed w=$w h=$h nf=$nf g=$g: channel sums drifted")
      assert(row.getAs[Long]("motion") == motion,
        s"seed=$seed: motion over reconstructed frames drifted")
    }
  }

  test("property: CUSUM closed form equals the direct recursion (30 random series)") {
    import spark.implicits._
    import graft.operators.Relational
    val series = Gen.choose(5, 20).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 30)))
    (1 to 30).foreach { seed =>
      val counts = sample(series, seed.toLong)
      val evs = counts.zipWithIndex.flatMap { case (n, d) =>
        (1 to n).map(i => ((d + 1) * 1000L + i, java.sql.Timestamp.valueOf(
          f"2024-03-${d + 1}%02d 10:00:00"), i.toLong, "t", 0.0))
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val got = Relational.cusumChangepoint(evs).collect()
        .map(r => r.getAs[Long]("cusum")).toSeq
      // direct recursion at the same integer scaling
      val dD = counts.length.toLong
      val tT = counts.map(_.toLong).sum
      var s = 0L
      val want = counts.map { x =>
        s = math.max(0L, s + 4L * dD * x - 5L * tT); s
      }
      assert(got == want, s"seed=$seed counts=$counts: got $got want $want")
    }
  }
}
