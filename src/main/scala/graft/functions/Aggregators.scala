package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.4 B26): `Aggregator[IN, BUF, OUT]`
  * examples registered via `functions.udaf`. The buffer types are flat
  * case classes → Catalyst-encodable, mergeable, partial+final capable.
  */
object Aggregators {

  /** Numerically-stable streaming mean+variance (Welford/Chan parallel
    * merge) — the canonical "needs a real UDAF" aggregate: not expressible
    * as a single built-in, must merge partial states across partitions.
    */
  case class MomentState(n: Long, mean: Double, m2: Double)

  object VarianceAgg extends Aggregator[Double, MomentState, Double] {
    override def zero: MomentState = MomentState(0L, 0.0, 0.0)
    override def reduce(s: MomentState, x: Double): MomentState = {
      val n = s.n + 1
      val d = x - s.mean
      val mean = s.mean + d / n
      MomentState(n, mean, s.m2 + d * (x - mean))
    }
    override def merge(a: MomentState, b: MomentState): MomentState = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        MomentState(n,
          a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    }
    override def finish(s: MomentState): Double =
      if (s.n < 2) 0.0 else s.m2 / (s.n - 1)
    override def bufferEncoder: Encoder[MomentState] = Encoders.product[MomentState]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Top-k smallest values kept in the aggregation buffer — a bounded-state
    * mergeable aggregate (the pattern behind streaming top-k at scale).
    */
  case class TopKState(k: Int, values: Seq[Double])

  class TopKMin(k: Int) extends Aggregator[Double, TopKState, Seq[Double]] {
    // the SAME total order merge's .sorted uses (NaN greater than every
    // number) — a naive `<=` insert would disagree with merge on NaN and
    // make results partition-order-dependent
    private val ord = implicitly[Ordering[Double]]
    override def zero: TopKState = TopKState(k, Seq.empty)
    // invariant: `values` is sorted ascending. The per-ROW path is a
    // capped insert — O(1) reject for values above the current cutoff,
    // O(k) splice otherwise — not a full re-sort; the sort-based path
    // remains only in merge, which runs once per map task per group.
    override def reduce(s: TopKState, x: Double): TopKState =
      if (s.k <= 0) s
      else if (s.values.size >= s.k && ord.gteq(x, s.values.last)) s
      else {
        val (lo, hi) = s.values.span(v => ord.lteq(v, x))
        TopKState(s.k, (lo ++ (x +: hi)).take(s.k))
      }
    override def merge(a: TopKState, b: TopKState): TopKState =
      TopKState(a.k, (a.values ++ b.values).sorted.take(a.k))
    override def finish(s: TopKState): Seq[Double] = s.values
    override def bufferEncoder: Encoder[TopKState] = Encoders.product[TopKState]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Top-k (score, id) pairs per group, largest scores first, ties broken
    * by smallest id. The k-capped buffer makes partial aggregation prune
    * map-side: each map task ships at most k pairs per group instead of
    * the whole group — the scale answer to window-sort ranking, which
    * materializes and sorts every group in full before filtering rn ≤ k.
    */
  case class TopKPairsState(k: Int, scores: Seq[Double], ids: Seq[Long])

  class TopKPairs(k: Int) extends Aggregator[(Double, Long), TopKPairsState, Seq[(Double, Long)]] {
    /** EXACTLY the ordering `cap`'s sortBy uses — (-score, id) ascending
      * under the total Double order, so NaN scores rank worst and reduce
      * never disagrees with merge on any input (a bespoke `>` comparison
      * would stall the buffer forever once a NaN entered it).
      */
    private val rankOrd: Ordering[(Double, Long)] =
      Ordering.by { case (score, id) => (-score, id) }
    private def cap(s: TopKPairsState): TopKPairsState = {
      val kept = s.scores.zip(s.ids)
        .sortBy { case (score, id) => (-score, id) }.take(s.k)
      TopKPairsState(s.k, kept.map(_._1), kept.map(_._2))
    }
    override def zero: TopKPairsState = TopKPairsState(k, Seq.empty, Seq.empty)
    // invariant: buffer sorted best-first. Capped insert per row (O(1)
    // reject below the cutoff, O(k) splice), full sort only in merge —
    // once per map task per group, not per row.
    override def reduce(s: TopKPairsState, x: (Double, Long)): TopKPairsState = {
      if (s.k <= 0) return s
      val full = s.scores.size >= s.k
      if (full && rankOrd.gteq(x, (s.scores.last, s.ids.last))) s
      else {
        val pairs = s.scores.zip(s.ids)
        val at = pairs.indexWhere(p => rankOrd.lt(x, p))
        val kept = (if (at < 0) pairs :+ x
                    else (pairs.take(at) :+ x) ++ pairs.drop(at)).take(s.k)
        TopKPairsState(s.k, kept.map(_._1), kept.map(_._2))
      }
    }
    override def merge(a: TopKPairsState, b: TopKPairsState): TopKPairsState =
      cap(TopKPairsState(a.k, a.scores ++ b.scores, a.ids ++ b.ids))
    override def finish(s: TopKPairsState): Seq[(Double, Long)] = s.scores.zip(s.ids)
    override def bufferEncoder: Encoder[TopKPairsState] = Encoders.product[TopKPairsState]
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Misra–Gries frequent-items summary (capacity k), the heavy-hitters
    * sketch next to the HLL cardinality sketch (operators.Sketches): a
    * k-entry (item, count) table whose estimates satisfy
    *
    *   true − ⌊n/(k+1)⌋ ≤ estimate ≤ true
    *
    * so every item with frequency > n/(k+1) is guaranteed present — the
    * single-pass answer to "which tokens/URLs dominate this 100 TB
    * corpus" when the full vocabulary is too wide to exact-count. The
    * buffer is O(k) regardless of input size, partial aggregation prunes
    * map-side, and the merge is the Agarwal et al. 2013 mergeable-summary
    * form (sum counts; if over capacity, subtract the (k+1)-th largest
    * and drop non-positives) — associative and bound-preserving across
    * any partition tree. When k ≥ the true distinct count the sketch
    * never evicts and the counts are EXACT (pinned by the q82 oracle).
    *
    * Determinism: counts are partition-order independent; the finish
    * ordering (−count, item) makes the emitted sequence deterministic
    * whenever counts are (always, for exact-regime capacity).
    */
  case class MGState(k: Int, items: Seq[String], counts: Seq[Long])

  class MisraGries(k: Int) extends Aggregator[String, MGState, Seq[(String, Long)]] {
    require(k > 0, "capacity must be positive")
    override def zero: MGState = MGState(k, Seq.empty, Seq.empty)
    override def reduce(s: MGState, x: String): MGState = {
      val at = s.items.indexOf(x)
      if (at >= 0)
        MGState(s.k, s.items, s.counts.updated(at, s.counts(at) + 1))
      else if (s.items.size < s.k)
        MGState(s.k, s.items :+ x, s.counts :+ 1L)
      else {
        // classic MG decrement: every stored count pays 1 for the miss
        val kept = s.items.zip(s.counts.map(_ - 1)).filter(_._2 > 0)
        MGState(s.k, kept.map(_._1), kept.map(_._2))
      }
    }
    override def merge(a: MGState, b: MGState): MGState = {
      val summed = (a.items.zip(a.counts) ++ b.items.zip(b.counts))
        .groupMapReduce(_._1)(_._2)(_ + _).toSeq
      if (summed.size <= a.k.max(b.k)) {
        val s = summed.sortBy { case (i, c) => (-c, i) }
        MGState(a.k.max(b.k), s.map(_._1), s.map(_._2))
      } else {
        val t = summed.map(_._2).sorted(Ordering[Long].reverse)(a.k.max(b.k))
        val kept = summed.map { case (i, c) => (i, c - t) }
          .filter(_._2 > 0).sortBy { case (i, c) => (-c, i) }
        MGState(a.k.max(b.k), kept.map(_._1), kept.map(_._2))
      }
    }
    override def finish(s: MGState): Seq[(String, Long)] =
      s.items.zip(s.counts).sortBy { case (i, c) => (-c, i) }
    override def bufferEncoder: Encoder[MGState] = Encoders.product[MGState]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Mergeable QUANTILE sketch — the missing member of the sketch family
    * (HLL distinct / count-min / Misra-Gries heavy hitters / this):
    * bounded-memory approximate percentiles over any double column, the
    * single-pass answer to "what does the length/score distribution of
    * this 100 TB corpus look like" when an exact sort is off the table.
    *
    * Design: the KLL/MRL compactor hierarchy (Karnin-Lang-Liberty 2016,
    * derandomized): level i holds items of weight 2^i in a ≤ k buffer;
    * a full buffer sorts and promotes alternate elements to level i+1.
    * Instead of KLL's random offset, the kept-parity alternates with a
    * per-level compaction counter — DETERMINISTIC for a fixed
    * reduce/merge order (the repo's reproducibility discipline; the
    * classic unbiasing coin is the only thing sacrificed). Merge
    * concatenates level-wise and recompacts — the mergeable-summaries
    * form, so partial aggregation prunes map-side like every other
    * sketch here.
    *
    * Error: rank error is O(log²(n/k)/k)·n (MRL bound for deterministic
    * compaction); k = 128 keeps observed error well under 2 % of n at
    * 100k rows (pinned in FunctionsSurfaceSpec). Like percentile_approx,
    * results vary within that bound across partition layouts — only the
    * BOUND is layout-independent.
    */
  case class QSState(k: Int, levels: Seq[Seq[Double]], flips: Seq[Long])

  class QuantileSketch(k: Int, qs: Seq[Double])
      extends Aggregator[Double, QSState, Seq[Double]] {
    require(k >= 8, "compactor capacity must be >= 8")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be in [0, 1]")

    override def zero: QSState = QSState(k, Seq(Seq.empty), Seq(0L))

    private def compact(s: QSState): QSState = {
      var levels = s.levels.map(_.toVector).toVector
      var flips = s.flips.toVector
      var i = 0
      while (i < levels.length) {
        if (levels(i).size > s.k) {
          val sorted = levels(i).sorted
          val offset = (flips(i) % 2).toInt
          val kept = sorted.zipWithIndex
            .collect { case (v, idx) if idx % 2 == offset => v }
          if (i + 1 >= levels.length) {
            levels = levels :+ Vector.empty[Double]
            flips = flips :+ 0L
          }
          levels = levels
            .updated(i, Vector.empty[Double])
            .updated(i + 1, levels(i + 1) ++ kept)
          flips = flips.updated(i, flips(i) + 1)
        }
        i += 1
      }
      QSState(s.k, levels, flips)
    }

    override def reduce(s: QSState, x: Double): QSState = {
      val withX = QSState(s.k,
        s.levels.updated(0, s.levels.head :+ x), s.flips)
      if (withX.levels.head.size > s.k) compact(withX) else withX
    }

    override def merge(a: QSState, b: QSState): QSState = {
      val n = a.levels.size.max(b.levels.size)
      def pad(x: Seq[Seq[Double]]): Seq[Seq[Double]] =
        x ++ Seq.fill(n - x.size)(Seq.empty[Double])
      def padF(x: Seq[Long]): Seq[Long] = x ++ Seq.fill(n - x.size)(0L)
      val levels = pad(a.levels).zip(pad(b.levels)).map { case (x, y) => x ++ y }
      val flips = padF(a.flips).zip(padF(b.flips)).map { case (x, y) => x + y }
      compact(QSState(a.k.max(b.k), levels, flips))
    }

    override def finish(s: QSState): Seq[Double] = {
      val weighted = s.levels.zipWithIndex.flatMap { case (items, i) =>
        items.map(v => (v, 1L << i))
      }.sortBy(_._1)
      if (weighted.isEmpty) return qs.map(_ => Double.NaN)
      val total = weighted.map(_._2).sum
      qs.map { q =>
        val target = q * total
        var acc = 0L
        var ans = weighted.last._1
        var i = 0
        var done = false
        while (i < weighted.length && !done) {
          acc += weighted(i)._2
          if (acc >= target) { ans = weighted(i)._1; done = true }
          i += 1
        }
        ans
      }
    }

    override def bufferEncoder: Encoder[QSState] = Encoders.product[QSState]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
