package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.streaming.Throttle

/** Laws for the throttle's pure fold (the streaming operator's core):
  * kept-set invariants that must hold for ANY event-time sequence and
  * carried state, plus the batch-split consistency that makes the
  * cross-micro-batch behavior principled. */
object ThrottleLawsProps extends Properties("graft.throttle.laws") {

  private val W = 30L // window

  private val timesGen: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 300L)).map(_.sorted)

  private val stateGen: Gen[Option[Long]] =
    Gen.option(Gen.chooseNum(-50L, 300L))

  property("kept times are > window apart, and nothing keepable was dropped") =
    Prop.forAll(timesGen, stateGen) { (ts, st) =>
      val (kept, last) = Throttle.foldKept(ts, st, W)
      val anchors = st.toList ++ kept
      // consecutive anchors (carried state, then kept times) each clear
      // the window — the "at most one per window from last KEPT" claim
      val spaced = anchors.sliding(2).forall {
        case Seq(a, b) => b > a + W
        case _         => true
      }
      // completeness: every dropped event is within the window of the
      // nearest preceding anchor (i.e. it HAD to be dropped)
      val keptSet = kept.toSet
      val justified = ts.filterNot(keptSet.contains).forall { t =>
        // some anchor's window covers t (for an out-of-order event vs
        // the carried state, that anchor may be LATER than t), or t is
        // a tie-duplicate of a kept time
        anchors.exists(a => t <= a + W) || keptSet.contains(t)
      }
      // new state is the last kept time (or the carried state if none)
      val stateOk = last == (st.toList ++ kept).lastOption
      spaced && justified && stateOk
    }

  property("splitting the stream at any batch boundary changes nothing") =
    Prop.forAll(timesGen, Gen.chooseNum(0, 50)) { (ts, cut) =>
      val k = math.min(cut, ts.length)
      val (a, b) = ts.splitAt(k)
      val whole = Throttle.foldKept(ts, None, W)
      val (k1, s1) = Throttle.foldKept(a, None, W)
      val (k2, s2) = Throttle.foldKept(b, s1, W)
      (k1 ++ k2, s2) == whole
    }
}
