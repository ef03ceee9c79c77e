package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.SparkTestSession

/** SCHEMA-EVOLUTION FUZZ for the column mapping ([[ColumnMapping]]) —
  * the mechanical companion to TxnRenameSpec, same spirit as
  * [[VacuumLawsProps]]: drive a RANDOM interleave of
  * append / rename / drop / re-add / CoW delete / MoR delete /
  * delete-fold / compact / restore against a fresh table while
  * maintaining a DRIVER-SIDE MODEL of what every version must contain,
  * then assert:
  *
  *  1. the head reads exactly the model (columns, order, values, NULLs
  *     for rows born before a column — and for rows born before a
  *     column's REBIRTH: a dropped-then-re-added name must never
  *     resurrect old bytes);
  *  2. EVERY version time-travels to its own model state under its own
  *     era's names (schema and files travel together, incl. across
  *     restore);
  *  3. a range-pruned read by the id column's CURRENT logical name
  *     never loses an in-range row (pruning translated through the
  *     mapping stays sound at file granularity).
  *
  * Column identity in the model is a monotone counter (`mult`); a
  * column's value on a row is `id*1000 + mult`, so any cross-identity
  * mixup (rename aliasing the wrong field, a reborn column reading its
  * predecessor's bytes) changes exact values — nothing is asserted
  * "approximately". Restore reverts the model wholesale to the target
  * version's snapshot, exactly the format's schema-rides-with-files
  * contract. */
object MappingLawsProps extends Properties("graft.txn.mapping.laws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkTestSession.spark

  sealed private trait Op
  private case class Append(n: Int) extends Op
  private case class Rename(sel: Int, reuse: Boolean) extends Op
  private case class DropCol(sel: Int) extends Op
  private case class AddCol(reuse: Boolean) extends Op
  private case class CowDelete(sel: Int) extends Op
  private case class MorDelete(sel: Int) extends Op
  private case object FoldDeletes extends Op
  private case object Compact extends Op
  private case class PartialCompact(sel: Int) extends Op
  private case class Restore(sel: Int) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    5 -> Gen.chooseNum(1, 3).map(Append),
    4 -> Gen.zip(Gen.chooseNum(0, 7), Gen.oneOf(true, false))
      .map { case (s, r) => Rename(s, r) },
    3 -> Gen.chooseNum(0, 7).map(DropCol),
    3 -> Gen.oneOf(true, false).map(AddCol),
    2 -> Gen.chooseNum(0, 7).map(CowDelete),
    2 -> Gen.chooseNum(0, 7).map(MorDelete),
    1 -> Gen.const(FoldDeletes),
    2 -> Gen.const(Compact),
    2 -> Gen.chooseNum(0, 7).map(PartialCompact),
    2 -> Gen.chooseNum(0, 7).map(Restore),
  )

  private val caseGen: Gen[List[Op]] = Gen.listOfN(9, opGen)

  /** The driver-side model of one committed version: the id column's
    * current logical name, the live data columns in schema order
    * (logical name + frozen identity), every logical name the line has
    * ever used (for reuse-candidate selection — reverts with restore,
    * like the schema it mirrors), and per-row the set of column
    * identities live at the row's append (anything else reads NULL). */
  private case class ColM(logical: String, mult: Long)
  private case class State(idName: String, cols: Vector[ColM],
                           used: Set[String], rows: Map[Long, Set[Long]]) {
    def liveNames: Set[String] = cols.map(_.logical).toSet + idName
    def expected: Set[Seq[Any]] = rows.map { case (id, born) =>
      (id: Any) +: cols.map(c =>
        if (born.contains(c.mult)) (id * 1000L + c.mult): Any else null)
    }.toSet
    def colNames: Seq[String] = idName +: cols.map(_.logical)
  }

  property("every version reads its own model across random evolution") =
    Prop.forAll(caseGen) { ops =>
      val root = Files.createTempDirectory("txn_mapping_fuzz").toString + "/tbl"
      val s = spark
      import s.implicits._
      var nextId = 0L
      var nextMult = 1L // column identities + fresh-name counter (global:
                        // a restore must not let fresh names collide)
      var st = State("id", Vector.empty, Set("id"), Map.empty)
      val history = scala.collection.mutable.Map.empty[Long, State]
      def record(): Unit =
        history(TxnTable.latest(spark, root).get.version) = st
      def liveIds: Seq[Long] = st.rows.keys.toSeq.sorted
      def appendRows(n: Int): Unit = {
        val ids = (nextId until nextId + n); nextId += n
        var df = ids.toDF(st.idName)
        st.cols.foreach { c =>
          df = df.withColumn(c.logical, col(st.idName) * 1000L + lit(c.mult)) }
        TxnTable.append(spark, root, df.repartition(1))
        val born = st.cols.map(_.mult).toSet
        st = st.copy(rows = st.rows ++ ids.map(_ -> born))
        record()
      }
      def freshName(): String = { val n = s"c$nextMult"; nextMult += 1; n }
      def foldIfMor(): Unit =
        if (TxnTable.latest(spark, root).exists(_.deletes.nonEmpty)) {
          TxnTable.compactDeletes(spark, root); record()
        }
      appendRows(2) // first append records the schema (stats on id)
      TxnTable.alterTable(spark, root, newStatsCols = Some(Seq(st.idName)))
      record()
      ops.foreach {
        case Append(n) => appendRows(n)
        case Rename(sel, reuse) =>
          val reusable = (st.used -- st.liveNames).toSeq.sorted
          val to = if (reuse && reusable.nonEmpty) reusable(sel % reusable.size)
                   else freshName()
          val slots = st.idName +: st.cols.map(_.logical)
          val from = slots(sel % slots.size)
          TxnTable.alterTable(spark, root, renames = Seq(from -> to))
          st =
            if (from == st.idName) st.copy(idName = to, used = st.used + to)
            else st.copy(cols = st.cols.map(c =>
              if (c.logical == from) c.copy(logical = to) else c),
              used = st.used + to)
          record()
        case DropCol(sel) => if (st.cols.nonEmpty) {
          val victim = st.cols(sel % st.cols.size)
          TxnTable.alterTable(spark, root, drops = Seq(victim.logical))
          st = st.copy(cols = st.cols.filterNot(_.mult == victim.mult))
          record()
        }
        case AddCol(reuse) =>
          val reusable = (st.used -- st.liveNames).toSeq.sorted
          val name = if (reuse && reusable.nonEmpty) reusable.head
                     else freshName()
          val lv = ColumnMapping.logicalView(
            TxnTable.latest(spark, root).get.schema.get)
          TxnTable.alterTable(spark, root,
            newSchema = Some(lv.add(name, LongType, nullable = true)))
          st = st.copy(cols = st.cols :+ ColM(name, nextMult),
            used = st.used + name)
          nextMult += 1
          record()
        case CowDelete(sel) => if (liveIds.nonEmpty) {
          foldIfMor() // deleteWhere refuses while MoR deletes are live
          if (liveIds.nonEmpty) {
            val k = liveIds(sel % liveIds.size)
            TxnTable.deleteWhere(spark, root,
              col(st.idName) === k, Some((k, k)))
            st = st.copy(rows = st.rows - k)
            record()
          }
        }
        case MorDelete(sel) => if (liveIds.nonEmpty) {
          val k = liveIds(sel % liveIds.size)
          TxnTable.deleteKeysMor(spark, root, st.idName,
            Seq(k).toDF(st.idName))
          st = st.copy(rows = st.rows - k)
          record()
        }
        case FoldDeletes => foldIfMor()
        case Compact =>
          if (TxnTable.latest(spark, root).exists(_.files.nonEmpty)) {
            TxnTable.compactTxn(spark, root, targetFiles = 1)
            record()
          }
        case PartialCompact(sel) => if (liveIds.nonEmpty) {
          // a scoped rewrite addressed by the CURRENT id name (the
          // bounds criterion translates through the mapping); content
          // must be unaffected, so the model does not change
          val lo = liveIds(sel % liveIds.size)
          val before = TxnTable.latest(spark, root).get.version
          TxnTable.compactWhere(spark, root, targetFiles = 1,
            bounds = Seq((st.idName, lo, lo + 3)))
          if (TxnTable.latest(spark, root).get.version != before) record()
        }
        case Restore(sel) =>
          val vs = TxnTable.versions(spark, root)
          val head = vs.max
          val targets = vs.filter(_ < head)
          if (targets.nonEmpty) {
            val v = targets(sel % targets.size)
            TxnTable.restore(spark, root, v)
            st = history(v)
            record()
          }
      }
      def got(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
        df.collect().map(_.toSeq).toSet
      // ---- law 1: the head reads the model exactly ----
      val headDf = TxnTable.read(spark, root)
      val headOk = ((headDf.columns.toSeq == st.colNames) :|
        s"head columns ${headDf.columns.toSeq} != model ${st.colNames}") &&
        ((got(headDf) == st.expected) :| "head contents != model")
      // ---- law 2: every version time-travels to its own model ----
      val travelOk = Prop.all(TxnTable.versions(spark, root).map { v =>
        val m = history(v)
        val df = TxnTable.readAsOf(spark, root, v)
        ((df.columns.toSeq == m.colNames) :|
          s"v$v columns ${df.columns.toSeq} != model ${m.colNames}") &&
          ((got(df) == m.expected) :| s"v$v contents != model")
      }: _*)
      // ---- law 3: pruned read by the current id name loses nothing ----
      val prunedOk =
        if (liveIds.isEmpty ||
            TxnTable.latest(spark, root).exists(_.deletes.nonEmpty)) Prop.passed
        else {
          val (lo, hi) = (liveIds.head, liveIds(liveIds.size / 2))
          val ids = got(TxnTable.readPruned(spark, root, st.idName, lo, hi)
            .select(st.idName)).map(_.head.asInstanceOf[Long])
          val want = st.rows.keySet.filter(k => k >= lo && k <= hi)
          ((want.subsetOf(ids)) :| s"pruned read lost in-range ids " +
            s"${want -- ids}") &&
            ((ids.subsetOf(st.rows.keySet)) :|
              "pruned read resurrected deleted ids")
        }
      headOk && travelOk && prunedOk
    }
}
