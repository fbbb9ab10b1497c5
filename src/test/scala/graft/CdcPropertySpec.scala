package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.catalog.SnapshotCatalog

/** Property-style check of the round-12 row-level-delete semantics:
  * random CDC batch sequences (equality-delete + append commits) are
  * applied BOTH through the catalog and a driver-side reference map,
  * with compactions, positional deletes, and identity copy-on-write
  * rewrites (the delete-carry path) interleaved at random — after
  * every step the table must read exactly the reference state, and
  * every suffix window's changelog must replay the from-state into
  * the final state. This is the adversarial composition the unit
  * tests can't enumerate: sequence-gated equality deletes over files
  * of mixed commit eras, folded and carried through rewrites.
  */
class CdcPropertySpec extends SparkTestBase {

  import spark.implicits._

  private sealed trait Step
  private case class CdcBatch(upserts: Map[Long, Double],
      deletes: Set[Long]) extends Step
  private case object Compact extends Step
  private case object BinPack extends Step
  private case object RenameKey extends Step
  private case class PosDelete(key: Long) extends Step
  private case class IdentityRewrite(nth: Int) extends Step

  private val genKey = Gen.chooseNum(0L, 15L)
  private val genStep: Gen[Step] = Gen.frequency(
    (5, for {
      nUp <- Gen.chooseNum(0, 4)
      ups <- Gen.listOfN(nUp, for {
        k <- genKey; v <- Gen.chooseNum(1, 99)
      } yield k -> v.toDouble)
      nDel <- Gen.chooseNum(0, 3)
      dels <- Gen.listOfN(nDel, genKey)
    } yield CdcBatch(ups.toMap, dels.toSet -- ups.map(_._1))),
    (2, Gen.const(Compact)),
    // round-13 paths under the same adversarial composition: the
    // per-file-group maintenance rewrite (delete folding + candidate
    // pruning) and a RENAME of the eq-delete KEY column mid-stream
    (2, Gen.const(BinPack)),
    (1, Gen.const(RenameKey)),
    (2, genKey.map(PosDelete)),
    (2, Gen.chooseNum(0, 7).map(IdentityRewrite)))

  private val scenarios: List[List[Step]] = {
    val g = Gen.listOfN(6, Gen.listOfN(9, genStep))
    g.apply(Gen.Parameters.default, rng.Seed(4242L))
      .getOrElse(sys.error("gen failed"))
  }

  test("random CDC/compact/rewrite sequences: table state equals the " +
      "reference model at every step; changelog replays every window") {
    scenarios.zipWithIndex.foreach { case (steps, si) =>
      val cat = new SnapshotCatalog(spark, tmpDir(s"graft-cdcprop-$si"))
      cat.createTable("db", "t",
        Seq.empty[(Long, Double)].toDF("id", "v").schema)
      // seed state: keys 0..7
      var ref: Map[Long, Double] = (0L until 8L).map(k => k -> k.toDouble).toMap
      cat.append("db", "t", ref.toSeq.toDF("id", "v").coalesce(2))
      // the key column's CURRENT declared name (RenameKey flips it) —
      // batches and reads must always speak the current schema, while
      // eq-delete files written under the OLD name keep applying
      var keyName = "id"
      def state(): Map[Long, Double] = cat.read("db", "t")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val checkpoints = scala.collection.mutable.ListBuffer[
        (Long, Map[Long, Double])]()

      steps.zipWithIndex.foreach { case (step, i) =>
        step match {
          case CdcBatch(ups, dels) =>
            cat.cdcUpsert("db", "t",
              rows = ups.toSeq.toDF(keyName, "v"),
              deletes = dels.toSeq.toDF(keyName), Seq(keyName))
            ref = ref -- dels ++ ups
          case Compact =>
            cat.compact("db", "t", numFiles = 2)
          case BinPack =>
            // every test file is tiny, so this folds the whole delete
            // side through the candidate-pruned per-group path
            cat.compactFileGroups("db", "t"): Unit
          case RenameKey =>
            val next = if (keyName == "id") "ident" else "id"
            cat.renameColumn("db", "t", keyName, next)
            keyName = next
          case PosDelete(k) =>
            val meta = cat.describe("db", "t")
            val snap = meta.currentSnapshot.get
            val schema = cat.schemaOf("db", "t")
            val pos = cat
              .readFilesWithRowId(snap, schema, snap.files, meta.fieldIds)
              .filter(col(keyName) === k)
              .select(SnapshotCatalog.RowIdFileCol,
                SnapshotCatalog.RowIdPosCol)
            cat.addDeleteFile("db", "t", pos, None)
            ref = ref - k
          case IdentityRewrite(nth) =>
            val snap = cat.describe("db", "t").currentSnapshot.get
            if (snap.files.nonEmpty) {
              val target = snap.files(nth % snap.files.size)
              cat.rewriteFiles("db", "t", Seq(target), d => d, None)
            }
        }
        val got = state()
        assert(got == ref,
          s"scenario $si step $i ($step): table=$got ref=$ref")
        val snap = cat.describe("db", "t").currentSnapshot.get
        // manifest arithmetic, whenever it claims to be provable
        snap.statsRowCount.foreach(n =>
          assert(n == ref.size,
            s"scenario $si step $i: statsRowCount=$n ref=${ref.size}"))
        checkpoints += ((snap.snapshotId, ref))
      }

      // changelog replay: every recorded window must transform its
      // from-state into the final state. Windows crossing a COMPACTION
      // now DECOMPOSE into ordinal-ordered runs (round 15 — replace
      // snapshots are content-preserving and contribute nothing), so
      // the replay applies run by run; only a row-CHANGING rewrite
      // still refuses (identity is genuinely gone there)
      val finalRef = ref
      checkpoints.toList.foreach { case (fromSnap, fromState) =>
        try {
          val changes = cat.readChangelog("db", "t", fromSnap).collect()
          val byOrd = changes.groupBy(_.getInt(3)).toSeq.sortBy(_._1)
          var state = fromState
          byOrd.foreach { case (_, rows) =>
            val dels = rows.filter(_.getString(2) == "delete")
              .map(_.getLong(0)).toSet
            val ins = rows.filter(_.getString(2) == "insert")
              .map(r => r.getLong(0) -> r.getDouble(1)).toMap
            state = (state -- dels) ++ ins
          }
          assert(state == finalRef,
            s"scenario $si from snapshot $fromSnap: replay=$state " +
              s"final=$finalRef (changes=${changes.toSeq})")
        } catch {
          case _: IllegalStateException => () // row-changing rewrite inside
        }
      }
    }
  }
}
