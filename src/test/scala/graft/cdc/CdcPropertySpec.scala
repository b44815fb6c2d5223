package graft.cdc

import scala.collection.mutable
import scala.util.Random

import graft.SparkSpec
import CdcFixtures._

/**
 * SURVEY.md §5 property tests (seeded-random model-based checks):
 *  (a) applying a random consistent change log ≡ replaying it into a per-key
 *      map one event at a time (the reference's sequential loop,
 *      matomo2clickhouse.py:648-653);
 *  (b) idempotent replay — re-applying a suffix of the log is a no-op on the
 *      latest-wins view (the ReplacingMergeTree contract,
 *      reference: README.md:358-362);
 *  (c) dedup purge never removes a key's max-version row
 *      (reference: _settings.py:230-287).
 */
class CdcPropertySpec extends SparkSpec {

  type Row3 = (Option[Long], Option[String], Option[String])

  /** Generate a consistent change log: each UPDATE/DELETE's before-image is
    * the key's current model row, as a faithful row-binlog guarantees. */
  private def genLog(rnd: Random, nEvents: Int, nKeys: Int): (Seq[Ev], Map[Long, Row3]) = {
    val model = mutable.Map[Long, (String, Option[String])]()
    val evs = mutable.Buffer[Ev]()
    var v = 0L
    def freshName() = "n" + rnd.nextInt(1000)
    def freshNote() = if (rnd.nextBoolean()) Some("t" + rnd.nextInt(10)) else None
    (1 to nEvents).foreach { _ =>
      v += 1
      val key = 1L + rnd.nextInt(nKeys)
      model.get(key) match {
        case None =>
          val (n, t) = (freshName(), freshNote())
          evs += ins(v, key, n, t)
          model(key) = (n, t)
        case Some((curN, curT)) =>
          rnd.nextInt(10) match {
            case 0 | 1 =>
              evs += del(v, key, curN, curT)
              model.remove(key)
            case 2 =>
              // re-insert over existing key (latest-wins collision)
              val (n, t) = (freshName(), freshNote())
              evs += ins(v, key, n, t)
              model(key) = (n, t)
            case _ =>
              // update: mutate name and/or note (sometimes a no-op column)
              val n2 = if (rnd.nextBoolean()) freshName() else curN
              val t2 = if (rnd.nextBoolean()) freshNote() else curT
              evs += (("UPDATE", v,
                Some((Some(key), Some(curN), curT)),
                Some((Some(key), Some(n2), t2))): Ev)
              model(key) = (n2, t2)
          }
      }
    }
    (evs.toSeq, model.map { case (k, (n, t)) => k -> ((Some(k), Some(n), t): Row3) }.toMap)
  }

  test("property: batched applyMutable ≡ sequential per-key replay (3 seeds × random batch splits)") {
    Seq(1, 7, 42).foreach { seed =>
      val rnd = new Random(seed)
      val (log, expected) = genLog(rnd, nEvents = 40, nKeys = 6)
      // split the log into 1-4 sequential batches at random cut points
      val nBatches = 1 + rnd.nextInt(4)
      val cuts = (Seq(0, log.size) ++ Seq.fill(nBatches - 1)(rnd.nextInt(log.size + 1)))
        .sorted.distinct
      val batches = cuts.zip(cuts.tail).map { case (a, b) => log.slice(a, b) }
        .filter(_.nonEmpty)
      var st = state(spark, Nil)
      batches.foreach { b =>
        st = Cdc.applyMutable(st, changes(spark, b), Seq("id")).localCheckpoint()
      }
      val got = collectMutable(st).map { case (k, n, t) => k.get -> ((k, n, t): Row3) }.toMap
      assert(got == expected, s"seed=$seed batches=${batches.map(_.size)}")
    }
  }

  test("property: applyVersioned + latestWins ≡ sequential replay; purge never removes max") {
    Seq(3, 99).foreach { seed =>
      val rnd = new Random(seed)
      val (log, expected) = genLog(rnd, nEvents = 30, nKeys = 5)
      var h = history(spark, Nil)
      val mid = log.size / 2
      Seq(log.take(mid), log.drop(mid)).filter(_.nonEmpty).foreach { b =>
        h = Cdc.applyVersioned(h, changes(spark, b), Seq("id")).localCheckpoint()
      }
      val latest = collectVersioned(Cdc.latestWins(h, Seq("id")))
        .map { case (k, n, t, _) => k -> ((Some(k), n, t): Row3) }.toMap
      assert(latest == expected, s"seed=$seed")

      // (c) purge keeps exactly each key's max-version row among survivors
      val purged = collectVersioned(Cdc.dedupPurge(h, Seq("id")))
      val maxPerKey = collectVersioned(h).groupBy(_._1).map { case (k, rows) =>
        k -> rows.maxBy(_._4)
      }
      assert(purged == maxPerKey.values.toSet, s"seed=$seed purge")
    }
  }

  test("property: replaying a suffix twice is a no-op on the latest-wins view (ST3)") {
    Seq(5, 11).foreach { seed =>
      val rnd = new Random(seed)
      val (log, _) = genLog(rnd, nEvents = 30, nKeys = 5)
      val mid = log.size / 2
      val (prefix, suffix) = (log.take(mid), log.drop(mid))
      val base = Cdc.applyVersioned(history(spark, Nil), changes(spark, prefix), Seq("id"))
        .localCheckpoint()
      val once = Cdc.applyVersioned(base, changes(spark, suffix), Seq("id")).localCheckpoint()
      val twice = Cdc.applyVersioned(once, changes(spark, suffix), Seq("id")).localCheckpoint()
      val vOnce = collectVersioned(Cdc.latestWins(once, Seq("id")))
      val vTwice = collectVersioned(Cdc.latestWins(twice, Seq("id")))
      assert(vOnce == vTwice, s"seed=$seed")
    }
  }
}
