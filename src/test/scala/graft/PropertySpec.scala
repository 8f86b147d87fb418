package graft

import graft.functions.WinnowFingerprints
import graft.status.StatusMachine
import graft.status.StatusMachine.{EntityType, Status}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property-based layer (SURVEY.md §5 item 4): invariants the reference
  * encodes imperatively, checked over seeded generated inputs
  * (deterministic — seed 42, 200 cases per property). Pure JVM, no
  * SparkSession.
  */
class PropertySpec extends AnyFunSuite {

  private def randWord(r: Random): String =
    (1 to (1 + r.nextInt(8))).map(_ => ('a' + r.nextInt(26)).toChar).mkString

  private def randText(r: Random, maxWords: Int = 20): String =
    (1 to (1 + r.nextInt(maxWords))).map(_ => randWord(r)).mkString(" ")

  test("shingle_set kernel: pure-JVM invariants over random texts") {
    import graft.functions.ShingleSet
    val r = new Random(44)
    (1 to 200).foreach { _ =>
      val t = randText(r)
      val arr = ShingleSet.evalText(UTF8String.fromString(t), 3)
      val shingles = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      // distinct, deterministic, and exactly the k-gram set of the split
      assert(shingles.distinct == shingles)
      val words = t.split(" ", -1)
      val expected = (0 until math.max(words.length - 2, 1))
        .map(i => words.slice(i, i + 3).mkString(" ")).distinct
      assert(shingles == expected, s"text=$t")
    }
  }

  test("repetition stats kernel: bounds and exactness over random texts") {
    import graft.functions.RepetitionStats
    val r = new Random(45)
    (1 to 200).foreach { _ =>
      val t = randText(r)
      val row = RepetitionStats.evalText(UTF8String.fromString(t))
      val n = row.getLong(0)
      val topFrac = row.getDouble(1)
      val dupFrac = row.getDouble(2)
      val words = t.split(" ", -1)
      assert(n == words.length)
      val expTop = words.groupBy(identity).values.map(_.length).max.toDouble / n
      assert(math.abs(topFrac - expTop) < 1e-12)
      assert(topFrac > 0 && topFrac <= 1.0)
      assert(dupFrac >= 0 && dupFrac < 1.0)
      if (words.length >= 2) {
        val bigrams = words.sliding(2).map(_.mkString("\u001f")).toSeq
        val expDup = (bigrams.length - bigrams.distinct.length).toDouble / bigrams.length
        assert(math.abs(dupFrac - expDup) < 1e-12)
      }
    }
  }

  test("winnowing: deterministic, nonempty, self-identical") {
    val r = new Random(42)
    (1 to 200).foreach { _ =>
      val t = randText(r)
      val a = WinnowFingerprints.fingerprints(t.getBytes, 5, 4)
      val b = WinnowFingerprints.fingerprints(t.getBytes, 5, 4)
      assert(a.sameElements(b) && a.nonEmpty)
    }
  }

  test("winnowing guarantee: shared substring ≥ w+k-1 chars → common fingerprint") {
    val r = new Random(43)
    var checked = 0
    while (checked < 200) {
      val shared = randText(r, 10)
      if (shared.length >= 5 + 4 - 1) {
        val a = (randText(r, 5) + " " + shared).getBytes
        val b = (shared + " " + randText(r, 5)).getBytes
        val fa = WinnowFingerprints.fingerprints(a, 5, 4)
        val fb = WinnowFingerprints.fingerprints(b, 5, 4)
        assert(fa.intersect(fb).nonEmpty,
          s"no common fingerprint for shared='$shared'")
        checked += 1
      }
    }
  }

  test("status machine: transition never accepts an illegal (type, status) pair") {
    val r = new Random(44)
    val names = Status.all.map(_.name) ++ Seq("bogus", "", "PUBLISHED ", "qa")
    (1 to 500).foreach { _ =>
      val e = EntityType.all(r.nextInt(EntityType.all.length))
      val s = names(r.nextInt(names.length))
      StatusMachine.transition(e, None, s) match {
        case Right(Some(next)) => assert(StatusMachine.isLegal(e, next))
        case Right(None) => fail("no-op without a current status")
        case Left(_) => ()
      }
    }
  }

  test("status machine: same-status requests always suppress") {
    EntityType.all.foreach { e =>
      StatusMachine.legalStatuses(e).foreach { s =>
        assert(StatusMachine.transition(e, Some(s), s.name) == Right(None))
        assert(StatusMachine.transition(e, Some(s), s.name.toUpperCase) == Right(None))
      }
    }
  }

  test("simhash vote-fold is token-order independent") {
    val r = new Random(45)
    (1 to 200).foreach { _ =>
      val ws = (1 to (1 + r.nextInt(30))).map(_ => randWord(r))
      assert(simhashOf(ws) == simhashOf(r.shuffle(ws)))
    }
  }

  private def simhashOf(tokens: Seq[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h = graft.functions.SimHash64.fnv1a64(UTF8String.fromString(t))
      (0 until 64).foreach { b =>
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
      }
    }
    (0 until 64).foldLeft(0L)((acc, b) => if (votes(b) > 0) acc | (1L << b) else acc)
  }
}
