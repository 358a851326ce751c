package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** [[TopKHeap]] / [[TopKDedupHeap]] unit laws, plus the DataFrame-level
  * equivalence the round-17 walk rewrite rests on: under the purity
  * contract (score a pure function of (group, id)) `topkDedup` over a
  * duplicate-bearing multiset equals `distinct()` + `topk`. */
class BoundedTopKSpec extends AnyFunSuite with Matchers {

  private def fScore(id: Long): Double = math.sin(id.toDouble) // pure, collisions unlikely

  test("TopKDedupHeap == distinct + TopKHeap on randomized pure-score streams") {
    val rng = new scala.util.Random(17)
    for (trial <- 1 to 50) {
      val k = 1 + rng.nextInt(8)
      // ids drawn WITH replacement — duplicates are the point
      val stream = Seq.fill(200)(rng.nextInt(40).toLong)
      val plain = new TopKHeap(k)
      stream.distinct.foreach(id => plain.insert(fScore(id), id))
      val dedup = new TopKDedupHeap(k)
      stream.foreach(id => dedup.insert(fScore(id), id))
      withClue(s"trial $trial k=$k: ") {
        dedup.sorted shouldBe plain.sorted
      }
    }
  }

  test("TopKDedupHeap: an evicted id can be re-offered without duplicating, ties break toward smaller id") {
    val h = new TopKDedupHeap(2)
    h.insert(1.0, 10L)
    h.insert(2.0, 20L)
    h.insert(3.0, 30L) // evicts id 10
    h.insert(1.0, 10L) // re-offered after eviction: loses the compare, stays out
    h.insert(3.0, 30L) // duplicate of a live id: skipped
    h.sorted shouldBe Seq((3.0, 30L), (2.0, 20L))
    // tie on score: smaller id wins the slot
    val t = new TopKDedupHeap(1)
    t.insert(1.0, 5L); t.insert(1.0, 3L); t.insert(1.0, 7L)
    t.sorted shouldBe Seq((1.0, 3L))
  }

  test("merge across dedup heaps preserves the one-entry-per-id invariant") {
    val a = new TopKDedupHeap(3)
    val b = new TopKDedupHeap(3)
    Seq(1L, 2L, 3L).foreach(id => a.insert(fScore(id), id))
    Seq(2L, 3L, 4L).foreach(id => b.insert(fScore(id), id))
    a.mergeFrom(b)
    val expected = new TopKHeap(3)
    Seq(1L, 2L, 3L, 4L).foreach(id => expected.insert(fScore(id), id))
    a.sorted shouldBe expected.sorted
  }
}
