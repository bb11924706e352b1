package graft.plans

import scala.collection.mutable

/** Misra-Gries bounded-state heavy-hitter pass (Misra & Gries 1982,
  * "Finding repeated elements"): at most `capacity` counters; an unseen
  * item with a full table decrements EVERY counter and evicts zeros
  * instead of being inserted.
  *
  * Guarantee used by `agg_freq_items_misra_gries`: any item occurring more
  * than n/(capacity+1) times in the scanned stream survives to the output
  * (its net count — increments minus shared decrements — stays positive).
  * Run per partition inside mapPartitions, the union of partition outputs
  * is therefore a superset of every item with GLOBAL frequency >
  * n/(capacity+1) (pigeonhole over partition-local counts), which is what
  * makes the exact-confirm second pass partitioning-independent.
  */
object MisraGries {

  /** Surviving candidate items of one stream, in no particular order. */
  def candidates(it: Iterator[String], capacity: Int): Iterator[String] = {
    require(capacity > 0, "capacity must be positive")
    val counters = mutable.HashMap.empty[String, Long]
    it.foreach { tok =>
      counters.get(tok) match {
        case Some(c) => counters(tok) = c + 1
        case None if counters.size < capacity => counters(tok) = 1L
        case None =>
          val dead = counters.iterator.collect { case (t, 1L) => t }.toList
          counters.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(counters.remove)
      }
    }
    counters.keysIterator
  }
}
