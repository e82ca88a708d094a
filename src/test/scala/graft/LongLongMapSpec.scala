package graft

import graft.core.LongLongMap
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class LongLongMapSpec extends AnyFunSuite {

  test("put/putIfAbsent/update/apply/contains match java.util.HashMap over random ops") {
    val rnd = new Random(42)
    val m = new LongLongMap(16)
    val ref = new java.util.HashMap[Long, Long]()
    for (_ <- 1 to 200000) {
      val k = rnd.nextLong(5000) - 1000 // negatives too; collisions likely
      rnd.nextInt(4) match {
        case 0 =>
          val v = rnd.nextLong()
          m.put(k, v); ref.put(k, v)
        case 1 =>
          val v = rnd.nextLong()
          if (!ref.containsKey(k)) { m.putIfAbsent(k, v); ref.put(k, v) }
          else m.putIfAbsent(k, v) // must be a no-op
        case 2 =>
          if (ref.containsKey(k)) { val v = rnd.nextLong(); m(k) = v; ref.put(k, v) }
        case 3 =>
          assert(m.contains(k) == ref.containsKey(k), s"contains($k)")
          if (ref.containsKey(k)) assert(m(k) == ref.get(k), s"apply($k)")
      }
    }
    assert(m.size == ref.size)
    var seen = 0
    m.foreachEntry { (k, v) =>
      assert(ref.containsKey(k) && ref.get(k) == v, s"entry ($k,$v)")
      seen += 1
    }
    assert(seen == ref.size)
  }

  test("growth across many sequential keys (the doc-id shape)") {
    val m = new LongLongMap(16)
    (0L until 300000L).foreach(k => m.putIfAbsent(k, k * 2))
    assert(m.size == 300000)
    (0L until 300000L by 7919).foreach(k => assert(m(k) == k * 2))
  }

  test("apply on a missing key throws; sentinel key rejected") {
    val m = new LongLongMap()
    m.put(1L, 2L)
    intercept[NoSuchElementException](m(99L))
    intercept[NoSuchElementException](m(3L) = 4L)
    intercept[IllegalArgumentException](m.put(Long.MinValue, 0L))
  }
}
