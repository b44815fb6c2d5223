package graft

import org.apache.spark.storage.StorageLevel

class CachingSpec extends SparkSpec {

  test("scoped persists once per plan and releaseAll unpersists everything") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x").filter($"x" > 1)
    val first = Caching.scoped(df)
    assert(first.storageLevel == StorageLevel.MEMORY_AND_DISK)
    // same plan scoped again: reused silently, still one cache entry
    val again = Caching.scoped(Seq(1, 2, 3).toDF("x").filter($"x" > 1))
    assert(again.storageLevel == StorageLevel.MEMORY_AND_DISK)
    Caching.releaseAll()
    assert(df.storageLevel == StorageLevel.NONE)
    // releasing twice is a no-op, and scoping works again afterwards
    Caching.releaseAll()
    val back = Caching.scoped(df)
    assert(back.storageLevel == StorageLevel.MEMORY_AND_DISK)
    Caching.releaseAll()
  }

  test("scope releases exactly its own frames — outer caches survive") {
    import spark.implicits._
    val outer = Caching.scoped(Seq(1, 2).toDF("a").filter($"a" > 0))
    val inner = Caching.scope {
      val i = Caching.scoped(Seq(3, 4).toDF("b").filter($"b" > 3))
      assert(i.storageLevel == StorageLevel.MEMORY_AND_DISK)
      // a nested scope releases its frame at ITS exit, not the outer's
      val n = Caching.scope {
        Caching.scoped(Seq(5).toDF("c").filter($"c" > 0))
      }
      assert(n.storageLevel == StorageLevel.NONE)
      assert(i.storageLevel == StorageLevel.MEMORY_AND_DISK)
      i
    }
    // the scope closed: its frame is gone, the scope-less one survives
    assert(inner.storageLevel == StorageLevel.NONE)
    assert(outer.storageLevel == StorageLevel.MEMORY_AND_DISK)
    // a failing body still releases its scope
    var failing: org.apache.spark.sql.DataFrame = null
    intercept[RuntimeException] {
      Caching.scope {
        failing = Caching.scoped(Seq(6).toDF("d").filter($"d" > 0))
        assert(failing.storageLevel == StorageLevel.MEMORY_AND_DISK)
        throw new RuntimeException("boom")
      }
    }
    assert(failing.storageLevel == StorageLevel.NONE)
    assert(outer.storageLevel == StorageLevel.MEMORY_AND_DISK)
    Caching.releaseAll()
    assert(outer.storageLevel == StorageLevel.NONE)
  }
}
