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
}
