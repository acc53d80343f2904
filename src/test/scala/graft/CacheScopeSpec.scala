package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.ops.CacheScope

class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  // distinct plans per test so cache-manager entries never collide
  // across tests or suites
  private def df(tag: Int) =
    (1 to 100).toDF("v").filter(col("v") % 97 =!= tag).select((col("v") * tag).as("x"))

  test("outside any scope: persist is plain — relation stays cached (bench family sharing)") {
    val d = CacheScope.persist(df(2))
    d.count()
    assert(d.storageLevel != StorageLevel.NONE)
    d.unpersist()
  }

  test("scoped: persist acquired inside is released on exit, after being live mid-scope") {
    val d = df(3)
    CacheScope.scoped {
      CacheScope.persist(d)
      d.count()
      assert(d.storageLevel != StorageLevel.NONE, "cache must be live inside the scope")
    }
    assert(d.storageLevel == StorageLevel.NONE, "cache must be released at scope exit")
  }

  test("scoped: release runs on the exception path") {
    val d = df(5)
    intercept[RuntimeException] {
      CacheScope.scoped {
        CacheScope.persist(d)
        d.count()
        throw new RuntimeException("boom")
      }
    }
    assert(d.storageLevel == StorageLevel.NONE)
  }

  test("ownership: a nested scope never releases a cache its outer scope acquired") {
    val d = df(7)
    CacheScope.scoped {
      CacheScope.persist(d)
      d.count()
      CacheScope.scoped {
        // same canonical plan: already cached → no-op, NOT re-registered
        CacheScope.persist(df(7))
      }
      // inner scope exited; the outer acquisition must survive
      assert(d.storageLevel != StorageLevel.NONE,
        "inner scope released a cache the outer scope owns")
    }
    assert(d.storageLevel == StorageLevel.NONE)
  }

  test("ownership: a scope never releases a cache persisted before it opened") {
    val d = df(11)
    d.persist(); d.count()
    CacheScope.scoped { CacheScope.persist(df(11)) } // already cached → not acquired
    assert(d.storageLevel != StorageLevel.NONE,
      "scope released a pre-existing un-scoped cache")
    d.unpersist()
  }
}
