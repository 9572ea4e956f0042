package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Cache lifetime gates: operators that persist a shared intermediate
  * (IVF's scored projection, q20's range-partitioned base, the BPE
  * trainer's epoch bases) must leave the session's cache manager EMPTY
  * once their consuming action completes — a long-lived session
  * composing operators must not accumulate cached relations
  * (ScopedCaches releases on the listener sweep; the trainer releases
  * deterministically before returning).
  */
class CacheHygieneSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    graft.GraftSession.builder("local[4]", 4).getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  /** The release listener rides the async listener bus; poll briefly. */
  private def awaitEmptyCache(what: String): Unit = {
    val cm = spark.sharedState.cacheManager
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!cm.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cm.isEmpty, s"$what left cached relations in the session")
  }

  for (name <- Seq("sim4_ivf_ann_top1", "sim5_ivf_ann_topk",
      "q20_ntile_quartiles", "tx25_bpe_train_loop",
      "dd13_dup_graph_pagerank", "tx29_changelog_apply")) {
    test(s"$name: cache manager is empty after the consuming action") {
      spark.sharedState.cacheManager.clearCache()
      Registry.byName(name).fn(spark, dir).count()
      awaitEmptyCache(name)
    }
  }

  test("a scoped cache survives unrelated actions until ITS consumer " +
      "runs — release keys on materialization, not on any action") {
    spark.sharedState.cacheManager.clearCache()
    val df = Registry.byName("sim4_ivf_ann_top1").fn(spark, dir)
    // unrelated actions must not evict the still-unmaterialized cache
    spark.range(10).count()
    spark.range(10).count()
    Thread.sleep(500) // give the sweep every chance to misfire
    assert(!spark.sharedState.cacheManager.isEmpty,
      "the scoped projection must stay registered until sim4 executes")
    df.count()
    awaitEmptyCache("sim4 after its own action")
  }
}
