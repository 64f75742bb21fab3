package graft.operators

import graft.SparkSpec

/** q51: ancestor doubling must assign the same depth a sequential
  * parent-pointer chase does, for every node of the derived forest.
  */
class HierarchySpec extends SparkSpec {

  test("doubling depths == sequential parent-chase depths") {
    val got = Hierarchy.q51Hierarchy(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild the identical forest driver-side
    val keys = graft.Tables(spark, sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0)).sorted
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val parent = keys.map { k =>
      k -> (if (k == 0) -1L
            else java.lang.Long.parseLong(
              md5hex(s"h:$k").take(15), 16) % k)
    }.toMap
    val depthMemo = scala.collection.mutable.Map[Long, Long](0L -> 0L)
    def depth(k: Long): Long =
      depthMemo.getOrElseUpdate(k, depth(parent(k)) + 1)
    val expected = keys.map(k => k -> depth(k)).toMap
    assert(got === expected)
    // sanity: the random recursive tree is non-trivial
    assert(expected.values.max >= 3)
  }

  test("gapped keyspace: absent parents make roots, no node dropped") {
    // shard-offset keys like the make_scale sf1 fixture: most derived
    // parents of the second shard land in the [100, 100000) gap
    import spark.implicits._
    val keys: Seq[Long] = (0L until 100L) ++ (100000L until 100100L)
    val got = Hierarchy.depths(keys.toDF("k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val keySet = keys.toSet
    val parent = keys.map { k =>
      val p = if (k == 0) -1L
        else java.lang.Long.parseLong(md5hex(s"h:$k").take(15), 16) % k
      k -> (if (p >= 0 && keySet.contains(p)) p else -1L)
    }.toMap
    val memo = scala.collection.mutable.Map[Long, Long]()
    def depth(k: Long): Long = memo.getOrElseUpdate(k,
      if (parent(k) == -1L) 0L else depth(parent(k)) + 1)
    val expected = keys.map(k => k -> depth(k)).toMap
    assert(got === expected)
    // every node present; the gap really produced extra roots
    assert(got.size === keys.size)
    assert(got.count(_._2 == 0L) > 1)
  }
}
