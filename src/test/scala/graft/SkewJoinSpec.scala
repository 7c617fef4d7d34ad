package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows on skewed data") {
    val s = spark
    import s.implicits._
    // 90% of rows share one hot key
    val big = (1 to 1000).map(i =>
      (if (i <= 900) "hot" else s"k$i", i.toLong)).toDF("key", "payload")
    val small = Seq(("hot", "H"), ("k950", "A"), ("k999", "B"), ("miss", "M"))
      .toDF("key", "tag")

    val plain = big.join(small, Seq("key"))
      .select("key", "payload", "tag").orderBy("payload").collect().toSeq
    val salted = SkewJoin.saltedInnerJoin(big, small, "key", Seq("payload"), 8)
      .select("key", "payload", "tag").orderBy("payload").collect().toSeq
    assert(salted == plain)
    assert(plain.size == 902)
  }

  test("hot key actually fans out across salt values") {
    val s = spark
    import s.implicits._
    val big = (1 to 500).map(i => ("hot", i.toLong)).toDF("key", "payload")
    val fanout = big
      .withColumn("_salt", pmod(hash(col("payload")), lit(8)))
      .select("_salt").distinct().count()
    assert(fanout == 8)
  }
}
