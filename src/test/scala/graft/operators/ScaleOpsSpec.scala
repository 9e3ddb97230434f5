package graft.operators

import graft.SparkSpec
import graft.sources.AcghMelt
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedDistinctCount equals plain countDistinct") {
    val df = (1 to 500).map(i => ("hot", i % 37)) ++ Seq(("cold", 1), ("cold", 2))
    val in = df.toDF("k", "e")
    val salted = Skew.saltedDistinctCount(in, "k", "e", buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = in.groupBy($"k").agg(countDistinct($"e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("hot") == 37)
  }

  test("saltedJoin equals plain join") {
    val fact = (1 to 100).map(i => (if (i % 10 == 0) "k1" else "k2", i)).toDF("k", "v")
    val dim = Seq(("k1", "A"), ("k2", "B")).toDF("k", "label")
    val salted = Skew.saltedJoin(fact, dim, "k", spreadCols = Seq("v"))
      .groupBy($"label").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = fact.join(dim, "k")
      .groupBy($"label").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}

class AcghMeltSpec extends SparkSpec {
  import spark.implicits._

  test("7-column group melt to per-sample rows") {
    val df = Seq(
      ("r1", "0.1", "0.2", "0", "0.0", "0.9", "0.1", "0.0",
             "1.1", "1.2", "1", "0.1", "0.8", "0.1", "0.0"))
      .toDF("region_id",
        "S1.chip", "S1.segmented", "S1.flag", "S1.probloss", "S1.probnorm",
        "S1.probgain", "S1.probamp",
        "S2.chip", "S2.segmented", "S2.flag", "S2.probloss", "S2.probnorm",
        "S2.probgain", "S2.probamp")
    val m = AcghMelt.melt(df)
    assert(m.count() == 2)
    val s2 = m.filter($"sample_id" === "S2").collect()(0)
    assert(s2.getAs[String]("chip") == "1.1" && s2.getAs[String]("flag") == "1")
    assert(m.columns.toSeq ==
      Seq("region_id", "sample_id") ++ AcghMelt.Metrics)
  }
}

class SecurityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("i2b2_secure tokens, upsert, token swap") {
    val i2b2 = Seq(("\\S\\A\\", 2)).toDF("c_fullname", "c_hlevel")
    val sec = SecurityOps.rebuildI2b2Secure(i2b2, "GS1", secure = true).collect()(0)
    assert(sec.getAs[String]("secure_obj_token") == "EXP:GS1")
    val pub = SecurityOps.rebuildI2b2Secure(i2b2, "GS1", secure = false).collect()(0)
    assert(pub.getAs[String]("secure_obj_token") == "EXP:PUBLIC")

    val existing = Seq(("GS1", "Old title"), ("GS2", "Other")).toDF("accession", "title")
    val up = SecurityOps.upsertBioExperiment(existing, "GS1", "New title")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(up == Map("GS1" -> "New title", "GS2" -> "Other"))

    val tokens = Seq(("EXP:GS1", 1), ("EXP:GS9", 2)).toDF("token", "x")
    val swapped = SecurityOps.swapSecurityTokens(tokens, "token", "GS1", "GS5")
      .collect().map(_.getString(0)).toSet
    assert(swapped == Set("EXP:GS5", "EXP:GS9"))
  }
}
