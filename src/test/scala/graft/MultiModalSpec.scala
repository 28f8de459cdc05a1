package graft

import graft.operators.MultiModal

class MultiModalSpec extends SparkSpec {

  test("decode kernel emits fixed-width features and is deterministic") {
    val a = MultiModal.mm2.build(spark, sf).orderBy("doc_id").collect()
    val b = MultiModal.mm2.build(spark, sf).orderBy("doc_id").collect()
    assert(a.length > 0)
    assert(a.forall(_.getAs[Seq[Float]]("features").length == 8))
    assert(a.map(_.getLong(2)).sameElements(b.map(_.getLong(2)))) // checksums stable
  }

  test("byte length matches utf-8 payload size") {
    val rows = MultiModal.mm2.build(spark, sf).orderBy("doc_id").limit(5).collect()
    val docs = graft.core.Tables.documents(spark, sf).orderBy("doc_id").limit(5).collect()
    rows.zip(docs).foreach { case (f, d) =>
      assert(f.getInt(1) === d.getString(1).getBytes("UTF-8").length)
    }
  }

  test("decodeStub is pure") {
    val payload = "hello multimodal".getBytes("UTF-8")
    val (crcA, featA) = MultiModal.decodeStub(payload)
    val (crcB, featB) = MultiModal.decodeStub(payload)
    assert(crcA === crcB)
    assert(featA.toSeq === featB.toSeq)
    assert(MultiModal.decodeStub(Array.emptyByteArray)._2.forall(_ == 0f))
  }
}
