package graft

import graft.operators.MultiModal

class MultiModalSpec extends SparkSpec {

  test("decode kernel emits fixed-width features and is deterministic") {
    val a = MultiModal.decode(spark, sf).orderBy("doc_id").collect()
    val b = MultiModal.decode(spark, sf).orderBy("doc_id").collect()
    assert(a.length > 0)
    assert(a.forall(_.features.length == 8))
    assert(a.map(_.checksum).sameElements(b.map(_.checksum)))
  }

  test("mm2 driver surface exposes scalar digests consistent with decode") {
    val digests = MultiModal.mm2.build(spark, sf).orderBy("doc_id").collect()
    val full = MultiModal.decode(spark, sf).orderBy("doc_id").collect()
    digests.zip(full).foreach { case (row, f) =>
      assert(row.getLong(0) === f.doc_id)
      assert(row.getLong(2) === f.checksum)
      assert(row.getInt(3) === f.features.length)
      assert(row.getDouble(5) === f.features.sum.toDouble)
    }
  }

  test("byte length matches utf-8 payload size") {
    val rows = MultiModal.decode(spark, sf).orderBy("doc_id").limit(5).collect()
    val docs = graft.core.Tables.documents(spark, sf).orderBy("doc_id").limit(5).collect()
    rows.zip(docs).foreach { case (f, d) =>
      assert(f.byte_len === d.getString(1).getBytes("UTF-8").length)
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
