package graft.operators

import graft.api.GraftQuery
import graft.core.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque binary payload + typed metadata. */
final case class MediaRecord(doc_id: Long, payload: Array[Byte], lang: String, n_chars: Long)

/** Extracted features for one media record. */
final case class MediaFeatures(
    doc_id: Long,
    byte_len: Int,
    checksum: Long,
    features: Array[Float])

/** Multimodal column handling: image/audio/video travel as opaque `binary`
  * columns with typed metadata; decode / feature-extract runs as a
  * partition-wise typed kernel (`mapPartitions`) so each task amortizes
  * codec setup over its whole batch — the Scala analogue of the reference
  * stack's `mapInPandas` batching.
  *
  * STUB NOTE: no image/audio codecs exist in this container, so
  * [[MultiModal.decodeStub]] is a clearly-marked deterministic fake. The
  * Spark-side plumbing — binary schema, partitioning, kernel signature,
  * batch shape — is real and tested; swapping in a real codec changes only
  * the stub body.
  */
object MultiModal {

  /** DETERMINISTIC FAKE of a media decoder (real codec goes here): derives
    * a fixed-width float feature vector + checksum from the raw bytes.
    */
  def decodeStub(payload: Array[Byte]): (Long, Array[Float]) = {
    var crc = 0L
    var i = 0
    while (i < payload.length) { crc = crc * 31 + (payload(i) & 0xff); i += 1 }
    val feats = Array.tabulate(8) { k =>
      if (payload.isEmpty) 0f
      else payload((k * 7919) % payload.length).toFloat / 128f
    }
    (crc, feats)
  }

  /** MM1: metadata + byte-length stats over the binary column — pure
    * relational, oracle-checked (payload = utf-8 bytes of text here; a real
    * corpus would load binary files the same way).
    */
  val mm1: GraftQuery = GraftQuery(
    "mm1_binary_metadata",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"),
        col("lang"), col("n_chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("total_bytes"),
        max(length(col("payload"))).as("max_bytes")),
    Some("""SELECT lang, count(*) AS n,
           |CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           |CAST(MAX(octet_length(encode(text))) AS INT) AS max_bytes
           |FROM documents GROUP BY lang""".stripMargin))

  /** Partition-wise decode/feature-extract over the binary column — the
    * full typed result including the `features` array, for downstream
    * consumers (e.g. ANN over decoded features) and MultiModalSpec.
    */
  def decode(s: SparkSession, d: String): Dataset[MediaFeatures] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"),
        col("lang"), col("n_chars"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // per-partition "codec" setup happens once here, then batches
        it.map { r =>
          val (crc, feats) = decodeStub(r.payload)
          MediaFeatures(r.doc_id, r.payload.length, crc, feats)
        }
      }
  }

  /** MM2: the decode kernel on the driver surface. The `features` array is
    * exposed as scalar digests (first element + fixed-order sum) because
    * harness row-compares can't sort array cells; the array itself stays on
    * [[decode]]. Even the byte-level stub is oracle-checked: DuckDB
    * re-derives the payload bytes from the hex of the utf-8 blob, folds the
    * wrapping crc in HUGEINT mod 2^64, and rebuilds the signed-byte
    * features — the float/128 values are dyadic rationals, exact in both
    * float and double, so no rounding can diverge.
    */
  val mm2: GraftQuery = GraftQuery(
    "mm2_decode_features",
    (s, d) => {
      import s.implicits._
      decode(s, d)
        .map(f => (f.doc_id, f.byte_len, f.checksum, f.features.length,
          f.features.headOption.getOrElse(0f).toDouble, f.features.sum.toDouble))
        .toDF("doc_id", "byte_len", "checksum", "n_features", "feat_head", "feat_sum")
    },
    Some("""WITH b AS (SELECT doc_id, CAST(length(text) AS INT) AS byte_len, hex(encode(text)) AS hx FROM documents),
           |bytes AS (SELECT doc_id, byte_len, list_transform(generate_series(1, byte_len),
           |   i -> CAST(CAST('0x' || substr(hx, CAST(2*i-1 AS INT), 2) AS INT) AS HUGEINT)) AS bs FROM b),
           |crc AS (SELECT doc_id, byte_len, bs,
           |   CASE WHEN byte_len = 0 THEN CAST(0 AS HUGEINT)
           |        ELSE list_reduce(bs, (acc, x) -> (acc * 31 + x) % 18446744073709551616) END AS c FROM bytes)
           |SELECT doc_id, byte_len,
           |   CASE WHEN c >= 9223372036854775808 THEN CAST(c - 18446744073709551616 AS BIGINT)
           |        ELSE CAST(c AS BIGINT) END AS checksum,
           |   CAST(8 AS INT) AS n_features,
           |   CASE WHEN byte_len = 0 THEN CAST(0 AS DOUBLE)
           |        ELSE CAST(CASE WHEN bs[1] >= 128 THEN bs[1] - 256 ELSE bs[1] END AS DOUBLE) / 128 END AS feat_head,
           |   CASE WHEN byte_len = 0 THEN CAST(0 AS DOUBLE)
           |        ELSE CAST(list_sum(list_transform(generate_series(0, 7),
           |          k -> CAST(CASE WHEN bs[(k*7919) % byte_len + 1] >= 128
           |                    THEN bs[(k*7919) % byte_len + 1] - 256
           |                    ELSE bs[(k*7919) % byte_len + 1] END AS BIGINT))) AS DOUBLE) / 128 END AS feat_sum
           |FROM crc""".stripMargin))

  /** MM3: strided frame sampling over the binary payload — the video
    * keyframe-sampling shape: treat the blob as fixed 64-byte frames, take
    * every 4th frame up to 8 samples, and emit a digest per sampled frame.
    * Pure relational on the binary column (`substring` + `md5` are
    * codegen'd builtins; the lateral `explode(sequence)` fans out inside
    * the task) — no kernel, no shuffle, scan-parallel at any corpus size.
    * The oracle replays byte-identical slices: the corpus is ASCII
    * (byte_len == char_len, pinned by mm1), so text substrings are the
    * same bytes the binary slice sees.
    */
  val mm3: GraftQuery = GraftQuery(
    "mm3_frame_sample",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .withColumn("blen", length(col("payload")))
      .select(col("doc_id"), col("payload"), col("blen"),
        explode(expr("sequence(0, least(7, (blen - 1) div 256))")).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * 256 + 1).as("frame_off"),
        md5(expr("substring(payload, frame_idx * 256 + 1, 64)")).as("frame_md5")),
    Some("""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS blen FROM documents),
           |e AS (SELECT doc_id, text, unnest(generate_series(0, least(7, (blen - 1) // 256))) AS frame_idx FROM b)
           |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           |  CAST(frame_idx * 256 + 1 AS INT) AS frame_off,
           |  md5(substr(text, CAST(frame_idx * 256 + 1 AS INT), 64)) AS frame_md5
           |FROM e""".stripMargin))

  /** MM4 (beyond reference): modality-weighted sequence packing — the
    * multimodal batch-layout step: a record's context-window cost is its
    * text token count PLUS a fixed per-frame visual-token charge (16
    * here) for each frame mm3's strided sampler would emit, and records
    * are packed into fixed windows by the same two-level shard-offset
    * prefix sum as x16 ([[TextOps.packByCost]]) — integer-only, no
    * window partition proportional to a source. `greatest(blen, 1)`
    * keeps the frame count cross-engine for degenerate empty payloads
    * (Spark `div` truncates toward zero, DuckDB `//` floors — they
    * disagree only at negative operands).
    */
  val mm4: GraftQuery = GraftQuery(
    "mm4_multimodal_pack",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val cost = docs.select(col("doc_id"), col("source"),
        (size(split(col("text"), " ")) +
          lit(16) * least(lit(8),
            expr("(greatest(length(encode(text, 'utf-8')), 1) - 1) div 256") + 1))
          .cast("int").as("n_tok"))
      TextOps.packByCost(cost, "source", 2048, shardSpan = 128L)
    },
    Some("""WITH t AS (SELECT doc_id, source,
           |  CAST(len(str_split(text, ' '))
           |    + 16 * least(8, (greatest(octet_length(encode(text)), 1) - 1) // 256 + 1) AS INT) AS n_tok
           |  FROM documents),
           |c AS (SELECT doc_id, source, n_tok,
           |  CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
           |  FROM t)
           |SELECT doc_id, source, n_tok, start_tok,
           |  start_tok // 2048 AS first_pack,
           |  (start_tok + n_tok - 1) // 2048 AS last_pack,
           |  (start_tok + n_tok - 1) // 2048 - start_tok // 2048 + 1 AS n_packs
           |FROM c""".stripMargin))

  /** DETERMINISTIC FAKE of a perceptual hash (real pHash — DCT + median
    * threshold — goes here): a 60-bit signature from the payload's byte
    * HISTOGRAM (bit k set iff the count of byte 97 + k%26 reaches the
    * k-banded threshold), because histogram features are what gives a real
    * perceptual hash its robustness: invariant to byte reordering, stable
    * under small edits. 60 bits (not 64) so the signature stays a positive
    * BIGINT on every engine.
    */
  def phashStub(payload: Array[Byte]): Long = {
    val counts = new Array[Int](26)
    var i = 0
    while (i < payload.length) {
      val c = payload(i) - 97
      if (c >= 0 && c < 26) counts(c) += 1
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 60) {
      if (counts(k % 26) >= (k / 26 + 1) * 4) sig |= (1L << k)
      k += 1
    }
    sig
  }

  /** Hamming-LSH parameters: 4 bands x 15 bits over the 60-bit signature
    * (any near-identical pair shares at least one band), candidate buckets
    * larger than [[BucketCap]] skipped — the stop-bucket rule: a band
    * value carried by that many items is a corpus-wide commonality, not
    * duplication evidence, and capping it bounds per-bucket pair fanout at
    * BucketCap^2/2 no matter how skewed the signature distribution gets
    * at 100 TB. Pairs within [[HammingMax]] bits are reported.
    */
  private val BucketCap = 50
  private val HammingMax = 2

  /** Public DataFrame-in API (see graft.api.Graft): perceptual-hash
    * near-duplicate screening over (doc_id: long, payload: binary).
    * Returns (a_id, b_id, hamming) for candidate pairs within
    * `hammingMax` bits. Signature -> band explode -> capped bucket join ->
    * hamming verify on candidates only; no all-pairs step anywhere.
    */
  def phashNearDups(media: DataFrame, hammingMax: Int = HammingMax): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    val sigs = media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, p) => (id, phashStub(p)) }.toDF("doc_id", "sig")
    val bv = sigs.select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(3))).as("band_idx"))
      .withColumn("band_val",
        expr("shiftright(sig, CAST(band_idx * 15 AS INT)) & 32767"))
    val keep = bv.groupBy("band_idx", "band_val")
      .agg(count(lit(1)).as("bn")).filter(col("bn") <= BucketCap)
      .select("band_idx", "band_val")
    val kept = bv.join(keep, Seq("band_idx", "band_val"))
    kept.as("a").join(kept.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.sig").as("sa"), col("b.sig").as("sb"))
      .distinct()
      .select(col("a_id"), col("b_id"),
        expr("CAST(bit_count(sa ^ sb) AS INT)").as("hamming"))
      .filter(col("hamming") <= hammingMax)
  }

  /** MM5 (beyond reference): perceptual-hash near-duplicate detection over
    * the binary payload column — the image/video dedup step of a
    * multimodal curation pipeline (x1/x5 dedup text; this dedups media
    * bytes). Signature is the [[phashStub]] histogram fake (swap for real
    * pHash bits; the banding/verify dataflow is the product); the oracle
    * replays signature, banding, stop-bucket cap, and hamming verify
    * exactly — byte counts re-derived from the text because the corpus is
    * ASCII (byte_len == char_len, pinned by mm1).
    */
  val mm5: GraftQuery = GraftQuery(
    "mm5_phash_neardup",
    (s, d) => phashNearDups(Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))),
    Some(s"""WITH sig AS (SELECT doc_id, list_sum(list_transform(range(0, 60),
           |  k -> CASE WHEN (length(text) - length(replace(text, chr(CAST(97 + k % 26 AS INT)), '')))
           |            >= (k // 26 + 1) * 4
           |       THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END))::BIGINT AS sig
           |  FROM documents),
           |bands AS (SELECT doc_id, sig, unnest(range(0, 4)) AS band_idx FROM sig),
           |bv0 AS (SELECT doc_id, sig, band_idx,
           |        (sig >> CAST(band_idx * 15 AS INT)) & 32767 AS band_val FROM bands),
           |keep AS (SELECT band_idx, band_val FROM bv0
           |         GROUP BY 1, 2 HAVING count(*) <= $BucketCap),
           |bv AS (SELECT bv0.* FROM bv0 JOIN keep USING (band_idx, band_val)),
           |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
           |                a.sig AS sa, b.sig AS sb
           |         FROM bv a JOIN bv b ON a.band_idx = b.band_idx
           |           AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
           |SELECT a_id, b_id, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
           |FROM cand WHERE bit_count(xor(sa, sb)) <= $HammingMax""".stripMargin))

  /** MM6 (beyond reference): video-level near-duplicate pairs by SHARED
    * SAMPLED FRAMES — the shot-level dedup a video curation pipeline runs
    * on top of [[mm3]]'s keyframe sampler: two payloads are candidate
    * dups when they share >= 2 distinct sampled-frame digests, reported
    * with the overlap fraction over the smaller frame set (the
    * containment view — a clip embedded in a longer cut still surfaces).
    * Complements [[mm5]]: phash catches whole-payload similarity, this
    * catches SEGMENT reuse (frames before an edit point stay identical
    * even when everything after shifts). Shape: frame digests from the
    * strided sampler (scan-parallel), a DF-capped inverted index on the
    * digest (stop-frame rule — a digest carried by > 50 payloads is
    * corpus boilerplate, not dup evidence; bounds bucket fanout), one
    * equi-join on the digest key, integer counts and one division. Never
    * all-pairs.
    */
  val mm6: GraftQuery = GraftQuery(
    "mm6_video_neardup",
    (s, d) => {
      val f = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
        .withColumn("blen", length(col("payload")))
        .select(col("doc_id"), col("payload"),
          explode(expr("sequence(0, least(7, (blen - 1) div 256))")).as("fi"))
        .select(col("doc_id"),
          md5(expr("substring(payload, fi * 256 + 1, 64)")).as("h"))
        .distinct()
      val nf = f.groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
      val keep = f.groupBy("h").agg(count(lit(1)).as("dfc"))
        .filter(col("dfc") <= 50).select("h")
      val fk = f.join(keep, "h")
      val p = fk.select(col("h"), col("doc_id").as("a_id"))
        .join(fk.select(col("h"), col("doc_id").as("b_id")), "h")
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
      p.join(nf.select(col("doc_id").as("a_id"), col("n_frames").as("na")), "a_id")
        .join(nf.select(col("doc_id").as("b_id"), col("n_frames").as("nb")), "b_id")
        .select(col("a_id"), col("b_id"), col("n_shared"),
          least(col("na"), col("nb")).as("min_frames"),
          (col("n_shared").cast("double") / least(col("na"), col("nb")))
            .as("overlap_frac"))
    },
    Some("""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS blen FROM documents),
           |e AS (SELECT doc_id, text,
           |        unnest(generate_series(0, least(7, (blen - 1) // 256))) AS fi FROM b),
           |f AS (SELECT DISTINCT doc_id,
           |        md5(substr(text, CAST(fi * 256 + 1 AS INT), 64)) AS h FROM e),
           |nf AS (SELECT doc_id, count(*) AS n_frames FROM f GROUP BY 1),
           |keep AS (SELECT h FROM f GROUP BY h HAVING count(*) <= 50),
           |fk AS (SELECT f.* FROM f JOIN keep USING (h)),
           |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |        CAST(count(*) AS BIGINT) AS n_shared
           |      FROM fk a JOIN fk b ON a.h = b.h AND a.doc_id < b.doc_id
           |      GROUP BY 1, 2 HAVING count(*) >= 2)
           |SELECT p.a_id, p.b_id, p.n_shared,
           |  CAST(least(na.n_frames, nb.n_frames) AS BIGINT) AS min_frames,
           |  CAST(p.n_shared AS DOUBLE) / least(na.n_frames, nb.n_frames) AS overlap_frac
           |FROM p
           |JOIN nf na ON na.doc_id = p.a_id
           |JOIN nf nb ON nb.doc_id = p.b_id""".stripMargin))

  /** Energy gate for [[mm7]]'s frame classifier — sits at the corpus
    * median frame energy so the gate discriminates (an extreme value
    * would mark everything (in)active and the segmentation would be
    * vacuous). Fixed, engine-independent integer.
    */
  private val EnergyGate = 625000L

  /** MM7 (beyond reference): energy-gated segment extraction — the
    * voice-activity-detection dataflow of a speech curation pipeline:
    * the payload is framed (64 bytes/frame, full frames only), each
    * frame scores an integer energy Σ code², frames above [[EnergyGate]]
    * are active, and per payload the op reports frame counts plus the
    * LONGEST ACTIVE RUN — the "is there a usable contiguous speech
    * segment" audit that decides whether a clip enters the training set
    * (cf. WebRTC VAD's energy gate; the real spectral decode is the
    * stub seam, as in [[decodeStub]]). Frame energies come from ONE
    * linear typed pass over the payload (the [[decode]] batch-kernel
    * discipline — a per-frame SQL `substring` probe would re-scan the
    * string per character and go quadratic in payload length); segment
    * runs then come from the gaps-and-islands idiom (frame_idx −
    * row_number over active frames), NOT a per-doc sequential fold — two
    * doc-partitioned windows on the ACTIVE-frame subset plus one
    * doc-domain aggregate, all exact BIGINTs until the final ratio.
    */
  val mm7: GraftQuery = GraftQuery(
    "mm7_energy_segments",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val docs = Tables.documents(s, d)
      // chars == bytes on this ASCII corpus (pinned by mm1), matching the
      // oracle's length(text)-based framing
      val fr = docs.select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, t) =>
          val nf = t.length / 64
          (0 until nf).iterator.map { fi =>
            var e = 0L
            var j = 0
            while (j < 64) {
              val c = t.charAt(fi * 64 + j).toLong
              e += c * c
              j += 1
            }
            (id, fi, e > EnergyGate)
          }
        }.toDF("doc_id", "fi", "active")
      val act = fr.filter(col("active"))
        .withColumn("grp", col("fi") -
          row_number().over(Window.partitionBy("doc_id").orderBy("fi")))
      val longest = act.groupBy("doc_id", "grp").agg(count(lit(1)).as("run"))
        .groupBy("doc_id").agg(max("run").as("longest_run"))
      val per = fr.groupBy("doc_id").agg(count(lit(1)).as("n_frames"),
        sum(when(col("active"), 1).otherwise(0)).as("n_active"))
      docs.select("doc_id")
        .join(per, Seq("doc_id"), "left")
        .join(longest, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_frames", "n_active", "longest_run"))
        .select(col("doc_id"), col("n_frames"), col("n_active"),
          col("longest_run"),
          when(col("n_frames") === 0, lit(0.0))
            .otherwise(col("n_active").cast("double") /
              col("n_frames").cast("double")).as("active_ratio"))
    },
    Some(s"""WITH d0 AS (SELECT doc_id, text, length(text) // 64 AS nf FROM documents),
           |fr0 AS (SELECT doc_id, text, unnest(range(0, nf)) AS fi FROM d0 WHERE nf > 0),
           |fr AS (SELECT doc_id, fi,
           |        list_sum(list_transform(range(0, 64),
           |          j -> CAST(ord(substr(text, CAST(fi * 64 + j + 1 AS INT), 1)) AS BIGINT)
           |             * CAST(ord(substr(text, CAST(fi * 64 + j + 1 AS INT), 1)) AS BIGINT)))::BIGINT
           |          AS energy
           |       FROM fr0),
           |fa AS (SELECT doc_id, fi, energy > $EnergyGate AS active FROM fr),
           |act AS (SELECT doc_id, fi,
           |          fi - row_number() OVER (PARTITION BY doc_id ORDER BY fi) AS grp
           |        FROM fa WHERE active),
           |runs AS (SELECT doc_id, grp, count(*) AS run FROM act GROUP BY 1, 2),
           |lng AS (SELECT doc_id, CAST(max(run) AS BIGINT) AS longest_run FROM runs GROUP BY 1),
           |per AS (SELECT doc_id, count(*) AS n_frames,
           |         CAST(sum(CASE WHEN active THEN 1 ELSE 0 END) AS BIGINT) AS n_active
           |       FROM fa GROUP BY 1)
           |SELECT d0.doc_id, coalesce(per.n_frames, 0) AS n_frames,
           |  coalesce(per.n_active, 0) AS n_active,
           |  coalesce(lng.longest_run, 0) AS longest_run,
           |  CASE WHEN coalesce(per.n_frames, 0) = 0 THEN CAST(0.0 AS DOUBLE)
           |       ELSE CAST(per.n_active AS DOUBLE) / CAST(per.n_frames AS DOUBLE)
           |  END AS active_ratio
           |FROM d0 LEFT JOIN per USING (doc_id) LEFT JOIN lng USING (doc_id)""".stripMargin))

  /** The aspect-bucket target set: 7 resolutions of (near-)equal area
    * ~512², from 2.2:1 landscape to 1:2.2 portrait — the SDXL/NaViT
    * bucket ladder shape. Stored with the 1e6-quantized aspect ratio the
    * assignment argmin runs on.
    */
  val AspectBuckets: Seq[(Int, Int)] = Seq(
    (704, 320), (640, 384), (576, 448), (512, 512),
    (448, 576), (384, 640), (320, 704))

  /** Public DataFrame-in API (see graft.api.Graft): aspect-ratio bucket
    * planning — the RESIZE step of a multimodal training pipeline
    * (NaViT/SDXL aspect bucketing): every image is assigned to the
    * fixed-area target bucket with the nearest aspect ratio, so a batch
    * resizes without destructive squashing and batches form per bucket.
    * `media` needs (width, height) metadata columns. Returns one row per
    * bucket: (bucket_w, bucket_h, n_images, n_batches@`batch`,
    * sum_ar_gap) — n_batches is the ceil-div batch plan, sum_ar_gap the
    * total 1e6-quantized |aspect − bucket aspect| mismatch (the
    * distortion budget the ladder choice controls).
    *
    * Determinism: the image aspect quantizes to an exact integer before
    * the argmin, bucket aspects are integer constants, and ties break
    * toward the wider bucket (stable seq order) — so assignment is exact
    * in any engine. Scale: per-row argmin over a 7-literal array + one
    * 7-group hash aggregate; nothing sorts, nothing is data-sized on the
    * driver.
    */
  def aspectBucketPlan(media: DataFrame, batch: Int = 32): DataFrame = {
    val barsSql = AspectBuckets.map { case (bw, bh) =>
      s"named_struct('bw', $bw, 'bh', $bh, 'bar', ${math.round(bw * 1e6 / bh)}L)"
    }.mkString("array(", ", ", ")")
    media
      .withColumn("ar_q", expr("CAST(floor(width * 1e6 / height + 0.5) AS LONG)"))
      .withColumn("pick", expr(
        s"""aggregate($barsSql, named_struct('bw', 0, 'bh', 0, 'gap', 9223372036854775807L),
           |  (best, b) -> IF(abs(b.bar - ar_q) < best.gap,
           |    named_struct('bw', b.bw, 'bh', b.bh, 'gap', abs(b.bar - ar_q)), best))"""
          .stripMargin))
      .groupBy(col("pick.bw").as("bucket_w"), col("pick.bh").as("bucket_h"))
      .agg(count(lit(1)).as("n_images"),
        expr(s"CAST((count(1) + ${batch - 1}) div $batch AS LONG)").as("n_batches"),
        sum(col("pick.gap")).as("sum_ar_gap"))
  }

  /** MM8 (beyond reference): the aspect-bucket plan over the corpus, with
    * width/height synthesized deterministically from document metadata —
    * the DIMENSION-METADATA stub (a real corpus ships width/height columns
    * next to the payload, exactly like mm1's typed-metadata contract; the
    * planner itself is real).
    */
  val mm8: GraftQuery = GraftQuery(
    "mm8_aspect_bucket_plan",
    (s, d) => aspectBucketPlan(Tables.documents(s, d)
      .select(col("doc_id"),
        (lit(320) + pmod(col("n_chars") * 7 + col("doc_id") * 13, lit(1024)))
          .as("width"),
        (lit(240) + pmod(col("n_chars") * 3 + col("doc_id") * 5, lit(768)))
          .as("height"))),
    Some(s"""WITH m AS (SELECT doc_id,
           |    320 + (n_chars * 7 + doc_id * 13) % 1024 AS width,
           |    240 + (n_chars * 3 + doc_id * 5) % 768 AS height
           |  FROM documents),
           |qm AS (SELECT doc_id,
           |    CAST(floor(width * 1e6 / height + 0.5) AS BIGINT) AS ar_q FROM m),
           |b(bw, bh, bar, idx) AS (VALUES ${AspectBuckets.zipWithIndex.map {
             case ((bw, bh), i) =>
               s"($bw, $bh, ${math.round(bw * 1e6 / bh)}, $i)" }.mkString(", ")}),
           |pk AS (SELECT doc_id, bw, bh, gap FROM (
           |    SELECT qm.doc_id, b.bw, b.bh, abs(b.bar - qm.ar_q) AS gap,
           |      row_number() OVER (PARTITION BY qm.doc_id
           |        ORDER BY abs(b.bar - qm.ar_q), b.idx) AS rn
           |    FROM qm, b) WHERE rn = 1)
           |SELECT bw AS bucket_w, bh AS bucket_h,
           |  CAST(count(*) AS BIGINT) AS n_images,
           |  (count(*) + 31) // 32 AS n_batches,
           |  CAST(sum(gap) AS BIGINT) AS sum_ar_gap
           |FROM pk GROUP BY 1, 2""".stripMargin))

  /** mm9 framing: 16-byte frames, lags swept over ±4 frames. */
  private val SyncFrame = 16
  private val SyncMaxLag = 4

  /** Public DataFrame-in API (see graft.api.Graft): A/V sync-offset
    * estimation — the "is the audio N frames ahead of the video" check a
    * video-ingest pipeline runs before cutting training clips. Each
    * payload splits into two equal-length tracks (the AUDIO/VIDEO stub
    * seam — a real pipeline feeds two genuine streams); each track maps
    * to 16-byte frame energies (Σ byte², exact integers), and the
    * estimated offset is the argmax of the integer cross-correlation
    * over lags −L..L with L = min(4, (frames−1)/2), evaluated on the
    * FIXED window i ∈ [L, frames−L) so every lag sums the same number of
    * terms — unnormalized sliding correlation is biased toward small
    * |lag| (more overlap), and the fixed window removes that bias while
    * keeping every score an exact BIGINT (ties → smaller lag). Returns
    * one row per payload with ≥1 frame pair:
    * (doc_id, n_frames, best_lag, best_score).
    *
    * Scale: a per-payload typed kernel (mm2's batching discipline) doing
    * O(lags · frames) integer multiplies — no shuffle at all until a
    * consumer aggregates; scores are exact BIGINTs, so the argmax and
    * its tie-break are bitwise-identical cross-engine.
    */
  def avSyncLag(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        val half = t.length / 2
        val nf = half / SyncFrame
        if (nf < 1) Iterator.empty
        else {
          def energies(off: Int): Array[Long] =
            Array.tabulate(nf) { fi =>
              var e = 0L
              var j = 0
              while (j < SyncFrame) {
                val c = t.charAt(off + fi * SyncFrame + j).toLong
                e += c * c
                j += 1
              }
              e
            }
          val ea = energies(0)
          val ev = energies(half)
          val eff = math.min(SyncMaxLag, (nf - 1) / 2)
          var bestLag = -eff - 1
          var bestScore = Long.MinValue
          var lag = -eff
          while (lag <= eff) {
            var score = 0L
            var i = eff
            while (i < nf - eff) { score += ea(i) * ev(i + lag); i += 1 }
            if (score > bestScore) { bestScore = score; bestLag = lag }
            lag += 1
          }
          Iterator.single((id, nf, bestLag, bestScore))
        }
      }
      .toDF("doc_id", "n_frames", "best_lag", "best_score")
  }

  /** MM9 (beyond reference): sync-lag estimate over the corpus payloads. */
  val mm9: GraftQuery = GraftQuery(
    "mm9_av_sync_lag",
    (s, d) => avSyncLag(Tables.documents(s, d)),
    Some(s"""WITH d0 AS (SELECT doc_id, text, length(text) // 2 AS half FROM documents),
           |d1 AS (SELECT doc_id, text, half, half // $SyncFrame AS nf
           |       FROM d0 WHERE half // $SyncFrame >= 1),
           |tr AS (SELECT doc_id, nf,
           |  list_transform(range(0, nf), fi -> CAST(list_sum(list_transform(range(0, $SyncFrame),
           |    j -> CAST(ord(substr(text, CAST(fi * $SyncFrame + j + 1 AS INT), 1)) AS BIGINT)
           |       * CAST(ord(substr(text, CAST(fi * $SyncFrame + j + 1 AS INT), 1)) AS BIGINT))) AS BIGINT)) AS ea,
           |  list_transform(range(0, nf), fi -> CAST(list_sum(list_transform(range(0, $SyncFrame),
           |    j -> CAST(ord(substr(text, CAST(half + fi * $SyncFrame + j + 1 AS INT), 1)) AS BIGINT)
           |       * CAST(ord(substr(text, CAST(half + fi * $SyncFrame + j + 1 AS INT), 1)) AS BIGINT))) AS BIGINT)) AS ev
           |  FROM d1),
           |te AS (SELECT doc_id, nf, ea, ev,
           |         least($SyncMaxLag, (nf - 1) // 2) AS eff FROM tr),
           |sc AS (SELECT doc_id, nf, CAST(lag AS INT) AS lag,
           |    CAST(coalesce(list_sum(list_transform(
           |      range(eff, nf - eff),
           |      i -> ea[CAST(i + 1 AS INT)] * ev[CAST(i + lag + 1 AS INT)])), 0) AS BIGINT) AS score
           |  FROM te, LATERAL (SELECT unnest(range(-eff, eff + 1)) AS lag) l)
           |SELECT doc_id, CAST(nf AS INT) AS n_frames, lag AS best_lag, score AS best_score
           |FROM sc
           |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lag) = 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(mm1, mm2, mm3, mm4, mm5, mm6, mm7, mm8, mm9)
}
