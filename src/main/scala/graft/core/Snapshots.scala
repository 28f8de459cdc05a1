package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Minimal snapshot/time-travel surface at the [[Tables]] seam — the shape
  * of Iceberg's metadata inspection and `VERSION AS OF` reads (reference
  * lakehouse_part1_load_data.py:333, 346-409: snapshot listing, history,
  * reading an older snapshot after a delete) without the Iceberg runtime
  * (jar absent in this environment; see DIVERGENCES #6).
  *
  * Every write is a NEW immutable version directory `v1, v2, ...`; readers
  * address a version explicitly or take the latest. Deletes are
  * copy-on-write: filter + write-next-version, the old version stays
  * readable. At 100 TB this is exactly Iceberg's model (immutable
  * snapshots + metadata pointer), so swapping the directory listing for
  * the Iceberg catalog keeps every call site.
  */
object Snapshots {

  private def root(table: String): java.io.File =
    new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft-scratch/snapshots/$table")

  /** Snapshot ids, ascending (empty when the table does not exist). */
  def versions(table: String): Seq[Int] = {
    val fs = root(table).listFiles()
    if (fs == null) Seq.empty
    else fs.toSeq.map(_.getName).filter(_.startsWith("v")).map(_.drop(1).toInt).sorted
  }

  /** Write `df` as the next snapshot; returns the new version id.
    *
    * Crash-safe publish (the discipline every serving store now shares —
    * see [[VersionedStore]]): the data lands in an UNPUBLISHED `stage-*`
    * directory that [[versions]] never lists, and `v{N}` appears via one
    * atomic rename — a writer crashing mid-write leaves only staging
    * debris readers cannot resolve, never a half-written snapshot that
    * [[latest]] would trust. The version number is taken AFTER the data
    * write, so a concurrent writer racing to the same number fails the
    * rename loudly instead of interleaving files.
    */
  def write(s: SparkSession, table: String, df: DataFrame): Int =
    publishStaged(table, stage(s, table, df))

  /** Time-travel read of snapshot `v`. */
  def read(s: SparkSession, table: String, v: Int): DataFrame =
    s.read.parquet(s"${root(table)}/v$v")

  /** Read the current snapshot. */
  def latest(s: SparkSession, table: String): DataFrame =
    read(s, table, versions(table).last)

  /** MERGE (upsert) of `source` into the latest snapshot on `key` —
    * Iceberg/Delta `MERGE INTO` with the update-all / insert-all branches:
    * matched target rows are replaced by their source row, unmatched
    * source rows are inserted, untouched target rows carry over. Returns
    * the new snapshot id.
    *
    * Faithful to the MERGE cardinality rule: a source with duplicate keys
    * would update one target row twice nondeterministically, so it is
    * rejected (Iceberg raises the same error). Copy-on-write: one
    * anti-join + union written as the next snapshot. At 100 TB the
    * anti-join shuffles on the merge key — or needs no exchange at all if
    * the table is bucketed on it — and a real table format would rewrite
    * only the files containing matches; this seam is unchanged either way.
    */
  def merge(s: SparkSession, table: String, source: DataFrame, key: Seq[String]): Int = {
    import org.apache.spark.sql.functions._
    // one pass over source for the cardinality check (countDistinct over a
    // struct so null key fields still count), instead of distinct+count twice
    val r = source.agg(count(lit(1)),
      countDistinct(struct(key.map(col): _*))).head()
    require(r.getLong(0) == r.getLong(1),
      s"MERGE source has duplicate rows on key ${key.mkString(",")}")
    val untouched = latest(s, table)
      .join(source.select(key.map(col): _*), key, "left_anti")
    write(s, table, untouched.unionByName(source))
  }

  /** Changelog between two snapshots — the CDC read (Iceberg changelog /
    * Delta CDF shape): every row only in `from` is a delete, every row
    * only in `to` is an insert; an update surfaces as its delete+insert
    * pair. Multiset semantics, so duplicate rows diff correctly.
    *
    * Derived in ONE shuffle: tag `from` rows -1 and `to` rows +1, group by
    * the whole row, and the signed count's sign is the change type while
    * its magnitude is the multiplicity (re-expanded with a lateral
    * sequence). Two `exceptAll`s would compute the same thing with two
    * full-width shuffles and four snapshot scans — at 100 TB this variant
    * reads each snapshot once and exchanges each distinct row once. A
    * production table format reads the changelog from commit metadata
    * instead; same contract, callers unchanged.
    */
  def diff(s: SparkSession, table: String, from: Int, to: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val a = read(s, table, from)
    val cols = a.columns.toSeq
    val tagged = a.withColumn("_w", lit(-1L))
      .unionByName(read(s, table, to).withColumn("_w", lit(1L)))
    tagged.groupBy(cols.map(col): _*).agg(sum(col("_w")).as("_net"))
      .filter(col("_net") =!= 0L)
      .withColumn("_change_type",
        when(col("_net") > 0, lit("insert")).otherwise(lit("delete")))
      .withColumn("_dup", explode(expr("sequence(1, abs(_net))")))
      .drop("_net", "_dup")
  }

  /** Apply a changelog (the [[diff]] shape: row columns + `_change_type`
    * of insert/delete) to a snapshot — the CDC-consumer half of the
    * contract: `applyChangelog(v_n, diff(n, m)) == v_m` as multisets.
    * Same one-shuffle signed-count derivation as [[diff]]: snapshot rows
    * weigh +1, deletes -1, inserts +1; the net multiplicity re-expands
    * through a lateral sequence. A net below zero means the changelog
    * deletes a row the snapshot does not have — that is corruption, so it
    * raises (assert_true) instead of silently clamping.
    */
  def applyChangelog(snapshot: DataFrame, changelog: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val cols = snapshot.columns.toSeq
    val tagged = snapshot.withColumn("_w", lit(1L))
      .unionByName(changelog
        .withColumn("_w", when(col("_change_type") === "insert", 1L).otherwise(-1L))
        .drop("_change_type"))
    tagged.groupBy(cols.map(col): _*).agg(sum(col("_w")).as("_net"))
      // the assert is woven into the VALUE the filter compares (assert_true
      // is NULL on pass, so `when` yields _net), not a separate conjunct —
      // a standalone `.filter(assert_true(...))` next to `.filter(_net > 0)`
      // would rely on Catalyst's conjunct evaluation order, and a reorder
      // could short-circuit past the assert for exactly the corrupt rows
      .withColumn("_net", when(assert_true(col("_net") >= 0L,
        lit("changelog deletes a row absent from the snapshot")).isNull,
        col("_net")))
      .filter(col("_net") > 0L)
      .withColumn("_dup", explode(expr("sequence(1, _net)")))
      .drop("_net", "_dup")
  }

  /** Tag a snapshot with a stable name (Iceberg tag / Delta named commit
    * at this seam): a reader can pin "the audited state" instead of a
    * version number that moves. Metadata-only — one tiny ref file.
    */
  def tag(table: String, name: String, v: Int): Unit = {
    require(versions(table).contains(v), s"tag $name: no snapshot v$v")
    require(name.matches("[A-Za-z0-9_.-]+"), s"bad tag name: $name")
    // "." / ".." pass the character class but resolve to the tags dir /
    // table root — reject dots-only names here so the caller gets the
    // validation error, not an opaque IOException from Files.write.
    require(!name.forall(_ == '.'), s"bad tag name: $name")
    val dir = new java.io.File(root(table), "tags")
    dir.mkdirs()
    java.nio.file.Files.write(new java.io.File(dir, name).toPath,
      v.toString.getBytes("UTF-8")): Unit
  }

  /** All tags of a table, name -> version. */
  def tags(table: String): Map[String, Int] = {
    val dir = new java.io.File(root(table), "tags")
    val fs = dir.listFiles()
    if (fs == null) Map.empty
    else fs.map(f => f.getName ->
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toInt)
      .toMap
  }

  /** Time-travel read at a named tag. */
  def readTag(s: SparkSession, table: String, name: String): DataFrame = {
    val v = tags(table).getOrElse(name,
      throw new IllegalArgumentException(s"unknown tag: $name"))
    read(s, table, v)
  }

  /** WAP stage: write `df` as an UNPUBLISHED candidate under the table
    * root. The data files land on storage, but no reader resolves them —
    * [[versions]] lists only `v*` directories, so [[latest]]/[[read]]
    * cannot see a staged candidate. Returns the staging path. (Iceberg's
    * `write.wap.enabled` branch write / Delta's un-committed files at
    * this seam.)
    */
  def stage(s: SparkSession, table: String, df: DataFrame): String = {
    root(table).mkdirs()
    val p = java.nio.file.Files
      .createTempDirectory(root(table).toPath, "stage-").toFile
    df.write.mode(SaveMode.Overwrite).parquet(p.toString)
    p.toString
  }

  /** WAP publish: promote a staged candidate to the next version. A
    * metadata-only atomic rename — zero data rewrite, which is the whole
    * point of write-audit-publish at 100 TB: the audit scans the staged
    * files once and the commit itself is O(1).
    */
  def publishStaged(table: String, staged: String): Int = {
    val v = versions(table).lastOption.getOrElse(0) + 1
    val ok = new java.io.File(staged).renameTo(new java.io.File(root(table), s"v$v"))
    require(ok, s"publishStaged: atomic rename failed for $staged")
    v
  }

  /** WAP reject: drop a staged candidate that failed its audit. The
    * published table never saw it.
    */
  def discardStaged(staged: String): Unit = {
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rec)
      f.delete(): Unit
    }
    val f = new java.io.File(staged)
    require(f.getName.startsWith("stage-"), s"not a staging dir: $staged")
    if (f.exists()) rec(f)
  }

  /** Drop the whole table (all snapshots) — test/setup hygiene. */
  def reset(table: String): Unit = {
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rec)
      f.delete(): Unit
    }
    if (root(table).exists()) rec(root(table))
  }

  /** VACUUM / snapshot expiry: drop all but the newest `keep` snapshots
    * (Iceberg `expireSnapshots` / Delta `VACUUM` semantics at this seam).
    * Returns the dropped version ids, ascending. Time travel to a dropped
    * version fails afterwards — that loss is the contract; callers keep
    * enough history for their audit window.
    */
  def vacuum(table: String, keep: Int): Seq[Int] = {
    require(keep >= 1, s"vacuum must keep at least 1 snapshot, got $keep")
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rec)
      f.delete(): Unit
    }
    val drop = versions(table).dropRight(keep)
    drop.foreach(v => rec(new java.io.File(s"${root(table)}/v$v")))
    drop
  }
}
