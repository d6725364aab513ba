package graft

import java.nio.file.Files
import graft.streaming.DocIngest
import graft.streaming.DocIngest.Sinks
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming document ingest: quality routing, content dedup within the
  * watermark, hash-split partitioning, and DLQ routing — the corpus
  * pipeline's end-to-end behavior over a file-source replay. */
class DocIngestSpec extends SparkTestBase {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def doc(id: Long, text: String, source: String = "crawl",
                  ts: String = "2026-08-12T10:00:00.000Z"): String =
    s"""{"doc_id": $id, "text": "$text", "source": "$source", "ingest_ts": "$ts"}"""

  test("incrementalPairs: a re-ingested id scores with its BATCH shingles (deterministic, not version-arbitrary)") {
    // r18 ADVICE / r19 contract pin (NearDup.incrementalPairs scaladoc):
    // when a batch re-ingests an id the index already holds with CHANGED
    // content, every pair touching that id must score against the batch
    // version. doc 1 is indexed as a twin of doc 2; the batch re-ingests
    // id 1 with UNRELATED content — under the batch-wins rule the (1,2)
    // jaccard drops below threshold, so no pair may surface. The old
    // dropDuplicates pick could keep the stale index row and report
    // (1, 2, 1.0) nondeterministically.
    import graft.text.{NearDup, TextOps}
    import spark.implicits._
    // old content: ids 1 and 2 are exact twins (jaccard 1.0). The batch
    // re-ingests id 1 with ONE token changed — enough shared shingles
    // that a band still collides (the candidate forms), but the exact
    // jaccard of (new 1, old 2) is strictly < 1.0.
    val oldTokens = (0 until 40).map(i => s"tok$i")
    val oldText = oldTokens.mkString(" ")
    val newText = (oldTokens.dropRight(1) :+ "changed").mkString(" ")
    def sig(rows: Seq[(Long, String)]) = NearDup.signatureRelation(
      rows.toDF("id", "text")
        .select(col("id"), TextOps.tokens(col("text")).as("w")),
      "id", "w").localCheckpoint()
    val index = sig(Seq((1L, oldText), (2L, oldText)))
    val batch = sig(Seq((1L, newText)))
    val expected = sig(Seq((10L, newText))).limit(1).select(col("sh"))
      .crossJoin(sig(Seq((20L, oldText))).limit(1)
        .select(col("sh").as("sh2")))
      .select(TextOps.jaccard(col("sh"), col("sh2"))).first().getDouble(0)
    assert(expected < 1.0 && expected >= 0.5) // construction sanity
    val pairs = NearDup.incrementalPairs(index, batch, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq === Seq((1L, 2L, expected)),
      s"re-ingested id must score with its BATCH shingles ($expected), " +
        s"got ${pairs.mkString(",")}")
  }

  test("ingest replay: quality rejects, content dedup, split partitioning, DLQ") {
    val src = tmpDir("doc_src")
    val lines = Seq(
      doc(1, "the quick brown fox jumps"),
      doc(2, "a slow green turtle crawls"),
      // exact content duplicate of doc 1 from another source, later ts —
      // content dedup must keep exactly one copy
      doc(3, "the quick brown fox jumps", source = "mirror",
        ts = "2026-08-12T10:05:00.000Z"),
      // quality rejects: too short
      doc(4, "tiny doc"),
      doc(5, ""),
      // corrupt: not JSON, missing text, unparseable timestamp
      "not json at all",
      """{"doc_id": 6, "source": "crawl", "ingest_ts": "2026-08-12T10:00:00.000Z"}""",
      doc(7, "valid text here but bad clock", ts = "not-a-timestamp")
    )
    Files.writeString(java.nio.file.Paths.get(s"$src/docs.jsonl"),
      lines.mkString("\n") + "\n")

    val root = tmpDir("doc_out")
    val sinks = Sinks(s"$root/corpus", s"$root/rejects", s"$root/error",
      s"$root/checkpoint")
    val (main, rejects, dlq) = DocIngest.start(spark.readStream.text(src),
      sinks, Trigger.AvailableNow())
    assert(main.awaitTermination(120000), "stream did not finish in 120s")
    assert(rejects.awaitTermination(120000), "stream did not finish in 120s")
    assert(dlq.awaitTermination(120000), "stream did not finish in 120s")

    // corpus: docs 1 and 2 survive; the duplicate (3) collapsed into 1
    val corpus = spark.read.parquet(sinks.corpus)
    assert(corpus.count() === 2)
    assert(corpus.select("doc_id").as[Long](longEnc).collect().toSet === Set(1L, 2L))
    // first arrival won the dedup (doc 1, not the mirror copy doc 3)
    assert(corpus.filter(col("source") === "mirror").count() === 0)

    // split column: present, partition-valued, and matching q63's rule
    val splits = corpus.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def expected(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.charAt(0)
      if (h < 'c') "train" else if (h < 'e') "val" else "test"
    }
    splits.foreach { case (id, s) => assert(s === expected(id)) }
    // the split is a physical partition dir → downstream readers prune
    val batchDirs = new java.io.File(sinks.corpus).listFiles().filter(_.isDirectory)
    assert(batchDirs.flatMap(_.listFiles()).exists(_.getName.startsWith("split=")))

    // rejects: docs 4 and 5 (too short), with reasons — data, not errors
    val rej = spark.read.parquet(sinks.rejects)
    assert(rej.count() === 2)
    assert(rej.filter(col("reject_reason") === "too_short").count() === 2)
    // the audit layout CONTRACT forget() rewrites under must match what
    // the sink actually writes — a drifted column would be silently
    // dropped from surviving audit rows on the next forget rewrite.
    // Read ONE batch dir: forget's per-dir rewrite sees file columns
    // only (batch_id is the dir name, not data)
    val rejDir = new java.io.File(sinks.rejects).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .head.toString
    val rejFooter = spark.read.parquet(rejDir).schema
    assert(rejFooter.fields.map(f => (f.name, f.dataType)).toSeq ===
      DocIngest.rejectSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"rejectSchema drifted from the written layout: $rejFooter")

    // DLQ: the non-JSON line, the missing-text record, the bad timestamp
    assert(spark.read.text(sinks.error).count() === 3)
  }

  test("redelivery of identical content dedups across files") {
    val src = tmpDir("doc_src2")
    Files.writeString(java.nio.file.Paths.get(s"$src/a.jsonl"),
      doc(10, "same exact content delivered twice") + "\n")
    Files.writeString(java.nio.file.Paths.get(s"$src/b.jsonl"),
      doc(11, "same exact content delivered twice",
        ts = "2026-08-12T10:01:00.000Z") + "\n" +
        doc(12, "fresh second document content") + "\n")

    val root = tmpDir("doc_out2")
    val sinks = Sinks(s"$root/corpus", s"$root/rejects", s"$root/error",
      s"$root/checkpoint")
    val (main, rejects, dlq) = DocIngest.start(spark.readStream.text(src),
      sinks, Trigger.AvailableNow())
    assert(main.awaitTermination(120000), "stream did not finish in 120s")
    assert(rejects.awaitTermination(120000), "stream did not finish in 120s")
    assert(dlq.awaitTermination(120000), "stream did not finish in 120s")

    val corpus = spark.read.parquet(sinks.corpus)
    // one survivor per distinct digest: {10 or 11} + 12
    assert(corpus.count() === 2)
    assert(corpus.select(countDistinct(col("digest"))).head().getLong(0) === 2)
  }

  test("duplicate rejected lines all reach the audit sink (no dedup state spent on junk)") {
    val src = tmpDir("doc_src3")
    Files.writeString(java.nio.file.Paths.get(s"$src/a.jsonl"),
      doc(20, "tiny doc") + "\n" +
        doc(21, "tiny doc", ts = "2026-08-12T10:02:00.000Z") + "\n")
    val root = tmpDir("doc_out3")
    val sinks = Sinks(s"$root/corpus", s"$root/rejects", s"$root/error",
      s"$root/checkpoint")
    val (main, rejects, dlq) = DocIngest.start(spark.readStream.text(src),
      sinks, Trigger.AvailableNow())
    assert(main.awaitTermination(120000), "stream did not finish in 120s")
    assert(rejects.awaitTermination(120000), "stream did not finish in 120s")
    assert(dlq.awaitTermination(120000), "stream did not finish in 120s")
    // identical junk content twice → BOTH rows audited (content dedup is
    // a corpus concern, not an audit concern)
    assert(spark.read.parquet(sinks.rejects).count() === 2)
  }

  test("ingest-time near-dup: batch-mates and cross-batch copies route to the audit sink; index grows by survivors only") {
    val src = tmpDir("doc_src4")
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    // batch 1: original + a near-copy batch-mate (different digest, same
    // trigram neighborhood) + an unrelated doc
    Files.writeString(java.nio.file.Paths.get(s"$src/a.jsonl"),
      doc(30, base) + "\n" +
        doc(31, base + " extra marker") + "\n" +
        doc(32, "completely different second subject matter entirely " +
          "about spark shuffles and partitions") + "\n")

    val root = tmpDir("doc_out4")
    val idx = s"$root/neardup_index"
    val sinks = Sinks(s"$root/corpus", s"$root/rejects", s"$root/error",
      s"$root/checkpoint")
    def run(): Unit = {
      val (main, rejects, dlq) = DocIngest.start(spark.readStream.text(src),
        sinks, Trigger.AvailableNow(), nearDupIndex = Some(idx),
        nearDupThreshold = 0.3)
      assert(main.awaitTermination(120000), "stream did not finish in 120s")
      assert(rejects.awaitTermination(120000), "stream did not finish in 120s")
      assert(dlq.awaitTermination(120000), "stream did not finish in 120s")
    }
    run()

    // lower id survives; the batch-mate near-copy is audited, not written
    val corpus1 = spark.read.parquet(sinks.corpus)
      .select("doc_id").as[Long](longEnc).collect().toSet
    assert(corpus1 === Set(30L, 32L))
    val nd1 = spark.read.parquet(s"${sinks.rejects}_neardup")
    assert(nd1.collect().map(r => (r.getLong(0), r.getString(2))).toSeq ===
      Seq((31L, "near_dup")))
    // index carries SURVIVOR signatures only
    val indexed1 = spark.read.parquet(idx).select("id").as[Long](longEnc)
      .collect().toSet
    assert(indexed1 === Set(30L, 32L))

    // batch 2 (same checkpoint — the stream resumes): another near-copy
    // of doc 30 must be caught AGAINST THE INDEX, not any in-batch mate
    Files.writeString(java.nio.file.Paths.get(s"$src/b.jsonl"),
      doc(40, base + " trailing addition") + "\n" +
        doc(41, "yet another fully unrelated document about watermark " +
          "state eviction semantics") + "\n")
    run()

    val corpus2 = spark.read.parquet(sinks.corpus)
      .select("doc_id").as[Long](longEnc).collect().toSet
    assert(corpus2 === Set(30L, 32L, 41L))
    val nd2 = spark.read.parquet(s"${sinks.rejects}_neardup")
      .select("doc_id").as[Long](longEnc).collect().toSet
    assert(nd2 === Set(31L, 40L))
    val indexed2 = spark.read.parquet(idx).select("id").as[Long](longEnc)
      .collect().toSet
    assert(indexed2 === Set(30L, 32L, 41L))
  }

  test("near-dup index consolidation: accept/reject decisions identical across fold boundaries; the probe's listed-dir count stays bounded; the signature schema contract matches the written footer") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val others = Seq(
      "completely different second subject matter entirely about spark shuffles",
      "yet another fully unrelated document about watermark state eviction",
      "a third standalone text concerning parquet footers and column pruning",
      "fourth independent piece on broadcast joins and adaptive execution")
    // six single-file triggers; near-copies of EARLIER batches' docs must
    // be caught against the index whether the tail was folded or not
    val files = Seq(
      Seq(doc(100, base), doc(101, others(0))),
      Seq(doc(102, base + " extra marker")),
      Seq(doc(103, others(1))),
      Seq(doc(104, base + " trailing addition"), doc(105, others(2))),
      Seq(doc(106, others(0) + " with a small tail")),
      Seq(doc(107, others(3))))

    def run(consolidateAfter: Int): (String, Set[Long], Set[Long], Long) = {
      val src = tmpDir(s"doc_src_fold$consolidateAfter")
      // distinct mtimes pin the trigger order (the file source orders
      // by modification time; same-millisecond writes replay in an
      // undefined order)
      files.zipWithIndex.foreach { case (ls, i) =>
        val p = java.nio.file.Paths.get(f"$src/f$i%02d.jsonl")
        Files.writeString(p, ls.mkString("\n") + "\n")
        assert(p.toFile.setLastModified(
          System.currentTimeMillis() - 120000 + i * 10000))
      }
      val root = tmpDir(s"doc_out_fold$consolidateAfter")
      val sinks = Sinks(s"$root/corpus", s"$root/rejects", s"$root/error",
        s"$root/checkpoint")
      val idx = s"$root/idx"
      val (m, r, d) = DocIngest.start(
        spark.readStream.option("maxFilesPerTrigger", "1").text(src),
        sinks, Trigger.AvailableNow(), nearDupIndex = Some(idx),
        nearDupThreshold = 0.3, consolidateAfter = consolidateAfter)
      assert(m.awaitTermination(180000), "stream did not finish in 180s")
      assert(r.awaitTermination(120000), "stream did not finish in 120s")
      assert(d.awaitTermination(120000), "stream did not finish in 120s")
      val accepted = spark.read.parquet(sinks.corpus)
        .select("doc_id").as[Long](longEnc).collect().toSet
      val rejected = spark.read.parquet(s"${sinks.rejects}_neardup")
        .select("doc_id").as[Long](longEnc).collect().toSet
      (idx, accepted, rejected, m.lastProgress.batchId)
    }

    // PARITY: a folding tenant (threshold 1 — folds early and often)
    // decides exactly like a never-folding one
    val (idxF, accF, rejF, lastBatch) = run(consolidateAfter = 1)
    val (idxN, accN, rejN, _) = run(consolidateAfter = 0)
    assert(rejF.nonEmpty, "no near-dup rejects — the parity check is vacuous")
    assert(accF === accN, "folding changed the accept decisions")
    assert(rejF === rejN, "folding changed the reject decisions")
    assert(accF === Set(100L, 101L, 103L, 105L, 107L))
    assert(rejF === Set(102L, 104L, 106L))

    // BOUND: the folding tenant's probe listing is ≤ threshold + 2 dirs
    // (consol + tail), the never-folding one grew one dir per survivor
    // batch
    val (consolF, tailF) =
      DocIngest.indexParts(spark, idxF, lastBatch + 1)
    assert(consolF.nonEmpty, "threshold-1 tenant never folded")
    assert(1 + tailF.size <= 3,
      s"probe listing unbounded: consol=$consolF tail=$tailF")
    val (consolN, tailN) = DocIngest.indexParts(spark, idxN, lastBatch + 1)
    assert(consolN.isEmpty && tailN.size >= 4,
      s"the no-fold control folded anyway: $consolN/$tailN")

    // INDEX CONTENT parity: both tenants index the same survivors
    def indexed(idx: String): Set[Long] = {
      val (c, t) = DocIngest.indexParts(spark, idx, Long.MaxValue)
      val dirs = c.map(i => s"$idx/consol_id=$i").toSeq ++
        t.map(i => s"$idx/batch_id=$i")
      spark.read.schema(DocIngest.signatureSchema).parquet(dirs: _*)
        .select("id").as[Long](longEnc).collect().toSet
    }
    assert(indexed(idxF) === accF, "folded index lost or gained documents")
    assert(indexed(idxN) === accF)

    // SCHEMA CONTRACT: the declared signatureSchema matches what a
    // committed dir's footer actually holds (name + type; a drift here
    // would make forget's victim predicate silently match nothing)
    val footDir = new java.io.File(idxN).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .head.toString
    val footer = spark.read.parquet(footDir).schema
    assert(footer.fields.map(f => (f.name, f.dataType)).toSeq ===
      DocIngest.signatureSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"signatureSchema drifted from the written layout: $footer")
  }

  test("compactAfter cadence: bounded dir counts across triggers on every sink; split pruning and stream resume survive; forget deletes victims from folded dirs") {
    import graft.streaming.ArchiveCompaction
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val others = Seq(
      "completely different second subject matter entirely about spark shuffles",
      "yet another fully unrelated document about watermark state eviction",
      "a third standalone text concerning parquet footers and column pruning",
      "fourth independent piece on broadcast joins and adaptive execution")
    // the fold test's six-trigger fixture (decisions pinned there)
    val files = Seq(
      Seq(doc(100, base), doc(101, others(0))),
      Seq(doc(102, base + " extra marker")),
      Seq(doc(103, others(1))),
      Seq(doc(104, base + " trailing addition"), doc(105, others(2))),
      Seq(doc(106, others(0) + " with a small tail")),
      Seq(doc(107, others(3))))
    val src = tmpDir("doc_src_cadence")
    files.zipWithIndex.foreach { case (ls, i) =>
      val p = java.nio.file.Paths.get(f"$src/f$i%02d.jsonl")
      Files.writeString(p, ls.mkString("\n") + "\n")
      assert(p.toFile.setLastModified(
        System.currentTimeMillis() - 120000 + i * 10000))
    }
    val root = tmpDir("doc_out_cadence")
    val sinks = Sinks(s"$root/corpus", s"$root/rejects", s"$root/error",
      s"$root/checkpoint")
    val idx = s"$root/idx"
    def run(): Unit = {
      val (m, r, d) = DocIngest.start(
        spark.readStream.option("maxFilesPerTrigger", "1").text(src),
        sinks, Trigger.AvailableNow(), nearDupIndex = Some(idx),
        nearDupThreshold = 0.3, consolidateAfter = 1, compactAfter = 2)
      assert(m.awaitTermination(180000), "stream did not finish in 180s")
      assert(r.awaitTermination(120000), "stream did not finish in 120s")
      assert(d.awaitTermination(120000), "stream did not finish in 120s")
    }
    run()

    def corpusIds: Set[Long] = spark.read.parquet(sinks.corpus)
      .select("doc_id").as[Long](longEnc).collect().toSet
    // decisions identical to the uncompacted tenant (the fold test's
    // pinned sets) — compaction must never change content
    assert(corpusIds === Set(100L, 101L, 103L, 105L, 107L))
    assert(spark.read.parquet(s"${sinks.rejects}_neardup")
      .select("doc_id").as[Long](longEnc).collect().toSet ===
      Set(102L, 104L, 106L))

    // BOUNDED: every accreting sink holds ≤ compactAfter + 1 dirs
    // (k retained + at most one folded) after 6 triggers
    def dirCount(r: String): Int = ArchiveCompaction.batchIds(spark, r).size
    assert(dirCount(sinks.corpus) <= 3,
      s"corpus dirs unbounded: ${dirCount(sinks.corpus)}")
    assert(dirCount(sinks.rejects) <= 3)
    assert(dirCount(s"${sinks.rejects}_neardup") <= 3)

    // split pruning survives the folded layout
    val plan = spark.read.parquet(sinks.corpus)
      .filter(col("split") === "train")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(split"),
      s"split pruning lost under the cadence:\n$plan")

    // RESUME on the same checkpoint over the folded layout: a fresh
    // doc lands, a near-copy of folded doc 100's text is still caught
    // against the (consolidated) index, and the bound holds. 109's
    // text must be NEVER-SEEN (an exact repeat of 102's would be
    // swallowed by the digest-dedup state, not the near-dup gate) and
    // is an empirically verified band-collider with `base`.
    val p6 = java.nio.file.Paths.get(s"$src/f06.jsonl")
    Files.writeString(p6,
      doc(108, "entirely new fifth document about executor memory tuning") +
        "\n" + doc(109, base + " second trailing piece") + "\n")
    assert(p6.toFile.setLastModified(System.currentTimeMillis() - 50000))
    run()
    assert(corpusIds === Set(100L, 101L, 103L, 105L, 107L, 108L))
    assert(spark.read.parquet(s"${sinks.rejects}_neardup")
      .select("doc_id").as[Long](longEnc).collect().toSet ===
      Set(102L, 104L, 106L, 109L))
    assert(dirCount(sinks.corpus) <= 3, "bound broke across resume")

    // FORGET from a FOLDED dir: doc 100 arrived in batch 0, which the
    // cadence folded — its corpus rows and signatures must still delete
    val foldedId = ArchiveCompaction.batchIds(spark, sinks.corpus).min
    assert(spark.read.parquet(s"${sinks.corpus}/batch_id=$foldedId")
        .filter(col("doc_id") === 100L).count() === 1,
      "victim 100 not in the folded dir — the forget check is vacuous")
    DocIngest.forget(spark, sinks, Seq(100L), Some(idx))
    assert(corpusIds === Set(101L, 103L, 105L, 107L, 108L))
    val (c, t) = DocIngest.indexParts(spark, idx, Long.MaxValue)
    val dirs = c.map(i => s"$idx/consol_id=$i").toSeq ++
      t.map(i => s"$idx/batch_id=$i")
    assert(!spark.read.schema(DocIngest.signatureSchema)
        .parquet(dirs: _*).select("id").as[Long](longEnc)
        .collect().toSet.contains(100L),
      "victim signatures survived in the folded index")
  }

  test("lifecycle: ingest -> fold -> quiesce -> forget (victims in consol AND tail) -> resume probes the rewritten index; forgotten text re-accepts as new, surviving text still rejects") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val others = Seq(
      "completely different second subject matter entirely about spark shuffles",
      "yet another fully unrelated document about watermark state eviction",
      "a third standalone text concerning parquet footers and column pruning",
      "fourth independent piece on broadcast joins and adaptive execution")
    // ASCENDING event times, 3 h apart: the watermark (lateness 1 h)
    // advances across triggers, so by the resume the early digests
    // have evicted from the dedup state — a re-arrival then reaches
    // the NEAR-DUP gate, which is the seam under test (an exact-dup
    // drop in the digest state would make the re-accept pin vacuous)
    def ts(i: Int): String = f"2026-08-12T${8 + 3 * i}%02d:00:00.000Z"
    val files = Seq(
      Seq(doc(200, base, ts = ts(0)), doc(201, others(0), ts = ts(0))),
      Seq(doc(202, others(1), ts = ts(1))),
      Seq(doc(203, others(2), ts = ts(2))),
      Seq(doc(204, others(3), ts = ts(3))))
    val src = tmpDir("doc_src_lifecycle")
    files.zipWithIndex.foreach { case (ls, i) =>
      val p = java.nio.file.Paths.get(f"$src/f$i%02d.jsonl")
      Files.writeString(p, ls.mkString("\n") + "\n")
      assert(p.toFile.setLastModified(
        System.currentTimeMillis() - 120000 + i * 10000))
    }
    val root = tmpDir("doc_out_lifecycle")
    val sinks = Sinks(s"$root/corpus", s"$root/rejects", s"$root/error",
      s"$root/checkpoint")
    val idx = s"$root/idx"
    def run(): Unit = {
      val (m, r, d) = DocIngest.start(
        spark.readStream.option("maxFilesPerTrigger", "1").text(src),
        sinks, Trigger.AvailableNow(), nearDupIndex = Some(idx),
        nearDupThreshold = 0.3, consolidateAfter = 2)
      assert(m.awaitTermination(180000), "stream did not finish in 180s")
      assert(r.awaitTermination(120000), "stream did not finish in 120s")
      assert(d.awaitTermination(120000), "stream did not finish in 120s")
    }
    run()
    def corpusIds: Set[Long] = spark.read.parquet(sinks.corpus)
      .select("doc_id").as[Long](longEnc).collect().toSet
    assert(corpusIds === Set(200L, 201L, 202L, 203L, 204L))

    // the victim set must span BOTH layout generations: 200's
    // signatures folded into the consol, 204's still in a tail dir
    val (consol, tail) = DocIngest.indexParts(spark, idx, Long.MaxValue)
    assert(consol.nonEmpty && tail.nonEmpty,
      s"fixture must leave consol AND tail: $consol/$tail")
    def sigIds(dir: String): Set[Long] =
      spark.read.schema(DocIngest.signatureSchema).parquet(dir)
        .select("id").as[Long](longEnc).collect().toSet
    assert(sigIds(s"$idx/consol_id=${consol.get}").contains(200L),
      "victim 200 not in the consol — the cross-generation pin is vacuous")
    assert(tail.exists(t => sigIds(s"$idx/batch_id=$t").contains(204L)),
      "victim 204 not in a tail dir")

    // QUIESCE (streams terminated) -> whole-tenant forget
    DocIngest.forget(spark, sinks, Seq(200L, 204L), Some(idx))
    assert(corpusIds === Set(201L, 202L, 203L))

    // RESUME on the same checkpoint: the next triggers' probes read
    // the rewritten index cleanly (consol rewritten, 204's tail dir
    // retired whole)
    val p4 = java.nio.file.Paths.get(s"$src/f04.jsonl")
    Files.writeString(p4,
      doc(210, base, ts = ts(4)) + "\n" + // forgotten text re-arrives
        doc(211, others(1), ts = ts(4)) + "\n" + // surviving 202's text
        doc(212, "entirely new fifth document about executor memory " +
          "tuning", ts = ts(4)) + "\n")
    assert(p4.toFile.setLastModified(System.currentTimeMillis() - 50000))
    run()

    // the forgotten text is a NEW document (documented semantics: its
    // signatures are gone, so the gate has never seen it); surviving
    // 202's text still rejects against its retained signatures
    assert(corpusIds === Set(201L, 202L, 203L, 210L, 212L),
      "re-arrival of forgotten text was not re-accepted (or fresh doc lost)")
    assert(spark.read.parquet(s"${sinks.rejects}_neardup")
        .select("doc_id").as[Long](longEnc).collect().toSet === Set(211L),
      "surviving document's re-arrival was not near-dup rejected")
    // and the re-accepted document is indexed again
    val (c2, t2) = DocIngest.indexParts(spark, idx, Long.MaxValue)
    val dirs = c2.map(i => s"$idx/consol_id=$i").toSeq ++
      t2.map(i => s"$idx/batch_id=$i")
    val indexed = spark.read.schema(DocIngest.signatureSchema)
      .parquet(dirs: _*).select("id").as[Long](longEnc).collect().toSet
    assert(indexed === Set(201L, 202L, 203L, 210L, 212L),
      s"post-resume index diverged: $indexed")
  }

  test("corpus compaction folds batch dirs and keeps split partition pruning") {
    import graft.streaming.ArchiveCompaction
    val src = tmpDir("doc_src5")
    // two files → two micro-batches → two batch_id dirs under the corpus
    Files.writeString(java.nio.file.Paths.get(s"$src/a.jsonl"),
      doc(50, "first corpus document with enough tokens") + "\n")
    val root = tmpDir("doc_out5")
    val sinks = Sinks(s"$root/corpus", s"$root/rejects", s"$root/error",
      s"$root/checkpoint")
    def run(): Unit = {
      val (m, r, d) = DocIngest.start(
        spark.readStream.option("maxFilesPerTrigger", "1").text(src),
        sinks, Trigger.AvailableNow())
      assert(m.awaitTermination(120000), "stream did not finish in 120s"); assert(r.awaitTermination(120000), "stream did not finish in 120s")
      assert(d.awaitTermination(120000), "stream did not finish in 120s")
    }
    run()
    Files.writeString(java.nio.file.Paths.get(s"$src/b.jsonl"),
      doc(51, "second corpus document with enough tokens") + "\n")
    run()

    // ≥2 dirs: one per data batch, plus possibly a no-data batch's empty dir
    val ids = ArchiveCompaction.batchIds(spark, sinks.corpus).sorted
    assert(ids.size >= 2)
    assert(ArchiveCompaction.compact(spark, sinks.corpus, ids.max) === ids.size)
    val corpus = spark.read.parquet(sinks.corpus)
    assert(corpus.count() === 2)
    // split stayed a PHYSICAL partition: the filter pushes as a
    // PartitionFilter (downstream train/val/test readers keep pruning)
    val plan = corpus.filter(col("split") === "train")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(split"),
      s"split pruning lost after compaction:\n$plan")
  }

  private def longEnc = org.apache.spark.sql.Encoders.scalaLong
}
