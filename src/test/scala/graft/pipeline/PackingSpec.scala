package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sequence packing invariants: within a shard the token stream is gapless
  * and overlap-free (every doc starts exactly where the previous ended),
  * chunk ranges follow from pure integer arithmetic, and the layout is
  * deterministic across runs.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    val rnd = new scala.util.Random(3)
    (0L until 400L).map(i => (i, rnd.nextInt(900).toLong)).toDF("doc_id", "n_tokens")
  }

  test("shard token streams are gapless and overlap-free; chunk math is exact") {
    val out = Packing.packChunks(docs, ctxTokens = 100L, nShards = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(0)))
    val toks = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val ordered = rows.sortBy(_._2)
      var expectStart = 0L
      ordered.foreach { case (_, start, cf, cl, nc, id) =>
        val n = toks(id)
        assert(start == expectStart, s"shard $shard doc $id: start $start != $expectStart")
        expectStart += n
        assert(cf == start / 100, s"doc $id chunk_first")
        val wantLast = if (n > 0) (start + n - 1) / 100 else start / 100
        assert(cl == wantLast && nc == wantLast - cf + 1, s"doc $id chunk range")
      }
    }
    // every doc appears exactly once across shards
    assert(out.length == 400 && out.map(_._6).distinct.length == 400)
  }

  test("chunkSpans: every chunk but each shard's last is exactly ctx-full; totals conserve") {
    val spans = Packing.chunkSpans(docs, ctxTokens = 100L, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    spans.groupBy(_._1).foreach { case (shard, rows) =>
      val maxChunk = rows.map(_._2).max
      rows.foreach { case (_, chunk, nDocs, fill) =>
        assert(nDocs >= 1)
        if (chunk < maxChunk)
          assert(fill == 100L, s"shard $shard chunk $chunk fill $fill != ctx")
        else
          assert(fill >= 1 && fill <= 100L, s"shard $shard final chunk fill $fill")
      }
      // chunk ids are contiguous from 0
      assert(rows.map(_._2).sorted.toSeq == (0L to maxChunk), s"shard $shard has chunk gaps")
    }
    // token conservation: fills sum to the corpus token count
    val totalTokens = docs.agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(spans.map(_._4).sum == totalTokens)
  }

  test("packing is deterministic across runs and rejects bad token counts") {
    val a = Packing.packChunks(docs, 100L, 4).collect().toSeq.map(_.toSeq)
    val b = Packing.packChunks(docs, 100L, 4).collect().toSeq.map(_.toSeq)
    assert(a.toSet == b.toSet)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val bad = Seq((1L, -3L)).toDF("doc_id", "n_tokens")
    val e = intercept[Exception] { Packing.packChunks(bad, 100L, 4).collect() }
    assert(messages(e).exists(_.contains("non-negative")), s"got: $e")
  }

  // ----------------------------------------------- length bucketing

  test("lengthBuckets: pow2 boundaries, full batches except the last, <2x padding within any batch") {
    val rnd = new scala.util.Random(29)
    val mix = (0L until 500L).map(i => (i, rnd.nextInt(1000).toLong)).toDF("doc_id", "n_tokens")
    val out = Packing.lengthBuckets(mix, batchSize = 8L, nShards = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("bucket"), r.getAs[Long]("shard"), r.getAs[Long]("pos"),
        r.getAs[Long]("batch_idx")))
    assert(out.length == 500)
    // bucket b holds exactly [2^(b-1), 2^b) tokens; zero-token docs bucket 0
    out.foreach { case (id, n, b, _, _, _) =>
      if (n == 0) assert(b == 0, s"doc $id")
      else assert(n >= (1L << (b - 1).toInt) && n < (1L << b.toInt),
        s"doc $id: $n tokens outside bucket $b")
    }
    out.groupBy(t => (t._4, t._3)).foreach { case ((shard, bucket), rows) =>
      // positions contiguous per (shard, bucket) stream
      assert(rows.map(_._5).sorted.toSeq == (1L to rows.length))
      // every batch full except possibly the highest index
      val byBatch = rows.groupBy(_._6)
      val maxIdx = byBatch.keys.max
      byBatch.foreach { case (idx, b2) =>
        if (idx < maxIdx) assert(b2.length == 8, s"batch ($shard,$bucket,$idx) not full")
        // padding bound: max/min token ratio within a batch < 2 (same bucket)
        val ns = b2.map(_._2).filter(_ > 0)
        if (ns.nonEmpty) assert(ns.max < ns.min * 2 || ns.min == 0 || ns.max == ns.min,
          s"batch ($shard,$bucket,$idx) spans ${ns.min}..${ns.max}")
      }
    }
    // deterministic
    val again = Packing.lengthBuckets(mix, batchSize = 8L, nShards = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("batch_idx")))
    assert(out.map(t => (t._1, t._6)).sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // negative token counts fail loudly
    val e = intercept[Exception] {
      Packing.lengthBuckets(Seq((1L, -2L)).toDF("doc_id", "n_tokens"), 8L, 2).collect()
    }
    assert(e.getMessage.contains("non-negative"), s"got: ${e.getMessage}")
  }

  // ------------------------------------------------ mixture interleave

  test("interleaveByWeight: sorted prefixes hold every stratum in weight proportion (bounded discrepancy)") {
    val mix = ((0L until 300L).map(i => (i, "a")) ++
      (300L until 400L).map(i => (i, "b")) ++
      (400L until 600L).map(i => (i, "c")) ++
      (600L until 620L).map(i => (i, "zz"))).toDF("doc_id", "src")
    val weights = Map("a" -> 3L, "b" -> 1L, "c" -> 2L)
    val out = Packing.interleaveByWeight(mix, "src", weights, nShards = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("src"),
        r.getAs[Long]("shard"), r.getAs[Long]("pos"), r.getAs[Long]("ikey")))
    // unlisted stratum dropped
    assert(!out.exists(_._2 == "zz") && out.length == 600)
    // within each shard's sorted stream, every prefix holds each stratum
    // within 1 doc of its weight share of what that stratum has consumed —
    // the stride-scheduling discrepancy bound: docs of stratum i in keys
    // <= K is |{p : (2p-1)/(2w) <= K}| = floor(K*w + 1/2), so two strata's
    // counts stay in ratio w1:w2 up to rounding
    out.groupBy(_._3).foreach { case (shard, rows) =>
      val ordered = rows.sortBy(t => (t._5, t._2, t._1))
      val totalW = weights.values.sum.toDouble
      val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
      ordered.zipWithIndex.foreach { case ((_, srcK, _, _, _), idx) =>
        counts(srcK) += 1
        val n = idx + 1
        // only check prefixes where no stratum is exhausted yet
        val exhausted = weights.keys.exists(k =>
          counts(k) == rows.count(_._2 == k))
        if (!exhausted) {
          weights.foreach { case (k, wgt) =>
            val expect = n * wgt / totalW
            assert(math.abs(counts(k) - expect) <= 2.0,
              s"shard $shard prefix $n: stratum $k at ${counts(k)} vs ~$expect")
          }
        }
      }
    }
    // deterministic
    val again = Packing.interleaveByWeight(mix, "src", weights, nShards = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("ikey")))
    assert(out.map(t => (t._1, t._5)).sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  // ------------------------------------------------------ epoch shuffle

  test("epochShuffle: every doc placed once, pos contiguous per shard, deterministic") {
    val ids = (0L until 300L).map(Tuple1(_)).toDF("doc_id")
    val out = Packing.epochShuffle(ids, nShards = 4, epoch = 0L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(out.length == 300 && out.map(_._1).toSet.size == 300)
    assert(out.forall(t => t._2 >= 0 && t._2 < 4))
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length),
        s"shard $shard positions not contiguous")
    }
    // md5 spreads shards roughly evenly (each ~75 of 300)
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.length > 40 && rows.length < 120, s"shard $shard size ${rows.length}")
    }
    val again = Packing.epochShuffle(ids, nShards = 4, epoch = 0L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("epochShuffle: epochs are uncorrelated — docs move shards and orders diverge") {
    val ids = (0L until 300L).map(Tuple1(_)).toDF("doc_id")
    def layout(e: Long) = Packing.epochShuffle(ids, nShards = 4, epoch = e).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("shard"), r.getAs[Long]("pos"))).toMap
    val e0 = layout(0L); val e1 = layout(1L)
    // an avalanche hash moves ~3/4 of docs to a different shard
    val moved = (0L until 300L).count(i => e0(i)._1 != e1(i)._1)
    assert(moved > 150, s"only $moved/300 docs changed shard between epochs")
    // within docs that stayed on their shard, the relative order reshuffles
    val stayed = (0L until 300L).filter(i => e0(i)._1 == e1(i)._1)
    val samePos = stayed.count(i => e0(i)._2 == e1(i)._2)
    assert(samePos < stayed.length / 2, s"$samePos/${stayed.length} kept their position")
  }

  test("epochShuffle: shard derives from the md5 epoch key exactly as documented") {
    // independent JVM-side computation of the shard for a handful of ids —
    // pins the conv(hex,16,10) % n path against a reference implementation
    val md = java.security.MessageDigest.getInstance("MD5")
    def expectShard(epoch: Long, id: Long, n: Int): Long = {
      val hex = md.digest(s"$epoch:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % n
    }
    val ids = (0L until 20L).map(Tuple1(_)).toDF("doc_id")
    val got = Packing.epochShuffle(ids, nShards = 8, epoch = 5L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    (0L until 20L).foreach { i =>
      assert(got(i) == expectShard(5L, i, 8), s"doc $i shard mismatch")
    }
  }

  test("chunkWithOverlap: coverage, overlap arithmetic, short/empty docs, guards") {
    import spark.implicits._
    // 10 tokens, chunk 4, overlap 1 -> stride 3 -> starts 0,3,6 (6+4=10 covers)
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "a b"),   // shorter than one chunk: single short chunk
      (3L, "")       // empty: emits nothing
    ).toDF("doc_id", "text")
    val out = Packing.chunkWithOverlap(docs, chunkTokens = 4, overlapTokens = 1)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 7L), (1L, 2L, 6L, 10L),
      (2L, 0L, 0L, 2L)))
    // every token position of doc 1 is inside at least one chunk, and
    // consecutive full chunks overlap by exactly `overlap`
    val spans = out.filter(_._1 == 1L).map(t => (t._3, t._4))
    assert((0L until 10L).forall(p => spans.exists(s => p >= s._1 && p < s._2)))
    spans.sliding(2).foreach { case Array((_, e1), (s2, _)) =>
      assert(e1 - s2 == 1L, "full consecutive chunks must overlap by exactly overlapTokens")
    }
    intercept[IllegalArgumentException] {
      Packing.chunkWithOverlap(docs, chunkTokens = 4, overlapTokens = 4)
    }
  }

  test("shardManifest: counts/totals per shard; fingerprint is order-exact and detects swaps") {
    import spark.implicits._
    val placed = Seq(
      (1L, 0L, 1L, 10L), (2L, 0L, 2L, 20L), (3L, 1L, 1L, 5L))
      .toDF("doc_id", "shard", "pos", "n_tokens")
    val m = Packing.shardManifest(placed).orderBy("shard").collect()
    assert(m.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 2L, 30L), (1L, 1L, 5L)))
    // swapping two docs' positions keeps counts/totals but MUST change the
    // fingerprint — that is the whole point of baking pos into each term
    val swapped = Seq(
      (2L, 0L, 1L, 20L), (1L, 0L, 2L, 10L), (3L, 1L, 1L, 5L))
      .toDF("doc_id", "shard", "pos", "n_tokens")
    val m2 = Packing.shardManifest(swapped).orderBy("shard").collect()
    assert(m2(0).getLong(1) == 2L && m2(0).getLong(2) == 30L)
    assert(m2(0).getLong(3) != m(0).getLong(3), "swap must change the fingerprint")
    assert(m2(1).getLong(3) == m(1).getLong(3), "untouched shard fingerprint is stable")
    // token column optional: without it the schema drops n_tokens
    val noTok = Packing.shardManifest(placed.drop("n_tokens"))
    assert(noTok.columns.toSeq == Seq("shard", "n_docs", "fingerprint"))
  }

  test("purgePropagate: dirty set is sound+complete; chunks before rebuild_from survive a repack byte-identically; purged bytes survive nowhere") {
    val ctx = 100L
    val purgedIds = Set(7L, 42L, 111L, 256L, 340L)
    val purged = purgedIds.toSeq.map(Tuple1(_)).toDF("doc_id")
    val layout = Packing.packChunks(docs, ctx, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val toks = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // per-(shard, chunk) content = set of (doc, tokens-overlapping-chunk)
    def contents(rows: Seq[(Long, Long, Long, Long, Long)]): Map[(Long, Long), Set[(Long, Long)]] =
      rows.filter(r => toks(r._1) > 0).flatMap { case (id, shard, start, cf, cl) =>
        (cf to cl).map { c =>
          val in = math.min(start + toks(id), (c + 1) * ctx) - math.max(start, c * ctx)
          ((shard, c), (id, in))
        }
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val orig = contents(layout)

    val got = Packing.purgePropagate(docs, purged, ctx, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    // SOUND + COMPLETE: the dirty set is exactly the chunks holding
    // purged bytes, with the exact purged token mass
    val wantDirty = orig.toSeq.flatMap { case ((shard, c), content) =>
      val hit = content.filter(x => purgedIds.contains(x._1))
      if (hit.nonEmpty) Some((shard, c) -> ((hit.size.toLong, hit.map(_._2).sum))) else None
    }.toMap
    assert(got.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap == wantDirty,
      "dirty chunks must be exactly the chunks containing purged bytes")
    // rebuild_from = the shard's first dirty chunk
    got.groupBy(_._1).foreach { case (shard, rows) =>
      assert(rows.forall(_._5 == rows.map(_._2).min), s"shard $shard rebuild_from wrong")
    }
    // REPACK the survivors: chunks strictly before rebuild_from are
    // byte-identical (same docs, same per-chunk token spans), and no
    // surviving chunk contains a purged doc's bytes ANYWHERE
    val repacked = contents(
      Packing.packChunks(docs.where(!col("doc_id").isin(purgedIds.toSeq: _*)), ctx, nShards = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq)
    assert(repacked.values.forall(_.forall(x => !purgedIds.contains(x._1))),
      "a purged doc's bytes must appear in no surviving chunk")
    val rebuildFrom = got.groupBy(_._1).map { case (sh, rows) => sh -> rows.map(_._2).min }
    rebuildFrom.foreach { case (shard, from) =>
      (0L until from).foreach { c =>
        assert(orig.get((shard, c)) == repacked.get((shard, c)),
          s"shard $shard chunk $c precedes the purge point and must repack byte-identically")
      }
    }
    // a shard with no purged docs never appears (nothing to rebuild)
    val dirtyShards = got.map(_._1).toSet
    val purgedShards = layout.filter(r => purgedIds.contains(r._1) && toks(r._1) > 0).map(_._2).toSet
    assert(dirtyShards == purgedShards)
  }
}
