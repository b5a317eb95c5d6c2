package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-18 OPTIMIZATION guards — the pass changed decode internals and
  * physical layout, not semantics, and these pin exactly that:
  *
  *  - `decodeWav` (the per-thread SPI-reader path that replaced
  *    `AudioSystem.getAudioInputStream` in the row loops) must produce
  *    the SAME PCM bytes and format as AudioSystem, round-trip
  *    `encodeWav` exactly, fail loud naming the doc on corrupt bytes,
  *    and be safe under the concurrency that motivated it.
  *  - `decodeImage` (per-thread PNG reader over a memory-cached stream)
  *    must stay pixel-identical to `ImageIO.read` and thread-safe.
  *  - `Tables.parallelized` (the expensive-map parallelism floor) must
  *    floor a narrow scan to defaultParallelism and be a provable no-op
  *    on inputs already at or above it — the property that makes it
  *    scale-adaptive rather than a local[32] constant.
  *  - the media store must stage as MULTIPLE files when the session has
  *    more than one core (the single-file layout was the round's m*
  *    serialization bug).
  */
class Round18OptSpec extends AnyFunSuite {
  import TestSession._

  test("decodeWav == AudioSystem byte-for-byte and round-trips encodeWav") {
    val samples = Array.tabulate(100)(i => ((i * i * 7919L) % 65536 - 32768).toShort)
    val wav = graft.operators.Multimodal.encodeWav(samples)

    val ours = graft.operators.Multimodal.decodeWav(7L, wav)
    val oursFmt = ours.getFormat
    val oursPcm = ours.readAllBytes(); ours.close()

    val ref = javax.sound.sampled.AudioSystem
      .getAudioInputStream(new java.io.ByteArrayInputStream(wav))
    val refPcm = ref.readAllBytes(); ref.close()

    assert(java.util.Arrays.equals(oursPcm, refPcm), "PCM payload must match AudioSystem")
    assert(oursFmt.getSampleRate == 8000f && oursFmt.getSampleSizeInBits == 16)
    // and the samples themselves round-trip exactly (little-endian s16)
    val back = Array.tabulate(samples.length) { i =>
      (((oursPcm(2 * i) & 0xff) | (oursPcm(2 * i + 1) << 8)).toShort)
    }
    assert(back.sameElements(samples))
  }

  test("decodeWav fails loud naming the doc on corrupt bytes") {
    val e = intercept[IllegalArgumentException] {
      graft.operators.Multimodal.decodeWav(42L, Array[Byte](1, 2, 3, 4))
    }
    assert(e.getMessage.contains("42"))
  }

  test("decodeWav and decodeImage are stable under the concurrency that motivated them") {
    val samples = Array.tabulate(80)(i => ((i * 31L) % 65536 - 32768).toShort)
    val wav = graft.operators.Multimodal.encodeWav(samples)
    val png = graft.operators.Multimodal.encodePng(5, 4, i => (i * 13) & 0xff)
    val refImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val refPx = for (y <- 0 until 4; x <- 0 until 5) yield refImg.getRaster.getSample(x, y, 0)

    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 16).map { t =>
      new Thread(() =>
        try {
          var i = 0
          while (i < 50) {
            val ais = graft.operators.Multimodal.decodeWav(t.toLong, wav)
            val pcm = ais.readAllBytes(); ais.close()
            assert(pcm.length == samples.length * 2)
            val img = graft.operators.Multimodal.decodeImage(t.toLong, png)
            val px = for (y <- 0 until 4; x <- 0 until 5) yield img.getRaster.getSample(x, y, 0)
            assert(px == refPx)
            i += 1
          }
        } catch { case e: Throwable => errs.add(e) }
      )
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent decode failed: ${Option(errs.peek()).map(_.toString)}")
  }

  test("Tables.parallelized floors a narrow scan and no-ops at/above defaultParallelism") {
    val target = spark.sparkContext.defaultParallelism
    val docs = graft.sources.Tables.documents(spark, sf)
    assume(docs.rdd.getNumPartitions < target, "sf fixture must be narrow for the floor case")
    val floored = graft.sources.Tables.parallelized(docs)
    assert(floored.rdd.getNumPartitions == target)
    // same rows either way — the floor is layout-only
    assert(floored.count() == docs.count())
    // r19: the helper now REJECTS non-raw-scan input outright (probing
    // df.rdd on a shuffled/AQE subtree was the r18 sharp edge), so the
    // no-op-above-the-floor property is pinned on raw scans in
    // Round19OptSpec and the old in-memory wide case asserts the guard.
    val wide = spark.range(1000).repartition(target + 3).toDF()
    intercept[IllegalArgumentException](graft.sources.Tables.parallelized(wide))
  }

  test("media store stages as multiple files on a multi-core session") {
    val store = graft.operators.Multimodal.mediaStore(spark, sf)
    val files = new java.io.File(s"$store/media").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    // sf0.001 has ~50 docs: nFiles = min(defaultParallelism, 50/32+1=2)
    assert(files.length >= 2, s"expected a multi-file store, got ${files.length}")
    // and the store still carries every document exactly once
    val n = spark.read.parquet(s"$store/media").select("doc_id").distinct().count()
    assert(n == graft.sources.Tables.documents(spark, sf).count())
  }
}
