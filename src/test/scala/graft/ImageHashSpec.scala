package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.multimodal.{ImageHash, Multimodal}

/** Perceptual image dedup (q175): dHash exactness on crafted rasters,
  * lossless banding vs a driver brute force, rendition robustness. */
class ImageHashSpec extends SparkSpec {

  private def raster(w: Int, h: Int)(lum: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.max(0, math.min(255, lum(x, y)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("dHash: constant raster hashes to 0, strict horizontal gradient to all ones") {
    assert(ImageHash.dHash64(raster(18, 16)((_, _) => 128)) === 0L)
    // 18px wide over a 9-cell grid: each cell spans 2 columns with
    // strictly increasing luminance, so every adjacent-cell comparison
    // fires -> all 64 bits set.
    assert(ImageHash.dHash64(raster(18, 16)((x, _) => x * 14)) === -1L)
  }

  test("dHash: tiny rasters (below grid size) still hash deterministically") {
    val h1 = ImageHash.dHash64(raster(4, 3)((x, y) => x * 40 + y))
    val h2 = ImageHash.dHash64(raster(4, 3)((x, y) => x * 40 + y))
    assert(h1 === h2)
  }

  test("luminance grid: constant raster yields exact per-cell means and " +
    "the grid-derived hash equals the direct one on varied rasters") {
    val flat = raster(18, 16)((_, _) => 200)
    val sums = ImageHash.lumSums(flat)
    val cnts = ImageHash.cellCounts(18, 16)
    assert(sums.length === 72 && cnts.length === 72)
    // every 2x2 cell of constant luminance 200 -> mean micro 200_000_000
    (0 until 72).foreach { i =>
      assert(sums(i) * 1000000L / cnts(i) === 200000000L, s"cell $i")
    }
    assert(cnts.sum === 18L * 16L, "cells must tile the raster exactly")
    // the sidecar-serve hash path == the direct decode hash path
    for (img <- Seq(flat, raster(18, 16)((x, _) => x * 14),
        raster(37, 23)((x, y) => (x * 7 + y * 13) % 256),
        raster(4, 3)((x, y) => x * 40 + y)))
      assert(ImageHash.dHashFromGrid(ImageHash.lumSums(img),
        img.getWidth, img.getHeight) === ImageHash.dHash64(img))
  }

  test("featurizeImages: dhash column matches hashImages, feature vector " +
    "matches the driver-side grid, non-png rows drop") {
    val imgs = media.where(col("format") === "png").orderBy("doc_id").limit(6)
    val feats = ImageHash.featurizeImages(media.limit(24)).collect()
      .map(r => r.getLong(0) -> r).toMap
    val hashes = ImageHash.hashImages(media.limit(24)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(feats.keySet === hashes.keySet, "featurize and hash row sets differ")
    feats.foreach { case (id, r) =>
      assert(r.getLong(1) === hashes(id), s"dhash drift for doc $id")
      val lum = r.getSeq[Long](4)
      assert(lum.length === 72 && lum.forall(v => v >= 0L && v <= 255000000L),
        s"out-of-range luminance for doc $id")
    }
    // driver-side recompute of one row pins the executor-side vector
    val one = imgs.limit(1).collect()(0)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(one.getAs[Array[Byte]]("payload")))
    val sums = ImageHash.lumSums(img)
    val cnts = ImageHash.cellCounts(img.getWidth, img.getHeight)
    val want = Array.tabulate(72)(i => sums(i) * 1000000L / cnts(i)).toSeq
    assert(feats(one.getAs[Long]("doc_id")).getSeq[Long](4) === want)
  }

  private def media = Multimodal.toMediaTable(Tables.documents(spark, sf0001))

  test("exact byte copies land at hamming 0 and every copy pair is found") {
    val imgs = media.where(col("format") === "png").orderBy("doc_id").limit(5)
    val copies = imgs.withColumn("doc_id", col("doc_id") + lit(1000000L))
    val pairs = ImageHash.nearDupPairs(
      ImageHash.hashImages(imgs.unionByName(copies)), maxHamming = 0).collect()
    val origIds = imgs.select("doc_id").collect().map(_.getLong(0)).toSet
    // every original matched with its shifted copy at distance 0
    origIds.foreach { id =>
      assert(pairs.exists(r => r.getLong(0) == id && r.getLong(1) == id + 1000000L
        && r.getLong(2) == 0L), s"copy pair for $id missing")
    }
  }

  test("banding is lossless: pairs == driver brute force at radii 3 and 7") {
    val imgs = media.where(col("format") === "png")
    val withCopies = imgs.unionByName(
      imgs.orderBy("doc_id").limit(6).withColumn("doc_id", col("doc_id") + lit(1000000L)))
    val hashes = ImageHash.hashImages(withCopies).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    for (radius <- Seq(3, 7)) {
      val expected = (for {
        (ida, ha) <- hashes; (idb, hb) <- hashes
        if ida < idb && java.lang.Long.bitCount(ha ^ hb) <= radius
      } yield (ida, idb, java.lang.Long.bitCount(ha ^ hb).toLong)).toSet
      val got = ImageHash.nearDupPairs(
        ImageHash.hashImages(withCopies), radius).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected, s"radius $radius")
    }
  }

  test("resized renditions stay perceptually close; unrelated rasters stay far") {
    // smooth crafted raster vs its box-consistent 2x upscale: the cell
    // gradient signs survive, so the hashes collide outright
    val base = raster(18, 16)((x, y) => x * 10 + y * 3)
    val up = raster(36, 32)((x, y) => (x / 2) * 10 + (y / 2) * 3)
    val d = java.lang.Long.bitCount(ImageHash.dHash64(base) ^ ImageHash.dHash64(up))
    assert(d <= 3, s"rendition drifted $d bits")
    // a mirrored gradient flips every horizontal sign: maximally far
    val other = raster(18, 16)((x, y) => 200 - x * 10 + y * 3)
    val far = java.lang.Long.bitCount(ImageHash.dHash64(base) ^ ImageHash.dHash64(other))
    assert(far > 48, s"opposed rasters landed only $far bits apart")
  }

  test("undecodable and non-image rows drop from the hash pass") {
    import spark.implicits._
    val junk = Seq(
      Multimodal.MediaRecord(1L, "image", "png", 8, 8, Array[Byte](1, 2, 3)),
      Multimodal.MediaRecord(2L, "audio", "wav", 8, 1, Array[Byte](1, 2, 3))
    ).toDF()
    assert(ImageHash.hashImages(junk).count() === 0L)
  }

  test("dup clusters: a transitive rendition chain collapses to one keeper") {
    import spark.implicits._
    def png(img: BufferedImage): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
    // three rasters PROVEN mutually distant (corpus gradients can
    // collide at hamming 0 — q175's natural pairs — so craft instead)
    val rasters = Seq(
      1L -> raster(18, 16)((x, _) => x * 14),
      2L -> raster(18, 16)((x, _) => 250 - x * 14),
      3L -> raster(18, 16)((x, _) => ((x / 2) % 2) * 255)) // cell-aligned bands
    val hs = rasters.map { case (_, r) => ImageHash.dHash64(r) }
    for (i <- hs.indices; j <- hs.indices if i < j)
      assert(java.lang.Long.bitCount(hs(i) ^ hs(j)) > 0, s"crafted rasters $i/$j collide")
    // two exact-copy generations of each original: A≈A'≈A'' chains
    val records = rasters.flatMap { case (id, r) =>
      val bytes = png(r)
      Seq(id, id + 1000000L, id + 2000000L).map(d =>
        Multimodal.MediaRecord(d, "image", "png", r.getWidth, r.getHeight, bytes))
    }
    val out = graft.multimodal.ImageHash.imageDupClusters(records.toDF(), 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // every cluster: size 3, labeled by its original, only that original kept
    rasters.map(_._1).foreach { id =>
      val members = out.filter(_._2 == id)
      assert(members.map(_._1).toSet === Set(id, id + 1000000L, id + 2000000L))
      assert(members.forall(_._3 == 3L))
      assert(members.filter(_._4 == 1).map(_._1).toSeq === Seq(id),
        s"cluster $id kept the wrong member")
    }
    assert(out.length === 9)
  }

  test("warm path == cold path: clusters off a persisted hash sidecar are " +
    "bit-identical to decode-and-cluster (the q181_serve contract)") {
    import spark.implicits._
    val media = Multimodal.toMediaTable(Tables.documents(spark, sf0001))
    val imgs = media.where(org.apache.spark.sql.functions.col("format") === "png")
      .orderBy("doc_id").limit(4)
    val copies = imgs.withColumn("doc_id",
      org.apache.spark.sql.functions.col("doc_id") + 1000000L)
    val corpus = media.unionByName(copies)
    val cold = graft.multimodal.ImageHash.imageDupClusters(corpus, 3)
      .collect().map(_.toString).sorted.toSeq
    val sidecar = graft.multimodal.ImageHash.hashImages(corpus)
      .localCheckpoint() // what q193's sync persists
    val warm = graft.multimodal.ImageHash.dupClustersFromHashes(sidecar, 3)
      .collect().map(_.toString).sorted.toSeq
    assert(warm == cold, "sidecar-served clusters diverged from the decode path")
  }

  test("pair report is partition-invariant") {
    val imgs = media.where(col("format") === "png")
    val withCopies = imgs.unionByName(
      imgs.orderBy("doc_id").limit(4).withColumn("doc_id", col("doc_id") + lit(1000000L)))
    val a = ImageHash.imageDedupReport(withCopies.repartition(1), 3).collect().toSeq
    val b = ImageHash.imageDedupReport(withCopies.repartition(7), 3).collect().toSeq
    assert(a === b)
  }
}
