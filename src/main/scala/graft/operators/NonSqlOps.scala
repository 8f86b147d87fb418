package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.SimHash64.simhash64
import graft.functions.WinnowFingerprints.winnowFingerprints
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operators built on custom hash kernels (SimHash, winnowing) plus the
  * real-codec multimodal round trips. The hash kernels ARE oracle-checked:
  * FNV-1a64 and the Karp-Rabin/fmix64 winnow are re-derived in portable
  * DuckDB SQL (HUGEINT arithmetic mod 2^64, 32-bit split multiplication
  * to stay inside 128-bit intermediates), so q52/q53 hash-match like any
  * relational query. The media queries (q54/q68) are encode→decode round
  * trips through the REAL JDK codecs (`javax.imageio`,
  * `javax.sound.sampled`): deterministic PNG/WAV payloads are generated
  * per document, decoded for geometry/frames/pixel checksums, and the
  * oracle re-derives every expected value arithmetically — a broken
  * decoder cannot reproduce the checksums.
  */
object NonSqlOps extends QueryModule {

  /** SimHash near-dup signatures + hamming-bucket summary. */
  def simhashBuckets(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), simhash64(split(lower(col("text")), " ")).as("sig"))
      .withColumn("bucket", shiftrightunsigned(col("sig"), 48)) // 16-bit prefix block
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("sig")).as("n_distinct_sigs"))
      .orderBy("bucket")

  /** q98: SimHash near-duplicate PAIRS — the step q52's bucket summary
    * stops short of, via Manku-style block-combination banding
    * (Manku, Jain & Das Sarma, WWW'07): the 64-bit signature splits
    * into `nBlocks` equal blocks; a pair within hamming `maxHamming`
    * differs in at most `maxHamming` blocks, so it AGREES on some
    * (nBlocks − maxHamming)-subset — every such subset becomes a band
    * whose key packs those block values into one long. Candidates are
    * docs sharing any band key; the in-bucket
    * `bit_count(sig_l XOR sig_r) <= maxHamming` verify makes recall
    * EXACT by pigeonhole — banding with a guarantee, not a heuristic.
    *
    * Scale shape: the knob that keeps buckets small is `nBlocks` —
    * key width is 64 − maxHamming·(64/nBlocks) bits, so the DEFAULT
    * (4, 3) keys on 16 bits (fine up to ~10^6 docs, and what the
    * oracle mirrors), while (8, 3) keys on 40 bits — ~10^12 buckets,
    * the 10^9-docs setting, at the cost of C(8,5) = 56 bands/doc vs 4
    * (recall-identical: spec'd equal to brute force for BOTH configs).
    * One explode + ONE groupBy either way; pair expansion carries
    * (id, sig) structs so the verify is in-bucket arithmetic — no
    * second join against the corpus; `distinct` dedups pairs colliding
    * in several bands.
    */
  def simhashHammingPairs(documents: DataFrame, maxHamming: Int = 3,
                          nBlocks: Int = 4): DataFrame = {
    val sigs = documents
      .select(col("doc_id"), simhash64(split(lower(col("text")), " ")).as("sig"))
    hammingPairsFromSigs(sigs, maxHamming, nBlocks)
  }

  /** Pigeonhole hamming-pair search over any (doc_id, sig: long) frame —
    * shared by the text (q98) and image (q287) fingerprint families. */
  private[operators] def hammingPairsFromSigs(sigs: DataFrame, maxHamming: Int,
                                              nBlocks: Int): DataFrame = {
    require(64 % nBlocks == 0, s"nBlocks must divide 64, got $nBlocks")
    require(maxHamming < nBlocks, "pigeonhole needs maxHamming < nBlocks")
    val w = 64 / nBlocks
    val block: Int => org.apache.spark.sql.Column = j =>
      shiftrightunsigned(col("sig"), w * j).bitwiseAND(lit((1L << w) - 1))
    // every (nBlocks − maxHamming)-subset of blocks, packed into a long
    val bands = (0 until nBlocks).combinations(nBlocks - maxHamming).toSeq
      .zipWithIndex.map { case (combo, ci) =>
        val key = combo.zipWithIndex.map { case (j, pos) =>
          shiftleft(block(j), w * pos)
        }.reduce(_.bitwiseOR(_))
        struct(lit(ci).as("band_idx"), key.as("band_key"))
      }
    sigs.select(col("doc_id"), col("sig"), explode(array(bands: _*)).as("b"))
      .select(col("doc_id"), col("sig"), col("b.band_idx"), col("b.band_key"))
      .groupBy("band_idx", "band_key")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig")))).as("members"))
      .filter(size(col("members")) > 1)
      .select(explode(expr(Dedup.pairExpansionExpr("members"))).as("p"))
      .select(col("p.l.doc_id").as("left_id"), col("p.r.doc_id").as("right_id"),
        expr("bit_count(p.l.sig ^ p.r.sig)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy("left_id", "right_id")
  }

  /** q103: frame-level audio features — the windowed feature extraction
    * every speech-data pipeline runs before VAD / quality filtering:
    * decode the container to PCM through the REAL `javax.sound` stream,
    * window into fixed frames (160 samples = 20 ms @ 8 kHz), and emit
    * per-frame integer features: sample count, amplitude sum, and
    * energy Σ(v−128)² about the unsigned-8-bit midline. All-integer
    * outputs make the real decode round-trippable by a closed-form
    * oracle (the q54 contract — a broken decoder can't reproduce them).
    *
    * Scale shape: decode+window is narrow per-row work behind the by-id
    * repartition (CPU-bound codec stage); the frame fan-out is a
    * flatMap, no shuffle anywhere before the output sort.
    */
  def audioFrameFeatures(documents: DataFrame, frameLen: Int = 160): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long].mapPartitions { it =>
        it.flatMap { d =>
          val pcm = MediaCodec.decodePcm8(fixtureWav(d))
          pcm.grouped(frameLen).zipWithIndex.map { case (frame, idx) =>
            val sumAmp = frame.map(_.toLong).sum
            val energy = frame.map(v => (v - 128L) * (v - 128L)).sum
            (d, idx.toLong, frame.length.toLong, sumAmp, energy)
          }
        }
      }.toDF("media_id", "frame_idx", "n_samples", "sum_amp", "energy")
      .orderBy("media_id", "frame_idx")
  }

  /** q304: per-frame zero-crossing rate over the SAME real
    * javax.sound decode path as q103 — ZCR is the classic
    * silence/voicing/noisiness discriminator (high ZCR ≈ fricatives or
    * noise, low ≈ voiced speech or tone) and, with q103's energy, the
    * two-feature front end of every cheap audio-quality gate a
    * multimodal curation pipeline runs before paying for a real model.
    *
    * A crossing is a sign change about the unsigned-8-bit midline
    * between CONSECUTIVE samples within a frame (boundary pairs belong
    * to no frame, so frames are independently recomputable); samples
    * at exactly 128 count as non-negative. Integer counts only; the
    * ppm rate is one closing integer division — same oracle contract
    * as q103 (a broken decoder cannot reproduce the numbers).
    *
    * Scale shape: identical to q103 — CPU-bound decode behind the
    * by-id repartition, frame fan-out as flatMap, no shuffle before
    * the output sort.
    */
  def audioZeroCrossings(documents: DataFrame, frameLen: Int = 160): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long].mapPartitions { it =>
        it.flatMap { d =>
          val pcm = MediaCodec.decodePcm8(fixtureWav(d))
          pcm.grouped(frameLen).zipWithIndex
            .filter(_._1.length >= 2) // a 1-sample tail frame has no pairs
            .map { case (frame, idx) =>
              val nPairs = (frame.length - 1).toLong
              val crossings = frame.iterator.sliding(2).withPartial(false)
                .count { w => (w.head < 128) != (w(1) < 128) }.toLong
              (d, idx.toLong, nPairs, crossings, crossings * 1000000L / nPairs)
            }
        }
      }.toDF("media_id", "frame_idx", "n_pairs", "crossings", "zcr_ppm")
      .orderBy("media_id", "frame_idx")
  }

  /** Winnowing fingerprint stats per document. */
  def winnowStats(documents: DataFrame): DataFrame =
    documents.select(
        col("doc_id"),
        size(winnowFingerprints(lower(col("text")))).cast("long").as("n_fingerprints"),
        col("n_chars"))
      .orderBy("doc_id")

  /** Winnow-fingerprint CONTAINMENT between consecutive docs — the MOSS
    * overlap measure: |fp(a) ∩ fp(b)| / |fp(a)|. Set sizes only (no
    * array columns in the output, so the driver's value hash is stable).
    * The length >= 8 filter keeps the pair inside the oracle's
    * general-path re-derivation (shorter docs collapse to a single
    * whole-string hash the SQL can't enumerate as a set); the operator
    * itself handles any length.
    */
  def winnowContainment(documents: DataFrame): DataFrame = {
    // A self-join on doc_id+1 would run the winnow kernel TWICE (once per
    // join side) and shuffle each side separately. Instead: compute each
    // document's fingerprint set ONCE, fan the array out to the (at most
    // two) consecutive pairs it participates in, and reassemble pairs
    // with a single hash-partitioned aggregation — same shuffle volume,
    // half the kernel work, one scan. Each pair group holds exactly one
    // 'l' and one 'r' row, so first(ignoreNulls) is deterministic.
    val withFp = documents.filter(length(col("text")) >= 8)
      .select(col("doc_id"), winnowFingerprints(lower(col("text"))).as("fp"))
    val sides = withFp.select(col("fp"),
        explode(array(
          struct(col("doc_id").as("pair_id"), lit("l").as("side")),
          struct((col("doc_id") - 1).as("pair_id"), lit("r").as("side")))).as("e"))
      .select(col("e.pair_id").as("pair_id"), col("e.side").as("side"), col("fp"))
    val paired = sides.groupBy("pair_id").agg(
        first(when(col("side") === "l", col("fp")), ignoreNulls = true).as("fp_l"),
        first(when(col("side") === "r", col("fp")), ignoreNulls = true).as("fp_r"))
      .filter(col("fp_l").isNotNull && col("fp_r").isNotNull)
    val inter = size(array_intersect(col("fp_l"), col("fp_r")))
    paired.select(col("pair_id").as("left_id"), (col("pair_id") + 1).as("right_id"),
        size(col("fp_l")).cast("long").as("n_fp_left"),
        inter.cast("long").as("n_common"),
        round(inter / size(col("fp_l")).cast("double"), 4).as("containment"))
      .orderBy("left_id")
  }

  /** Deterministic media fixtures per document: a grayscale PNG whose
    * geometry and pixels derive from `doc_id` (pixel(x,y) =
    * (31x + 17y + id) mod 256) and an 8-bit mono WAV whose samples are
    * (7i + id) mod 256 — every decoded property is closed-form
    * arithmetic over `doc_id`, which is what makes the decode
    * round-trippable by a SQL oracle.
    */
  /** ONE copy of the fixture formulas (both oracles re-derive them in
    * SQL): image dims/pixels and audio length/samples as closed forms
    * over the doc id.
    */
  private def fixturePng(d: Long): Array[Byte] = {
    val w = (8 + d % 24).toInt
    val h = (8 + (d / 5) % 24).toInt
    MediaCodec.encodePng(w, h, (x, y) => ((x * 31 + y * 17 + d) % 256).toInt)
  }

  private def fixtureWav(d: Long): Array[Byte] = {
    val n = (800 + d % 800).toInt
    MediaCodec.encodeWav(8000f, Array.tabulate(n)(i => ((i * 7 + d) % 256).toByte))
  }

  private def mediaFixtures(documents: DataFrame) = {
    val spark = documents.sparkSession
    import spark.implicits._
    // codec stages are CPU-bound, not IO-bound: a small id projection
    // collapses to one input split (and AQE would coalesce an advisory
    // repartition of ~KBs right back to one partition), so pin one
    // partition per core before the per-row encode/decode work — the
    // same reason a 100 TB decode stage repartitions by media_id
    // instead of inheriting file splits
    documents.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long].mapPartitions { it =>
      it.flatMap { d =>
        Iterator(Multimodal.MediaRow(d, "image", fixturePng(d)),
                 Multimodal.MediaRow(d, "audio", fixtureWav(d)))
      }
    }
  }

  /** Multimodal metadata: encode → REAL JDK decode → stats. The decoded
    * width/height/frame-count/pixel-checksum round-trip against the
    * generation formulas, so the oracle verifies the actual codecs.
    */
  def mediaMeta(documents: DataFrame): DataFrame =
    Multimodal.decodeStats(mediaFixtures(documents)).toDF()
      .orderBy("media_id", "kind")

  /** Resize round trip: PNG fixture → exact nearest-neighbor resize on
    * the decoded raster → decode the resized image → geometry + pixel
    * checksum. dst(x,y) = src((x·sw)/dw, (y·sh)/dh) floor division makes
    * every resized pixel closed-form over `doc_id`.
    */
  def mediaResize(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val resized = documents.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long].mapPartitions { it =>
      it.map { d =>
        val dw = (4 + d % 8).toInt
        val dh = (4 + (d / 3) % 8).toInt
        Multimodal.MediaRow(d, "image", MediaCodec.resizeNearest(fixturePng(d), dw, dh))
      }
    }
    Multimodal.decodeStats(resized).toDF()
      .select(col("media_id"), col("width"), col("height"), col("format"), col("checksum"))
      .orderBy("media_id")
  }

  /** q97: perceptual image dedup — the image-side analogue of MinHash
    * banding: decode every image, average-hash the 8×8-resized raster
    * (both through the REAL JDK codecs), and group identical hashes
    * into duplicate-image clusters. Fixtures reuse the PNG generator
    * with seed = doc_id % 29, so visually-identical images recur under
    * different doc ids and the groups are non-trivial; the oracle
    * re-derives the full decode→resize→threshold→bit-pack chain as
    * closed-form integer arithmetic.
    *
    * Scale shape: decode + hash is narrow per-row work behind an
    * explicit by-id repartition (CPU-bound stage, same note as
    * [[mediaFixtures]]); the ONLY shuffle is the groupBy on a 64-bit
    * hash — uniform by construction, exactly like exact text dedup.
    */
  def imageAHashGroups(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val hashes = documents.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long].mapPartitions { it =>
        it.map { d =>
          val seed = d % 29
          val w = (8 + seed % 13).toInt
          val h = (8 + seed % 11).toInt
          val png = MediaCodec.encodePng(w, h,
            (x, y) => ((x * 31 + y * 17 + seed * 7) % 256).toInt)
          (d, MediaCodec.aHash64(png))
        }
      }.toDF("doc_id", "ahash")
    hashes.groupBy("ahash")
      .agg(count(lit(1)).as("n_images"),
        concat_ws(",", sort_array(collect_list(col("doc_id")))).as("members"))
      .orderBy("ahash")
  }

  /** q287: perceptual NEAR-duplicate image CLASS pairs — the
    * hamming-radius complement to q97's exact-equality aHash groups:
    * dHash (gradient sign) fingerprints through the REAL decode→resize
    * codec chain, then the pigeonhole band join at radius ≤ 2 (6
    * two-block bands — zero false negatives by the q98 theorem, which
    * the oracle proves by brute-forcing all class pairs closed-form).
    *
    * The corpus dedupes to its distinct raster classes FIRST (the
    * q97/q311/q321 posture) and the report pairs CLASSES, carrying the
    * member counts — the original doc-level pair list was inherently
    * quadratic in the copy count (the sf1 scale sweep measured a 66×
    * slope on 10× data before this redesign: 29 raster classes × 10×
    * members = 100× pairs). Decode runs once per class; the implied
    * doc-pair volume is reported as the exact n_docs_a·n_docs_b count,
    * never materialized.
    *
    * Scale shape: the class collapse is one map-side-combined groupBy;
    * decode+hash is |classes| rows of narrow work; the band join and
    * pair expansion run on the class-sized frame — at 100 TB, work
    * scales with DISTINCT content, never with the copy count.
    */
  /** q321: WALSH–HADAMARD spectral hash groups — the fourth rung of
    * the image-dedup ladder: q97 aHash (global mean) and q287 dHash
    * (local gradient) are spatial; the WHT hash is SPECTRAL — it keys
    * on low-sequency structure the way pHash does, but on the ±1
    * Hadamard basis, so the whole transform is exact integer
    * arithmetic through the REAL decode (pHash's DCT cosines would
    * put a float ulp under every sign bit; see
    * [[MediaCodec.wHash64]]).
    *
    * The corpus dedupes to its raster classes FIRST (the q311
    * posture: fixture rasters recur under seed = doc_id % 29), so the
    * REAL decode runs once per class and the report stays bounded:
    * per hash, the classes and total images it covers. At 100 TB the
    * same shape holds — decode work scales with DISTINCT content
    * (pre-grouped by cheap byte hash), never with the copy count.
    */
  def imageWHashGroups(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val classes = documents.select((col("doc_id") % 29).as("seed"))
      .groupBy("seed").agg(count(lit(1)).as("n_docs"))
    val hashes = classes.as[(Long, Long)].mapPartitions { it =>
      it.map { case (seed, nd) =>
        val w = (8 + seed % 13).toInt
        val h = (8 + seed % 11).toInt
        val png = MediaCodec.encodePng(w, h,
          (x, y) => ((x * 31 + y * 17 + seed * 7) % 256).toInt)
        (seed, nd, MediaCodec.wHash64(png))
      }
    }.toDF("seed", "n_docs", "whash")
    hashes.groupBy("whash")
      .agg(count(lit(1)).as("n_classes"), sum("n_docs").as("n_images"),
        concat_ws(",", sort_array(collect_list(col("seed")))).as("seeds"))
      .orderBy("whash")
  }

  def imageDHashPairs(documents: DataFrame, maxHamming: Int = 2): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val classes = documents.select((col("doc_id") % 29).as("seed"))
      .groupBy("seed").agg(count(lit(1)).as("n_docs"))
    // the fixture's 29 raster classes are mutually far (min cross-class
    // hamming = 7 at this formula), so near-dups are PLANTED in-plan
    // (the q76 posture): every class re-enters as class_id + 29 with ONE
    // sampled pixel perturbed (+128 mod 256 at the col-8/row-0 dHash
    // sample), which flips at most gradient bit 7 — each (base, variant)
    // pair lands at hamming ∈ {0, 1} and the band join must recover
    // exactly those 29 pairs
    val planted = classes
      .select(col("seed"), col("n_docs"), lit(false).as("isvar"))
      .unionByName(classes
        .select((col("seed") + 29).as("seed"), col("n_docs"), lit(true).as("isvar")))
    val sigs = planted.as[(Long, Long, Boolean)].mapPartitions { it =>
        it.map { case (cid, nd, isVar) =>
          val seed = if (isVar) cid - 29 else cid
          val w = (8 + seed % 13).toInt
          val h = (8 + seed % 11).toInt
          val x8 = (8 * w) / 9
          val png = MediaCodec.encodePng(w, h, (x, y) => {
            val base = ((x * 31 + y * 17 + seed * 7) % 256).toInt
            if (isVar && x == x8 && y == 0) (base + 128) % 256 else base
          })
          (cid, nd, MediaCodec.dHash64(png))
        }
      }.toDF("doc_id", "n_docs", "sig")
    val counts = sigs.select(col("doc_id").as("seed"), col("n_docs"))
    hammingPairsFromSigs(sigs.select("doc_id", "sig"), maxHamming, nBlocks = 4)
      .withColumnRenamed("left_id", "seed_a")
      .withColumnRenamed("right_id", "seed_b")
      .join(broadcast(counts.select(col("seed").as("seed_a"),
        col("n_docs").as("n_docs_a"))), "seed_a")
      .join(broadcast(counts.select(col("seed").as("seed_b"),
        col("n_docs").as("n_docs_b"))), "seed_b")
      .select(col("seed_a"), col("seed_b"), col("hamming"),
        col("n_docs_a"), col("n_docs_b"),
        (col("n_docs_a") * col("n_docs_b")).as("n_doc_pairs"))
      .orderBy("seed_a", "seed_b")
  }

  /** q311: luminance-histogram similarity between image CLASSES — the
    * third rung of the image-dedup ladder: q97 aHash catches exact
    * perceptual copies, q287 dHash catches near-copies at hamming ≤ 2,
    * and histogram INTERSECTION (Swain & Ballard 1991) scores global
    * tonal similarity that survives recomposition (crops/rearrangements
    * keep the histogram; both hash families lose it). Decode is the
    * REAL JDK codec path at native size (no resize — the histogram is
    * size-normalized instead).
    *
    * The corpus is deduped to its distinct raster classes FIRST (the
    * q97 posture: fixture classes recur under seed = doc_id % 29), so
    * decode runs once per class and the pairwise stage is bounded by
    * |classes|², never |docs|². Similarity is the exact rational
    * Σ_b min(hA_b·nB, hB_b·nA) · 10⁶ / (nA·nB), floor-quantized —
    * integer min/products only.
    */
  def imageHistSimilarity(documents: DataFrame, buckets: Int = 8): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val classes = documents.select((col("doc_id") % 29).as("seed"))
      .groupBy("seed").agg(count(lit(1)).as("n_docs"))
    val hists = classes.as[(Long, Long)].mapPartitions { it =>
      it.map { case (seed, nd) =>
        val w = (8 + seed % 13).toInt
        val h = (8 + seed % 11).toInt
        val png = MediaCodec.encodePng(w, h,
          (x, y) => ((x * 31 + y * 17 + seed * 7) % 256).toInt)
        val (np, hist) = MediaCodec.grayHistogram(png, buckets)
        (seed, nd, np, hist)
      }
    }.toDF("seed", "n_docs", "n_pix", "hist")
    hists.alias("a").join(broadcast(hists.alias("b")), col("a.seed") < col("b.seed"))
      .select(col("a.seed").as("seed_a"), col("b.seed").as("seed_b"),
        col("a.n_docs").as("n_docs_a"), col("b.n_docs").as("n_docs_b"),
        expr(
          """aggregate(zip_with(a.hist, b.hist, (x, y) -> least(x * b.n_pix, y * a.n_pix)),
            |          0L, (s, v) -> s + v) * 1000000L div (a.n_pix * b.n_pix)"""
            .stripMargin).as("sim_ppm"))
      .orderBy("seed_a", "seed_b")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q311_image_hist" -> ((s, d) => imageHistSimilarity(Tables(s, d).documents)),
    "q287_image_dhash" -> ((s, d) => imageDHashPairs(Tables(s, d).documents)),
    "q321_image_whash" -> ((s, d) => imageWHashGroups(Tables(s, d).documents)),
    "q52_simhash_buckets" -> ((s, d) => simhashBuckets(Tables(s, d).documents)),
    "q97_image_ahash"     -> ((s, d) => imageAHashGroups(Tables(s, d).documents)),
    // pigeonhole recall is EXACT for every valid (nBlocks, maxHamming),
    // so the autosize flip to (8,3) past 10⁶ docs (40-bit keys) changes
    // the PLAN only — output pairs are identical by theorem (spec'd)
    "q98_simhash_pairs"   -> ((s, d) => simhashHammingPairs(Tables(s, d).documents,
      nBlocks = graft.plans.Autosize.simhashConf(s, d))),
    "q103_audio_frames"   -> ((s, d) => audioFrameFeatures(Tables(s, d).documents)),
    "q304_audio_zcr"      -> ((s, d) => audioZeroCrossings(Tables(s, d).documents)),
    "q53_winnow_stats"    -> ((s, d) => winnowStats(Tables(s, d).documents)),
    "q54_media_meta"      -> ((s, d) => mediaMeta(Tables(s, d).documents)),
    "q68_media_resize"    -> ((s, d) => mediaResize(Tables(s, d).documents)),
    "q64_winnow_containment" -> ((s, d) => winnowContainment(Tables(s, d).documents)),
  )

  /** DuckDB re-derivations of the custom hash kernels. Conventions that
    * make these bit-exact: all 64-bit wrapping arithmetic is HUGEINT
    * mod 2^64; (a*c) mod 2^64 for 64-bit c uses the 32-bit split
    * `(a_lo*c + ((a_hi*(c mod 2^32)) mod 2^32)*2^32) mod 2^64` so
    * intermediates stay under 2^127; xor/shift run on UBIGINT; the
    * winnow window-min compares SIGNED longs (matching JVM `Long`
    * ordering); text is ASCII so `unicode(substr(...))` == UTF-8 byte.
    *
    * The media oracles (q54/q68) re-derive the decoded geometry, frame
    * counts, and content checksums from the generation formulas — the
    * Spark side must push actual bytes through `javax.imageio` /
    * `javax.sound.sampled` and get every pixel/sample back exactly to
    * hash-match.
    */
  override def oracles: Map[String, String] = Map(
    // WHT coefficients re-derived closed-form over the 8×8 nearest-resize
    // geometry (the q97 convention): ±val signed by
    // popcount(x&u)+popcount(y&v) parity, bit u*8+v set iff the exact
    // integer coefficient is positive — the Spark side must push real
    // bytes through ImageIO and get every pixel back exactly
    "q321_image_whash" ->
      """WITH seeds AS (SELECT doc_id % 29 AS seed, count(*)::BIGINT AS n_docs
        |               FROM documents GROUP BY 1),
        |dims AS (SELECT seed, n_docs, (8 + seed % 13)::BIGINT AS sw,
        |                (8 + seed % 11)::BIGINT AS sh
        |         FROM seeds),
        |v AS (SELECT seed, n_docs, p % 8 AS x, p // 8 AS y,
        |             ((((p % 8) * sw) // 8) * 31
        |              + (((p // 8) * sh) // 8) * 17 + seed * 7) % 256 AS val
        |      FROM dims, unnest(range(64)) AS t(p)),
        |coef AS (SELECT seed, n_docs, q // 8 AS u, q % 8 AS w_v,
        |                sum(CASE WHEN (bit_count(x & (q // 8))
        |                              + bit_count(y & (q % 8))) % 2 = 0
        |                         THEN val ELSE -val END)::BIGINT AS c
        |         FROM v, unnest(range(64)) AS t2(q) GROUP BY seed, n_docs, q),
        |h AS (SELECT seed, n_docs,
        |             sum(CASE WHEN c > 0
        |                      THEN (1::UBIGINT << (u * 8 + w_v)::INTEGER)::HUGEINT
        |                      ELSE 0::HUGEINT END) AS uh
        |      FROM coef GROUP BY seed, n_docs),
        |s AS (SELECT seed, n_docs,
        |             (CASE WHEN uh >= 9223372036854775808::HUGEINT
        |                   THEN uh - 18446744073709551616::HUGEINT
        |                   ELSE uh END)::BIGINT AS whash
        |      FROM h)
        |SELECT whash, count(*)::BIGINT AS n_classes, sum(n_docs)::BIGINT AS n_images,
        |       string_agg(seed, ',' ORDER BY seed) AS seeds
        |FROM s GROUP BY whash ORDER BY whash""".stripMargin,
    // dHash re-derived closed-form over the 9×8 nearest-resize geometry
    // (the q97 convention), then BRUTE-FORCE all-pairs hamming — the
    // banded Spark path must recover exactly these pairs (pigeonhole
    // zero-false-negative proof at radius ≤ 2)
    "q287_image_dhash" ->
      """WITH cls AS (
        |  SELECT doc_id % 29 AS seed, count(*)::BIGINT AS n_docs
        |  FROM documents GROUP BY 1),
        |pl AS (
        |  SELECT seed AS cid, seed, n_docs, 0 AS isvar FROM cls
        |  UNION ALL
        |  SELECT seed + 29, seed, n_docs, 1 FROM cls),
        |dims AS (
        |  SELECT cid, seed, n_docs, isvar,
        |         (8 + seed % 13)::BIGINT AS sw,
        |         (8 + seed % 11)::BIGINT AS sh
        |  FROM pl),
        |bits AS (
        |  SELECT cid, p,
        |         CASE WHEN
        |           (CASE WHEN isvar = 1 AND ((((p % 8) + 1) * sw) // 9) = ((8 * sw) // 9)
        |                      AND ((p // 8) * sh) // 8 = 0
        |                 THEN (((((p % 8) + 1) * sw) // 9) * 31
        |                       + (((p // 8) * sh) // 8) * 17 + seed * 7) % 256 + 128
        |                 ELSE (((((p % 8) + 1) * sw) // 9) * 31
        |                       + (((p // 8) * sh) // 8) * 17 + seed * 7) % 256
        |            END) % 256
        |           >
        |           (CASE WHEN isvar = 1 AND (((p % 8) * sw) // 9) = ((8 * sw) // 9)
        |                      AND ((p // 8) * sh) // 8 = 0
        |                 THEN ((((p % 8) * sw) // 9) * 31
        |                       + (((p // 8) * sh) // 8) * 17 + seed * 7) % 256 + 128
        |                 ELSE ((((p % 8) * sw) // 9) * 31
        |                       + (((p // 8) * sh) // 8) * 17 + seed * 7) % 256
        |            END) % 256
        |         THEN 1 ELSE 0 END AS bit
        |  FROM dims, unnest(range(64)) AS t(p)),
        |h AS (
        |  SELECT cid,
        |         sum(CASE WHEN bit = 1 THEN (1::UBIGINT << p::INTEGER)::HUGEINT
        |                  ELSE 0::HUGEINT END) AS usig
        |  FROM bits GROUP BY cid),
        |signed AS (
        |  SELECT cid,
        |         (CASE WHEN usig >= 9223372036854775808::HUGEINT
        |               THEN usig - 18446744073709551616::HUGEINT
        |               ELSE usig END)::BIGINT AS sig
        |  FROM h)
        |SELECT a.cid AS seed_a, b.cid AS seed_b,
        |       bit_count(xor(a.sig, b.sig))::BIGINT AS hamming,
        |       pa.n_docs AS n_docs_a, pb.n_docs AS n_docs_b,
        |       (pa.n_docs * pb.n_docs)::BIGINT AS n_doc_pairs
        |FROM signed a JOIN signed b ON a.cid < b.cid
        |JOIN pl pa ON pa.cid = a.cid
        |JOIN pl pb ON pb.cid = b.cid
        |WHERE bit_count(xor(a.sig, b.sig)) <= 2
        |ORDER BY seed_a, seed_b""".stripMargin,
    // frame features re-derived from the WAV generation formula
    // ((7i + d) mod 256 over n = 800 + d mod 800 samples, frames of
    // 160): all-integer, so the real decode must be sample-exact
    "q103_audio_frames" ->
      """WITH adims AS (SELECT doc_id, (800 + doc_id % 800)::BIGINT AS n FROM documents),
        |apx AS (SELECT doc_id, i, (i * 7 + doc_id) % 256 AS v
        |        FROM adims, unnest(range(n)) AS t(i))
        |SELECT doc_id AS media_id, i // 160 AS frame_idx,
        |       count(*)::BIGINT AS n_samples,
        |       sum(v)::BIGINT AS sum_amp,
        |       sum((v - 128) * (v - 128))::BIGINT AS energy
        |FROM apx GROUP BY 1, 2 ORDER BY media_id, frame_idx""".stripMargin,
    // closed-form raster mirror of the REAL decode (q97 contract) at
    // native size; exact rational histogram intersection in ppm
    "q311_image_hist" ->
      """WITH seeds AS (SELECT doc_id % 29 AS seed, count(*)::BIGINT AS n_docs
        |               FROM documents GROUP BY 1),
        |dims AS (SELECT seed, n_docs, (8 + seed % 13)::BIGINT AS w,
        |                (8 + seed % 11)::BIGINT AS h
        |         FROM seeds),
        |px AS (SELECT seed, n_docs, w * h AS n_pix, p % w AS x, p // w AS y
        |       FROM dims, unnest(range(w * h)) t(p)),
        |v AS (SELECT seed, n_docs, n_pix,
        |             (((x * 31 + y * 17 + seed * 7) % 256) * 8) // 256 AS b
        |      FROM px),
        |hist AS (SELECT seed, n_docs, n_pix, b, count(*)::BIGINT AS c
        |         FROM v GROUP BY 1, 2, 3, 4),
        |dense AS (SELECT s.seed, s.n_docs, d.n_pix, bb.b, coalesce(h.c, 0)::BIGINT AS c
        |          FROM seeds s
        |          JOIN (SELECT DISTINCT seed, n_pix FROM px) d ON d.seed = s.seed
        |          CROSS JOIN generate_series(0, 7) bb(b)
        |          LEFT JOIN hist h ON h.seed = s.seed AND h.b = bb.b)
        |SELECT a.seed AS seed_a, b.seed AS seed_b,
        |       max(a.n_docs)::BIGINT AS n_docs_a, max(b.n_docs)::BIGINT AS n_docs_b,
        |       (sum(least(a.c * b.n_pix, b.c * a.n_pix)) * 1000000
        |          // (max(a.n_pix) * max(b.n_pix)))::BIGINT AS sim_ppm
        |FROM dense a JOIN dense b ON a.b = b.b AND a.seed < b.seed
        |GROUP BY a.seed, b.seed ORDER BY seed_a, seed_b""".stripMargin,
    // q103's closed-form PCM mirror; in-frame consecutive pairs only
    // (i % 160 != 159), midline-sign change, floor-ppm division
    "q304_audio_zcr" ->
      """WITH adims AS (SELECT doc_id, (800 + doc_id % 800)::BIGINT AS n FROM documents),
        |apx AS (SELECT doc_id, i, (i * 7 + doc_id) % 256 AS v
        |        FROM adims, unnest(range(n)) AS t(i)),
        |p AS (SELECT doc_id, i, v,
        |             lead(v) OVER (PARTITION BY doc_id ORDER BY i) AS vn
        |      FROM apx),
        |c AS (SELECT doc_id, i // 160 AS frame_idx,
        |             CASE WHEN (v < 128) <> (vn < 128) THEN 1 ELSE 0 END AS x
        |      FROM p WHERE vn IS NOT NULL AND i % 160 <> 159)
        |SELECT doc_id AS media_id, frame_idx,
        |       count(*)::BIGINT AS n_pairs,
        |       sum(x)::BIGINT AS crossings,
        |       (sum(x) * 1000000 // count(*))::BIGINT AS zcr_ppm
        |FROM c GROUP BY 1, 2 ORDER BY media_id, frame_idx""".stripMargin,
    // q52's FNV-1a + bit-vote signature chain, then 16-bit block
    // bucketing and an in-bucket hamming verify (bit_count over the
    // signed xor — two's complement makes signed/unsigned equivalent)
    "q98_simhash_pairs" ->
      """WITH th AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        list_transform(range(1, length(tok)+1), i -> unicode(substr(tok, i, 1))::HUGEINT)),
        |      (h, b) -> ((xor(h::UBIGINT, b::UBIGINT))::HUGEINT * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |    )::UBIGINT AS h
        |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents)
        |),
        |votes AS (
        |  SELECT doc_id, r.range AS b,
        |    SUM(CASE WHEN (h >> r.range::INTEGER) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM th, range(64) r
        |  GROUP BY doc_id, r.range
        |),
        |usigs AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN vote > 0 THEN (1::UBIGINT << b::INTEGER)::HUGEINT ELSE 0::HUGEINT END) AS usig
        |  FROM votes GROUP BY doc_id
        |),
        |signed AS (
        |  SELECT doc_id,
        |    (CASE WHEN usig >= 9223372036854775808::HUGEINT THEN usig - 18446744073709551616::HUGEINT ELSE usig END)::BIGINT AS sig,
        |    usig
        |  FROM usigs
        |),
        |blocks AS (
        |  SELECT doc_id, sig, t.j,
        |         ((usig // (1::UBIGINT << (16 * t.j)::INTEGER)::HUGEINT) % 65536) AS key
        |  FROM signed, unnest(range(4)) AS t(j)
        |),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id,
        |         bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
        |  FROM blocks a JOIN blocks b ON a.j = b.j AND a.key = b.key AND a.doc_id < b.doc_id
        |)
        |SELECT left_id, right_id, hamming FROM pairs
        |WHERE hamming <= 3 ORDER BY left_id, right_id""".stripMargin,
    // decode→8×8 nearest-resize→integer-mean threshold→bit-pack, all
    // closed-form over seed = doc_id % 29; unsigned→signed conversion
    // follows the q52 HUGEINT convention
    "q97_image_ahash" ->
      """WITH dims AS (
        |  SELECT doc_id, doc_id % 29 AS seed,
        |         (8 + (doc_id % 29) % 13)::BIGINT AS sw,
        |         (8 + (doc_id % 29) % 11)::BIGINT AS sh
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, p,
        |         ((((p % 8) * sw) // 8) * 31 + (((p // 8) * sh) // 8) * 17 + seed * 7) % 256 AS val
        |  FROM dims, unnest(range(64)) AS t(p)),
        |m AS (SELECT doc_id, sum(val) // 64 AS mean FROM v GROUP BY doc_id),
        |h AS (
        |  SELECT v.doc_id,
        |         sum(CASE WHEN val > mean THEN (1::UBIGINT << p::INTEGER)::HUGEINT
        |                  ELSE 0::HUGEINT END) AS uh
        |  FROM v JOIN m ON v.doc_id = m.doc_id GROUP BY v.doc_id),
        |s AS (
        |  SELECT doc_id,
        |         (CASE WHEN uh >= 9223372036854775808::HUGEINT
        |               THEN uh - 18446744073709551616::HUGEINT ELSE uh END)::BIGINT AS ahash
        |  FROM h)
        |SELECT ahash, count(*)::BIGINT AS n_images,
        |       string_agg(doc_id, ',' ORDER BY doc_id) AS members
        |FROM s GROUP BY ahash ORDER BY ahash""".stripMargin,
    "q54_media_meta" ->
      """WITH dims AS (
        |  SELECT doc_id, (8 + doc_id % 24)::INTEGER AS w, (8 + (doc_id // 5) % 24)::INTEGER AS h
        |  FROM documents
        |),
        |ipx AS (SELECT doc_id, w, h, unnest(range(w::BIGINT * h)) AS p FROM dims),
        |img AS (
        |  SELECT doc_id AS media_id, 'image' AS kind,
        |         any_value(w) AS width, any_value(h) AS height,
        |         1::INTEGER AS n_frames, 'png' AS format,
        |         sum(((p % w) * 31 + (p // w) * 17 + doc_id) % 256)::BIGINT AS checksum
        |  FROM ipx GROUP BY doc_id
        |),
        |adims AS (SELECT doc_id, (800 + doc_id % 800)::INTEGER AS n FROM documents),
        |apx AS (SELECT doc_id, n, unnest(range(n::BIGINT)) AS i FROM adims),
        |aud AS (
        |  SELECT doc_id AS media_id, 'audio' AS kind,
        |         0::INTEGER AS width, 0::INTEGER AS height,
        |         any_value(n) AS n_frames, 'wav' AS format,
        |         sum((i * 7 + doc_id) % 256)::BIGINT AS checksum
        |  FROM apx GROUP BY doc_id
        |)
        |SELECT media_id, kind, width, height, n_frames, format, checksum
        |FROM (SELECT * FROM img UNION ALL SELECT * FROM aud)
        |ORDER BY media_id, kind""".stripMargin,
    "q68_media_resize" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |         (8 + doc_id % 24)::BIGINT AS sw, (8 + (doc_id // 5) % 24)::BIGINT AS sh,
        |         (4 + doc_id % 8)::INTEGER AS dw, (4 + (doc_id // 3) % 8)::INTEGER AS dh
        |  FROM documents
        |),
        |px AS (SELECT doc_id, sw, sh, dw, dh, unnest(range(dw::BIGINT * dh)) AS p FROM dims)
        |SELECT doc_id AS media_id,
        |       any_value(dw) AS width, any_value(dh) AS height,
        |       'png' AS format,
        |       sum(((((p % dw) * sw) // dw) * 31 + (((p // dw) * sh) // dh) * 17 + doc_id) % 256)::BIGINT AS checksum
        |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin,
    "q52_simhash_buckets" ->
      """WITH th AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        list_transform(range(1, length(tok)+1), i -> unicode(substr(tok, i, 1))::HUGEINT)),
        |      (h, b) -> ((xor(h::UBIGINT, b::UBIGINT))::HUGEINT * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |    )::UBIGINT AS h
        |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents)
        |),
        |votes AS (
        |  SELECT doc_id, r.range AS b,
        |    SUM(CASE WHEN (h >> r.range::INTEGER) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM th, range(64) r
        |  GROUP BY doc_id, r.range
        |),
        |sigs AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN vote > 0 THEN (1::UBIGINT << b::INTEGER)::HUGEINT ELSE 0::HUGEINT END) AS usig
        |  FROM votes GROUP BY doc_id
        |),
        |signed_sigs AS (
        |  SELECT doc_id,
        |    (CASE WHEN usig >= 9223372036854775808::HUGEINT THEN usig - 18446744073709551616::HUGEINT ELSE usig END)::BIGINT AS sig,
        |    (usig // 281474976710656::HUGEINT)::BIGINT AS bucket
        |  FROM sigs
        |)
        |SELECT bucket, count(*)::BIGINT AS n_docs, count(DISTINCT sig)::BIGINT AS n_distinct_sigs
        |FROM signed_sigs GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q64_winnow_containment" ->
      """WITH docs AS (
        |  SELECT doc_id, lower(text) AS t, length(text) AS n FROM documents WHERE length(text) >= 8
        |),
        |pos AS (
        |  SELECT doc_id, n, unnest(range(1, (n - 3)::BIGINT))::INTEGER AS i, t FROM docs
        |),
        |raw AS (
        |  SELECT doc_id, n, i,
        |    (((((((( unicode(substr(t, i,   1))::HUGEINT * 1000003
        |           + unicode(substr(t, i+1, 1))::HUGEINT) % 18446744073709551616::HUGEINT) * 1000003
        |           + unicode(substr(t, i+2, 1))::HUGEINT) % 18446744073709551616::HUGEINT) * 1000003
        |           + unicode(substr(t, i+3, 1))::HUGEINT) % 18446744073709551616::HUGEINT) * 1000003
        |           + unicode(substr(t, i+4, 1))::HUGEINT) % 18446744073709551616::HUGEINT) AS h
        |  FROM pos
        |),
        |m1 AS (SELECT doc_id, n, i, xor(h::UBIGINT, h::UBIGINT >> 33)::HUGEINT AS x1 FROM raw),
        |m2 AS (
        |  SELECT doc_id, n, i,
        |    (( (x1 % 4294967296::HUGEINT) * 18397679294719823053::HUGEINT
        |     + (((x1 // 4294967296::HUGEINT) * (18397679294719823053::HUGEINT % 4294967296::HUGEINT)) % 4294967296::HUGEINT) * 4294967296::HUGEINT
        |     ) % 18446744073709551616::HUGEINT) AS y1 FROM m1
        |),
        |m3 AS (SELECT doc_id, n, i, xor(y1::UBIGINT, y1::UBIGINT >> 33)::HUGEINT AS x2 FROM m2),
        |m4 AS (
        |  SELECT doc_id, n, i,
        |    (( (x2 % 4294967296::HUGEINT) * 14181476777654086739::HUGEINT
        |     + (((x2 // 4294967296::HUGEINT) * (14181476777654086739::HUGEINT % 4294967296::HUGEINT)) % 4294967296::HUGEINT) * 4294967296::HUGEINT
        |     ) % 18446744073709551616::HUGEINT) AS y2 FROM m3
        |),
        |fh AS (SELECT doc_id, n, i, xor(y2::UBIGINT, y2::UBIGINT >> 33) AS u FROM m4),
        |signed_h AS (
        |  SELECT doc_id, n, i,
        |    (CASE WHEN u >= 9223372036854775808::UBIGINT
        |          THEN u::HUGEINT - 18446744073709551616::HUGEINT
        |          ELSE u::HUGEINT END)::BIGINT AS sh
        |  FROM fh
        |),
        |wmins AS (
        |  SELECT doc_id, n, i,
        |    min(sh) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wm
        |  FROM signed_h
        |),
        |fps AS (
        |  SELECT doc_id, list_distinct(list(wm)) AS fp
        |  FROM wmins WHERE i <= n - 4 - 3 GROUP BY doc_id
        |)
        |SELECT a.doc_id AS left_id, b.doc_id AS right_id,
        |       len(a.fp)::BIGINT AS n_fp_left,
        |       len(list_intersect(a.fp, b.fp))::BIGINT AS n_common,
        |       round(len(list_intersect(a.fp, b.fp)) / len(a.fp)::DOUBLE, 4) AS containment
        |FROM fps a JOIN fps b ON b.doc_id = a.doc_id + 1
        |ORDER BY left_id""".stripMargin,
    "q53_winnow_stats" ->
      """WITH docs AS (
        |  SELECT doc_id, lower(text) AS t, length(text) AS n, n_chars FROM documents
        |),
        |-- n <= 7: fewer hashes than one full window (n < k gives one
        |-- whole-string hash; 5 <= n <= 7 gives <= 3 hashes, single min)
        |-- -> exactly one fingerprint, mirroring the Scala short paths
        |short AS (
        |  SELECT doc_id, 1::BIGINT AS n_fingerprints, n_chars FROM docs WHERE n <= 7
        |),
        |pos AS (
        |  SELECT doc_id, n, n_chars, unnest(range(1, (n - 3)::BIGINT))::INTEGER AS i, t
        |  FROM docs WHERE n >= 8
        |),
        |raw AS (
        |  SELECT doc_id, n, n_chars, i,
        |    (((((((( unicode(substr(t, i,   1))::HUGEINT * 1000003
        |           + unicode(substr(t, i+1, 1))::HUGEINT) % 18446744073709551616::HUGEINT) * 1000003
        |           + unicode(substr(t, i+2, 1))::HUGEINT) % 18446744073709551616::HUGEINT) * 1000003
        |           + unicode(substr(t, i+3, 1))::HUGEINT) % 18446744073709551616::HUGEINT) * 1000003
        |           + unicode(substr(t, i+4, 1))::HUGEINT) % 18446744073709551616::HUGEINT) AS h
        |  FROM pos
        |),
        |m1 AS (SELECT doc_id, n, n_chars, i, xor(h::UBIGINT, h::UBIGINT >> 33)::HUGEINT AS x1 FROM raw),
        |m2 AS (
        |  SELECT doc_id, n, n_chars, i,
        |    (( (x1 % 4294967296::HUGEINT) * 18397679294719823053::HUGEINT
        |     + (((x1 // 4294967296::HUGEINT) * (18397679294719823053::HUGEINT % 4294967296::HUGEINT)) % 4294967296::HUGEINT) * 4294967296::HUGEINT
        |     ) % 18446744073709551616::HUGEINT) AS y1 FROM m1
        |),
        |m3 AS (SELECT doc_id, n, n_chars, i, xor(y1::UBIGINT, y1::UBIGINT >> 33)::HUGEINT AS x2 FROM m2),
        |m4 AS (
        |  SELECT doc_id, n, n_chars, i,
        |    (( (x2 % 4294967296::HUGEINT) * 14181476777654086739::HUGEINT
        |     + (((x2 // 4294967296::HUGEINT) * (14181476777654086739::HUGEINT % 4294967296::HUGEINT)) % 4294967296::HUGEINT) * 4294967296::HUGEINT
        |     ) % 18446744073709551616::HUGEINT) AS y2 FROM m3
        |),
        |fh AS (SELECT doc_id, n, n_chars, i, xor(y2::UBIGINT, y2::UBIGINT >> 33) AS u FROM m4),
        |signed_h AS (
        |  SELECT doc_id, n, n_chars, i,
        |    (CASE WHEN u >= 9223372036854775808::UBIGINT
        |          THEN u::HUGEINT - 18446744073709551616::HUGEINT
        |          ELSE u::HUGEINT END)::BIGINT AS sh
        |  FROM fh
        |),
        |wmins AS (
        |  SELECT doc_id, n, n_chars, i,
        |    min(sh) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wm
        |  FROM signed_h
        |)
        |SELECT doc_id, n_fingerprints, n_chars FROM (
        |  SELECT doc_id, count(DISTINCT wm)::BIGINT AS n_fingerprints, any_value(n_chars) AS n_chars
        |  FROM wmins
        |  WHERE i <= n - 4 - 3
        |  GROUP BY doc_id
        |  UNION ALL
        |  SELECT doc_id, n_fingerprints, n_chars FROM short
        |)
        |ORDER BY doc_id""".stripMargin,
  )
}
