package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.PpmCodec

/** The PPM P6 codec must be a REAL codec, not a stub dressed up: it
  * round-trips its own output, reads files other tools write (the
  * netpbm grammar: comments, arbitrary header whitespace), and fails
  * loudly on foreign or truncated bytes instead of misdecoding. The
  * operator-level outputs are gated by the DuckDB oracle (q_mm_*);
  * this spec pins the codec seams the oracle can't see. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark

  private def raster(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)

  test("encode → decode round-trips dims and every pixel byte") {
    for ((w, h) <- Seq((1, 1), (16, 79), (79, 16), (64, 64))) {
      val px = raster(w, h)
      val (dw, dh, dr) = PpmCodec.decode(PpmCodec.encode(w, h, px))
      assert(dw == w && dh == h, s"dims drifted: ${dw}x$dh vs ${w}x$h")
      assert(java.util.Arrays.equals(dr, px), s"raster drifted at ${w}x$h")
    }
  }

  test("decodes a foreign-style header: comments and arbitrary whitespace") {
    // the netpbm grammar allows comments wherever whitespace may
    // appear and any whitespace run between tokens — files written by
    // other tools use all of it
    val px = raster(3, 2)
    val header = "P6 # written by some-tool\n# a full-line comment\n 3\t2 # dims\n255\n"
    val bytes = header.getBytes("US-ASCII") ++ px
    val (w, h, r) = PpmCodec.decode(bytes)
    assert(w == 3 && h == 2)
    assert(java.util.Arrays.equals(r, px))
  }

  test("rejects foreign bytes loudly: bad magic, truncation, 2-byte maxval") {
    val good = PpmCodec.encode(4, 4, raster(4, 4))
    intercept[IllegalArgumentException](PpmCodec.decode("P3\n4 4\n255\n".getBytes ++ raster(4, 4)))
    intercept[IllegalArgumentException](PpmCodec.decode(good.dropRight(1)))
    intercept[IllegalArgumentException](PpmCodec.decode(PpmCodec.encode(2, 2, raster(2, 2))
      .patch(8, "65535".getBytes, 3))) // maxval 255 -> 65535 (2-byte samples)
    intercept[IllegalArgumentException](PpmCodec.decode(Array[Byte](0x42, 0x4d, 0, 0)))
  }

  test("nearest-neighbor resample: identity at same dims, exact mapping when shrinking") {
    val px = raster(8, 4)
    assert(java.util.Arrays.equals(PpmCodec.resample(8, 4, px, 8, 4), px),
      "same-dims resample must be the identity")
    val half = PpmCodec.resample(8, 4, px, 4, 2)
    for (oy <- 0 until 2; ox <- 0 until 4; c <- 0 until 3) {
      val expected = px(((oy * 4 / 2) * 8 + (ox * 8 / 4)) * 3 + c)
      assert(half((oy * 4 + ox) * 3 + c) == expected,
        s"resampled pixel ($ox,$oy,$c) drifted from the integer mapping")
    }
  }

  test("synthesized payloads ARE well-formed P6 whose decode matches catalog dims") {
    // the in-plan payload synthesis (Spark SQL expr) and the codec
    // must agree: every payload the operators produce decodes, and
    // the decoded dims equal the catalog metadata the oracle embeds
    val meta = multimodal.Multimodal.qMmMeta(spark, SparkSpecBase.sf001).collect()
    assert(meta.length > 0)
    val nonNull = meta.filter(!_.isNullAt(2))
    assert(nonNull.length > 0, "no decodable payloads at sf0.001")
    nonNull.foreach { r =>
      val w = r.getInt(2); val h = r.getInt(3); val pb = r.getInt(5)
      assert(w >= 16 && w < 80 && h >= 16 && h < 80, s"dims out of range ${w}x$h")
      // payload = header + raster; header is 9 + digits(w) + digits(h)
      assert(pb == 9 + w.toString.length + h.toString.length + w * h * 3,
        s"payload_bytes $pb inconsistent with decoded ${w}x$h")
    }
  }

  test("r18 native PpmPayload is byte-identical to the repeat+unhex SQL fragment") {
    // the optimization-round rewrite of payloadFrame: the native
    // tiling expression must reproduce the SQL spelling bit-for-bit
    // (which is also what the DuckDB oracle constructs)
    import org.apache.spark.sql.functions._
    val both = multimodal.Multimodal.metaFrameProbe(spark, SparkSpecBase.sf001)
      .select(
        multimodal.PpmExprs.ppmPayload(col("hex"), col("width"), col("height"))
          .as("native"),
        expr(multimodal.Multimodal.ppmPayloadSql).as("sql"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val a = if (r.isNullAt(0)) null else r.getAs[Array[Byte]](0)
      val b = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
      assert((a == null) == (b == null), "null-ness diverged")
      if (a != null) assert(java.util.Arrays.equals(a, b), "payload bytes diverged")
    }
  }
}
