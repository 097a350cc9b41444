package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Behavioral invariants for the sequence-assembly, Z-order layout, and
  * Bloom-decontamination operators (the DuckDB oracle gate covers
  * value-level correctness; these pin the semantic properties a refactor
  * could silently break).
  */
class PackingLayoutSpec extends SparkSpec {

  test("seq pack lays documents on one contiguous token tape") {
    val rows = Packing.qSeqPack(spark, sf001).collect()
    assert(rows.nonEmpty)
    // the tape starts at zero and every document begins exactly where
    // the previous one ended — no gaps, no overlaps, in doc_id order
    val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
    assert(sorted.head.getAs[Long]("start_off") == 0L)
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("start_off") ==
          a.getAs[Long]("start_off") + a.getAs[Long]("n_toks"),
          s"tape must be contiguous: $a | $b")
      case _ =>
    }
    // crossing flag agrees with the sequence indices, and a document
    // never spans more sequences than its token count allows
    sorted.foreach { r =>
      val first = r.getAs[Long]("first_seq")
      val last = r.getAs[Long]("last_seq")
      assert(r.getAs[Boolean]("crosses") == (last > first))
      assert(first == r.getAs[Long]("start_off") / Packing.SeqLen)
      assert(last - first <= r.getAs[Long]("n_toks") / Packing.SeqLen + 1)
    }
  }

  test("doc chunks tile every document with stride overlap and full coverage") {
    val rows = Packing.qDocChunk(spark, sf001).collect()
    val toks = Tables.documents(spark, sf001)
      .select(col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, chunks) =>
      val n = toks(doc)
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_idx"))
      // indices are 0..k-1, starts are stride-spaced
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("chunk_idx") == i)
        assert(c.getAs[Long]("start_tok") == i * Packing.ChunkStride)
        val len = c.getAs[Long]("chunk_toks")
        assert(len >= 1 && len <= Packing.ChunkLen)
      }
      // the last chunk reaches the end of the document (full coverage)…
      val lastEnd = sorted.last.getAs[Long]("start_tok") +
        sorted.last.getAs[Long]("chunk_toks")
      assert(lastEnd == n, s"doc $doc: chunks end at $lastEnd of $n tokens")
      // …and the tiling is minimal: one fewer chunk would leave a tail
      if (sorted.length > 1) {
        val prevEnd = (sorted.length - 2) * Packing.ChunkStride + Packing.ChunkLen
        assert(prevEnd < n, s"doc $doc: chunk ${sorted.length - 1} is redundant")
      }
    }
  }

  test("morton cells cover tight 2-D boxes (both dims bounded per cell)") {
    val cells = Layout.qZorderLayout(spark, sf001).collect()
    assert(cells.nonEmpty)
    val xw = Layout.XSpanCents / (1L << Layout.ZBits) // grid cell width
    cells.foreach { r =>
      val z = r.getAs[Long]("z")
      // decode the cell's grid coordinates back out of the interleave
      val (x, y) = (0 until Layout.ZBits).foldLeft((0L, 0L)) {
        case ((xa, ya), i) =>
          (xa | (((z >> (2 * i)) & 1) << i), ya | (((z >> (2 * i + 1)) & 1) << i))
      }
      assert(x < (1L << Layout.ZBits) && y < (1L << Layout.ZBits))
      // every row in the cell lies inside the cell's 2-D box — the
      // property that makes contiguous morton ranges prunable on BOTH
      // dimensions (top-edge cells absorb the clamped remainder)
      val minC = r.getAs[Long]("min_cents"); val maxC = r.getAs[Long]("max_cents")
      assert(minC >= Layout.XOriginCents + x * xw)
      if (x < (1L << Layout.ZBits) - 1) assert(maxC < Layout.XOriginCents + (x + 1) * xw)
    }
  }

  test("z-ordered write prunes a 2-D box to a few files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val grid = s"least(${(1L << Layout.ZBits) - 1}, ((cents - ${Layout.XOriginCents})" +
      s" * ${1L << Layout.ZBits}) div ${Layout.XSpanCents})"
    val parts = Tables.part(spark, sf001)
      .withColumn("cents", round(col("p_retailprice") * 100).cast("long"))
      .withColumn("gx", expr(grid))
      .withColumn("gy", expr(s"least(${(1L << Layout.ZBits) - 1}, ((CAST(p_size AS BIGINT)" +
        s" - ${Layout.YOriginSize}) * ${1L << Layout.ZBits}) div ${Layout.YSpanSize})"))
    Layout.writeZOrdered(parts, s"$dir/part_z", "gx", "gy",
      numPartitions = Some(8), maxRecordsPerFile = 400)
    val back = spark.read.parquet(s"$dir/part_z")
      .withColumn("file", input_file_name())
    val allFiles = back.select(col("file")).distinct().count()
    assert(allFiles >= 6, s"want enough files for pruning to matter, got $allFiles")
    // an aligned 2×2 grid box = 4 consecutive morton values → its rows
    // concentrate in very few of the range-partitioned files
    val boxFiles = back
      .filter(col("gx").between(4, 5) && col("gy").between(4, 5))
      .select(col("file")).distinct().count()
    assert(boxFiles <= 2, s"2-D box should live in ≤2 of $allFiles files, got $boxFiles")
  }

  test("bloom decontamination never misses an exact hit and stays count-consistent") {
    val rows = Curation.qBloomDecontaminate(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flagged = r.getAs[Long]("bloom_flagged")
      val exact = r.getAs[Long]("exact_hits")
      // no false negatives: everything exactly contaminated is flagged
      assert(r.getAs[Long]("false_pos") == flagged - exact)
      assert(flagged >= exact, s"bloom missed an exact duplicate: $r")
      assert(flagged <= r.getAs[Long]("n_train"))
    }
    // totals account for every prefix-eligible train document
    val nTrain = rows.map(_.getAs[Long]("n_train")).sum
    val expected = Tables.documents(spark, sf001)
      .filter(size(graft.functions.TextFns.tokens(col("text"))) >= Dedup.PrefixTokens)
      .select(Curation.splitCol.as("split")).filter(col("split") === "train").count()
    assert(nTrain == expected)
  }
}
