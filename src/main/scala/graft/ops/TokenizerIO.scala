package graft.ops

import org.apache.spark.sql.SparkSession

/** Single-file tokenizer artifacts — the "ship the model" boundary all
  * three trained families need: a tokenizer is useless to the serving
  * fleet as a session-local `Seq`, and a parquet model TABLE is the
  * wrong interchange grain for a kilobyte-sized object every task,
  * trainer checkpoint, and external consumer wants as one file (the
  * shape the HuggingFace `tokenizer.json` ecosystem standardized).
  *
  * Format: one UTF-8 JSON object per artifact —
  *
  *  - `{"family": "bpe", "merges": [["a","b"], …]}` — merge order IS
  *    the model; preserved exactly.
  *  - `{"family": "unigram", "pieces": [["ab", -3.210000], …]}` —
  *    log-probs printed as the 6dp decimals they are
  *    ([[Unigram]] quantizes; printing more digits would invent
  *    precision, fewer would corrupt the micro-Long serve scores).
  *    Pieces sorted lexicographically (the stored order is a set).
  *  - `{"family": "wordpiece", "unk": "[UNK]", "vocab": ["a", …]}` —
  *    vocab sorted lexicographically (a set; greedy matching is
  *    order-independent).
  *
  * Byte shape is pinned like the index export
  * ([[graft.index.InvertedIndex.exportSingleFileJson]]): deterministic
  * member order, no whitespace beyond single spaces after `:` and `,`,
  * Python-default `ensure_ascii` escaping — so re-exporting an
  * imported artifact reproduces it byte-for-byte (the spec pins it),
  * and artifact diffs mean MODEL diffs, never serialization noise.
  *
  * Scale stance: artifacts are model-sized (vocab × piece length
  * bytes); the writer is a driver-side stream to any Hadoop
  * filesystem, and import is one `wholetext` read — neither touches
  * corpus data.
  */
object TokenizerIO {

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < 0x20 || c > 0x7e => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def writeFile(spark: SparkSession, path: String, body: String): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(hPath, true), java.nio.charset.StandardCharsets.UTF_8))
    try out.write(body) finally out.close()
  }

  private def readFile(spark: SparkSession, path: String): String =
    spark.read.option("wholetext", "true").text(path)
      .collect().headOption.map(_.getString(0)).getOrElse("")

  /** 6dp decimal text of a micro-Long log-prob (−3210000 → "-3.210000"). */
  private def lp6(micro: Long): String =
    java.math.BigDecimal.valueOf(micro).movePointLeft(6).setScale(6).toPlainString

  def exportBpe(spark: SparkSession, merges: Seq[(String, String)], path: String): Unit =
    writeFile(spark, path,
      s"""{"family": "bpe", "merges": [${
        merges.map { case (a, b) => s"""["${esc(a)}", "${esc(b)}"]""" }.mkString(", ")
      }]}""")

  def exportUnigram(spark: SparkSession, pieces: Seq[(String, Long)], path: String): Unit =
    writeFile(spark, path,
      s"""{"family": "unigram", "pieces": [${
        pieces.sortBy(_._1).map { case (p, m) => s"""["${esc(p)}", ${lp6(m)}]""" }.mkString(", ")
      }]}""")

  def exportWordPiece(spark: SparkSession, vocab: Seq[String], path: String,
      unk: String = WordPiece.Unk): Unit =
    writeFile(spark, path,
      s"""{"family": "wordpiece", "unk": "${esc(unk)}", "vocab": [${
        vocab.sorted.map(p => s""""${esc(p)}"""").mkString(", ")
      }]}""")

  // ---- import -------------------------------------------------------------

  private def parse(spark: SparkSession, path: String, family: String)
      : com.fasterxml.jackson.databind.JsonNode = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    // keep the 6dp log-prob digits exactly as written (a double
    // round-trip re-derives them, but exactness shouldn't hinge on
    // shortest-repr printing)
    m.configure(
      com.fasterxml.jackson.databind.DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS, true)
    val root = m.readTree(readFile(spark, path))
    require(root != null && !root.isMissingNode,
      s"$path: empty or unparseable tokenizer artifact")
    val got = Option(root.get("family")).map(_.asText()).getOrElse("<absent>")
    require(got == family,
      s"$path holds a '$got' tokenizer, expected '$family'")
    root
  }

  /** The named member, or a loud error naming the path and field —
    * a malformed artifact must fail like the family mismatch does,
    * never as a bare NullPointerException three calls later. */
  private def member(root: com.fasterxml.jackson.databind.JsonNode,
      path: String, field: String): com.fasterxml.jackson.databind.JsonNode = {
    val n = root.get(field)
    require(n != null && !n.isNull,
      s"$path: tokenizer artifact is missing the '$field' member")
    n
  }

  /** Ordered merge list, servable by [[Bpe.encodeFast]]. */
  def importBpe(spark: SparkSession, path: String): Seq[(String, String)] = {
    val arr = member(parse(spark, path, "bpe"), path, "merges")
    (0 until arr.size).map(i => (arr.get(i).get(0).asText(), arr.get(i).get(1).asText()))
  }

  /** (piece, micro-log-prob) list, servable by [[Unigram.encodeFast]]. */
  def importUnigram(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val arr = member(parse(spark, path, "unigram"), path, "pieces")
    (0 until arr.size).map { i =>
      val e = arr.get(i)
      (e.get(0).asText(),
        new java.math.BigDecimal(e.get(1).asText())
          .movePointRight(6).longValueExact())
    }
  }

  /** (vocab, unk), servable by [[WordPiece.encodeFast]]. */
  def importWordPiece(spark: SparkSession, path: String): (Seq[String], String) = {
    val root = parse(spark, path, "wordpiece")
    val arr = member(root, path, "vocab")
    ((0 until arr.size).map(arr.get(_).asText()),
      member(root, path, "unk").asText())
  }

  /** Family tag of a stored artifact — sniffed from the file, so the
    * cross-family faces never assume what a path holds. */
  def familyOf(spark: SparkSession, path: String): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(readFile(spark, path))
    require(root != null && !root.isMissingNode,
      s"$path: empty or unparseable tokenizer artifact")
    member(root, path, "family").asText()
  }

  /** Cross-family audit of two STORED artifacts over one corpus — the
    * model-selection face the completed triad was missing: load both
    * files (any of the three families, sniffed), compare their piece
    * INVENTORIES and their measured FIT. One row: `(family_a,
    * family_b, n_pieces_a, n_pieces_b, shared_pieces, jaccard,
    * fertility_a, fertility_b)`.
    *
    * Piece sets are what each artifact SHIPS (bpe: distinct merge
    * outputs — the learned units; unigram: pieces; wordpiece: vocab).
    * Overlap and jaccard compare continuation-NORMALIZED pieces
    * (leading `##` stripped) so WordPiece's position marking doesn't
    * mask real inventory agreement; the n_pieces counts stay raw.
    * Fertility is corpus-level (tokens per word) under each
    * artifact's own serving encoder — lower fits this corpus better.
    *
    * Scale stance: artifacts are KB-sized, so the piece algebra is
    * driver-side set arithmetic; the two fertility scans are the only
    * corpus passes, each one combinable aggregate. */
  def compare(spark: SparkSession, pathA: String, pathB: String,
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val (famA, pa) = piecesOf(spark, pathA)
    val (famB, pb) = piecesOf(spark, pathB)
    val na = pa.map(normPiece).toSet
    val nb = pb.map(normPiece).toSet
    val shared = (na & nb).size.toLong
    Seq((famA, famB, pa.size.toLong, pb.size.toLong, shared,
      jaccard6(shared, (na | nb).size.toLong)))
      .toDF("family_a", "family_b", "n_pieces_a", "n_pieces_b",
        "shared_pieces", "jaccard")
      .crossJoin(fertilityOf(spark, pathA, famA, docs)
        .select(col("fertility").as("fertility_a")))
      .crossJoin(fertilityOf(spark, pathB, famB, docs)
        .select(col("fertility").as("fertility_b")))
  }

  /** N-WAY model selection over stored artifacts — the leaderboard
    * [[compare]]'s pairwise row can't give without O(n²) calls and
    * hand assembly: one row per artifact, `(artifact_idx, family,
    * n_pieces, coverage, max_jaccard, fertility)`, ranked by the
    * caller (lower fertility = better corpus fit, the usual sort key).
    *
    *  - `artifact_idx` — position in `paths` (the join key back to the
    *    caller's artifact names; files carry no identity of their own).
    *  - `n_pieces` — raw shipped-inventory size ([[compare]]'s count).
    *  - `coverage` — |this artifact's continuation-normalized pieces| /
    *    |union of ALL artifacts' normalized pieces|: the share of the
    *    candidate pool's combined inventory this artifact ships (6dp).
    *  - `max_jaccard` — the artifact's highest normalized-piece
    *    Jaccard against any OTHER artifact (6dp): high means it's
    *    redundant with a rival, low means it brings distinct units.
    *  - `fertility` — corpus-level tokens-per-word under the
    *    artifact's own serving encoder, exactly [[compare]]'s.
    *
    * Cost: artifacts are KB-sized so the piece algebra is driver-side
    * set arithmetic; the corpus is scanned once PER ARTIFACT for
    * fertility (each scan one combinable aggregate) — n scans total,
    * the same per-artifact price [[compare]] pays. */
  def compareAll(spark: SparkSession, paths: Seq[String],
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    require(paths.size >= 2, s"compareAll needs at least 2 artifacts, got ${paths.size}")
    val metas = paths.map(p => (piecesOf(spark, p), p))
      .map { case ((fam, ps), p) => (fam, ps, ps.map(normPiece).toSet, p) }
    val union = metas.map(_._3).reduce(_ | _)
    val rows = metas.zipWithIndex.map { case ((fam, ps, norm, _), i) =>
      val maxJ = metas.zipWithIndex.collect { case ((_, _, other, _), j) if j != i =>
        jaccard6((norm & other).size.toLong, (norm | other).size.toLong)
      }.max
      (i, fam, ps.size.toLong,
        jaccard6(norm.size.toLong, union.size.toLong), maxJ)
    }
    val meta = rows.toDF("artifact_idx", "family", "n_pieces", "coverage", "max_jaccard")
    val ferts = metas.zipWithIndex.map { case ((fam, _, _, p), i) =>
      fertilityOf(spark, p, fam, docs)
        .select(org.apache.spark.sql.functions.lit(i).as("artifact_idx"),
          col("fertility"))
    }.reduce(_ unionByName _)
    meta.join(ferts, Seq("artifact_idx"))
  }

  /** (family, shipped piece inventory) of a stored artifact (bpe:
    * distinct merge outputs — the learned units; unigram: pieces;
    * wordpiece: vocab). */
  private def piecesOf(spark: SparkSession, path: String): (String, Seq[String]) =
    familyOf(spark, path) match {
      case "bpe" => ("bpe", importBpe(spark, path).map { case (a, b) => a + b }.distinct)
      case "unigram" => ("unigram", importUnigram(spark, path).map(_._1).distinct)
      case "wordpiece" => ("wordpiece", importWordPiece(spark, path)._1.distinct)
      case f => throw new IllegalArgumentException(s"$path: unsupported family '$f'")
    }

  /** Continuation normalization (leading `##` stripped) so WordPiece's
    * position marking doesn't mask real inventory agreement. */
  private def normPiece(p: String): String =
    if (p.startsWith("##")) p.substring(2) else p

  /** 6dp HALF_UP intersection/union ratio; 0 when the union is empty. */
  private def jaccard6(shared: Long, union: Long): Double =
    if (union == 0L) 0.0
    else BigDecimal(shared.toDouble / union)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** One-row corpus-level fertility under the artifact's own serving
    * encoder ([[Bpe.fertility]] / [[Unigram.fertility]] /
    * [[WordPiece.fertility]] over a constant source column). */
  private def fertilityOf(spark: SparkSession, path: String, family: String,
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val d = docs.withColumn("__all", lit("all"))
    (family match {
      case "bpe" => Bpe.fertility(d, importBpe(spark, path), sourceCol = "__all")
      case "unigram" => Unigram.fertility(d, importUnigram(spark, path), sourceCol = "__all")
      case _ =>
        WordPiece.fertility(d, importWordPiece(spark, path)._1, sourceCol = "__all")
    }).select(col("fertility"))
  }
}
