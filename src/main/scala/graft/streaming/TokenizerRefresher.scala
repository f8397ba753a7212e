package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Bpe, TokenizerIO, Unigram, WordPiece}

/** ACT on a tokenizer refresh decision — the tokenizer-family sibling
  * of [[EmbeddingIndexer.rebuildIfDue]], closing the second leg of the
  * drift loop: [[graft.ops.WordPiece.unkSignals]] →
  * [[graft.ops.TextAnalysis.unkRefreshSignals]] →
  * [[graft.ops.TextAnalysis.refreshDue]] → a recorded `refreshDir`
  * decision → HERE a retrained, versioned artifact. Before this face
  * a due `tokenizer:<source>` row had no executable counterpart: the
  * ANN index retrained itself, the tokenizer waited for a human.
  *
  * Versioning contract (the rebuildIfDue discipline): the retrained
  * model is exported as a NEW single-file artifact
  * `versionsRoot/v<decidingBatch>.json` — the live artifact is never
  * written, so an interrupted retrain leaves serving untouched, and a
  * replay of the same decision overwrites its own version file. The
  * family is SNIFFED from the live artifact
  * ([[graft.ops.TokenizerIO.familyOf]]), never assumed: a bpe
  * deployment retrains bpe, a wordpiece deployment wordpiece — the
  * refresh loop must not silently change model family. With `repoint`
  * (the default) the new version is atomically committed as current
  * ([[ArtifactVersions.repoint]]) AFTER the export completes; readers
  * resolve through [[ArtifactVersions.currentDir]].
  *
  * Scale stance: training cost is the family trainer's (corpus-scan
  * bounded, vocabulary-sized state — their own contracts); the export
  * is a driver-side KB-file write. Nothing here touches the ingest
  * path — retraining is an offline act, exactly like the ANN rebuild.
  */
object TokenizerRefresher {

  /** Retrain + version the tokenizer artifact named `artifact` (the
    * [[graft.ops.TextAnalysis.unkRefreshSignals]] naming, e.g.
    * `tokenizer:web`) when the LATEST recorded decision says it
    * drifted. Returns the new version file's path; None = not due,
    * nothing written.
    *
    * @param livePath currently-serving artifact file — supplies the
    *   FAMILY (sniffed) and, when budgets are left at their defaults,
    *   the TRAINING BUDGET (inventory-sized); its bytes are never
    *   touched
    * @param docs retraining corpus (`doc_id`, `text`) — the CURRENT
    *   distribution the drift evidence came from
    * @param versionsRoot versioned artifact dir; the export lands at
    *   `versionsRoot/v<batch>.json`
    * @param merges bpe/wordpiece merge budget; None (default) derives
    *   it from the LIVE artifact's inventory — bpe: its merge count,
    *   wordpiece: its vocab size MINUS its alphabet (single-char and
    *   ##single-char pieces) and [UNK] — a tight upper bound on the
    *   merges that produced it, so the retrain budget is never smaller
    *   than the serving inventory and never alphabet-many merges
    *   larger (the r18 advisory's over-estimate). An explicit budget
    *   smaller than the live artifact would otherwise atomically
    *   repoint serving at a toy vocabulary and WORSEN the very
    *   unk_rate that triggered the retrain.
    * @param vocabSize unigram piece budget; None derives the live
    *   artifact's piece count. @param emRounds unigram EM rounds.
    * @param minBatchId cold-start guard, the [[EmbeddingIndexer
    *   .latestDue]] contract (batch 0 compared against an empty
    *   history and must not trigger retraining)
    * @param keepVersions retention: after the repoint,
    *   [[ArtifactVersions.prune]] reclaims all but the newest N
    *   version files (never the pointer target) — without it every due
    *   retrain leaks a `v<batch>.json` forever. None (default) keeps
    *   everything.
    */
  def retrainIfDue(
      session: SparkSession,
      refreshDir: String,
      artifact: String,
      livePath: String,
      docs: DataFrame,
      versionsRoot: String,
      merges: Option[Int] = None,
      vocabSize: Option[Int] = None,
      emRounds: Int = 2,
      minBatchId: Long = 1L,
      repoint: Boolean = true,
      keepVersions: Option[Int] = None): Option[String] =
    EmbeddingIndexer.latestDue(session, refreshDir, artifact, minBatchId).map { batch =>
      val out = s"$versionsRoot/v$batch.json"
      TokenizerIO.familyOf(session, livePath) match {
        case "bpe" =>
          val budget = merges.getOrElse(TokenizerIO.importBpe(session, livePath).size)
          TokenizerIO.exportBpe(session,
            Bpe.trainMerges(docs, budget).map(m => (m.lhs, m.rhs)), out)
        case "unigram" =>
          val budget =
            vocabSize.getOrElse(TokenizerIO.importUnigram(session, livePath).size)
          TokenizerIO.exportUnigram(session,
            Unigram.collectPieces(
              Unigram.trainUnigram(docs, vocabSize = budget, emRounds = emRounds)),
            out)
        case "wordpiece" =>
          val budget = merges.getOrElse {
            // each merge adds AT MOST one piece on top of the alphabet
            // (single-char and ##single-char pieces) and [UNK], so
            // vocab-minus-alphabet-minus-specials bounds the producing
            // merge count far tighter than the raw vocab size — the
            // r18 advisory: the raw count made a drift retrain train
            // alphabet-many extra merges the serving artifact never
            // had, while this derivation still never shrinks serving
            // below its merged-piece inventory
            val vocab = TokenizerIO.importWordPiece(session, livePath)._1
            val alphabet = vocab.count(p =>
              p.codePointCount(0, p.length) == 1 ||
                (p.startsWith("##") && p.length > 2 &&
                  p.codePointCount(2, p.length) == 1))
            math.max(1, vocab.size - alphabet - vocab.count(_ == "[UNK]"))
          }
          TokenizerIO.exportWordPiece(session,
            WordPiece.collectVocab(
              WordPiece.vocab(docs, WordPiece.trainMerges(docs, budget))),
            out)
        case f =>
          throw new IllegalArgumentException(s"$livePath: unsupported family '$f'")
      }
      if (repoint) ArtifactVersions.repoint(session, versionsRoot, s"v$batch.json")
      keepVersions.foreach(kp => ArtifactVersions.prune(session, versionsRoot, kp))
      out
    }
}
