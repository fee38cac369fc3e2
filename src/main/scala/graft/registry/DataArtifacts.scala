package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed registry faces for the engine's PUBLISHED DATA ARTIFACTS
  * (r19 verdict #4): the trained IVF coarse quantizer, PQ codebooks,
  * the BM25 idf table, the DSIR log-ratio array and the CCNet fluency
  * LM are models in every operational sense — trained from a corpus,
  * versioned, swapped by retraining pipelines — so they resolve BY
  * NAME through the same [[Registry]] the reference applies to model
  * versions (reference `processor.py:165-198`'s lifecycle, applied to
  * data artifacts), instead of being findable only by path
  * convention. The bare name tracks the CURRENT publish; the
  * `name@version` spelling pins each historical publish forever
  * (published paths are immutable and `_SUCCESS`-gated, so a stale
  * pointer is stale but never wrong — the segmented-index contract of
  * `Dedup.registerSegmentedIndex`, r19 verdict #7).
  *
  * Each kind face does three things: PUBLISH (train + `Work.publish`
  * commit where no publisher existed), REGISTER (versioned pointer),
  * RESOLVE (name → the typed runtime shape its consumers take:
  * centroids/codebook/idf as DataFrames for `ivfTopK`'s
  * `centroidsOpt` / `pqAdcTopK` / `bm25Of`, ratios as the dense
  * `Array[Long]` that `Dsir.weights` broadcasts, the fluency LM as
  * the broadcast-map triple `fluencyGateBc` consumes). Resolution
  * fails POINTEDLY on an unknown name — a curation pipeline must
  * never silently fall back to retraining under a typo'd name.
  */
object DataArtifacts {

  private def resolveUri(reg: Registry, name: String,
      version: Option[String], kind: String): String =
    reg.resolveArtifact(name, version).getOrElse(
      throw new NoSuchElementException(
        s"no $kind artifact registered under '$name'" +
          version.fold("")(v => s" at version '$v'") +
          s" — publish and register it first")).uri

  // --- IVF coarse quantizer (Similarity.kmeansCentroids) -------------

  /** Train and publish the IVF coarse quantizer (Lloyd k-means over
    * the reference vectors) as a parquet artifact `(cid, ce)` under
    * the `_SUCCESS`-gated publish discipline, then register it. */
  def publishCentroids(reg: Registry, s: SparkSession, name: String,
      path: String, refs: DataFrame, k: Int, iters: Int = 3,
      version: Option[String] = None): ArtifactMeta = {
    graft.Work.publish(path) { tmp =>
      graft.ext.Similarity.kmeansCentroids(refs, k, iters)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
    }
    reg.registerVersionedArtifact(name, path, version)
  }

  /** The trained quantizer, by name — feeds `ivfTopK(centroidsOpt)` /
    * `ivfAdcTopK`. */
  def resolveCentroids(reg: Registry, s: SparkSession, name: String,
      version: Option[String] = None): DataFrame =
    s.read.parquet(resolveUri(reg, name, version, "IVF-centroid"))

  // --- PQ codebook (Embeddings.pqCodebookTrained) ---------------------

  /** Train and publish the per-subspace PQ codebook (one-row
    * broadcastable `cb` map) as a parquet artifact, then register.
    * `scaled` is the fixed-point-scaled corpus frame the PQ family
    * consumes (`Embeddings.intScale`). */
  def publishPqCodebook(reg: Registry, s: SparkSession, name: String,
      path: String, scaled: DataFrame, idCol: String, iters: Int = 3,
      version: Option[String] = None): ArtifactMeta = {
    graft.Work.publish(path) { tmp =>
      graft.ext.Embeddings.pqCodebookTrained(scaled, idCol, iters)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
    }
    reg.registerVersionedArtifact(name, path, version)
  }

  /** The trained codebook, by name — the one-row `cb` frame the
    * encode/ADC paths cross-join broadcast. */
  def resolvePqCodebook(reg: Registry, s: SparkSession, name: String,
      version: Option[String] = None): DataFrame =
    s.read.parquet(resolveUri(reg, name, version, "PQ-codebook"))

  // --- BM25 idf table (Retrieval.ensureIdf) ---------------------------

  /** Ensure the corpus' published `(term, df, idf_fp, ndocs, toks)`
    * idf parquet exists (the oracle-shared publish) and register it. */
  def registerBm25Idf(reg: Registry, s: SparkSession, name: String,
      dir: String, version: Option[String] = None): ArtifactMeta =
    reg.registerVersionedArtifact(name,
      graft.ext.Retrieval.ensureIdf(s, dir), version)

  /** The idf table, by name — feeds `Retrieval.bm25Of` directly. */
  def resolveBm25Idf(reg: Registry, s: SparkSession, name: String,
      version: Option[String] = None): DataFrame =
    s.read.parquet(resolveUri(reg, name, version, "BM25-idf"))

  // --- DSIR log-ratio array (Dsir.ensureLogRatios) --------------------

  /** Ensure the corpus' published `(bucket, lr_fp)` ratio table
    * exists and register it. */
  def registerDsirRatios(reg: Registry, s: SparkSession, name: String,
      dir: String, fingerprint: Option[String] = None): ArtifactMeta =
    reg.registerVersionedArtifact(name,
      graft.ext.Dsir.ensureLogRatios(s, dir, fingerprint), fingerprint)

  /** The dense ratio array, by name — exactly what `Dsir.weights`
    * broadcasts into its map-only projection. */
  def resolveDsirRatios(reg: Registry, s: SparkSession, name: String,
      version: Option[String] = None): Array[Long] =
    graft.ext.Dsir.loadLr(s,
      resolveUri(reg, name, version, "DSIR-ratio"))

  // --- CCNet fluency LM (Corpus.ensureFluencyLm) ----------------------
  // (registration exists since r16: Corpus.registerFluencyLm)

  /** The fluency LM, by name — the (broadcast bigram map, t1, t2)
    * triple `Corpus.fluencyGateBc` consumes. */
  def resolveFluencyLm(reg: Registry, s: SparkSession, name: String,
      version: Option[String] = None)
      : (org.apache.spark.broadcast.Broadcast[Map[String, Long]],
        Long, Long) =
    graft.ext.Corpus.loadFluencyLm(s,
      resolveUri(reg, name, version, "fluency-LM"))
}
