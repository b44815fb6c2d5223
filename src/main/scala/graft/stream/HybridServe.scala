package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.Retrieval

/**
 * One-call hybrid retrieval over the persisted, incrementally-maintained
 * indexes: the lexical BM25 postings layer of [[CorpusIngest]] fused with
 * the frozen-codebook IVF layer of [[EmbeddingIngest]] by reciprocal-rank
 * fusion ([[Retrieval.rrfFuse]]). The full RAG serving path — lexical
 * recall catches exact terms the embedding misses, semantic recall catches
 * paraphrases the terms miss — running read-only and lock-free against
 * state a live ingest may be appending to (both faces read through
 * stranded compactions; neither takes the writer lock).
 *
 * Scale: the lexical list costs df(terms) (term-pruned postings scan), the
 * semantic list costs nprobe buckets per probe, and the fusion is bounded
 * by the two k's — corpus size appears in no stage.
 */
object HybridServe {

  /** Fused top-k per probe: (probe_id, doc_id, rrf, rank). `probes` is
    * (vec_id, embedding) exactly as [[EmbeddingIngest.search]] takes it;
    * embedding ids are the doc ids (the corpus convention). `allowed`
    * (one id column) filters BOTH legs before their top-k's — the
    * ACL-filtered RAG serve: each list refills from the allowed corpus,
    * and a disallowed doc can never surface through either modality. */
  def search(spark: SparkSession, lexCfg: CorpusIngest.IngestConfig,
      vecCfg: EmbeddingIngest.IngestConfig, terms: Seq[String],
      probes: DataFrame, kLex: Int = 20, kSem: Int = 10,
      kRrf: Int = 60, topK: Int = 10,
      allowed: Option[DataFrame] = None): DataFrame = {
    val lex = CorpusIngest.search(spark, lexCfg, terms, topK = kLex,
        allowed = allowed)
      .select(col("doc_id"), col("rank").as("lrank"))
    val sem = EmbeddingIngest.search(spark, vecCfg, probes, k = kSem,
        allowed = allowed)
      .select(col("probe_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("srank"))
    Retrieval.rrfFuse(sem, lex, kRrf, topK)
  }
}
