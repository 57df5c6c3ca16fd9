/** graft — a Spark-native analytics engine with the query surface of a
  * versioned, snapshot-isolated, copy-on-write ordered key-value index
  * (reference: scalable-services/index, analyzed in SURVEY.md), plus the
  * operators a large-scale training-data pipeline needs.
  *
  *  - [[graft.core]] — ordered-table read surface, snapshot store
  *    (range-sorted parquet + JSON manifest, file-granular COW, CAS
  *    commits, temporal log, vacuum), typed wrapper, skew utilities
  *  - [[graft.functions]] — codegen'd Catalyst kernels (cosine, dot,
  *    SimHash, MinHash, LSH band keys, shingle sets, rolling fingerprint)
  *    and their SQL registration
  *  - [[graft.dedup]] — exact / MinHash+LSH / SimHash / n-gram Jaccard /
  *    embedding-cosine dedup, transitive clustering
  *  - [[graft.similarity]] — brute-force and IVF nearest-neighbor search
  *  - [[graft.text]] — token stats, quality scoring, language ID,
  *    fingerprinting
  *  - [[graft.multimodal]] — binary media columns (stubbed codec, real
  *    plumbing)
  *  - [[graft.streaming]] — watermarked windows, sessionization,
  *    stream-stream joins, streaming dedup, snapshot-per-batch ingestion
  *  - [[graft.datom]] — EAVT/AVET/VAET composite-key modeling
  *  - [[graft.operators]] — as-of join, bounded top-k-per-group aggregate
  *  - [[graft.pipeline]] — end-to-end corpus cleaning composition
  *
  * Driver contract: [[graft.SparkEntry]] (queries + DuckDB oracle SQL),
  * [[graft.Verify]] (correctness dump), [[graft.Bench]] (timings).
  */
package object graft
