package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Training-data-pipeline primitives over text + embedding columns — the
  * operator families a 100 TB corpus pipeline needs (dedup, similarity,
  * text analysis, multimodal plumbing). The reference's analogous surface:
  * usearch HNSW vector index (`src/storage/v2/indices/vector_index.hpp:125-129`),
  * tantivy text index (`src/storage/v2/indices/text_index.hpp:37-48`), and
  * the MAGE text/LLM helpers (`src/mage/python/llm_util.py`).
  *
  * Portability discipline: every hash is an md5/sha2 of an explicit string
  * (identical across engines, so DuckDB can oracle-check bit-for-bit), and
  * every float reduction is a fixed-order left-to-right fold over an array
  * (deterministic regardless of partitioning — `aggregate()` folds the array
  * in element order, unlike a distributed `sum()`).
  *
  * Scale notes per op:
  *   - exact dedup: one hash + one shuffle on the hash — optimal.
  *   - MinHash/LSH: banding turns the all-pairs O(n²) join into per-bucket
  *     joins; at 100 TB the band value is the shuffle key and only
  *     within-bucket pairs are materialized.
  *   - ANN: brute-force top-k is the correctness baseline; the sign-code
  *     bucketing (IVF-style) is the scale path — candidates are co-shuffled
  *     by code so each bucket joins locally.
  *   - simhash: per-bit majority votes are plain aggregates (map-side
  *     combinable).
  */
object LlmOps {

  /** Canonical text form: collapse whitespace runs, trim, lowercase. */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  def words(c: Column): Column = split(normText(c), " ")

  /** Exact-dedup key (sha-256 of the canonical form). */
  def docHash(c: Column): Column = sha2(normText(c), 256)

  /** One MinHash component (aggregate): lexicographic min of salted md5
    * over the doc's shingle/word column. Hex-string min is portable — no
    * engine-specific 64-bit hash needed. */
  def minhashAgg(shingle: Column, salt: Int): Column =
    min(md5(concat(lit(s"mh$salt:"), shingle)))

  /** One simhash bit (aggregate): majority vote over words, where each
    * word's pseudo-random bit is "first hex digit of salted md5 < '8'". */
  def simhashBitAgg(word: Column, bit: Int): Column =
    when(
      sum(
        when(substring(md5(concat(lit(s"sh$bit:"), word)), 1, 1) < "8", 1)
          .otherwise(-1)) > 0,
      "1").otherwise("0")

  /** Word 3-gram shingles from a words array. */
  def shingles3(ws: Column): Column =
    when(size(ws) < 3, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(1), size(ws) - 2),
          i => concat_ws(" ", slice(ws, i, lit(3)))))

  /** Float array → double array (compute in double, deterministically). */
  def vecD(v: Column): Column = transform(v, _.cast("double"))

  /** Fixed-order dot product / L2 norm over array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)
  def l2norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), _ + _))

  /** IVF-style bucket code: sign bits of the first `bits` dimensions. */
  def signCode(v: Column, bits: Int): Column =
    concat(
      (1 to bits).map(i =>
        when(element_at(v, i) >= 0, "1").otherwise("0")): _*)

  /** Jaccard similarity of two array columns (as sets). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b))

  /** Multimodal decode STUB: real pipelines decode image/audio bytes here
    * (via native libs unavailable in this environment); the Spark-side
    * plumbing — binary column, deterministic per-item features — is real.
    * Features = ascii codes of the md5 nibbles of the canonical text. */
  def stubFeature(norm: Column, i: Int): Column =
    ascii(substring(md5(norm), i, 1))
}
