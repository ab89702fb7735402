package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed training-data pipeline flagship (r4 verdict task 6):
  * one declared query chaining four operators the engine already
  * ships separately —
  *
  *   chunk (T13) → feature-hash embed (T12) → SRP-LSH near-dup prune
  *   (V4) → sequence-pack (T20)
  *
  * — the "this is an engine, not a query zoo" demonstration. Each
  * stage is THE existing operator ([[Text.chunkCore]],
  * [[Text.withHashedVec]], [[Vectors.srpPairsOf]] + [[Components]],
  * the T20 bin recurrence), not a copy, so the pipeline exercises
  * cross-operator composition: the chunk relation fans into the
  * banded LSH self-join whose two sides collapse into one computed
  * exchange (ReuseExchange — PlanSpec pins it), the surviving-chunk
  * id set is a narrow anti-dup key join, and packing is one window
  * over the (source)-partitioned survivors.
  *
  * Scale shape, stage by stage, at 100 TB:
  *  - chunking is explode-in-scan — narrow, pipelined, no shuffle;
  *  - hashing is a per-row codegen'd pass over chunk text
  *    ([[graft.functions.PortableStringHash]]);
  *  - the LSH candidate join shuffles (band, bkey) keys ONLY — chunk
  *    text and vectors never ride through the self-join, candidates
  *    are bounded by bucket sizes (the LSH guarantee), and the
  *    cosine confirm joins vectors back by narrow id;
  *  - transitive closure is pointer-jumping over confirmed edges
  *    (O(log d) rounds, edges ≪ chunks);
  *  - packing shuffles once on `source` — per-shard parallel, the
  *    same partitioned-window discipline as q_pack_sequences.
  *
  * Near-dup threshold: hashed CHUNK count-vectors are all drawn from
  * one vocabulary distribution, so random-pair cosine sits far above
  * 0 (unlike the embeddings table) — the dup bar must be near-exact
  * overlap. 0.995 keeps genuinely re-rolled windows (the stride-192
  * overlap of 64/256 chars alone never reaches it) while collapsing
  * same-text chunks; PipelineSpec pins the planted-duplicate
  * behavior and the oracle unroll sufficiency. */
object Pipeline {

  private val ChunkWindow = 256
  private val ChunkStride = 192
  /** Chunk id = doc_id · CidBase + chunk_idx — collision-free while
    * docs stay under CidBase·stride ≈ 19 M chars (harness max ~2 k;
    * the require below fails loudly long before). */
  private val CidBase = 100000L
  private val PackCapacity = 128
  private val MinCos = 0.995

  def pipelineCorpus(s: SparkSession, d: String): DataFrame =
    pipelineCorpusCore(Tables.documents(s, d))

  /** T13: overlapping windows, `source` carried for per-shard packing. */
  private def chunksOf(docs: DataFrame): DataFrame =
    Text.chunkCore(docs, ChunkWindow, ChunkStride, carry = Seq("source"))
      .withColumn("cid",
        when(col("chunk_idx") < CidBase, col("doc_id") * CidBase + col("chunk_idx"))
          .otherwise(raise_error(concat(lit("chunk_idx overflows CidBase: "),
            col("chunk_idx").cast("string")))).cast("long"))

  /** T12 over chunk text; all-whitespace chunks have no tokens, no
    * vector, and (matching the oracle) drop out of the pipeline here.
    * `tkey` (text digest) rides along as the exact-collapse key for
    * [[edgesOf]]'s LSH front. */
  private def vecsOf(chunks: DataFrame): DataFrame =
    Text.withHashedVec(chunks, textCol = "chunk")
      .filter(size(col("buckets")) > 0)
      .select(col("cid").as("vec_id"), col("vec").as("v"),
        md5(col("chunk")).as("tkey"))

  /** V4 stage: centered SRP-LSH candidates → cosine-confirmed edges.
    *
    * Centering before the bucketing: hashed count vectors live in the
    * positive orthant (all counts ≥ 0), where sign-hyperplane buckets
    * collide constantly — measured on testdata, centering cuts
    * candidate pairs 3.6× (68,741 → 18,972 at sf0.001) with the SAME
    * confirmed edge set, because exact-dup chunks have IDENTICAL
    * centered vectors and still collide in every band. The mean is a
    * 1-row broadcast aggregate (exact: integral-double sums, one
    * division), the zScores shape without the variance pass; cosine
    * still scores the RAW vector, so centering affects recall of the
    * bucketing only, never a confirmed score. */
  private def edgesOf(vecs: DataFrame): DataFrame = {
    val dimMeans = vecs.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("i")).agg((sum(col("x")) / count(lit(1))).as("m"))
      .agg(sort_array(collect_list(struct(col("i"), col("m")))).as("ms"))
    // Exact-collapse front (r6, from the measured sf1 scale point):
    // identical chunk TEXTS enter the banded self-join as ONE
    // representative node. Without it, a chunk text occurring k times
    // (boilerplate, or a replicated corpus) puts k identical vectors
    // in the same bucket of EVERY band — C(k,2) candidate pairs per
    // group, the quadratic that measured slope 35.8 at the 10× scale
    // point (334 s; duplicate mass grows quadratically under cloning
    // while everything else is linear). The collapse is
    // OUTPUT-IDENTICAL by construction, which is why the oracle is
    // unchanged: clones have identical centered vectors, so (a) a rep
    // pair band-collides iff any member pair does, and (b) member ↔
    // rep star edges reconnect each exact group, so the transitive
    // closure reaches the same clusters and the same min-cid
    // survivors. The means stay multiplicity-weighted (computed over
    // the UNCOLLAPSED vectors) so band keys are bit-identical to the
    // uncollapsed plan's. Exact-dedup-before-near-dedup is the
    // standard production staging (T10's recipe), applied inside one
    // operator.
    val reps = vecs.groupBy(col("tkey"))
      .agg(min(col("vec_id")).as("vec_id"),
        min_by(col("v"), col("vec_id")).as("v"))
    val centered = reps.crossJoin(broadcast(dimMeans))
      .select(col("vec_id"), col("v"),
        zip_with(col("v"), col("ms"), (x, st) => x - st("m")).as("vc"))
    val lsh = Vectors.srpPairsOf(centered, MinCos, bandCol = "vc")
      .select(col("va").as("src"), col("vb").as("dst"))
    val exactEdges = vecs
      .join(reps.select(col("tkey"), col("vec_id").as("rep")), Seq("tkey"))
      .filter(col("vec_id") =!= col("rep"))
      .select(col("rep").as("src"), col("vec_id").as("dst"))
    lsh.unionByName(exactEdges)
  }

  /** The confirmed near-dup chunk edges — exposed so PipelineSpec can
    * pin the oracle's closure-unroll sufficiency against the engine's
    * Components fixed point. */
  private[graft] def nearDupEdges(docs: DataFrame): DataFrame =
    edgesOf(vecsOf(chunksOf(docs)))

  /** The pipeline over any `(doc_id, source, text, n_chars)` relation
    * — DataFrame-parameterized so PipelineSpec can plant duplicate
    * docs and watch exactly their chunks fold. */
  private[graft] def pipelineCorpusCore(docs: DataFrame): DataFrame = {
    val chunks = chunksOf(docs)
    val vecs = vecsOf(chunks)
    // transitive closure: a chunk keys to the min cid of its cluster
    val edges = edgesOf(vecs)
    val comps = Components.connectedComponents(edges)
      .select(col("node").as("cid"), col("comp").as("rep"))
    val kept = vecs.select(col("vec_id").as("cid"))
      .join(comps, Seq("cid"), "left")
      .filter(coalesce(col("rep"), col("cid")) === col("cid"))
      .select(col("cid"))
    // T20: greedy contiguous packing of the survivors, per source in
    // (doc_id, chunk_idx) order — same bin recurrence (exclusive
    // running token total div capacity) as q_pack_sequences.
    // n_tokens is computed BEFORE the survivor join (r8 verdict task
    // 6): the output never carries chunk text, so projecting to
    // (cid, doc_id, chunk_idx, source, n_tokens) here keeps the
    // ×100-cloned text out of the join shuffle and the packing window
    // — Catalyst prunes unused COLUMNS below a join but never hoists
    // expression evaluation, so the narrowing is explicit.
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"), col("chunk_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    chunks
      .select(col("cid"), col("doc_id"), col("chunk_idx"), col("source"),
        size(split(col("chunk"), " ")).as("n_tokens"))
      .join(kept, Seq("cid"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("chunk_idx"), col("source"), col("n_tokens"),
        floor(col("cum_before") / (PackCapacity * 1.0)).cast("int").as("bin"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_corpus" -> pipelineCorpus,
  )

  /** The whole chain replayed in DuckDB: the q_chunk_docs windows,
    * the q_hash_embed bucket-count vectors (over chunk text), the
    * q_dedup_embed SRP bands / candidate pairs / cosine edges /
    * unrolled min-label closure (shared generators —
    * [[Vectors.sqlSrpBandSelects]] — so engine and oracle constants
    * cannot drift), and the q_pack_sequences bin recurrence. Every
    * closure round MATERIALIZED for the same 2^rounds-replan reason
    * as q_dedup_embed; 20 rounds, sufficiency pinned by PipelineSpec
    * on testdata. */
  val oracles: Map[String, String] = Map(
    "q_pipeline_corpus" -> {
      val rounds = 20
      val steps = (1 to rounds).map { k =>
        s""", l$k AS MATERIALIZED (
             SELECT l.cid, least(l.lbl, coalesce(min(n.lbl), l.lbl)) AS lbl
             FROM l${k - 1} l
             LEFT JOIN und u ON l.cid = u.a
             LEFT JOIN l${k - 1} n ON u.b = n.cid
             GROUP BY l.cid, l.lbl)"""
      }.mkString
      s"""WITH starts AS (
           SELECT doc_id, source, text, unnest(range(0, n_chars, $ChunkStride)) AS start
           FROM documents),
         c AS MATERIALIZED (
           SELECT doc_id, source, CAST(start // $ChunkStride AS INT) AS chunk_idx,
                  substr(text, CAST(start AS INT) + 1, $ChunkWindow) AS chunk,
                  doc_id * $CidBase + (start // $ChunkStride) AS cid
           FROM starts),
         v AS MATERIALIZED (
           SELECT cid, list_transform(range(0, 64), i ->
             CAST(len(list_filter(
               list_transform(list_filter(string_split(chunk, ' '), w -> w != ''), w ->
                 list_reduce(list_transform(string_split(w, ''), ch -> CAST(ascii(ch) AS BIGINT)), (a, x) -> (a * 31 + x) % 1000003)
                   % 64),
               b -> b = i)) AS DOUBLE)) AS v
           FROM c
           WHERE len(list_filter(string_split(chunk, ' '), w -> w != '')) > 0),
         mexp AS (SELECT u.i AS i, sum(v.v[u.i]) / count(*) AS m
                  FROM v, (SELECT unnest(range(1, 65)) AS i) u GROUP BY u.i),
         mlist AS (SELECT list(m ORDER BY i) AS ms FROM mexp),
         vc AS MATERIALIZED (
           SELECT cid, list_transform(range(1, 65), i -> v[i] - ms[i]) AS vc
           FROM v CROSS JOIN mlist),
         bands AS MATERIALIZED (
           ${Vectors.sqlSrpBandSelects("vc", "cid", "vc")}),
         pairs AS MATERIALIZED (
           SELECT DISTINCT a.cid AS va, b.cid AS vb
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.bkey = b.bkey AND a.cid < b.cid),
         edges AS MATERIALIZED (
           SELECT va, vb
           FROM pairs
           JOIN (SELECT cid, v FROM v) ea ON va = ea.cid
           JOIN (SELECT cid, v AS w FROM v) eb ON vb = eb.cid
           WHERE ${Vectors.sqlCos("ea.v", "eb.w")} >= $MinCos),
         und AS MATERIALIZED (
           SELECT va AS a, vb AS b FROM edges
           UNION ALL SELECT vb AS a, va AS b FROM edges),
         l0 AS MATERIALIZED (SELECT cid, cid AS lbl FROM v)$steps,
         kept AS (SELECT cid FROM l$rounds WHERE lbl = cid),
         p AS (SELECT c.doc_id, c.chunk_idx, c.source,
                 CAST(len(string_split(c.chunk, ' ')) AS INT) AS n_tokens
               FROM c JOIN kept ON c.cid = kept.cid)
         SELECT doc_id, chunk_idx, source, n_tokens,
           CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY source
             ORDER BY doc_id, chunk_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / $PackCapacity.0) AS INT) AS bin
         FROM p ORDER BY doc_id, chunk_idx"""
    },
  )
}
