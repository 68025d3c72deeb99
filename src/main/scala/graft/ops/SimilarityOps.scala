package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) —
  * SURVEY.md §2.10 / the training-data-pipeline surface.
  *
  * Scale design:
  *  - brute-force top-k BROADCASTS the (small) query set and streams the
  *    corpus once: per-row cosine is a codegen'd `zip_with`+`aggregate`
  *    fold, the only shuffle is the final per-query top-k window over
  *    |queries| x |corpus| candidate rows pre-reduced by the window;
  *  - the LSH variant buckets both sides by random-hyperplane sign bits so
  *    each query only scans its bucket (corpus/2^planes expected) — the
  *    100 TB path; planes are deterministic md5-derived literals inlined
  *    into the plan (and, verbatim, into the DuckDB oracle SQL);
  *  - all float components are cast to double before any arithmetic, and
  *    folds run sequentially left-to-right, so results are bit-stable
  *    across partitionings and engines.
  */
object SimilarityOps {

  /** Element-wise double view of a float-array column. */
  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential left-to-right sum of an array<double> column. */
  private def seqSum(v: Column): Column = aggregate(v, lit(0.0), (a, x) => a + x)

  /** Cosine similarity of two float-array columns, rounded to 6 dp.
    * One fused codegen'd loop ([[graft.functions.VectorMath]]) — same
    * sequential-fold arithmetic as the HOF formulation and the oracle,
    * without interpreted per-component lambda dispatch. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorMath.cosineSim(a, b)

  /** Deterministic random hyperplanes: component d of plane p is
    * md5-derived, uniform in [-1, 1). Generated driver-side once; the same
    * literals are inlined into the oracle SQL so both engines use
    * byte-identical planes. */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    (0 until nPlanes).map(p => (0 until dim).map(d =>
      h60(s"$p:$d").toDouble / (1L << 59).toDouble - 1.0))
  }

  /** LSH bucket id: bit p set iff dot(vec, plane_p) > 0. Codegen'd kernel
    * ([[graft.functions.VectorMath.HyperplaneBucket]]) — same sequential
    * dot-product fold as the HOF formulation and the oracle SQL. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    graft.functions.VectorMath.hyperplaneBucket(vec, planes)

  /** Brute-force exact top-k nearest neighbors by cosine for the query set
    * `idCol % queryMod == 0`, self-pairs excluded. */
  def annBruteForce(
      emb: DataFrame, idCol: String, vecCol: String,
      queryMod: Int, k: Int): DataFrame = {
    val queries = emb.filter(col(idCol) % queryMod === 0)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cand = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("nv")).as("cos"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("query_id"), col("rk"))
  }

  /** LSH-bucketed approximate top-k: queries only meet candidates in the
    * same hyperplane-sign bucket. `nPlanes` small (corpus shrinks ~2^p per
    * query); increase planes + add multi-probe for bigger corpora. */
  def annLsh(
      emb: DataFrame, idCol: String, vecCol: String,
      queryMod: Int, k: Int, nPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val bucketed = emb.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val queries = bucketed.filter(col("id") % queryMod === 0)
      .select(col("id").as("query_id"), col("v").as("qv"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    bucketed.select(col("id").as("neighbor_id"), col("v").as("nv"), col("bucket"))
      .join(broadcast(queries), "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("nv")).as("cos"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("query_id"), col("rk"))
  }

  /** Multi-probe variant of [[annLsh]]: each query also probes the
    * `nPlanes` buckets at Hamming distance 1 from its own (one sign-bit
    * flip each) — recall rises toward brute force without adding planes or
    * shrinking buckets. Probe fan-out is on the SMALL query side (queries
    * × (nPlanes+1) rows), the corpus is still hashed once. */
  def annLshMultiProbe(
      emb: DataFrame, idCol: String, vecCol: String,
      queryMod: Int, k: Int, nPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val bucketed = emb.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val probes = explode(array(
      (col("bucket") +: (0 until nPlanes).map(p =>
        col("bucket").bitwiseXOR(lit(1L << p)))): _*)).as("bucket_probe")
    val queries = bucketed.filter(col("id") % queryMod === 0)
      .select(col("id").as("query_id"), col("v").as("qv"), probes)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    bucketed.select(col("id").as("neighbor_id"), col("v").as("nv"), col("bucket"))
      .join(broadcast(queries), col("bucket") === col("bucket_probe"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("nv")).as("cos"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("query_id"), col("rk"))
  }

  /** Embedding-cosine near-duplicate pairs, LSH-bucketed: vectors sharing
    * a full hyperplane-sign bucket are candidates (each vector lives in
    * exactly ONE bucket, so no cross-band dedup is needed); exact cosine
    * verifies. Candidate generation is a groupBy-collect on the bucket id —
    * one shuffle, pipeline evaluated once — the same shape as MinHash-LSH
    * in [[graft.ops.DedupOps.minhashPairs]].
    *
    * `maxBucket` bounds the per-bucket pair expansion (n(n-1)/2) exactly as
    * in minhashPairs: with only 2^nPlanes buckets, ONE dense bucket — e.g. a
    * mass-duplicated embedding — would otherwise be a single task's OOM and
    * an unbounded n² blow-up at 100 TB. Dropped buckets are all-near-
    * identical clusters that exact dedup (on a vector hash) handles more
    * cheaply first — run it before this on dup-heavy corpora. */
  def embeddingNearDupPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int, dim: Int, minCos: Double, limit: Int,
      maxBucket: Int = 1000): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val bucketed = emb.select(
      col(idCol).as("id"), lshBucket(col(vecCol), planes).as("bucket"))
    val cand = bucketed
      .groupBy("bucket")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucket)
      .select(explode(graft.functions.Collections.orderedPairs(col("ids"))).as("p"))
      .select(col("p.a").as("vec_a"), col("p.b").as("vec_b"))
    cand
      .join(emb.select(col(idCol).as("vec_a"), col(vecCol).as("va")), "vec_a")
      .join(emb.select(col(idCol).as("vec_b"), col(vecCol).as("vb")), "vec_b")
      .select(col("vec_a"), col("vec_b"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= minCos)
      .orderBy(col("cos").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(limit)
  }

  /** IVF-style approximate top-k: an inverted-file index with a
    * deterministic centroid set (vectors with id % centroidMod == 0 stand
    * in for trained k-means centroids — the assignment/probe machinery is
    * what the engine provides; centroid training is an offline concern).
    * Every vector is assigned to its nearest centroid (one broadcast of
    * the small centroid set, ties broken by centroid id on the 6-dp
    * rounded cosine so both engines agree); queries probe their own
    * centroid's inverted list (nprobe=1). */
  def annIvf(
      emb: DataFrame, idCol: String, vecCol: String,
      centroidMod: Int, queryMod: Int, k: Int): DataFrame = {
    val cents = emb.filter(col(idCol) % centroidMod === 0)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val wAssign = Window.partitionBy(col("id")).orderBy(col("ccos").desc, col("cid").asc)
    val assigned = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(cents))
      .select(col("id"), col("v"), col("cid"), cosine(col("v"), col("cv")).as("ccos"))
      .withColumn("crk", row_number().over(wAssign))
      .filter(col("crk") === 1)
      .select(col("id"), col("v"), col("cid"))
    val queries = assigned.filter(col("id") % queryMod === 0)
      .select(col("id").as("query_id"), col("v").as("qv"), col("cid"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    assigned.select(col("id").as("neighbor_id"), col("v").as("nv"), col("cid"))
      .join(broadcast(queries), "cid")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("nv")).as("cos"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("query_id"), col("rk"))
  }

  /** Multi-probe IVF: like [[annIvf]] but each query probes its `nprobe`
    * NEAREST centroids' inverted lists instead of only its own — the
    * standard IVF recall knob (recall rises toward brute force as nprobe →
    * k-cells). The corpus is still assigned to exactly ONE list (crk=1), so
    * probing n distinct cells can never duplicate a candidate; the probe
    * fan-out lives on the small broadcast query side (queries × nprobe
    * rows), mirroring [[annLshMultiProbe]]'s shape. */
  def annIvfMultiProbe(
      emb: DataFrame, idCol: String, vecCol: String,
      centroidMod: Int, queryMod: Int, k: Int, nprobe: Int): DataFrame = {
    val cents = emb.filter(col(idCol) % centroidMod === 0)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val wAssign = Window.partitionBy(col("id")).orderBy(col("ccos").desc, col("cid").asc)
    val ranked = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(cents))
      .select(col("id"), col("v"), col("cid"), cosine(col("v"), col("cv")).as("ccos"))
      .withColumn("crk", row_number().over(wAssign))
    val assigned = ranked.filter(col("crk") === 1).select(col("id"), col("v"), col("cid"))
    val queries = ranked.filter(col("id") % queryMod === 0 && col("crk") <= nprobe)
      .select(col("id").as("query_id"), col("v").as("qv"), col("cid"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    assigned.select(col("id").as("neighbor_id"), col("v").as("nv"), col("cid"))
      .join(broadcast(queries), "cid")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("nv")).as("cos"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("query_id"), col("rk"))
  }

  /** IVF centroid TRAINING: fixed-iteration Lloyd k-means expressed
    * entirely as DataFrame ops — no driver-side collect, ever. Upgrades
    * [[annIvf]]'s id-sampled stand-in centroids to trained ones.
    *
    * Each iteration is two distributed steps:
    *  1. assign — corpus × broadcast(centroids) cosine, per-vector argmax
    *     (window rn=1; ties on the 6-dp score break by centroid id, so both
    *     engines agree);
    *  2. update — per-(cluster, dim) decimal-exact mean via posexplode
    *     (exact under any partial-agg order), re-assembled in dim order,
    *     rounded to 6 dp (the engine-wide cross-engine score contract).
    *
    * Initialization is deterministic AND bounded: the k lowest-id vectors
    * seed the k centroids, so the per-iteration broadcast stays k × dim
    * doubles no matter how large the corpus grows (an id-mod seed would
    * scale the centroid count — and the broadcast — with the corpus).
    * Clusters that lose all members drop out (standard Lloyd behavior).
    * `iters` is fixed rather than convergence-tested: that keeps the oracle
    * expressible (the DuckDB mirror unrolls the same iterations as CTEs)
    * and bounds cost; convergence-driven training is the same loop with a
    * count-based stop like [[DedupOps.connectedComponents]].
    *
    * 100 TB shape: centroids stay a small broadcast relation (k × dim
    * doubles); the corpus is scanned once per iteration, shuffled once per
    * iteration on (cluster, dim) for the partial-aggregated means. */
  def kmeansCentroids(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(iters >= 1, "kmeans needs at least one iteration")
    require(k >= 1, "kmeans needs at least one centroid")
    val vecs = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    var cents = emb.orderBy(col(idCol).asc).limit(k)
      .select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
    var out: DataFrame = null
    for (_ <- 0 until iters) {
      val w = Window.partitionBy(col("id")).orderBy(col("ccos").desc, col("cid").asc)
      val assigned = vecs.crossJoin(broadcast(cents))
        .select(col("id"), col("v"), col("cid"), cosine(col("v"), col("cv")).as("ccos"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("v"), col("cid"))
      val perDim = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("dim0", "x")))
        .groupBy(col("cid"), (col("dim0") + 1).as("dim"))
        .agg(
          // float -> double -> decimal: exact widening then an exact,
          // associative sum (see labelCentroidProfile)
          round(sum(col("x").cast("double").cast("decimal(18,9)")).cast("double")
            / count(lit(1)), 6).as("m"),
          count(lit(1)).as("n"))
      out = perDim
        .groupBy("cid")
        .agg(
          array_sort(collect_list(struct(col("dim"), col("m")))).as("pairs"),
          max(col("n")).as("n_vecs"))
        .select(col("cid"), col("n_vecs"),
          transform(col("pairs"), p => p.getField("m")).as("centroid"))
      cents = out.select(col("cid"), col("centroid").as("cv"))
    }
    out.select(col("cid"), col("n_vecs"), col("centroid")).orderBy("cid")
  }

  /** Catalog shape of [[kmeansCentroids]]: one row per (cluster, dimension)
    * with scalar columns only. Array columns cannot be gate-compared (the
    * correctness harness sorts output columns and arrays are unhashable
    * there), so the array form above stays library-API-only and the
    * declared query uses this flattening. */
  def kmeansCentroidsFlat(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    kmeansCentroids(emb, idCol, vecCol, k, iters)
      .select(col("cid"), col("n_vecs"),
        posexplode(col("centroid")).as(Seq("dim0", "mean")))
      .select(col("cid"), (col("dim0") + 1).cast("long").as("dim"),
        col("mean"), col("n_vecs"))
      .orderBy("cid", "dim")

  /** Per-label centroid profile: vector count and decimal-exact means of
    * the first two dimensions (component values cast to decimal before
    * summing — exact under any aggregation order). The full-centroid
    * operator for engine use is [[labelCentroids]]. */
  def labelCentroidProfile(emb: DataFrame, idCol: String, vecCol: String, labelCol: String): DataFrame =
    emb
      .groupBy(col(labelCol).as("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        // float -> double first: Spark's float->decimal cast goes through
        // Float.toString (shortest repr), which disagrees with engines that
        // round the widened binary value
        sum(element_at(col(vecCol), 1).cast("double").cast("decimal(18,9)")).as("s0"),
        sum(element_at(col(vecCol), 2).cast("double").cast("decimal(18,9)")).as("s1"))
      .select(
        col("label"), col("n_vecs"),
        round(col("s0").cast("double") / col("n_vecs"), 6).as("mean_d0"),
        round(col("s1").cast("double") / col("n_vecs"), 6).as("mean_d1"))
      .orderBy("label")

  /** Full per-label mean vector (array<double>): posexplode + per-dim avg +
    * re-assembly in dim order. One shuffle on (label, dim). */
  def labelCentroids(emb: DataFrame, vecCol: String, labelCol: String): DataFrame =
    emb
      .select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy("label", "dim")
      .agg(avg(col("x").cast("double")).as("m"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("pairs"))
      .select(col("label"), transform(col("pairs"), p => p.getField("m")).as("centroid"))
}
