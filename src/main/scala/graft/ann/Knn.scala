package graft.ann

import graft.dedup.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - `bruteForceTopK`: exact cosine top-k; the (small) query set is
  *   broadcast against the corpus, so the corpus never shuffles — one
  *   scan + a per-query top-k window. The correctness baseline.
  * - `lshTopK`: random-hyperplane LSH — per-row signatures
  *   (projection), candidates restricted to same-bucket rows, then
  *   exact re-rank inside buckets. The scale path: the bucket join
  *   shuffles signature keys, not vectors x queries.
  *
  * Cosine uses int-quantized dot products (Dedup.quantize/cosineQ):
  * exact integer arithmetic, engine-reproducible, and the standard
  * int8-quantization trick for 100 TB-scale vector scans.
  */
object Knn {

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String, k: Int)
      : DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"),
      Dedup.quantize(col(vecCol)).as("__cq"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      Dedup.quantize(col(vecCol)).as("__qq"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("item_id"),
        Dedup.cosineQ(col("__cq"), col("__qq")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic integer hyperplanes from a seed (splitmix64 mix of
    * (seed, bit, dim), folded to [-1000, 1000]) — generated ONCE on
    * the driver and embedded as literals, so every signature bit is a
    * codegen'd [[graft.functions.DotProductQ]] integer dot product.
    *
    * This replaced a per-row `aggregate(zip_with(...))` HOF variant
    * that recomputed hash-derived plane terms inside an interpreted
    * lambda per row per bit — same math, but outside codegen and
    * invisible to the RewriteHofDotProduct rule. Driver-side plane
    * state is nBits x dims longs (a few KB), exactly the bounded
    * fitted-model shape every other operator uses.
    */
  def defaultPlanes(nBits: Int, dims: Int,
      seed: Long = 0x5DEECE66DL): Array[Array[Long]] =
    Array.tabulate(nBits)(b => Array.tabulate(dims) { i =>
      var z = seed + (b.toLong * dims + i + 1) * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= (z >>> 31)
      java.lang.Math.floorMod(z, 2001L) - 1000L
    })

  /** Signature from EXPLICIT integer hyperplanes (a pinned model):
    * bit b = sign(quantized(v) . planes(b)) through the codegen'd
    * [[graft.functions.DotProductQ]] — exact integer arithmetic any
    * engine reproduces, which is what gives the LSH search a
    * value-exact oracle (q98).
    */
  def hyperplaneSigPinned(vecQ: Column,
      planes: Array[Array[Long]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, b) =>
      val dot = graft.functions.DotProductQ
        .dotQ(vecQ, typedLit(p.toSeq))
      when(dot > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_)): Column
  }

  /** IVF (inverted-file) top-k — the classic coarse-quantizer ANN:
    *  1. nlist centroids from a deterministic corpus sample, refined by
    *     `iters` Lloyd steps run RELATIONALLY (assignment is a
    *     broadcast-centroid argmin projection; the centroid update is
    *     posexplode(vector) -> groupBy(cluster, dim).avg — nothing but
    *     scans and one tiny agg per iteration, no driver math over data);
    *  2. every corpus vector lands in exactly ONE inverted list
    *     (vs LSH's `tables` copies — IVF shuffles each vector once);
    *  3. a query probes its `nprobe` nearest centroids and exact-reranks
    *     only those lists.
    * At 100 TB the corpus-side cost is one centroid-assignment scan and
    * a single hash exchange on the list id; queries are broadcast.
    */
  /** Fitted IVF coarse quantizer — tiny driver-side state (nlist x
    * dims doubles), JSON-serialisable like every other fitted state in
    * the engine.
    */
  final case class IvfModel(centroids: Array[Array[Double]])

  /** Lloyd-refined centroids from a deterministic corpus sample — the
    * BUILD half of IVF, run once and amortized over every query batch.
    * Each iteration is relational: assignment is nlist codegen'd
    * integer dot products per row, the centroid update one
    * posexplode + groupBy(cluster, dim) avg; only nlist x dims scalars
    * ever reach the driver.
    */
  def ivfBuild(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, iters: Int = 2): IvfModel = {
    val dimsRow = corpus.select(size(col(vecCol)).as("__d"))
      .filter(col("__d").isNotNull && col("__d") > 0)
      .limit(1).collect()
    require(dimsRow.nonEmpty,
      "ivfBuild needs a non-empty corpus with non-null vectors " +
        "(an inverted-file index over nothing has no meaning — " +
        "query paths answer empty via ivfTopK)")
    val dims = dimsRow.head.getInt(0)

    // deterministic seed centroids: the nlist corpus vectors with the
    // smallest xxhash64(id) — a pseudo-random sample without rand().
    // The cast normalizes array<float> AND array<double> inputs (every
    // query path accepts both via Dedup.quantize).
    var centroids: Array[Array[Double]] = corpus
      .select(col(vecCol).cast("array<double>").as(vecCol),
        xxhash64(col(idCol).cast("string")).as("__h"))
      .orderBy(col("__h")).limit(nlist)
      .collect()
      .map(_.getSeq[Double](0).toArray)

    (1 to iters).foreach { _ =>
      val cs = centroids
      val assigned = corpus.select(
        nearestCentroid(Dedup.quantize(col(vecCol)), cs).as("__c"),
        posexplode(col(vecCol)).as(Seq("__d", "__x")))
      val updated = assigned
        .groupBy(col("__c"), col("__d"))
        .agg(avg(col("__x")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
      centroids = centroids.indices.map { c =>
        updated.get(c) match {
          case Some(rows) =>
            val m = Array.ofDim[Double](dims)
            rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
            m
          case None => centroids(c) // empty list keeps its seed
        }
      }.toArray
    }
    IvfModel(centroids)
  }

  /** Inverted lists: every corpus vector lands in exactly ONE list
    * (vs LSH's `tables` copies). Columns: (item_id, __cq, __list).
    */
  def ivfLists(model: IvfModel, corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    corpus
      .select(col(idCol).as("item_id"),
        Dedup.quantize(col(vecCol)).as("__cq"))
      .select(col("item_id"), col("__cq"),
        nearestCentroid(col("__cq"), model.centroids).as("__list"))

  /** QUERY half: each query probes its nprobe nearest centroids and
    * exact-reranks only those lists. Queries broadcast; the corpus-side
    * lists are reusable across arbitrarily many query batches.
    */
  /** `(query_id, __qq, __list)` probe rows: each query's quantized
    * vector exploded to its `nprobe` nearest centroid lists — the ONE
    * probe-selection rule shared by [[ivfQuery]] and [[ivfPqTopK]]
    * (drifting copies would silently desynchronize IVF and IVF-PQ
    * probing).
    */
  private def probesOf(model: IvfModel, queries: DataFrame,
      queryIdCol: String, vecCol: String, nprobe: Int): DataFrame =
    queries
      .select(col(queryIdCol).as("query_id"),
        Dedup.quantize(col(vecCol)).as("__qq"))
      .select(col("query_id"), col("__qq"),
        array_sort(array(
          centroidDists(col("__qq"), model.centroids): _*)).as("__pl"))
      .select(col("query_id"), col("__qq"),
        explode(slice(col("__pl"), 1, nprobe)).as("__p"))
      .select(col("query_id"), col("__qq"),
        col("__p").cast("struct<d:bigint,i:int>").getField("i")
          .as("__list"))

  def ivfQuery(model: IvfModel, lists: DataFrame, queries: DataFrame,
      queryIdCol: String, vecCol: String, k: Int, nprobe: Int = 4)
      : DataFrame = {
    val probes = probesOf(model, queries, queryIdCol, vecCol, nprobe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id"))
    lists.join(broadcast(probes), Seq("__list"))
      .select(col("query_id"), col("item_id"),
        Dedup.cosineQ(col("__cq"), col("__qq")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Persist a built index: inverted lists go through
    * [[graft.io.SnapshotStore]] (checkpointed, lineage-verified,
    * resumable — an interrupted index build restarts where it
    * stopped), centroids as a small driver-side file.
    */
  def ivfSave(model: IvfModel, lists: DataFrame, root: String)
      : graft.io.SnapshotStore.WriteResult = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "ivf_centroids.txt"),
      model.centroids.map(_.mkString(",")).mkString("\n"))
    graft.io.SnapshotStore.write(lists, s"$root/lists",
      pmod(col("__list"), lit(16)).cast("int"))
  }

  def ivfLoad(spark: org.apache.spark.sql.SparkSession, root: String)
      : (IvfModel, DataFrame) = {
    val cs = java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "ivf_centroids.txt"))
      .split("\n").map(_.split(",").map(_.toDouble))
    (IvfModel(cs), graft.io.SnapshotStore.read(spark, s"$root/lists"))
  }

  /** Persist a built IVF-PQ index: the (item_id, __list, codes) rows
    * go through [[graft.io.SnapshotStore]] (checkpointed,
    * lineage-verified, resumable), both models as small driver-side
    * files — the same split as [[ivfSave]]: bounded fitted state on
    * the driver, data-sized state in the snapshotted store.
    */
  def ivfPqSave(ivf: IvfModel, pq: PqModel, index: DataFrame,
      root: String): graft.io.SnapshotStore.WriteResult = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "ivf_centroids.txt"),
      ivf.centroids.map(_.mkString(",")).mkString("\n"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "pq_codebook.txt"),
      s"${pq.m} ${pq.dsub}\n" +
        pq.centroids.flatten.map(_.mkString(",")).mkString("\n"))
    graft.io.SnapshotStore.write(index, s"$root/ivfpq_index",
      pmod(col("__list"), lit(16)).cast("int"))
  }

  def ivfPqLoad(spark: org.apache.spark.sql.SparkSession, root: String)
      : (IvfModel, PqModel, DataFrame) = {
    val ivfCs = java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "ivf_centroids.txt"))
      .split("\n").map(_.split(",").map(_.toDouble))
    val pqLines = java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "pq_codebook.txt")).split("\n")
    val Array(m, dsub) = pqLines.head.split(" ").map(_.toInt)
    val flat = pqLines.tail.map(_.split(",").map(_.toDouble))
    val ksub = flat.length / m
    val cents = Array.tabulate(m)(i =>
      flat.slice(i * ksub, (i + 1) * ksub))
    (IvfModel(ivfCs), PqModel(m, dsub, cents),
      graft.io.SnapshotStore.read(spark, s"$root/ivfpq_index"))
  }

  /** One-shot IVF top-k (build + lists + query in a single call) —
    * the bench/oracle entry point; production splits the halves via
    * ivfBuild/ivfLists/ivfSave/ivfLoad/ivfQuery.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    // empty/all-null corpus: no index to build, no possible hits —
    // answer empty with the output schema (EmptyInputSpec contract,
    // same as lshTopK) instead of crashing inside the build
    if (corpus.select(size(col(vecCol)).as("__d"))
        .filter(col("__d").isNotNull && col("__d") > 0)
        .limit(1).collect().isEmpty)
      return queries.select(col(queryIdCol).as("query_id"))
        .filter(lit(false))
        .withColumn("item_id",
          lit(null).cast(corpus.schema(idCol).dataType))
        .withColumn("cosine", lit(0.0))
        .withColumn("rank", lit(0))
    val model = ivfBuild(corpus, idCol, vecCol, nlist, iters)
    ivfQuery(model, ivfLists(model, corpus, idCol, vecCol), queries,
      queryIdCol, vecCol, k, nprobe)
  }

  /** Per-centroid squared distance in QUANTIZED integer units:
    * argmin ||x-c||^2 == argmin (|c|^2 - 2 x.c) since |x|^2 is
    * constant per row — so the whole assignment is nlist codegen'd
    * integer dot products (graft.functions.DotProductQ), no
    * interpreted per-element lambdas in the per-row hot loop.
    */
  private def centroidDists(qvec: Column,
      cs: Array[Array[Double]]): Seq[Column] =
    cs.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      val cq = c.map(x => math.round(x * 1000))
      val norm2 = cq.map(v => v * v).sum
      struct(
        (lit(norm2) - lit(2L) * graft.functions.DotProductQ
          .dotQ(qvec, typedLit(cq.toSeq))).as("d"),
        lit(i).as("i"))
    }

  private def nearestCentroid(qvec: Column,
      cs: Array[Array[Double]]): Column =
    // struct ordering = (distance, index) -> argmin, ties to the
    // lower index; re-cast pins field names across type coercion
    array_min(array(centroidDists(qvec, cs): _*))
      .cast("struct<d:bigint,i:int>").getField("i")

  /** LSH top-k: candidates share any of `tables` signature buckets
    * (each table uses a disjoint bit range), exact cosine re-rank per
    * query, top-k. Recall < 1 by construction; verified against
    * bruteForceTopK in tests.
    *
    * Planes default to [[defaultPlanes]] (deterministic from a fixed
    * seed), so the default call is reproducible in any engine and
    * ALWAYS takes the codegen'd pinned signature path — there is no
    * interpreted fallback.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int,
      bitsPerTable: Int = 8, tables: Int = 4,
      pinnedPlanes: Option[Array[Array[Long]]] = None): DataFrame = {
    val planes = pinnedPlanes.getOrElse {
      // one bounded driver action: the vector width (planes are
      // nBits x dims literals, the same fitted-model scale as IVF/PQ).
      // Null-safe + empty-safe: an empty or all-null-vector corpus has
      // no width to learn and no possible hits — answer empty with the
      // output schema instead of crashing (EmptyInputSpec contract)
      val dimsRow = corpus
        .select(size(col(vecCol)).as("__d"))
        .filter(col("__d").isNotNull && col("__d") > 0)
        .limit(1).collect()
      if (dimsRow.isEmpty)
        return queries.select(col(queryIdCol).as("query_id"))
          .filter(lit(false))
          .withColumn("item_id",
            lit(null).cast(corpus.schema(idCol).dataType))
          .withColumn("cosine", lit(0.0))
          .withColumn("rank", lit(0))
      defaultPlanes(bitsPerTable * tables, dimsRow.head.getInt(0))
    }
    require(planes.length == bitsPerTable * tables,
      s"planes: need ${bitsPerTable * tables}, got ${planes.length}")
    // quantize ONCE behind a projection boundary; the sig bits and the
    // rerank both read __q instead of re-evaluating the interpreted
    // quantize HOF per plane
    def buckets(d: DataFrame, id: String): DataFrame = {
      val withQ = d.select(col(id),
        Dedup.quantize(col(vecCol)).as("__q"))
      val sig = hyperplaneSigPinned(col("__q"), planes)
      withQ.select(col(id), col("__q"), sig.as("__sig"))
        .select(col(id), col("__q"), explode(array((0 until tables).map {
          t =>
            struct(lit(t).as("tbl"),
              shiftright(col("__sig"), t * bitsPerTable)
                .bitwiseAND((1L << bitsPerTable) - 1).as("bkt"))
        }: _*)).as("b"))
        .select(col(id), col("__q"), col("b.tbl"), col("b.bkt"))
    }
    val c = buckets(corpus, idCol)
      .select(col(idCol).as("item_id"), col("tbl"), col("bkt"),
        col("__q").as("__cq"))
    val q = buckets(queries, queryIdCol)
      .select(col(queryIdCol).as("query_id"), col("tbl"), col("bkt"),
        col("__q").as("__qq"))
    val cands = c.join(broadcast(q), Seq("tbl", "bkt"))
      .select(col("query_id"), col("item_id"), col("__cq"), col("__qq"))
      .dropDuplicates("query_id", "item_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id"))
    cands
      .select(col("query_id"), col("item_id"),
        Dedup.cosineQ(col("__cq"), col("__qq")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive training: per query, the
    * documents ranked just BELOW the top `skipTop` neighbors — similar
    * enough to be informative negatives, far enough to (probably) be
    * true negatives. Ranks are exact here (brute force); at corpus
    * scale feed the ADC/IVF shortlist into the same rank-band filter.
    * Output: (query_id, rank, item_id, cosine), skipTop < rank <=
    * skipTop + take.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      skipTop: Int, take: Int): DataFrame = {
    require(skipTop >= 1 && take >= 1,
      s"need skipTop, take >= 1; got $skipTop, $take")
    bruteForceTopK(corpus, queries, idCol, vecCol, queryIdCol,
      skipTop + take)
      .filter(col("rank") > skipTop)
  }

  // ---- product quantization (PQ) ----------------------------------

  /** Fitted PQ codebook: `m` subspaces x `ksub` centroids of `dsub`
    * dims each — the memory-compression half of web-scale ANN: a
    * 64-dim float vector (256 B) becomes `m` byte codes, so a corpus'
    * candidate scan touches codes + a per-query lookup table instead
    * of raw vectors. Driver-side state is m x ksub x dsub doubles.
    */
  final case class PqModel(m: Int, dsub: Int,
      centroids: Array[Array[Array[Double]]])

  /** Per-subspace Lloyd's, fully relational like [[ivfBuild]]: one
    * explode to (subspace, subvector) rows, assignment = a codegen'd
    * argmin switched on the subspace id, centroid update = ONE
    * groupBy(sub, cluster, dim) avg for ALL subspaces — m codebooks
    * train in the same pair of jobs per iteration, not m passes.
    * Seeds: the ksub smallest-xxhash corpus vectors, sliced per
    * subspace (deterministic — no rand()).
    */
  def pqBuild(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, ksub: Int = 8, iters: Int = 2): PqModel = {
    val dimsRow = corpus.select(size(col(vecCol)).as("__d"))
      .filter(col("__d").isNotNull && col("__d") > 0)
      .limit(1).collect()
    require(dimsRow.nonEmpty,
      "pqBuild needs a non-empty corpus with non-null vectors")
    val dims = dimsRow.head.getInt(0)
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    val dsub = dims / m
    val seedRows = corpus
      .select(col(vecCol).cast("array<double>").as(vecCol),
        xxhash64(col(idCol).cast("string")).as("__h"))
      .orderBy(col("__h")).limit(ksub).collect()
      .map(_.getSeq[Double](0).toArray)
    require(seedRows.length == ksub,
      s"pqBuild needs >= ksub=$ksub corpus vectors, got ${seedRows.length}")
    var cents: Array[Array[Array[Double]]] = Array.tabulate(m)(i =>
      seedRows.map(_.slice(i * dsub, (i + 1) * dsub)))

    (1 to iters).foreach { _ =>
      val cs = cents
      val subCols = (0 until m).map(i => struct(lit(i).as("s"),
        slice(col(vecCol), i * dsub + 1, dsub).as("v")))
      val sub = corpus.select(explode(array(subCols: _*)).as("p"))
        .select(col("p.s").as("s"), col("p.v").as("v"))
      val subq = Dedup.quantize(col("v"))
      val assign = (0 until m).foldLeft(lit(-1): Column) {
        case (acc, i) =>
          when(col("s") === i, nearestCentroid(subq, cs(i)))
            .otherwise(acc)
      }
      val assigned = sub.select(col("s"), assign.as("c"),
        posexplode(col("v")).as(Seq("d", "x")))
      val updated = assigned.groupBy(col("s"), col("c"), col("d"))
        .agg(avg(col("x")).as("mv"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
      cents = Array.tabulate(m) { i =>
        Array.tabulate(ksub) { c =>
          updated.get((i, c)) match {
            case Some(rows) =>
              val v = Array.ofDim[Double](dsub)
              rows.foreach(r => v(r.getInt(2)) = r.getDouble(3))
              v
            case None => cents(i)(c) // empty cell: previous centroid
          }
        }
      }
    }
    PqModel(m, dsub, cents)
  }

  /** Encode: each vector -> `m` codebook indices. PURE PROJECTION —
    * per subspace a codegen'd argmin over `ksub` literal centroids;
    * the corpus never shuffles and the output is the compressed
    * representation downstream scans carry.
    */
  def pqCodes(model: PqModel, corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    corpus.select(col(idCol).as("item_id"),
      array((0 until model.m).map(i => nearestCentroid(
        Dedup.quantize(slice(col(vecCol), i * model.dsub + 1,
          model.dsub)), model.centroids(i))): _*).as("codes"))

  /** ADC (asymmetric distance computation) top-k over codes: the
    * query keeps its exact subvectors, items contribute only their
    * codes — score = approximate cosine from per-subspace
    * (query . centroid[code]) inner products plus the codebook's own
    * reconstructed norm. The corpus side carries m small ints per
    * item; queries (with their literal m x ksub lookup structure)
    * broadcast.
    */
  def pqTopK(model: PqModel, codes: DataFrame, queries: DataFrame,
      queryIdCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"),
      Dedup.quantize(col(vecCol)).as("__qq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_pq").desc, col("item_id"))
    codes.crossJoin(broadcast(q))
      .select(col("query_id"), col("item_id"),
        adcCosine(model).as("cosine_pq"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** ADC approximate cosine over columns `codes` and `__qq`: per
    * subspace the item contributes centroid[code] (a literal lookup
    * table), the query its exact quantized subvector — every term a
    * codegen'd [[graft.functions.DotProductQ]]. The item side of the
    * scan never touches raw vectors.
    */
  private def adcCosine(model: PqModel): Column = {
    val tables: Seq[Seq[Seq[Long]]] = model.centroids.toSeq.map(
      _.toSeq.map(_.toSeq.map(x => math.round(x * 1000))))
    import graft.functions.DotProductQ.dotQ
    val subScores = (0 until model.m).map { i =>
      val cent = element_at(typedLit(tables(i)),
        element_at(col("codes"), i + 1) + 1)
      val qsub = slice(col("__qq"), i * model.dsub + 1, model.dsub)
      (dotQ(cent, qsub), dotQ(cent, cent))
    }
    val ip = subScores.map(_._1.cast("double") * 1.0).reduce(_ + _)
    val n2 = subScores.map(_._2.cast("double") * 1.0).reduce(_ + _)
    val qn2 = graft.functions.DotProductQ
      .dotQ(col("__qq"), col("__qq")).cast("double")
    // a vector whose every subspace lands on an all-zero centroid
    // reconstructs to 0 — define its similarity as 0 (deterministic,
    // oracle-mirrored) rather than divide by zero under ANSI mode
    when(n2 === 0.0 || qn2 === 0.0, lit(0.0))
      .otherwise(ip / (sqrt(n2) * sqrt(qn2)))
  }

  /** Exact cosine top-k over a (query_id, item_id) candidate set —
    * the shared rerank tail: only candidates join back to raw
    * vectors, queries broadcast.
    */
  private def rerankExact(cands: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      queryIdCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"),
      Dedup.quantize(col(vecCol)).as("__cq"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      Dedup.quantize(col(vecCol)).as("__qq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id"))
    cands.join(c, Seq("item_id")).join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("item_id"),
        Dedup.cosineQ(col("__cq"), col("__qq")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** PQ search with exact re-rank — the production shape: ADC over
    * codes shortlists `shortlist` candidates per query (the corpus
    * scan touches ONLY m-byte codes), then just the shortlist joins
    * back to raw vectors for an exact cosine top-k. ADC alone cannot
    * rank items that share a quantization cell (identical codes =>
    * identical score); the re-rank restores exact order at
    * O(shortlist) vector reads per query instead of O(corpus).
    */
  def pqTopKRerank(model: PqModel, codes: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      queryIdCol: String, k: Int, shortlist: Int = 64): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k=$k")
    val cands = pqTopK(model, codes, queries, queryIdCol, vecCol,
      shortlist).select(col("query_id"), col("item_id"))
    rerankExact(cands, corpus, queries, idCol, vecCol, queryIdCol, k)
  }

  // ---- IVF-PQ (coarse quantizer + product-quantized lists) --------

  /** Combined IVF-PQ index — THE production web-scale ANN layout
    * (FAISS's IVFPQ, Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011): every corpus vector is ONE row
    * (item_id, __list, codes) — its coarse inverted-list id plus its
    * m-byte PQ code. One projection pass builds it (no shuffle: both
    * assignments are codegen'd argmins over literal centroids); the
    * search scan then touches `m` small ints per candidate instead of
    * the raw vector, and only inside the probed lists.
    *
    * Persist through [[graft.io.SnapshotStore]] exactly like
    * [[ivfSave]] (the frame is columnar-small: id + 2 ints + m bytes).
    */
  def ivfPqIndex(ivf: IvfModel, pq: PqModel, corpus: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol).as("item_id"),
      nearestCentroid(Dedup.quantize(col(vecCol)), ivf.centroids)
        .as("__list"),
      array((0 until pq.m).map(i => nearestCentroid(
        Dedup.quantize(slice(col(vecCol), i * pq.dsub + 1, pq.dsub)),
        pq.centroids(i))): _*).as("codes"))

  /** IVF-PQ top-k: probe `nprobe` lists, ADC-score ONLY their code
    * rows (never the raw vectors), shortlist, exact-rerank the
    * shortlist against raw vectors. The three scale levers compose:
    *  - IVF cuts the candidate scan to nprobe/nlist of the corpus;
    *  - PQ cuts the bytes per scanned candidate to m codes;
    *  - the rerank touches raw vectors for `shortlist` rows per query.
    * At 100 TB the corpus-side work is one broadcast-probe join over
    * the (tiny-rowed) index plus point lookups for the rerank —
    * the raw-vector table is never scanned in full.
    *
    * `index` defaults to a fresh [[ivfPqIndex]] build; production
    * passes the persisted one ([[ivfSave]]/[[ivfLoad]] machinery).
    */
  def ivfPqTopK(ivf: IvfModel, pq: PqModel, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      queryIdCol: String, k: Int, nprobe: Int = 4,
      shortlist: Int = 64, index: Option[DataFrame] = None)
      : DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k=$k")
    val idx = index.getOrElse(
      ivfPqIndex(ivf, pq, corpus, idCol, vecCol))
    val probes = probesOf(ivf, queries, queryIdCol, vecCol, nprobe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_pq").desc, col("item_id"))
    val cands = idx.join(broadcast(probes), Seq("__list"))
      .select(col("query_id"), col("item_id"),
        adcCosine(pq).as("cosine_pq"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= shortlist)
      .select(col("query_id"), col("item_id"))
    rerankExact(cands, corpus, queries, idCol, vecCol, queryIdCol, k)
  }
}
