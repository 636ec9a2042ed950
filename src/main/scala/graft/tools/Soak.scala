package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkEntry, Tables}
import graft.operators.{Dedup, Similarity, TextOps, VecIndex}

/** Order-of-magnitude scale soak: synthesize a `copies`× corpus from
  * sf0.1 (default 10× → ~50k documents / ~50k embeddings, the sf1
  * shape) and re-measure every DATA-DEPENDENT operating point the
  * engine sizes from corpus statistics — LSH bucket occupancy, IVF
  * cell occupancy under [[Similarity.centroidIdsFor]] sizing, dedup
  * pipeline candidate/pair/cluster volumes, bigram-LM vocab growth
  * (Heaps' law), and the end-to-end curation census — plus wall
  * times, so a collapsing operating point shows up as a census row,
  * not a hunch.
  *
  * Synthesis keeps REALISTIC growth semantics (a corpus 10× bigger,
  * not one corpus pasted 10 times): each copy i applies a per-copy
  * Caesar substitution to the text (every char-5 shingle changes —
  * measured: a word-ROTATION variant left shingle sets ~identical
  * because they are position-free bags, and 49,995 of 50,000 docs
  * clustered) and cyclically shifts every embedding by i dimensions —
  * deterministic, id-offset, norm- and length-preserving, so
  * duplication RATES stay at the base corpus's level instead of every
  * doc gaining 9 verbatim twins. Copy 0 is the untouched original.
  *
  * Inputs are derived from the driver's sf0.1 parquet only; synthetic
  * tables land under /tmp (never /root/testdata). This is a soak, not
  * an oracle gate — invariants are asserted here (sub-quadratic
  * candidate growth, bounded cell occupancy), exact values go to
  * PLANS.md.
  */
object Soak {
  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[soak] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val docsOnly = args.length > 1 && args(1) == "docs"
    val base = "/root/testdata/sf0.1"
    val out = "/tmp/graft_soak"
    val spark = GraftSession.local("graft-soak", cores = 32)
    spark.sparkContext.setLogLevel("WARN")

    // ---- synthesize the copies-x corpus --------------------------------
    val docs0 = Tables.documents(spark, base)
    val embs0 = Tables.embeddings(spark, base)
    val nDocs0 = docs0.count()
    val nEmbs0 = embs0.count()
    timed(s"synthesize ${copies}x corpus" + (if (docsOnly) " (docs only)" else "")) {
      val abc = "abcdefghijklmnopqrstuvwxyz"
      // AFFINE substitution ciphers j -> (a*j + b) mod 26: 12 units x
      // 26 offsets = 312 distinct permutations, so up to 312 copies
      // decorrelate (a plain Caesar shift has only 26 — copy 26 would
      // be copy 0's verbatim twin and the dup rate would quadruple at
      // 100x). Copy 0 is (a=1, b=0) = identity.
      val units = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
      require(copies <= units.size * 26, s"only ${units.size * 26} distinct ciphers")
      val docCopies = (0 until copies).map { i =>
        val (a, b) = (units(i / 26 % units.size), i % 26)
        val to = (0 until 26).map(j => abc((a * j + b) % 26)).mkString
        docs0
          .withColumn("text2",
            if (i == 0) col("text") else translate(col("text"), abc, to))
          // dense id blocks (copy i occupies [i*n, (i+1)*n)): the ANN
          // sizing helpers (centroidIdsFor) sample ids from [0, n) —
          // sparse 1e6-strided ids would leave most sampled centroids
          // nonexistent and collapse the cell census to a harness
          // artifact (measured: 15 live cells of 142)
          .select((col("doc_id") + lit(i * nDocs0)).as("doc_id"),
                  col("text2").as("text"), col("lang"), col("source"),
                  length(col("text2")).cast("long").as("n_chars"))
      }
      docCopies.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      if (!docsOnly) {
        val embCopies = (0 until copies).map { i =>
          embs0.select(
            (col("vec_id") + lit(i * nEmbs0)).as("vec_id"),
            (if (i == 0) col("embedding")
             else concat(slice(col("embedding"), i + 1, 10000),
                         slice(col("embedding"), 1, i))).as("embedding"),
            col("label"))
        }
        embCopies.reduce(_ unionByName _)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      }
    }
    val docs = Tables.documents(spark, out)
    val nDocs = docs.count()
    println(s"[soak] corpus: $nDocs docs (${nDocs0} base)")

    // ---- dedup pipeline volumes ---------------------------------------
    timed("dedup pipeline build + census") {
      val pl = Dedup.pipeline(docs, 0.3)
      val cand = pl.candidates.count()
      val pairs = pl.pairs.count()
      val clusters = pl.clusters.select("cluster_id").distinct().count()
      val clustered = pl.clusters.count()
      println(s"[soak] dedup: candidates=$cand pairs=$pairs " +
        s"clusters=$clusters clustered_docs=$clustered " +
        f"cand_per_doc=${cand.toDouble / nDocs}%.2f")
      // sub-quadratic: candidates must grow like the corpus, not its square
      assert(cand < nDocs * 50,
        s"candidate explosion: $cand candidates for $nDocs docs")
    }

    // ---- LSH bucket + IVF cell occupancy at derived sizing -------------
    if (!docsOnly) {
      val embs = Tables.embeddings(spark, out)
      val nEmbs = embs.count()
      println(s"[soak] vectors: $nEmbs")
      timed("ann occupancy census") {
        val planes = Similarity.planesFor(nEmbs)
        Similarity.bucketCensus(embs, planes).collect().foreach(r =>
          println(s"[soak] lsh planes=$planes census=$r"))
        // the s19 OR-construction at the same per-table budget: the
        // hot-bucket answer — per-table max occupancy should sit at
        // or below the single table's while the 3-table union keeps
        // recall (measured in the recall sweep, not here)
        Similarity.multiTableCensus(embs, Similarity.NumTables, planes)
          .collect().foreach(r =>
            println(s"[soak] lsh-or L=${Similarity.NumTables} planes=$planes census=$r"))
        // rank-based (not the affine id formula): the soak corpus has
        // dense ids so both agree here, but the census tool proved
        // the formula collapses on sparse id domains (CensusS20, r11)
        val cents = Similarity.centroidIdsRanked(embs)
        Similarity.cellCensus(embs, cents).collect().foreach(r =>
          println(s"[soak] ivf k=${cents.size} census=$r"))
        // the s20 exposure: per-cell candidate volume of the kNN
        // join (occupancy × probes) — hot_factor is what the AQE
        // skew split must absorb at scale
        Similarity.knnJoinCensus(embs, nProbe = 2, cents).collect().foreach(r =>
          println(s"[soak] s20 knn-join k=${cents.size} census=$r"))
      }

      // ---- the persisted IVF index at scale ----------------------------
      timed("vec index build+probe") {
        val root = s"$out/vecindex"
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        if (new java.io.File(root).exists()) rm(new java.io.File(root))
        VecIndex.build(spark, root, embs, centIds = Similarity.centroidIdsFor(nEmbs))
        val queries = embs.filter(col("vec_id") % 1000 === 7).limit(64)
          .select(col("vec_id"), col("embedding"))
        val hits = VecIndex.probe(spark, root, queries, k = 10, nProbe = 4).count()
        println(s"[soak] vecindex probe hits=$hits")
      }
    }

    // ---- bigram LM vocab growth (Heaps) --------------------------------
    timed("bigram surprisal") {
      val rows = TextOps.bigramSurprisal(docs).count()
      println(s"[soak] t18 scored docs=$rows")
    }

    // ---- the curation composite at scale -------------------------------
    timed("curation pipeline") {
      SparkEntry.queries("t23_curation_pipeline")(spark, out)
        .collect().foreach(r => println(s"[soak] t23 $r"))
    }

    spark.stop()
  }
}
