package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** r20 optimization-round pins: the redundant-corpus-pass fixes are plan
  * properties, not output properties (every output is oracle-pinned
  * elsewhere), so a refactor could silently regress them. Each test pins
  * the structural fact the measured win came from — and the lazy escape
  * hatches the fixes deliberately kept.
  */
class OptimizedLineageSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs = {
    graft.core.Tables.register(spark, sfDir)
    spark.table("documents")
  }

  test("DSIR bucketLogProbs tokenizes its corpus ONCE — totals ride a window") {
    val p = graft.ops.Dsir.bucketLogProbs(docs).queryExecution.optimizedPlan.toString
    // the pre-r20 form re-derived the scalar total from a SECOND gram
    // lineage (crossJoin(broadcast(counts.agg))) — two Generate explodes
    val gens = "Generate ".r.findAllIn(p).size
    assert(gens == 1, s"expected exactly one gram explode, got $gens:\n${p.take(1200)}")
    assert(p.contains("windowspecdefinition"),
      s"the bucket total must be a window over the counts frame:\n${p.take(1200)}")
  }

  test("incremental dedup materializes its gram streams; lazy escape intact") {
    val batch = docs.where(col("doc_id") % 10 === 3)
    val corpus = docs.where(col("doc_id") % 10 =!= 3)
    val eager = graft.ops.Dedup.jaccardAgainst(batch, corpus, n = 3,
      threshold = 0.5, maxDocFreq = 20)
      .queryExecution.optimizedPlan.toString
    // every gram-stream consumer must read the checkpointed RDD, never
    // re-shingle the corpus (the measured 4.80 -> 1.47 s fix)
    assert(eager.contains("LogicalRDD") || eager.contains("ExistingRDD"),
      s"materialize=true must plan from checkpointed gram streams:\n${eager.take(1200)}")
    val lazyP = graft.ops.Dedup.jaccardAgainst(batch, corpus, n = 3,
      threshold = 0.5, maxDocFreq = 20, materialize = false)
      .queryExecution.optimizedPlan.toString
    assert(!lazyP.contains("LogicalRDD") && !lazyP.contains("ExistingRDD"),
      "materialize=false must stay fully lazy (plan-inspection escape hatch)")
  }

  test("tfIdfCosine consumers all read ONE checkpointed kept frame") {
    val p = graft.ops.TextAnalysis.tfIdfCosine(docs, topTerms = 10,
      threshold = 0.3, maxKeptDf = 50).queryExecution.optimizedPlan.toString
    // norms + candidate join sides + verify join sides re-ran the whole
    // tfIdf lineage pre-r20 (24 parquet scans in the executed plan)
    assert(p.contains("LogicalRDD") || p.contains("ExistingRDD"),
      s"kept must be checkpointed once for its consumers:\n${p.take(1200)}")
    assert(!p.contains("parquet"),
      s"no consumer may re-derive kept from the source scan:\n${p.take(1200)}")
  }

  test("unigramLogProb's lazy form keeps the plan cache-matchable (ccnet persist)") {
    // ccnetBuckets persists the scored slice keyed on the CANONICALIZED
    // plan; a checkpoint's fresh RDD leaf would never match across
    // rebuilds (measured 0.57 -> 2.0 s regression when it did). Pin both
    // halves: the lazy form is plan-stable across rebuilds, the default
    // form checkpoints.
    val a = graft.ops.TextAnalysis.unigramLogProb(docs, materialize = false)
    val b = graft.ops.TextAnalysis.unigramLogProb(docs, materialize = false)
    assert(a.queryExecution.analyzed.sameResult(b.queryExecution.analyzed),
      "two lazy builds must canonicalize equal or ccnet's cache never hits")
    val eager = graft.ops.TextAnalysis.unigramLogProb(docs)
      .queryExecution.optimizedPlan.toString
    assert(eager.contains("LogicalRDD") || eager.contains("ExistingRDD"),
      "the default form must checkpoint tf (one tokenization pass)")
  }
}
