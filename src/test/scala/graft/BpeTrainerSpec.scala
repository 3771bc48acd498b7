package graft

import graft.operators.BpeTrainer

/** Distributed BPE training: learned merges are deterministic, the encode
  * side reproduces the trainer's output, and token counts shrink. */
class BpeTrainerSpec extends SparkSuite {
  import spark.implicits._

  test("learns the planted most-frequent pair first, with deterministic tiebreak") {
    // corpus: (1,2) appears 6 times, (2,3) 3 times, (3,1) 3 times
    val corpus = Seq(
      Array(1, 2, 3, 1, 2), Array(1, 2, 3, 1, 2), Array(1, 2, 3, 1, 2)
    ).toDS()
    val (merges, out) = BpeTrainer.train(corpus.repartition(2), nMerges = 2)
    assert(merges.head.left === 1 && merges.head.right === 2)
    assert(merges.head.newId === 4) // max token 3 → fresh ids from 4
    assert(merges.head.count === 6)
    // after merging (1,2)→4 the corpus is (4,3,4)×3: (3,4) and (4,3) tie at
    // 3 occurrences — the deterministic key-asc tiebreak picks (3,4)
    assert((merges(1).left, merges(1).right) === (3, 4))
    val seqs = out.collect()
    assert(seqs.forall(_.sameElements(Array(4, 5))))
  }

  test("greedy left-to-right rewrite handles overlapping runs correctly") {
    assert(BpeTrainer.mergeOnce(Array(7, 7, 7), 7, 7, 9).sameElements(Array(9, 7)))
    assert(BpeTrainer.mergeOnce(Array(7, 7, 7, 7), 7, 7, 9).sameElements(Array(9, 9)))
    assert(BpeTrainer.mergeOnce(Array(1), 1, 1, 9).sameElements(Array(1)))
    assert(BpeTrainer.mergeOnce(Array.empty[Int], 1, 1, 9).isEmpty)
  }

  test("encode with the learned table reproduces the trainer's final corpus") {
    val corpus = graft.sources.Synth.inputTable(spark, 120)
      .select("tokens").as[Array[Int]]
    val (merges, trained) = BpeTrainer.train(corpus, nMerges = 8)
    assert(merges.nonEmpty)
    // merge order respected: applying the table to the RAW corpus must give
    // byte-identical sequences to the trainer's incremental rewrites
    val reEncoded = BpeTrainer.encode(corpus, merges)
      .collect().map(_.mkString(",")).sorted
    val direct = trained.collect().map(_.mkString(",")).sorted
    assert(reEncoded === direct)
    // compression is real and monotone
    val before = corpus.map(_.length.toLong).reduce(_ + _)
    val after = trained.map(_.length.toLong).reduce(_ + _)
    assert(after < before)
    // fresh ids never collide with corpus tokens
    val maxRaw = corpus.flatMap(s => s.headOption.map(_ => s.max)).reduce(_ max _)
    assert(merges.forall(_.newId > maxRaw))
    assert(merges.map(_.newId).distinct.length === merges.length)
  }

  test("stops early when no pair clears minCount") {
    val corpus = Seq(Array(1, 2), Array(3, 4)).toDS() // every pair unique
    val (merges, out) = BpeTrainer.train(corpus, nMerges = 5, minCount = 2)
    assert(merges.isEmpty)
    assert(out.collect().map(_.toSeq).toSet === Set(Seq(1, 2), Seq(3, 4)))
  }
}
