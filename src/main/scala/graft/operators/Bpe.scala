package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding merge induction over a corpus — the canonical
  * iterate-with-shrinking-vocab dataflow of tokenizer training
  * (Sennrich et al. 2016): count adjacent symbol pairs weighted by word
  * frequency, merge the most frequent pair everywhere, repeat.
  *
  * Scale shape: after ONE corpus-sized aggregation (word -> frequency),
  * every round operates on the VOCABULARY table — distinct words with
  * their counts — which is orders of magnitude smaller than the corpus
  * (the classic BPE trick; at 100 TB the vocabulary is still
  * dimension-sized). Per round the only driver traffic is the single
  * argmax rule row (the k-means centroid discipline), fetched via
  * orderBy+limit(1) = TakeOrderedAndProject (per-partition top-1 then
  * merge — never a global sort), and the merge itself is a distributed
  * column fold over the symbol arrays.
  *
  * Merge semantics are the standard greedy left-to-right scan: in
  * `a a a` merging pair (a,a) produces `[aa, a]` — overlapping
  * occurrences are not re-merged. The fold below reproduces the scan
  * exactly: a merge is applied when the accumulator's LAST element
  * equals `a` and the current symbol is `b`; since the merged symbol
  * `a+b` is strictly longer than `a` it can never immediately re-merge,
  * which is precisely the scan's skip-after-merge rule (spec-pinned in
  * BpeSpec, including the tie-break and overlap contracts).
  */
object Bpe {

  /** One greedy merge pass of pair (a, b) over a symbol array column. */
  def mergePair(syms: Column, a: String, b: String): Column = {
    val zero = array().cast(ArrayType(StringType, containsNull = false))
    aggregate(syms, zero, (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))
  }

  /** Adjacent symbol pairs of each vocabulary row, weighted by word
    * frequency, summed: (a, b, c). Overlapping occurrences each count
    * (the reference `get_stats` convention). */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("f"), explode(expr(
        """transform(slice(syms, 1, greatest(size(syms) - 1, 0)),
          |  (s, i) -> struct(s AS a, element_at(syms, i + 2) AS b))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("f")).as("c"))

  /** One learned merge rule (rank r's most frequent pair). */
  final case class Rule(rank: Int, a: String, b: String, count: Long)

  /** Learn `k` merge rules from a (word, f) frequency table and return
    * them with the post-merge vocabulary (word, f, syms). Rules live on
    * the driver (k tiny rows — the k-means centroid discipline); the
    * vocabulary stays distributed. Ties in pair count break
    * lexicographically on (a, b) — both engines compare UTF-8 bytes,
    * so the choice is cross-engine stable. */
  def learn(spark: SparkSession, words: DataFrame, k: Int)
      : (Seq[Rule], DataFrame) = {
    // vocabulary-sized: persist once, rounds re-derive merge folds from it
    val base = words
      .select(col("word"), col("f"), split(col("word"), "").as("syms"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var vocab: DataFrame = base
    val rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    for (r <- 1 to k) {
      val top = pairCounts(vocab)
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val rule = Rule(r, top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        rules += rule
        vocab = vocab.withColumn("syms", mergePair(col("syms"), rule.a, rule.b))
      }
    }
    // rule rows are on the driver; the base cache only backs the lazy
    // vocab lineage now, which callers either consume promptly or drop
    base.unpersist(blocking = false)
    (rules.toSeq, vocab)
  }

  /** Learn `k` merge rules; one row per round:
    * (merge_rank, sym_a, sym_b, pair_count). */
  def mergeRules(spark: SparkSession, words: DataFrame, k: Int): DataFrame = {
    val (rules, _) = learn(spark, words, k)
    val schema = StructType(Seq(
      StructField("merge_rank", IntegerType, nullable = false),
      StructField("sym_a", StringType, nullable = false),
      StructField("sym_b", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rules.map(r => Row(r.rank, r.a, r.b, r.count)), 1), schema)
  }
}
