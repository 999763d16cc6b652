package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Training-data curation operators beyond dedup/similarity: the
  * corpus-hygiene passes a large-scale pipeline runs between raw crawl
  * and tokenizer — boilerplate detection, PII redaction, deterministic
  * sampling, and token-budget shard packing. Each is a bounded-shuffle
  * DataFrame plan with a DuckDB oracle.
  */
object Curation {

  private def toks(c: org.apache.spark.sql.Column) = Dedup.tokens(c)

  /** Corpus-level boilerplate detection: word bigrams occurring in many
    * distinct documents are boilerplate (the n-gram form of "this line
    * appears on every page"); report each document's boilerplate load.
    * Shape at 100 TB: one explode + one count shuffle to build the
    * common set — which is SMALL by construction (high-df n-grams are
    * bounded by vocabulary, not corpus size) — then a join back that AQE
    * turns into a broadcast. Never a doc×doc comparison.
    */
  def boilerplate(s: SparkSession, d: String): DataFrame = {
    // split ONCE into a staged column: an inlined split(text) inside the
    // n-gram transform lambda re-tokenizes the whole document per bigram
    // (O(tokens²) character work — measured 3s at sf0.1, plan-visible
    // as split() nested under the lambda)
    val base = documents(s, d)
      // spread the single-split scan before the bigram fan-out — the
      // explode work is invisible to AQE's pre-shuffle row counts
      .repartition(fanout(s), col("doc_id"))
      .select(col("doc_id"), toks(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    // bigram identity as the native 64-bit window hash (the substring-
    // overlap kernel at w=2), not the concatenated string: the string
    // form built + deduped a bigram STRING per token position (r19
    // trace: 16.3 s CPU / 4.2 s GC at sf0.1) and then shuffled those
    // strings; the hash streams the same window bytes through FNV-1a
    // with zero per-window allocation, and the groupBy/join key drops
    // to 8 bytes (guide §2.3 — shuffle keys, not payloads). HONESTY
    // NOTE (round 20): hash-as-identity is an APPROXIMATION, not exact
    // equivalence — a 64-bit FNV-1a collision between two distinct
    // bigrams would merge their doc counts (expected collisions
    // ≈ n²/2⁶⁵: negligible at fixture scale, a handful at billions of
    // distinct bigrams; each perturbs n_docs near the 5% threshold by
    // at most the smaller bigram's count). The substring op carries
    // the same documented approximation; do NOT narrow this hash.
    val sh = base.select(col("doc_id"),
      explode(graft.functions.TokenWindowExpr.windowHashes(col("t"), 2))
        .as("sh"))
    // the df threshold is RELATIVE (≥5% of docs) so the operator means
    // the same thing at every corpus size — an absolute count silently
    // degrades to all-match (or no-match) as the corpus scales. The
    // 1-row total broadcasts; no driver action.
    val total = documents(s, d).agg(count(lit(1)).as("n_total"))
    val common = sh.groupBy("sh")
      .agg(count(lit(1)).as("n_docs"))
      .join(broadcast(total))
      .filter(col("n_docs") >= col("n_total") * 0.05)
      .select("sh")
    sh.join(common, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bp"))
  }

  /** Within-document repetition stats (the Gopher-style quality
    * signals): fraction of duplicated word bigrams and the share of the
    * single most frequent bigram. Entirely ROW-LOCAL — raw bigrams are
    * sorted per document and run-lengths folded in one codegen'd
    * `aggregate` pass, so equal bigrams are adjacent and the max run IS
    * the max multiplicity. Zero shuffle: at 100 TB the scan is the whole
    * cost (the explode+groupBy formulation would shuffle every bigram
    * occurrence; the oracle uses it, the engine does not).
    */
  def repetition(s: SparkSession, d: String): DataFrame = {
    val raw = documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      // stage each intermediate as a real column: lambdas re-evaluate
      // captured expressions per element (the r3 O(n²) trap)
      .withColumn("raw", transform(
        sequence(lit(0), size(col("t")) - 2),
        i => concat_ws(" ", element_at(col("t"), i + 1),
          element_at(col("t"), i + 2))))
      .withColumn("srt", array_sort(col("raw")))
    val folded = raw.withColumn("st", aggregate(
      col("srt"),
      struct(lit("").as("prev"), lit(0).as("run"),
        lit(0).as("maxrun"), lit(0).as("ndist")),
      (acc, x) => struct(
        x.as("prev"),
        when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1)).as("run"),
        greatest(acc.getField("maxrun"),
          when(x === acc.getField("prev"), acc.getField("run") + 1)
            .otherwise(lit(1))).as("maxrun"),
        when(x === acc.getField("prev"), acc.getField("ndist"))
          .otherwise(acc.getField("ndist") + 1).as("ndist"))))
    folded.select(
      col("doc_id"),
      size(col("raw")).as("n_grams"),
      round((size(col("raw")) - col("st.ndist"))
        / size(col("raw")), 6).as("dup_frac"),
      round(col("st.maxrun") / size(col("raw")), 6).as("top_frac"))
  }

  /** Benchmark-contamination check: which corpus documents share word
    * 3-gram shingles with a held-out benchmark set (here: doc_id ≡ 0
    * mod 101 — the deterministic stand-in for an external eval suite).
    * The benchmark shingle set is SMALL by definition (benchmarks are
    * KBs against a 100 TB corpus), so it broadcasts; the corpus side is
    * one explode + a map-side-combinable count per document. Never a
    * doc×doc comparison, and the corpus is read once.
    */
  def contamination(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), Dedup.ngrams(col("t"), 3).as("g"))
    // explode_outer, NOT explode: for a plain explode over a staged
    // attribute, InferFiltersFromGenerate adds size(g)>0 AND isnotnull(g)
    // below the Generate and predicate pushdown re-substitutes the whole
    // shingle-building expression into that filter — every document then
    // builds its trigram array three times (measured 2× runtime). The
    // size(t) >= 3 guard already guarantees g is non-empty, so the outer
    // variant is semantically identical and evaluates g exactly once.
    val bench = base.filter(col("doc_id") % 101 === 0)
      .select(explode_outer(col("g")).as("sh")).distinct()
    val corpus = base.filter(col("doc_id") % 101 =!= 0)
      .select(col("doc_id"), size(col("g")).as("n_grams"),
        explode_outer(col("g")).as("sh"))
    corpus.join(broadcast(bench), "sh")
      .groupBy("doc_id", "n_grams")
      .agg(count(lit(1)).as("n_hits"))
      .select(col("doc_id"), col("n_hits"),
        round(col("n_hits") / col("n_grams"), 6).as("overlap_frac"))
  }

  /** PII redaction + pseudonymization: digit runs replaced with a
    * placeholder, the join key replaced by a deterministic hash
    * pseudonym — row-local regex/hash, zero shuffle, stays inside
    * whole-stage codegen (the scan is the cost at 100 TB).
    */
  def redact(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      col("c_custkey"),
      regexp_replace(col("c_name"), "[0-9]+", "<ID>").as("name_red"),
      md5(col("c_name")).as("pseudonym"))

  /** Deterministic hash sampling (~10%), stratified implicitly by being
    * content-keyed: the same document always lands the same side of the
    * cut, across runs and clusters — reproducible corpus snapshots
    * without storing a sample list. Narrow (no shuffle).
    */
  def sample(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(conv(substring(md5(col("text")), 1, 8), 16, 10)
        .cast("long") % 1000 < 100)
      .select(col("doc_id"), col("lang"))

  /** Deterministic train/val/test split: each document lands in a
    * split by a content-keyed hash bucket (98/1/1) — the assignment is
    * a pure function of the text, so it is stable across runs, ingest
    * order, cluster size, and engine (no RNG, no global sort, zero
    * shuffle), and near-dups of a test doc that survive dedup at least
    * split consistently when byte-identical. The leakage-prone
    * alternative — random split at read time — changes membership on
    * every retry of a failed task.
    */
  def split(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("bucket",
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long") % 100)
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < 98, "train")
          .when(col("bucket") === 98, "val")
          .otherwise("test").as("split"))

  /** Train/test LEAKAGE AUDIT — the content-keyed split crossed with
    * the transitive near-dup groups: a group whose members land in
    * different splits leaks test signal into training (the #1 silent
    * eval inflator — near-dups are NOT byte-identical, so a
    * per-document hash split scatters them). Output: one row per leaky
    * group with its size and the sorted splits it touches. Shape at
    * 100 TB: the groups frame is ≤ one row per document, the split
    * assignment is a zero-shuffle expression, their join is doc-keyed,
    * and the verdict is one combinable group-keyed aggregation (the
    * split set is bounded by 3, so collect_set state is O(1) per key).
    */
  def splitLeakage(s: SparkSession, d: String): DataFrame =
    Dedup.dupGroups(s, d)
      .join(split(s, d).select(col("doc_id"), col("split")), "doc_id")
      .groupBy(col("dup_group"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("split")).as("n_splits"),
        array_join(array_sort(collect_set(col("split"))), ",").as("splits"))
      .filter(col("n_splits") > 1)

  /** Leakage-FREE split — the fix for what `splitLeakage` measures:
    * every document is assigned by the hash of its near-dup GROUP
    * label (its own id when unduplicated), so a whole group lands on
    * one side by construction and no near-dup pair can ever straddle
    * the train/test boundary. Same 98/1/1 buckets and hash family as
    * `split`; determinism now keys on the group label instead of the
    * raw text (still RNG-free, retry-stable, engine-exact). The group
    * attach is one doc-keyed left join — everything else is the same
    * zero-shuffle expression split.
    */
  def groupSplit(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"))
      .join(Dedup.dupGroups(s, d), Seq("doc_id"), "left")
      .withColumn("grp", coalesce(col("dup_group"), col("doc_id")))
      .withColumn("bucket",
        conv(substring(md5(col("grp").cast("string")), 1, 8), 16, 10)
          .cast("long") % 100)
      .select(col("doc_id"), col("grp"), col("bucket"),
        when(col("bucket") < 98, "train")
          .when(col("bucket") === 98, "val")
          .otherwise("test").as("split"))

  /** Quality-weighted sampling — the classifier and the sampler
    * composed: each document's keep PROBABILITY is its clamped
    * classifier score (micro-units), decided against the same
    * content-keyed hash as `sample`. High-quality docs are kept at up
    * to ~100%, low-quality at 10% floor — soft filtering, the
    * production alternative to a hard keep/drop threshold (which
    * discards the long tail entirely). Deterministic: both the score
    * and the coin are pure functions of the text.
    */
  def qualitySample(s: SparkSession, d: String): DataFrame =
    scoredDocs(s, d)
      .withColumn("keep_micro",
        greatest(least(col("score_micro"), lit(1000000L)), lit(100000L)))
      .filter(conv(substring(md5(col("text")), 1, 8), 16, 10)
        .cast("long") % 1000000L < col("keep_micro"))
      .select(col("doc_id"), col("keep_micro"))

  /** Stratified deterministic sampling: per-language rates (25% for
    * 'en', 10% otherwise) applied through the same content-keyed hash
    * cut as `sample` — so the operator is NARROW (zero shuffle beyond
    * the final stats aggregation) and reproducible across runs and
    * clusters. This is how a corpus rebalances language mix at 100 TB
    * without a per-stratum sort or an exact-N window funnel.
    */
  def stratified(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(conv(substring(md5(col("text")), 1, 8), 16, 10)
        .cast("long") % 1000 <
        when(col("lang") === "en", 250).otherwise(100))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"),
        min(col("doc_id")).as("first_id"),
        max(col("doc_id")).as("last_id"))

  /** DSIR-style importance weighting: score every document by how much
    * its unigram distribution resembles the target domain (lang='en')
    * versus the background (everything else) — the data-selection step
    * that rebalances a raw crawl toward a target corpus. Per-token
    * weight = add-one-smoothed probability ratio, QUANTIZED to integer
    * micro-units, so the per-document score is an exact BIGINT sum —
    * order-independent, hence reproducible bit-for-bit across engines
    * and partitionings (a float log-sum would drift with aggregation
    * order; the ratio uses only +,*,/ on exactly-representable integers
    * and one correctly-rounded division, never a transcendental).
    *
    * Shape at 100 TB: ONE tokenize+explode into per-(doc,term) counts
    * (map-side combinable); the vocabulary table derives from that and
    * is bounded by vocabulary — not corpus — size, so the weight join
    * back onto doc-term counts broadcasts. The class totals are a 1-row
    * broadcast. No driver-side state.
    */
  def dsir(s: SparkSession, d: String): DataFrame = {
    val dt = documents(s, d)
      .select(col("doc_id"), col("lang"), explode(toks(col("text"))).as("term"))
      .groupBy("doc_id", "lang", "term")
      .agg(count(lit(1)).as("c_dt"))
    val vocab = dt.groupBy("term").agg(
      sum(when(col("lang") === "en", col("c_dt")).otherwise(0L)).as("c_tgt"),
      sum(when(col("lang") =!= "en", col("c_dt")).otherwise(0L)).as("c_bg"))
    val tot = vocab.agg(sum(col("c_tgt")).as("n_tgt"),
      sum(col("c_bg")).as("n_bg"), count(lit(1)).as("v"))
    // factors cast to DOUBLE before multiplying (round-14 width
    // audit): the long×long numerator (c_tgt+1)·(n_bg+v) wraps int64
    // once token totals reach ~10^13 — inside the 100 TB envelope —
    // while each factor stays exactly representable in double to
    // 2^53 (~9·10^15 tokens), so the double product is the correctly
    // rounded true product and both engines compute the identical
    // ratio (the oracle mirrors the same per-factor casts)
    val w = vocab.join(broadcast(tot))
      .select(col("term"),
        round(((col("c_tgt") + 1).cast("double")
          * (col("n_bg") + col("v")).cast("double"))
          / ((col("c_bg") + 1).cast("double")
            * (col("n_tgt") + col("v")).cast("double")) * lit(1000000.0))
          .cast("long").as("w"))
    dt.join(broadcast(w), "term")
      .groupBy("doc_id")
      .agg(sum(col("c_dt")).as("n_tokens"),
        sum(col("c_dt") * col("w")).as("score_micro"))
  }

  /** Temperature-weighted source mixture (T = 0.5): sampling weights
    * ∝ √(source volume), the standard up-weighting of small
    * high-quality sources when composing a training mix. Integer
    * square roots (floor-exact for any BIGINT count) keep the whole
    * computation in exact integer arithmetic — micro-unit weights are
    * engine-identical, and the final division is a truncating integer
    * op, not a float. One combinable count keyed on `source` plus a
    * 1-row broadcast of the normalizer.
    */
  def mixture(s: SparkSession, d: String): DataFrame = {
    val cnt = documents(s, d).groupBy("source")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("isqrt", floor(sqrt(col("n_docs"))).cast("long"))
    val tot = cnt.agg(sum(col("isqrt")).as("sum_isqrt"))
    cnt.join(broadcast(tot))
      .select(col("source"), col("n_docs"),
        expr("(1000000 * isqrt) DIV sum_isqrt").as("weight_micro"))
  }

  /** Fixed-weight linear quality classifier — the fastText-style
    * "keep/drop" gate of a curation run, with the trained weights
    * frozen as constants (training happens offline; serving is just
    * this scoring pass). Entirely row-local: two integer micro-unit
    * features (stopword rate, mean-token-length deviation from the
    * 4.5-char English center) and one linear score, so the operator is
    * a zero-shuffle projection that scales with the scan. Integer
    * arithmetic end-to-end — scores are bit-identical across engines
    * and partitionings.
    */
  /** Shared scoring projection: (doc_id, text, score_micro) — one
    * narrow pass; both the hard classifier and the soft sampler read
    * it so they cannot disagree on the model.
    */
  private def scoredDocs(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("text"), col("n_chars"),
        toks(col("text")).as("t"))
      .select(col("doc_id"), col("text"), col("n_chars"),
        size(col("t")).as("n_toks"),
        size(filter(col("t"),
          x => x.isin("the", "a", "of", "and", "is"))).as("n_stop"))
      .withColumn("stop_micro",
        expr("(1000000 * CAST(n_stop AS BIGINT)) DIV n_toks"))
      .withColumn("len_micro",
        expr("(1000000 * (n_chars - (n_toks - 1))) DIV n_toks"))
      .select(col("doc_id"), col("text"), col("n_toks"),
        (lit(10L) * col("stop_micro")
          - abs(col("len_micro") - lit(4500000L))).as("score_micro"))

  def classifier(s: SparkSession, d: String): DataFrame =
    scoredDocs(s, d)
      .select(col("doc_id"), col("score_micro"),
        (col("score_micro") >= 450000L).as("keep"))

  /** Source-level reputation rollup: per provenance bucket, the volume,
    * target-language share, exact-dup rate, and mean length — the
    * signals a curation run uses to up/down-weight whole sources before
    * touching individual documents. One map-side-combinable aggregation
    * keyed on `source`; mean and rates are single divisions over exact
    * integer sums (order-independent, engine-identical).
    */
  def sources(s: SparkSession, d: String): DataFrame =
    documents(s, d).groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
      countDistinct(md5(col("text"))).as("n_uniq"),
      sum(col("n_chars").cast("long")).as("sum_chars"))
    .select(col("source"), col("n_docs"), col("n_en"),
      round((col("n_docs") - col("n_uniq")) / col("n_docs"), 6).as("dup_frac"),
      round(col("sum_chars") / col("n_docs"), 6).as("mean_chars"))

  /** Exact-quota sampling: the N lowest-hash documents per stratum
    * (here: 10 per language) — when a run needs an exact per-stratum
    * count, not a rate. The rank is content-keyed (same hash as
    * `sample`), so the quota set is reproducible across runs and
    * engines. The window partitions by stratum — fine when quotas are
    * per-language (a handful of reducers each bounded by its stratum);
    * for millions of strata the same plan parallelizes by the
    * partition key. The rate-based `stratified` is the narrow
    * (zero-shuffle) alternative when an exact N is not required.
    */
  def quota(s: SparkSession, d: String): DataFrame = {
    val h = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    documents(s, d)
      .select(col("doc_id"), col("lang"), h.as("h"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("doc_id"), col("lang"), col("rk").cast("long").as("rk"))
  }

  /** Incremental dedup: a new ingest batch (doc_id ≡ 4 mod 5 — a
    * deterministic 20% stand-in for the fresh crawl at every SF) is
    * admitted only if its content hash exists neither in the
    * accumulated corpus NOR earlier in the batch itself (lowest doc_id
    * wins within the batch). At 100 TB the accumulated side is a
    * fingerprint TABLE (16-byte hash per doc, not the corpus)
    * maintained across ingests; both steps are hash-keyed joins with
    * map-side-combinable aggregation, no rescan of old text.
    */
  def incrementalDedup(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("doc_id"), md5(col("text")).as("h"))
    val seen = base.filter(col("doc_id") % 5 =!= 4).select("h").distinct()
    base.filter(col("doc_id") % 5 === 4)
      .groupBy("h").agg(min(col("doc_id")).as("doc_id"))
      .join(seen, Seq("h"), "left_anti")
      .select("doc_id", "h")
  }

  /** Percentile length gate: keep documents whose n_chars lies within
    * the corpus [p05, p95] band — the standard outlier trim before
    * tokenization. Uses the EXACT percentile aggregate, which is safe
    * here because n_chars has bounded cardinality (the aggregation
    * state is a value→count map, O(distinct lengths), not O(rows));
    * for unbounded-cardinality columns the scale path is
    * approx_percentile with an accuracy knob. The two bounds broadcast
    * as a 1-row frame; the gate itself is a narrow scan filter.
    */
  def lengthGate(s: SparkSession, d: String): DataFrame = {
    // DISCRETE percentiles (order statistics): the gate compares
    // INTEGER n_chars against the bound, and an interpolated bound
    // that lands on an exact integer computed 1 ulp low (99.9999...
    // vs 100.0) flips whole documents in or out between engines — the
    // same cross-engine amplifier the winsorize clamp hit. An order
    // statistic is an actual length; the comparison is integer-exact.
    val bounds = documents(s, d).agg(
      expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY n_chars)").as("lo"),
      expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars)").as("hi"))
    documents(s, d)
      .join(broadcast(bounds))
      .filter(col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
  }

  /** Token-budget shard packing: running token count per language
    * stream, shard = prefix-sum DIV budget — the deterministic
    * assignment step of sequence packing.
    *
    * The prefix sum is HIERARCHICAL: a naive window keyed on the
    * stratum alone funnels each language through ONE reducer — the
    * classic low-cardinality window bottleneck at 100 TB. Instead:
    * per-(lang, chunk) totals aggregate in parallel, a window over the
    * tiny chunk-totals table produces each chunk's starting offset, and
    * the intra-chunk prefix sums run in parallel per (lang, chunk).
    * Addition is associative, so the bins are bit-identical to the flat
    * window (the oracle is the flat formulation). Parallelism scales
    * with chunk count, not stratum count.
    */
  def pack(s: SparkSession, d: String): DataFrame = pack(s, d, 1000)

  def pack(s: SparkSession, d: String, chunkDocs: Int): DataFrame =
    packFrom(
      documents(s, d).select(col("doc_id"), col("lang"),
        size(toks(col("text"))).cast("long").as("n_tokens")),
      chunkDocs, budget = 2048)

  /** The hierarchical packer over any prepared (doc_id, lang, n_tokens)
    * frame — reused by the standalone query and the composed pipeline.
    */
  def packFrom(prepared: DataFrame, chunkDocs: Int, budget: Int)
      : DataFrame = {
    val base = prepared.withColumn("chunk", floor(col("doc_id") / chunkDocs))
    val chunkTotals = base.groupBy("lang", "chunk")
      .agg(sum(col("n_tokens")).as("chunk_sum"))
    val wc = Window.partitionBy("lang").orderBy("chunk")
    val offsets = chunkTotals
      .withColumn("offset",
        sum(col("chunk_sum")).over(wc) - col("chunk_sum"))
      .drop("chunk_sum")
    val wi = Window.partitionBy("lang", "chunk").orderBy("doc_id")
    base.join(broadcast(offsets), Seq("lang", "chunk"))
      .withColumn("bin", floor(
        (col("offset") + sum(col("n_tokens")).over(wi) - col("n_tokens"))
          / budget))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("bin"))
  }

  /** Partitioned corpus sink: the curated corpus written as parquet
    * laid out by (split, lang) — the layout a training run reads back
    * with partition PRUNING (one split, one language = one directory
    * subtree, no scan of the rest). Returns the manifest the write
    * publishes; `manifest` below exposes the same rollup as an
    * oracle-checked query so the sink's bookkeeping is itself gated.
    */
  def writeCorpus(s: SparkSession, d: String, outDir: String): DataFrame = {
    documents(s, d)
      .join(split(s, d).select(col("doc_id"), col("split")), "doc_id")
      .write.mode("overwrite")
      .partitionBy("split", "lang")
      .parquet(outDir)
    manifest(s, d)
  }

  /** Write manifest: per (split, lang) partition, document count and
    * exact char volume — what a shard registry records at publish
    * time. A pure rollup of the deterministic split assignment, so it
    * is oracle-checkable without touching the filesystem.
    */
  def manifest(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .join(split(s, d).select(col("doc_id"), col("split")), "doc_id")
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("sum_chars"))

  /** The composed curation pipeline in ONE declarative plan — the flow a
    * training-data run executes between raw corpus and tokenizer:
    * quality gate → exact dedup (lowest doc_id survives) → deterministic
    * 50% content-keyed sample → token-budget packing → per-shard stats.
    * Catalyst sees the whole chain, so filters fold into the scan and
    * nothing materializes between stages.
    */
  def curationPipeline(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).filter(col("n_chars") >= 100)
    val keep = base.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val survivors = base.join(keep, "doc_id")
      .filter(conv(substring(md5(col("text")), 1, 8), 16, 10)
        .cast("long") % 1000 < 500)
      .select(col("doc_id"), col("lang"),
        size(toks(col("text"))).cast("long").as("n_tokens"))
    packFrom(survivors, chunkDocs = 1000, budget = 1024)
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
  }

  /** Deterministic global shuffle (training-order randomization): every
    * epoch's order is a pure function of (seed, doc_id), so any worker
    * can recompute any shard's order without coordination and a re-run
    * is bit-identical. The order key is a 60-bit integer from
    * md5(seed|doc_id) with doc_id as tiebreak.
    *
    * The GLOBAL POSITION is assigned the scale-correct way: a global
    * `row_number()` window would funnel the corpus through ONE
    * partition (the classic driver-shaped bottleneck); instead the
    * frame is range-partitioned and sorted on the key — Spark's
    * distributed sort — and positions are composed from
    * `monotonically_increasing_id`'s (partition, intra-partition
    * counter) encoding plus per-partition cumulative offsets. The
    * offset table is one row per partition (bounded by cluster width,
    * never by data), so its window and the join back are both tiny; the
    * sorted frame is checkpointed so the offset count and the join
    * consume ONE materialization (AQE re-planning between two actions
    * could otherwise renumber partitions between the two reads).
    */
  def shuffleOrder(s: SparkSession, d: String): DataFrame = {
    val key = conv(substring(
      md5(concat(lit("epoch0|"), col("doc_id"))), 1, 15), 16, 10)
      .cast("long")
    val sorted = documents(s, d)
      .select(col("doc_id"), key.as("shuffle_key"))
      .repartitionByRange(fanout(s), col("shuffle_key"), col("doc_id"))
      .sortWithinPartitions("shuffle_key", "doc_id")
      .withColumn("mid", monotonically_increasing_id())
      .localCheckpoint(true)
    // mid = pid << 33 | intra (consecutive from 0 within a partition)
    val pid = shiftright(col("mid"), 33)
    val intra = col("mid") - shiftleft(pid, 33)
    val offW = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy(pid.as("pid"))
      .agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(offW), lit(0L)))
      .select(col("pid"), col("off"))
    sorted.join(broadcast(offsets), pid === col("pid"))
      .select(col("doc_id"), col("shuffle_key"),
        (col("off") + intra).as("pos"))
  }

  /** Deterministic fractional up-/down-sampling to a language-balanced
    * epoch mix: each document's replication factor is the ratio of its
    * language's target share (uniform across languages here) to its
    * natural share, r = N / (L · n_lang), applied as floor(r) whole
    * copies plus one more iff a content-keyed hash falls under the
    * fractional part — so a re-run, on any cluster, yields the SAME
    * epoch multiset without any RNG state. All arithmetic is integer
    * micro-units (cross-engine exact); rates and the language table are
    * vocabulary-bounded, so the joins broadcast and the only
    * corpus-sized work is the explode, whose output is ~N rows by
    * construction (the mix redistributes mass, it doesn't grow it).
    *
    * The replication factor is CAPPED at 100 (round-14 scale audit):
    * uncapped, a rare language in a large corpus gets r = N/(L·n_l)
    * per-doc copies — a 100-doc language in a 10^10-doc corpus means
    * 2·10^7 copies, i.e. a ~160 MB `sequence` array built inside ONE
    * row before the explode (executor OOM) concentrated on whichever
    * partitions hold those docs (skew), and an epoch that is 20 % the
    * same hundred documents (memorization, the thing a mix exists to
    * avoid). 100× is the standard upsampling ceiling in published
    * data-mix recipes; the cap is the same deterministic `least` in
    * both engines and is unreachable at fixture scale (ratios ≈ 1).
    */
  def upsample(s: SparkSession, d: String): DataFrame =
    upsampleOf(documents(s, d))

  /** The mix over an explicit documents frame — spec entry point for
    * constructed skewed corpora (the cap is unreachable on the
    * fixtures).
    */
  private[ops] def upsampleOf(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy("lang")
      .agg(count(lit(1)).as("n_l"))
    val totals = counts.agg(sum(col("n_l")).as("n"),
      count(lit(1)).as("nl"))
    val rated = docs.select(col("doc_id"), col("lang"))
      .join(broadcast(counts), "lang")
      .crossJoin(broadcast(totals))
      .withColumn("r_micro",
        expr("least((1000000 * n) DIV (nl * n_l), 100000000)"))
      .withColumn("h",
        conv(substring(md5(concat(lit("up|"), col("doc_id"))), 1, 8), 16, 10)
          .cast("long") % 1000000L)
      .withColumn("copies",
        expr("r_micro DIV 1000000") +
          when(col("h") < col("r_micro") % 1000000L, 1L).otherwise(0L))
    // guard BEFORE sequence(): Spark's sequence(1, 0) auto-steps -1 and
    // yields [1, 0] instead of an empty list — a down-sampled-out doc
    // would silently contribute two phantom rows
    rated.filter(col("copies") >= 1L)
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1L), col("copies"))).as("rep"))
  }

  /** Per-worker epoch shard manifest: the loader-facing composition of
    * the deterministic shuffle — worker w of W reads exactly the
    * positions ≡ w (mod W), so shards are equal-sized to ±1 doc with
    * no coordination, and the manifest (docs, token mass, position
    * range per worker) is what a training job uses to budget steps.
    * Output is W rows; the only corpus-scale work is the shuffle-order
    * derivation plus one join and one aggregation keyed on worker.
    */
  def epochShards(s: SparkSession, d: String): DataFrame = {
    val workers = 8
    val order = shuffleOrder(s, d)
    val tok = documents(s, d).select(col("doc_id"),
      size(toks(col("text"))).cast("long").as("n_tokens"))
    order.join(tok, "doc_id")
      .groupBy((col("pos") % workers).as("worker"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col("pos")).as("first_pos"),
        max(col("pos")).as("last_pos"))
  }

  /** Curriculum schedule: documents ordered best-quality-first and cut
    * into 4 phases of (near-)equal TOKEN mass — the manifest a staged
    * training run consumes (phase 0 = cleanest quarter of the token
    * budget, phase 3 = the tail). A doc's phase is determined by the
    * cumulative token mass STRICTLY BEFORE it in the quality order, so
    * the assignment is exact integer arithmetic with no float
    * boundaries: phase = (mass_before · 4) div mass_total.
    *
    * The running mass is computed the scale-correct way (same
    * discipline as `shuffleOrder`): a single global-order window would
    * funnel the corpus through one partition, so instead the projected
    * (doc_id, score, n_tokens) frame — three fixed-width columns, not
    * the text — is range-partitioned on the quality order, running
    * sums are taken per partition, and per-partition mass offsets (one
    * row per partition, bounded by cluster width) are broadcast back.
    * The eager checkpoint pins partition ids across the two consumers
    * (AQE re-planning between actions could otherwise renumber them).
    * Output is 4 rows: docs, token mass, and the score range per phase.
    */
  def curriculum(s: SparkSession, d: String): DataFrame = {
    val phases = 4
    val sorted = scoredDocs(s, d)
      .select(col("doc_id"), col("score_micro"),
        col("n_toks").cast("long").as("n_tokens"))
      .repartitionByRange(fanout(s), col("score_micro").desc, col("doc_id"))
      .sortWithinPartitions(col("score_micro").desc, col("doc_id"))
      .withColumn("spid", spark_partition_id())
      .localCheckpoint(true)
    // intra-partition running mass: the window regroups by spid — a
    // ≤fanout-ary exchange of the narrow projection, each group sorted
    // independently (parallel across partitions, never a global funnel)
    val w = Window.partitionBy("spid")
      .orderBy(col("score_micro").desc, col("doc_id"))
    val cum = sorted.withColumn("cum_in",
      sum(col("n_tokens")).over(w) - col("n_tokens"))
    val offW = Window.orderBy("spid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy(col("spid"))
      .agg(sum(col("n_tokens")).as("m"))
      .withColumn("off", coalesce(sum(col("m")).over(offW), lit(0L)))
      .select(col("spid"), col("off"))
    val total = sorted.agg(sum(col("n_tokens")).as("mass_total"))
    cum.join(broadcast(offsets), "spid")
      .crossJoin(broadcast(total))
      .withColumn("phase",
        expr(s"((cum_in + off) * $phases) DIV mass_total"))
      .groupBy("phase")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col("score_micro")).as("min_score"),
        max(col("score_micro")).as("max_score"))
  }

  /** Weighted sampling WITHOUT replacement, exact sample mass:
    * systematic PPS (probability-proportional-to-size) over a
    * hash-randomized order — the estimator-grade sampler behind
    * "pick ~k docs, long docs proportionally more often" that a
    * rate-cut (`sample`) or an independent coin (`qualitySample`)
    * cannot give, because neither controls the TOTAL drawn. Classic
    * construction (Madow's systematic selection after a random
    * permutation): lay every document's weight end to end along a
    * line in a content-hash order, drop exactly k equally spaced
    * sample points on it, and a document is drawn once per point
    * landing inside its span — multiplicity
    * m_i = ⌊(C_i + w_i)·k / W⌋ − ⌊C_i·k / W⌋ with C_i the mass
    * strictly before doc i and W the corpus mass, so Σ m_i
    * TELESCOPES to exactly k (no float boundary, no rejection pass)
    * and inclusion is ∝ w_i for every w_i ≤ W/k. The randomization is
    * the hash order itself; the arithmetic is pure BIGINT (the k·W
    * product stays under 2^63 up to ~10^15 weight units at k=1000 —
    * petabyte-of-chars headroom).
    *
    * Shape at 100 TB: the same two-phase running mass as `curriculum`
    * — range-partition the NARROW (doc_id, w, key) projection on the
    * hash order, per-partition running sums in parallel windows, one
    * broadcast row of mass offsets per partition — so there is no
    * global-order funnel anywhere, and the output is the drawn docs
    * only (expected k rows).
    */
  def weightedSample(s: SparkSession, d: String): DataFrame = {
    val k = 1000L
    val key = conv(substring(
      md5(concat(lit("pps|"), col("doc_id"))), 1, 15), 16, 10)
      .cast("long")
    val sorted = documents(s, d)
      .select(col("doc_id"), col("n_chars").as("w"), key.as("pps_key"))
      .repartitionByRange(fanout(s), col("pps_key"), col("doc_id"))
      .sortWithinPartitions("pps_key", "doc_id")
      .withColumn("spid", spark_partition_id())
      .localCheckpoint(true)
    val w = Window.partitionBy("spid").orderBy(col("pps_key"), col("doc_id"))
    val cum = sorted.withColumn("cum_in", sum(col("w")).over(w) - col("w"))
    val offW = Window.orderBy("spid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy(col("spid"))
      .agg(sum(col("w")).as("m"))
      .withColumn("off", coalesce(sum(col("m")).over(offW), lit(0L)))
      .select(col("spid"), col("off"))
    val total = sorted.agg(sum(col("w")).as("tw"))
    cum.join(broadcast(offsets), "spid")
      .crossJoin(broadcast(total))
      .withColumn("mult",
        expr(s"((cum_in + off + w) * $k) DIV tw - ((cum_in + off) * $k) DIV tw"))
      .filter(col("mult") >= 1L)
      .select(col("doc_id"), col("w"), col("mult"))
  }

  /** Per-stratum weighted sampling — `weightedSample`'s systematic PPS
    * run independently inside every language: exactly k=200 draws PER
    * STRATUM with inclusion ∝ n_chars within it. This completes the
    * sampling matrix (uniform rate `sample`, weighted rate
    * `qualitySample`, uniform exact-k `quota`, weighted exact-k global
    * `weightedSample`): the shape a corpus rebalance actually needs —
    * fixed per-language budgets, long docs favored inside each budget,
    * still RNG-free and partition-invariant.
    *
    * Shape at 100 TB: the per-stratum running mass uses the same
    * two-phase discipline, but offsets key on (partition, stratum):
    * range-partition on (lang, hash order) so a partition holds
    * contiguous spans of one-or-few strata, take per-(partition,
    * stratum) sums (≤ partitions × strata rows — broadcast-sized),
    * prefix them per stratum, and add back. Per-stratum totals are a
    * strata-bounded broadcast. No stratum ever funnels through one
    * reducer beyond its own contiguous span.
    */
  def stratifiedWeighted(s: SparkSession, d: String): DataFrame = {
    val k = 200L
    val key = conv(substring(
      md5(concat(lit("spps|"), col("doc_id"))), 1, 15), 16, 10)
      .cast("long")
    val sorted = documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars").as("w"),
        key.as("pps_key"))
      .repartitionByRange(fanout(s), col("lang"), col("pps_key"),
        col("doc_id"))
      .sortWithinPartitions("lang", "pps_key", "doc_id")
      .withColumn("spid", spark_partition_id())
      .localCheckpoint(true)
    val w = Window.partitionBy("spid", "lang")
      .orderBy(col("pps_key"), col("doc_id"))
    val cum = sorted.withColumn("cum_in", sum(col("w")).over(w) - col("w"))
    val offW = Window.partitionBy("lang").orderBy("spid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy(col("spid"), col("lang"))
      .agg(sum(col("w")).as("m"))
      .withColumn("off", coalesce(sum(col("m")).over(offW), lit(0L)))
      .select(col("spid"), col("lang"), col("off"))
    val totals = sorted.groupBy(col("lang")).agg(sum(col("w")).as("tw"))
    cum.join(broadcast(offsets), Seq("spid", "lang"))
      .join(broadcast(totals), "lang")
      .withColumn("mult",
        expr(s"((cum_in + off + w) * $k) DIV tw - ((cum_in + off) * $k) DIV tw"))
      .filter(col("mult") >= 1L)
      .select(col("doc_id"), col("lang"), col("w"), col("mult"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cur_curriculum" -> (curriculum _),
    "q_cur_weighted_sample" -> (weightedSample _),
    "q_cur_stratified_pps" -> (stratifiedWeighted _),
    "q_cur_epoch_shards" -> (epochShards _),
    "q_cur_upsample" -> (upsample _),
    "q_cur_shuffle" -> (shuffleOrder _),
    "q_cur_boilerplate" -> (boilerplate _),
    "q_cur_classifier" -> (classifier _),
    "q_cur_mixture" -> (mixture _),
    "q_cur_quality_sample" -> (qualitySample _),
    "q_cur_manifest" -> (manifest _),
    "q_cur_repetition" -> (repetition _),
    "q_cur_contamination" -> (contamination _),
    "q_cur_dsir" -> (dsir _),
    "q_cur_sources" -> (sources _),
    "q_cur_redact" -> (redact _),
    "q_cur_sample" -> (sample _),
    "q_cur_split" -> (split _),
    "q_cur_leakage" -> (splitLeakage _),
    "q_cur_group_split" -> (groupSplit _),
    "q_cur_stratified" -> (stratified _),
    "q_cur_quota" -> (quota _),
    "q_cur_incremental" -> (incrementalDedup _),
    "q_cur_lengthgate" -> (lengthGate _),
    "q_cur_pack" -> ((s: SparkSession, d: String) => pack(s, d)),
    "q_cur_pipeline" -> (curationPipeline _),
  )

  val oracles: Map[String, String] = Map(
    // same quality score as q_cur_classifier; the phase cut uses the
    // EXCLUSIVE running token mass so both engines land identical
    // integer boundaries
    "q_cur_curriculum" ->
      """WITH f AS (
        |  SELECT doc_id, n_chars, str_split(text, ' ') AS t FROM documents),
        |sc AS (
        |  SELECT doc_id, len(t)::BIGINT AS n_tokens,
        |    10 * ((1000000 * len(list_filter(t,
        |           x -> x IN ('the', 'a', 'of', 'and', 'is')))) // len(t))
        |      - abs((1000000 * (n_chars - (len(t) - 1))) // len(t)
        |             - 4500000) AS score_micro
        |  FROM f),
        |c AS (
        |  SELECT *,
        |    coalesce(sum(n_tokens) OVER (ORDER BY score_micro DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_in,
        |    sum(n_tokens) OVER () AS mass_total
        |  FROM sc)
        |SELECT ((cum_in * 4) // mass_total)::BIGINT AS phase,
        |  count(*)::BIGINT AS n_docs,
        |  sum(n_tokens)::BIGINT AS sum_tokens,
        |  min(score_micro)::BIGINT AS min_score,
        |  max(score_micro)::BIGINT AS max_score
        |FROM c GROUP BY 1""".stripMargin,
    // per-stratum systematic PPS: the same telescoping ⌊·k/W⌋
    // difference with the running mass and total partitioned by lang
    "q_cur_stratified_pps" ->
      """WITH v AS (
        |  SELECT doc_id, lang, n_chars::BIGINT AS w,
        |    ('0x' || substr(md5('spps|' || doc_id), 1, 15))::BIGINT
        |      AS pps_key
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, w,
        |    coalesce(sum(w) OVER (PARTITION BY lang
        |      ORDER BY pps_key, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cw,
        |    sum(w) OVER (PARTITION BY lang) AS tw
        |  FROM v)
        |SELECT doc_id, lang, w,
        |  (((cw + w) * 200) // tw - (cw * 200) // tw)::BIGINT AS mult
        |FROM c
        |WHERE ((cw + w) * 200) // tw > (cw * 200) // tw""".stripMargin,
    // systematic PPS: exclusive running mass over the SAME hash order
    // and the same telescoping ⌊·k/W⌋ difference — all BIGINT, so both
    // engines land identical sample points
    "q_cur_weighted_sample" ->
      """WITH v AS (
        |  SELECT doc_id, n_chars::BIGINT AS w,
        |    ('0x' || substr(md5('pps|' || doc_id), 1, 15))::BIGINT
        |      AS pps_key
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, w,
        |    coalesce(sum(w) OVER (ORDER BY pps_key, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cw,
        |    sum(w) OVER () AS tw
        |  FROM v)
        |SELECT doc_id, w,
        |  (((cw + w) * 1000) // tw - (cw * 1000) // tw)::BIGINT AS mult
        |FROM c
        |WHERE ((cw + w) * 1000) // tw > (cw * 1000) // tw""".stripMargin,
    "q_cur_epoch_shards" ->
      """WITH o AS (SELECT doc_id,
        |  (row_number() OVER (ORDER BY
        |     ('0x' || substr(md5('epoch0|' || doc_id), 1, 15))::BIGINT,
        |     doc_id) - 1)::BIGINT AS pos
        |  FROM documents)
        |SELECT o.pos % 8 AS worker, count(*) AS n_docs,
        |  sum(len(str_split(d.text, ' ')))::BIGINT AS sum_tokens,
        |  min(o.pos) AS first_pos, max(o.pos) AS last_pos
        |FROM o JOIN documents d USING (doc_id)
        |GROUP BY 1""".stripMargin,
    "q_cur_upsample" ->
      """WITH c AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
        |t AS (SELECT count(*) AS n, (SELECT count(*) FROM c) AS nl
        |      FROM documents),
        |r AS (SELECT d.doc_id, d.lang,
        |        least((1000000 * t.n) // (t.nl * c.n_l),
        |              100000000) AS r_micro,
        |        ('0x' || substr(md5('up|' || d.doc_id), 1, 8))::BIGINT
        |          % 1000000 AS h
        |      FROM documents d, c, t WHERE d.lang = c.lang),
        |k AS (SELECT doc_id, lang,
        |        r_micro // 1000000
        |          + CASE WHEN h < r_micro % 1000000 THEN 1 ELSE 0 END
        |          AS copies
        |      FROM r)
        |SELECT doc_id, lang, unnest(generate_series(1, copies))::BIGINT AS rep
        |FROM k WHERE copies >= 1""".stripMargin,
    // positions are 0-based; the key is the same 15-hex-digit (60-bit)
    // integer both engines derive from md5(seed|doc_id)
    "q_cur_shuffle" ->
      """SELECT doc_id,
        |  ('0x' || substr(md5('epoch0|' || doc_id), 1, 15))::BIGINT
        |    AS shuffle_key,
        |  (row_number() OVER (ORDER BY
        |     ('0x' || substr(md5('epoch0|' || doc_id), 1, 15))::BIGINT,
        |     doc_id) - 1)::BIGINT AS pos
        |FROM documents""".stripMargin,
    "q_cur_classifier" ->
      """WITH f AS (
        |  SELECT doc_id, n_chars, str_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    (1000000 * len(list_filter(t,
        |       x -> x IN ('the', 'a', 'of', 'and', 'is')))) // len(t)
        |      AS stop_micro,
        |    (1000000 * (n_chars - (len(t) - 1))) // len(t) AS len_micro
        |  FROM f)
        |SELECT doc_id,
        |  10 * stop_micro - abs(len_micro - 4500000) AS score_micro,
        |  10 * stop_micro - abs(len_micro - 4500000) >= 450000 AS keep
        |FROM g""".stripMargin,
    "q_cur_boilerplate" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2]))) AS sh
        |  FROM (SELECT doc_id, str_split(text, ' ') AS t FROM documents) x
        |  WHERE len(t) >= 2),
        |common AS (SELECT sh FROM sh GROUP BY sh
        |           HAVING count(*) >= 0.05 * (SELECT count(*) FROM documents))
        |SELECT doc_id, count(*) AS n_bp
        |FROM sh JOIN common USING (sh)
        |GROUP BY doc_id""".stripMargin,
    "q_cur_repetition" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(len(t) - 1),
        |      i -> t[i+1] || ' ' || t[i+2])) AS sh
        |  FROM (SELECT doc_id, str_split(text, ' ') AS t FROM documents) x
        |  WHERE len(t) >= 2),
        |per AS (SELECT doc_id, sh, count(*) AS c FROM g GROUP BY doc_id, sh)
        |SELECT doc_id, sum(c)::INT AS n_grams,
        |  round((sum(c) - count(*)) / sum(c), 6) AS dup_frac,
        |  round(max(c) / sum(c), 6) AS top_frac
        |FROM per GROUP BY doc_id""".stripMargin,
    "q_cur_contamination" ->
      """WITH g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(len(t) - 2),
        |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
        |  FROM (SELECT doc_id, str_split(text, ' ') AS t FROM documents) x
        |  WHERE len(t) >= 3),
        |bench AS (SELECT DISTINCT unnest(g) AS sh FROM g
        |          WHERE doc_id % 101 = 0),
        |corpus AS (SELECT doc_id, len(g) AS n_grams, unnest(g) AS sh
        |           FROM g WHERE doc_id % 101 <> 0)
        |SELECT doc_id, count(*) AS n_hits,
        |  round(count(*) / n_grams, 6) AS overlap_frac
        |FROM corpus JOIN bench USING (sh)
        |GROUP BY doc_id, n_grams""".stripMargin,
    "q_cur_dsir" ->
      """WITH dt AS (
        |  SELECT doc_id, lang, t AS term, count(*) AS c_dt
        |  FROM (SELECT doc_id, lang, unnest(str_split(text, ' ')) AS t
        |        FROM documents) x
        |  GROUP BY doc_id, lang, t),
        |vocab AS (
        |  SELECT term,
        |    sum(CASE WHEN lang = 'en' THEN c_dt ELSE 0 END) AS c_tgt,
        |    sum(CASE WHEN lang <> 'en' THEN c_dt ELSE 0 END) AS c_bg
        |  FROM dt GROUP BY term),
        |tot AS (SELECT sum(c_tgt) AS n_tgt, sum(c_bg) AS n_bg,
        |               count(*) AS v FROM vocab),
        |w AS (
        |  SELECT term, CAST(round(
        |    ((c_tgt + 1)::DOUBLE * (n_bg + v)::DOUBLE)
        |      / ((c_bg + 1)::DOUBLE * (n_tgt + v)::DOUBLE)
        |      * 1000000.0) AS BIGINT) AS w
        |  FROM vocab, tot)
        |SELECT dt.doc_id, sum(dt.c_dt)::BIGINT AS n_tokens,
        |  sum(dt.c_dt * w.w)::BIGINT AS score_micro
        |FROM dt JOIN w USING (term)
        |GROUP BY dt.doc_id""".stripMargin,
    "q_cur_sources" ->
      """SELECT source, count(*) AS n_docs,
        |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en,
        |  round((count(*) - count(DISTINCT md5(text))) / count(*), 6)
        |    AS dup_frac,
        |  round(sum(n_chars) / count(*), 6) AS mean_chars
        |FROM documents GROUP BY source""".stripMargin,
    "q_cur_redact" ->
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[0-9]+', '<ID>', 'g') AS name_red,
        |  md5(c_name) AS pseudonym
        |FROM customer""".stripMargin,
    "q_cur_manifest" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CASE WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 < 98
        |           THEN 'train'
        |         WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 = 98
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT s.split, d.lang, count(*) AS n_docs,
        |  sum(d.n_chars)::BIGINT AS sum_chars
        |FROM documents d JOIN s USING (doc_id)
        |GROUP BY 1, 2""".stripMargin,
    "q_cur_quality_sample" ->
      """WITH f AS (
        |  SELECT doc_id, text, n_chars, str_split(text, ' ') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, text,
        |    10 * ((1000000 * len(list_filter(t,
        |       x -> x IN ('the', 'a', 'of', 'and', 'is')))) // len(t))
        |      - abs((1000000 * (n_chars - (len(t) - 1))) // len(t) - 4500000)
        |      AS score_micro
        |  FROM f)
        |SELECT doc_id,
        |  greatest(least(score_micro, 1000000), 100000) AS keep_micro
        |FROM g
        |WHERE ('0x' || substr(md5(text), 1, 8))::BIGINT % 1000000
        |  < greatest(least(score_micro, 1000000), 100000)""".stripMargin,
    "q_cur_mixture" ->
      """WITH c AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(floor(sqrt(count(*))) AS BIGINT) AS isqrt
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(isqrt) AS sum_isqrt FROM c)
        |SELECT source, n_docs,
        |  ((1000000 * isqrt) // (SELECT sum_isqrt FROM t))::BIGINT
        |    AS weight_micro
        |FROM c""".stripMargin,
    "q_cur_split" ->
      """SELECT doc_id,
        |  ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket,
        |  CASE WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 < 98
        |         THEN 'train'
        |       WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 = 98
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "q_cur_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(text), 1, 8))::BIGINT % 1000 < 100""".stripMargin,
    // composes the dedup groups CTE (LSH banding → CC) with the
    // content-keyed split — a group is leaky iff it spans >1 split
    "q_cur_leakage" ->
      s"""${Dedup.groupsCte},
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 < 98
         |           THEN 'train'
         |         WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 = 98
         |           THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |SELECT dup_group, count(*)::BIGINT AS n_docs,
         |  count(DISTINCT split)::BIGINT AS n_splits,
         |  array_to_string(list_sort(list(DISTINCT split)), ',') AS splits
         |FROM groups JOIN sp USING (doc_id)
         |GROUP BY dup_group
         |HAVING count(DISTINCT split) > 1""".stripMargin,
    "q_cur_group_split" ->
      s"""${Dedup.groupsCte},
         |assigned AS (
         |  SELECT d.doc_id, coalesce(g.dup_group, d.doc_id) AS grp
         |  FROM documents d LEFT JOIN groups g ON d.doc_id = g.doc_id)
         |SELECT doc_id, grp,
         |  ('0x' || substr(md5(grp::VARCHAR), 1, 8))::BIGINT % 100 AS bucket,
         |  CASE WHEN ('0x' || substr(md5(grp::VARCHAR), 1, 8))::BIGINT % 100 < 98
         |         THEN 'train'
         |       WHEN ('0x' || substr(md5(grp::VARCHAR), 1, 8))::BIGINT % 100 = 98
         |         THEN 'val'
         |       ELSE 'test' END AS split
         |FROM assigned""".stripMargin,
    "q_cur_stratified" ->
      """SELECT lang, count(*) AS n_sampled,
        |  min(doc_id) AS first_id, max(doc_id) AS last_id
        |FROM documents
        |WHERE ('0x' || substr(md5(text), 1, 8))::BIGINT % 1000 <
        |  CASE WHEN lang = 'en' THEN 250 ELSE 100 END
        |GROUP BY lang""".stripMargin,
    "q_cur_quota" ->
      """SELECT doc_id, lang, rk FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY
        |      ('0x' || substr(md5(text), 1, 8))::BIGINT, doc_id)::BIGINT AS rk
        |  FROM documents) t
        |WHERE rk <= 10""".stripMargin,
    "q_cur_incremental" ->
      """WITH base AS (SELECT doc_id, md5(text) AS h FROM documents),
        |seen AS (SELECT DISTINCT h FROM base WHERE doc_id % 5 <> 4),
        |batch AS (
        |  SELECT h, min(doc_id) AS doc_id FROM base
        |  WHERE doc_id % 5 = 4 GROUP BY h)
        |SELECT doc_id, h FROM batch
        |WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.h = batch.h)""".stripMargin,
    "q_cur_lengthgate" ->
      """WITH b AS (SELECT quantile_disc(n_chars, 0.05) AS lo,
        |                  quantile_disc(n_chars, 0.95) AS hi
        |           FROM documents)
        |SELECT lang, count(*) AS n_kept,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents CROSS JOIN b
        |WHERE n_chars >= lo AND n_chars <= hi
        |GROUP BY lang""".stripMargin,
    "q_cur_pipeline" ->
      """WITH base AS (SELECT * FROM documents WHERE n_chars >= 100),
        |keep AS (SELECT min(doc_id) AS doc_id FROM base GROUP BY md5(text)),
        |surv AS (
        |  SELECT b.doc_id, b.lang,
        |    len(str_split(b.text, ' '))::BIGINT AS n_tokens
        |  FROM base b JOIN keep USING (doc_id)
        |  WHERE ('0x' || substr(md5(b.text), 1, 8))::BIGINT % 1000 < 500),
        |packed AS (
        |  SELECT lang, n_tokens,
        |    CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
        |      - n_tokens) / 1024) AS BIGINT) AS bin
        |  FROM surv)
        |SELECT lang, bin, count(*) AS n_docs, sum(n_tokens)::BIGINT AS tokens
        |FROM packed GROUP BY lang, bin""".stripMargin,
    "q_cur_pack" ->
      """SELECT doc_id, lang,
        |  len(str_split(text, ' '))::BIGINT AS n_tokens,
        |  CAST(floor((sum(len(str_split(text, ' '))::BIGINT)
        |      OVER (PARTITION BY lang ORDER BY doc_id)
        |    - len(str_split(text, ' '))::BIGINT) / 2048) AS BIGINT) AS bin
        |FROM documents""".stripMargin,
  )
}
