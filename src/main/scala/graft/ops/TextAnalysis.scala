package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text-analysis operators for corpus pipelines: quality statistics,
  * n-gram-heuristic language ID, content fingerprinting, and token
  * counting — all pure column expressions (whole-stage codegen, no UDFs),
  * linear scans with at most one shuffle for the grouped variants.
  */
object TextAnalysis {

  private def toks(c: Column): Column = split(c, " ")

  private val stop = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "los", "es"),
    "fr" -> Seq("le", "la", "et", "les", "est"))

  /** Stopword count straight off the text column — the native
    * single-pass expression; `hitsDeclarative` is its executable spec
    * (StopwordHitsExprSpec pins pointwise equality).
    */
  private def hits(text: Column, words: Seq[String]): Column =
    graft.functions.StopwordHitsExpr.stopwordHits(text, words)

  private[graft] def hitsDeclarative(t: Column, words: Seq[String]): Column =
    size(filter(t, x => x.isin(words.map(lit(_)): _*)))

  /** Per-document quality stats: token count, exact average token
    * length (single-space join ⇒ sum of lengths = chars − (n−1)),
    * stopword and digit ratios.
    */
  def textStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("t", toks(col("text")))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .select(
        col("doc_id"), col("n_tokens"),
        round((length(col("text")) - (col("n_tokens") - 1))
          .cast("double") / col("n_tokens"), 6).as("avg_token_len"),
        round(hits(col("text"), stop("en")).cast("double") / col("n_tokens"), 6)
          .as("stopword_ratio"),
        // guarded: an EMPTY document (length 0) must yield a null
        // ratio, not an ANSI DIVIDE_BY_ZERO that kills the whole
        // quality pass — real corpora always contain a few
        // (DegenerateCorpusSpec)
        when(length(col("text")) > 0,
          round(length(regexp_replace(col("text"), "[^0-9]", ""))
            .cast("double") / length(col("text")), 6)).as("digit_ratio"))

  /** Stopword-vote language ID compared against the labeled column.
    * Four native single-pass counters over the raw text — no token
    * array is ever built (the declarative form materialized the array
    * plus one filtered copy per language).
    */
  def langId(s: SparkSession, d: String): DataFrame = {
    val sc = stop.map { case (l, ws) => l -> hits(col("text"), ws) }
    val pred =
      when(sc("en") >= sc("de") && sc("en") >= sc("es") &&
        sc("en") >= sc("fr") && sc("en") > 0, "en")
        .when(sc("de") >= sc("es") && sc("de") >= sc("fr") && sc("de") > 0, "de")
        .when(sc("es") >= sc("fr") && sc("es") > 0, "es")
        .when(sc("fr") > 0, "fr")
        .otherwise("unk")
    documents(s, d)
      .select(col("lang"), pred.as("predicted"))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
  }

  /** Content fingerprint: hash of the sorted distinct token set —
    * catches word-order-only edits (fingerprint dedup).
    */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        md5(array_join(array_sort(array_distinct(toks(col("text")))), " "))
          .as("fp"))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))

  /** Token counting: whitespace tokens + a chars/4 BPE-style estimate. */
  def tokenCount(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("ws_tokens"),
        expr("CAST((length(text) + 3) DIV 4 AS BIGINT)").as("bpe_est"))

  /** TF-IDF top-3 terms per document. Shape at 100 TB: one explode +
    * two keyed aggregations (term-frequency per doc, document-frequency
    * per term — both with map-side partial aggregation), the corpus
    * total broadcast as a 1-row frame, and the top-k window partitioned
    * by doc_id (high cardinality ⇒ parallel, never a single-reducer
    * funnel). The score is tf·N/df computed in ONE double division —
    * IEEE-identical in any engine, so the rank (and the oracle hash)
    * is deterministic; no transcendental log in the ordering.
    */
  def tfidf(s: SparkSession, d: String): DataFrame = {
    // the corpus fits a handful of parquet splits, which would serialize
    // the token explode + partial aggregation on as few cores; the
    // explicit partition count survives AQE (which sizes off the tiny
    // pre-explode rows and would coalesce right back)
    val tf = documents(s, d)
      .repartition(fanout(s), col("doc_id"))
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    // df as a count-over-window on the tf frame, NOT a groupBy+self-join:
    // a derived `tf.groupBy(term)` references the tf subtree a second
    // time and the physical plan re-scans and re-explodes the whole
    // corpus for it (measured ~2× the tokenize cost) — the window form
    // reads the tf rows once, one extra term-keyed exchange, no rescan
    val total = documents(s, d).agg(count(lit(1)).as("n_total"))
    val wDf = org.apache.spark.sql.expressions.Window.partitionBy("term")
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy((col("tf") * col("n_total") / col("df")).desc, col("term"))
    tf.withColumn("df", count(lit(1)).over(wDf))
      .join(broadcast(total))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 3)
      .select("doc_id", "term", "tf", "df", "rk")
  }

  /** Corpus-wide heavy hitters: the top-20 tokens by total occurrence.
    * explode → groupBy(term) benefits from map-side combine (the
    * shuffle carries one row per distinct term per task, not one per
    * token), and the final top-k is a TakeOrdered, never a full sort.
    * Ties at the cutoff break on the token itself so the result set is
    * deterministic at any scale.
    */
  def heavyHitters(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(toks(col("text"))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(20)

  /** Inverted-index build: term → document frequency + the smallest-20
    * doc_ids of its posting list. The cap is computed HIERARCHICALLY —
    * per-(term, 1000-doc chunk) capped sorted lists first (parallel,
    * state bounded by the chunk), then a merge of the per-chunk caps —
    * because the global top-20 of a union is the top-20 of the per-chunk
    * top-20s (each global survivor is necessarily in its own chunk's
    * cap). A flat collect_list per term would build the FULL posting
    * array for every stopword before truncating — billions of elements
    * per hot term at corpus scale. On a real web corpus the production
    * path also gates on relative df (cf. boilerplate); this synthetic
    * vocabulary is dense, so the query exercises the capped build.
    */
  def postings(s: SparkSession, d: String): DataFrame =
    postings(s, d, chunkDocs = 1000)

  def postings(s: SparkSession, d: String, chunkDocs: Int): DataFrame = {
    val pairs = documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .distinct()
    val df = pairs.groupBy("term").agg(count(lit(1)).as("df"))
    val chunked = pairs
      .withColumn("chunk", floor(col("doc_id") / chunkDocs))
      .groupBy("term", "chunk")
      .agg(slice(sort_array(collect_list(col("doc_id"))), 1, 20).as("p"))
    chunked.groupBy("term")
      // The list is emitted as a comma-joined string: the verify gate's
      // column-sorted compare requires scalar cells, and a stable text
      // rendering of an integral list is engine-portable.
      .agg(array_join(
        slice(sort_array(flatten(collect_list(col("p")))), 1, 20), ",")
        .as("postings"))
      .join(df, "term")
      .select("term", "df", "postings")
  }

  /** Count-based bigram language model: conditional probability
    * P(w2 | w1) for every bigram seen ≥ 5 times, as integer micro-units
    * round(10^6·c12/c1), computed as a STAGED pure-int64 half-up
    * rounding (round 14). The previous form `round(c12·10^6 / c1)`
    * had two scale failures the fixtures cannot see: the int64
    * product wraps once one word occurs > 9.2·10^12 times, and the
    * division ran through a DOUBLE, which silently loses integer
    * precision past 2^53 (~9·10^9 — a stopword bigram count crosses
    * that at well under 1 TB of text). The staged identity
    * `10^6·c12 = (1000·q1 + q2)·c1 + r2` with
    * `q1 = (1000·c12) DIV c1, r1 = (1000·c12) % c1,
    *  q2 = (1000·r1) DIV c1, r2 = (1000·r1) % c1`
    * gives floor = 1000·q1 + q2 and half-up = +1 iff 2·r2 ≥ c1 —
    * bit-exact at any scale, every intermediate < 2^63 to
    * ~9.2·10^15 corpus tokens (~37 PB of text); the DuckDB twin
    * mirrors the staged form verbatim. Exact BIGINT everywhere else,
    * so the table is bit-identical under any partitioning.
    * The training shape at 100 TB: ONE explode into
    * bigram pairs, two map-side-combinable counts, and a join that
    * stays keyed on w1 (vocabulary-bounded, AQE-broadcast when the
    * vocab fits). This one plan IS the inner loop of n-gram LM
    * training; perplexity scoring replays it with the roles swapped.
    */
  def bigramLm(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d)
      .repartition(fanout(s), col("doc_id"))
      .select(toks(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    // explode_outer: the size(t) >= 2 guard already proves the bigram
    // array non-empty; a plain explode would let
    // InferFiltersFromGenerate re-substitute the transform under a
    // size()>0 filter and build every array twice (the contamination
    // lesson, SCALING.md)
    val pairs = base.select(explode_outer(
        expr("transform(sequence(0, size(t) - 2)," +
          " i -> named_struct('w1', t[i], 'w2', t[i + 1]))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    // c1 = sum of c12 over w1, as a window on the AGGREGATED frame —
    // a second pairs.groupBy would reference the explode subtree twice
    // and the physical plan re-scans + re-explodes the corpus for it
    // (the tfidf lesson); the window reads the vocabulary-bounded c12
    // rows once. The c12 >= 5 prune applies AFTER the window so c1
    // still counts every occurrence of w1.
    c12.withColumn("c1", sum(col("c12")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("w1")))
      .filter(col("c12") >= 5)
      .select(col("w1"), col("w2"), col("c12"),
        expr(pMicroStaged("c12", "c1")).as("p_micro"))
  }

  /** The staged int64 half-up rounding of 10^6·num/den (see bigramLm's
    * Scaladoc) — one definition for the engine expression and both
    * DuckDB twins (`DIV`/`%` parse identically in Spark SQL and
    * DuckDB... DuckDB uses `//`, so the divider token is a parameter).
    */
  private[ops] def pMicroStaged(num: String, den: String,
      div: String = "DIV"): String =
    s"""(1000 * ((1000 * $num) $div $den)
       |  + (1000 * ((1000 * $num) % $den)) $div $den
       |  + (CASE WHEN 2 * ((1000 * ((1000 * $num) % $den)) % $den)
       |       >= $den THEN 1 ELSE 0 END))""".stripMargin

  /** LM-based document scoring — the perplexity-filter shape with the
    * transcendentals removed: each document's bigrams are looked up in
    * the corpus bigram LM (`bigramLm`) and the integer micro-unit
    * conditional probabilities summed, plus an OOV count for bigrams
    * the LM pruned. Exact BIGINT arithmetic end-to-end (a log-prob sum
    * would drift with partition order); ranking behavior matches the
    * real filter — templated text scores high, noise scores low with
    * high OOV. The LM table is vocabulary-bounded, so the lookup join
    * broadcasts at any corpus scale; the per-doc rollup is one
    * map-side-combinable aggregation.
    */
  def lmScore(s: SparkSession, d: String): DataFrame = {
    val lm = bigramLm(s, d).select(col("w1"), col("w2"), col("p_micro"))
    val pairs = documents(s, d)
      .repartition(fanout(s), col("doc_id"))
      .select(col("doc_id"), toks(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode_outer(
        expr("transform(sequence(0, size(t) - 2)," +
          " i -> named_struct('w1', t[i], 'w2', t[i + 1]))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    pairs.join(broadcast(lm), Seq("w1", "w2"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("p_micro").isNull, 1)).as("n_oov"),
        sum(coalesce(col("p_micro"), lit(0L))).as("score_micro"))
      .withColumn("avg_micro", expr("score_micro DIV n_bigrams"))
  }

  /** One BPE training step at corpus scale: the 20 most frequent
    * adjacent symbol pairs (here: character pairs inside whitespace
    * tokens — the starting alphabet of byte-pair encoding). The real
    * trainer LOOPS this exact plan, merging the winner into the symbol
    * stream each round; each round is one explode + one combinable
    * count + a TakeOrdered — never a sort of the pair universe.
    */
  def bpeStep(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .repartition(fanout(s), col("doc_id"))
      .select(explode(toks(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode_outer(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)

  /** Overlapping token-window chunking — the context-window slicing
    * step of RAG indexing / LM training prep: windows of 32 tokens at
    * stride 24 (8-token overlap so no boundary context is lost), each
    * with its token count and content hash. Entirely row-local (one
    * explode per window, slices clamp at document end); chunk identity
    * is content-keyed so re-chunking a changed corpus only re-embeds
    * changed windows.
    */
  def chunk(s: SparkSession, d: String): DataFrame = {
    val win = 32
    val stride = 24
    val chunkSlice = slice(col("t"), col("chunk_idx") * stride + 1, lit(win))
    documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        explode(expr(s"sequence(0, (size(t) - 1) DIV $stride)"))
          .as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(chunkSlice).cast("long").as("n_tokens"),
        md5(concat_ws(" ", chunkSlice)).as("chunk_hash"))
  }

  /** Per-language Simpson diversity of the token distribution:
    * 1 − Σc²/N² in integer micro-units — the corpus-mix diagnostic
    * (low diversity = crawl full of templated text). Exact sums; ONE
    * double division at the end, so the index is engine-identical —
    * the log-free alternative to Shannon entropy, whose transcendental
    * sum would drift across partition orders.
    *
    * Width audit (round 14): the int64 form failed twice inside the
    * 100 TB envelope — `sum(c·c)` wraps once one term reaches
    * c > 3·10^9 occurrences in a language (a stopword crosses that
    * under 100 GB of text), and `n_tokens·n_tokens` wraps at
    * N > 3·10^9 total tokens. The squares now run in decimal(38,0)
    * (engine) / HUGEINT (oracle) — both exact to 10^38, and
    * Σc² ≤ N² < 10^28 at 100 TB — and the denominator squares in
    * DOUBLE (N < 2^53 keeps each factor exact; the quotient feeds the
    * double index anyway, and both engines' int→double conversions and
    * IEEE ops round identically, so the micro value stays bit-equal).
    */
  def diversity(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"), explode(toks(col("text"))).as("term"))
      .groupBy("lang", "term")
      .agg(count(lit(1)).as("c"))
      .groupBy("lang")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        sum(col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
          .as("sum_c2"))
      .select(col("lang"), col("n_tokens"), col("n_terms"),
        round((lit(1.0) - col("sum_c2").cast("double")
          / (col("n_tokens").cast("double") * col("n_tokens").cast("double")))
          * 1000000.0)
          .cast("long").as("simpson_micro"))

  /** Top-term co-occurrence: for the 20 most frequent terms, how many
    * documents contain each PAIR — the association structure behind
    * topic seeds and embedding sanity checks. The vocabulary is
    * reduced to the top-20 BEFORE any pairing (broadcast semi join),
    * so the per-document pair fan-out is ≤ C(20,2) regardless of
    * document length — the bound that keeps co-occurrence mining
    * feasible at corpus scale.
    */
  def cooccurrence(s: SparkSession, d: String): DataFrame = {
    // occ feeds both the top-20 vocabulary reduction and the pairing
    // join; without the lazy checkpoint the broadcast subtree re-scans
    // and re-explodes the WHOLE corpus for `top` (same double-scan the
    // tfidf window rewrite removed — measured 2× the tokenize cost).
    // Lazy (eager=false): building the frame must not launch a job; the
    // occ RDD materializes with the query's own action and is read
    // twice from cache.
    val occ = documents(s, d)
      .repartition(fanout(s), col("doc_id"))
      .select(col("doc_id"),
        explode(array_distinct(toks(col("text")))).as("term"))
      .localCheckpoint(false)
    val top = occ.groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term")).limit(20)
      .select(col("term"))
    val hits = occ.join(broadcast(top), "term")
    val a = hits.select(col("doc_id"), col("term").as("term_a"))
    val b = hits.select(col("doc_id"), col("term").as("term_b"))
    a.join(b, Seq("doc_id"))
      .filter(col("term_a") < col("term_b"))
      .groupBy("term_a", "term_b")
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Multi-round BPE tokenizer training — the iterative companion to
    * the single candidate-scan `bpeStep`. Returns the learned merge
    * table (step, left, right, freq), the artifact a tokenizer build
    * actually ships.
    *
    * Scale shape: the corpus is scanned ONCE into the distinct-word
    * count table — the classic BPE reduction, after which every round
    * works on VOCABULARY-bounded state, never the corpus. Each round
    * is (a) one explode+sum pair count over that table (map-side
    * combinable), (b) a 1-row TakeOrdered argmax pulled to the driver
    * (the same bounded-collect class as the k-means centroid pull —
    * one row per round, gated by the round count), and (c) a row-local
    * greedy left-to-right merge fold applied to every symbol sequence
    * (codegen `aggregate`, no UDF). State is lazily checkpointed per
    * round so the fold expressions don't nest across rounds and each
    * round's shuffle reads the materialized previous state. At 100 TB
    * the distinct-word table may hold billions of rows — everything
    * here stays distributed except the single argmax row.
    *
    * Greedy semantics (pinned by BpeTrainSpec against an independent
    * in-memory reference): merges apply left-to-right without overlap,
    * so a run `l l l l` under merge (l,l) becomes `ll ll`, and ties on
    * pair frequency break by (left, right) string order. Not
    * SQL-expressible (iterative argmax); rows-only by contract, exact
    * by spec.
    */
  def bpeTrain(s: SparkSession, d: String, rounds: Int = 8): DataFrame = {
    val merges = bpeFit(s, d, rounds)
    import s.implicits._
    // lhs/rhs, not left/right: the comparator re-selects columns by
    // name and LEFT/RIGHT are reserved words in SQL engines
    merges.toDF("step", "lhs", "rhs", "freq")
      .select(col("step").cast("long").as("step"), col("lhs"),
        col("rhs"), col("freq"))
  }

  /** Greedy left-to-right non-overlapping application of merge (a,b)
    * to a symbol array, as a codegen `aggregate` fold (no UDF).
    * Pending-symbol presence is an EXPLICIT boolean field, not a
    * sentinel value: dirty web text can contain any code point
    * (including NUL), so no string is safe to reserve — a sentinel
    * would make the fold silently drop/mangle that symbol while the
    * driver twin and the oracle handle it correctly.
    */
  private def mergeFold(syms: Column, a: String, b: String): Column = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val merged = a + b
    aggregate(
      syms,
      struct(array().cast(ArrayType(StringType)).as("out"),
        lit("").as("pend"), lit(false).as("has")),
      (acc, x) => {
        val hit = acc.getField("has") && acc.getField("pend") === a &&
          x === b
        struct(
          when(hit, array_append(acc.getField("out"), merged))
            .when(acc.getField("has"),
              array_append(acc.getField("out"), acc.getField("pend")))
            .otherwise(acc.getField("out")).as("out"),
          when(hit, lit("")).otherwise(x).as("pend"),
          (!hit).as("has"))
      },
      acc => when(acc.getField("has"),
        array_append(acc.getField("out"), acc.getField("pend")))
        .otherwise(acc.getField("out")))
  }

  /** Word-count budget under which the merge loop solves on the
    * driver. The corpus reduces to the distinct-word count table
    * before ANY training round, so the iteration state is
    * vocabulary-bounded — and when that vocabulary fits the
    * broadcast-build-side memory class (500k words × tens of bytes ≈
    * tens of MB raw; budget driver heap for ~10× that in JVM object
    * form), eight rounds of pair-count → argmax → re-merge are
    * microseconds of array walking instead of ~16 scheduled jobs
    * whose cost is pure job-launch constants. Same discipline as the
    * graph local solves (Dedup.localEdgeBudget): if it is small
    * enough to broadcast it is small enough to solve. Over budget,
    * the unchanged distributed loop runs; both paths are pinned equal
    * by BpeTrainSpec. Overridable via `graft.bpe.localWords`.
    */
  private def localWordBudget(s: SparkSession): Long =
    s.conf.getOption("graft.bpe.localWords")
      .flatMap(_.toLongOption).getOrElse(500000L)

  /** Spark/DuckDB-consistent string primitives for the driver twin:
    * symbols are CODE POINTS (Spark's substring splits by code point —
    * a UTF-16 `map(_.toString)` would halve surrogate pairs into
    * different symbols than the distributed path), and the tie-break
    * order is unsigned UTF-8 BYTES (both engines compare binary UTF-8;
    * Java String `<` is UTF-16 code-unit order, which ranks U+E000..
    * U+FFFF and supplementary-plane characters oppositely).
    */
  private def codePointSyms(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  private[ops] def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Driver-side merge-loop twin of the distributed path: identical
    * contract (all-adjacent pair counts weighted by word count, ties
    * (freq desc, left, right) in UTF-8 byte order, greedy left-to-right
    * non-overlapping application, early stop when no pair remains).
    */
  private[ops] def localBpeMerges(words: Array[(String, Long)], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var state: Array[(Array[String], Long)] =
      words.map { case (w, c) => (codePointSyms(w), c) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      state.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          counts.merge((syms(i), syms(i + 1)), c, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (k, n) =>
          if (best == null || n > best._2 ||
            (n == best._2 && (utf8Less(k._1, best._1._1) ||
              (k._1 == best._1._1 && utf8Less(k._2, best._1._2)))))
            best = (k, n)
        }
        val ((a, b), n) = best
        merges += ((r, a, b, n))
        state = state.map { case (syms, c) =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), c)
        }
        r += 1
      }
    }
    merges.result()
  }

  /** Shared BPE training core: reduces the corpus to the distinct-word
    * count table (the one corpus scan), then learns `rounds` merges —
    * on the driver when the vocabulary fits `localWordBudget`, else
    * via the distributed pair-count/argmax/fold loop. See `bpeTrain`
    * for the scale contract; `bpeEncode` reapplies the merge list
    * row-locally.
    */
  private def bpeFit(s: SparkSession, d: String, rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    val wc = documents(s, d)
      .repartition(fanout(s), col("doc_id"))
      .select(explode(toks(col("text"))).as("w"))
      // drop empty tokens (double spaces): length(w)=0 would trip the
      // same sequence(1, 0) step trap as the pair transform below
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val nWords = wc.count()
    if (nWords <= localWordBudget(s)) {
      return localBpeMerges(
        wc.collect().map(r => (r.getString(0), r.getLong(1))), rounds)
    }
    var cur = wc
      .select(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("syms"), col("cnt"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    for (r <- 1 to rounds if !done) {
      // size guard BEFORE the pair transform: sequence(1, 0) auto-steps
      // to [1, 0] and would fabricate a phantom pair for 1-char words
      val top = cur.filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> struct(syms[i-1] AS a, syms[i] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((r, a, b, n))
        cur = cur.select(mergeFold(col("syms"), a, b).as("syms"), col("cnt"))
          .localCheckpoint(false)
      }
    }
    merges.toSeq
  }

  /** Token bill under the trained tokenizer: train the 8-merge BPE,
    * then re-encode the corpus and report, per source, the whitespace
    * word count, character count, BPE token count, and the milli-
    * precision chars-per-token compression — the number a pipeline
    * reads to price a source's token budget before a run.
    *
    * Scale shape: the merge table is driver-known (≤8 rows from
    * `bpeFit`), so encoding is a ROW-LOCAL composition of the eight
    * greedy folds applied inside the one corpus scan — no join against
    * a vocabulary table (which at 100 TB holds billions of rows and
    * would shuffle the full exploded corpus), no broadcast, no extra
    * shuffle beyond the final partial-aggregated groupBy(source).
    * Integer milli units keep the ratio exact cross-engine; chars ×
    * 1000 stays under 2^63 to ~9e15 corpus characters, and the same
    * unit bound is why milli, not micro, precision.
    */
  def bpeEncode(s: SparkSession, d: String): DataFrame = {
    val merges = bpeFit(s, d, 8)
    val chars = expr(
      "transform(sequence(1, length(w)), i -> substring(w, i, 1))")
    val encoded = merges.foldLeft(chars) { case (c, (_, a, b, _)) =>
      mergeFold(c, a, b)
    }
    documents(s, d)
      .repartition(fanout(s), col("doc_id"))
      .select(col("source"), explode(toks(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .select(col("source"), length(col("w")).cast("long").as("n_chars"),
        size(encoded).cast("long").as("n_bpe"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum("n_chars").as("n_chars"),
        sum("n_bpe").as("n_bpe_tokens"))
      .select(col("source"), col("n_words"), col("n_chars"),
        col("n_bpe_tokens"),
        expr("n_chars * 1000L DIV n_bpe_tokens")
          .as("chars_per_token_milli"))
  }

  /** Tokenizer-vocabulary coverage: derive the top-V corpus vocabulary
    * by occurrence count and report each source's out-of-vocabulary
    * rate — the signal a pipeline reads before committing a tokenizer
    * (a source with high OOV under the candidate vocab will fragment
    * into long byte-fallback sequences and inflate its token bill).
    *
    * Scale shape: the token explode is scanned ONCE into a lazy
    * checkpoint read by both consumers. The vocabulary reduction is a
    * map-side-combinable count keyed on token (vocabulary-bounded, not
    * corpus-bounded) and the top-V cut is `orderBy(...).limit(V)` —
    * Spark's TakeOrdered, a per-partition top-V then a single
    * V·partitions merge, never a global sort of the vocabulary. The
    * V-row vocab then broadcasts back onto the occurrence stream, so
    * the corpus side is one scan + one final per-source aggregation.
    * The OOV rate is an integer micro-unit division (engine-exact),
    * STAGED as two thousand-fold steps (round 14): the direct form
    * `(10^6·n_oov) DIV n_occ` wraps int64 once one source holds
    * > 9.2·10^12 OOV tokens (~40 TB of text — inside the target);
    * `floor(10^6·a/b) = 1000·q + floor(1000·r/b)` with
    * `q = (1000·a) DIV b, r = (1000·a) % b` is the same integer
    * exactly, and every intermediate stays < 2^63 to ~9.2·10^15
    * tokens per source (~37 PB of text). The DuckDB twin mirrors the
    * staged form verbatim (its sum() already promotes to HUGEINT —
    * the exposure was engine-side only).
    * Ties at the V boundary are broken by the token string, so the
    * vocabulary is a deterministic set on both engines.
    */
  def vocabCoverage(s: SparkSession, d: String): DataFrame = {
    val vocabSize = 1000
    val occ = documents(s, d)
      .repartition(fanout(s), col("doc_id"))
      .select(col("source"), explode(toks(col("text"))).as("tk"))
      .localCheckpoint(false)
    val vocab = occ.groupBy("tk").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tk")).limit(vocabSize)
      .select(col("tk"), lit(1L).as("in_v"))
    occ.join(broadcast(vocab), Seq("tk"), "left_outer")
      .groupBy("source")
      .agg(count(lit(1)).as("n_occ"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_micro", expr(
        "1000 * ((1000 * n_oov) DIV n_occ)" +
          " + (1000 * ((1000 * n_oov) % n_occ)) DIV n_occ"))
  }

  /** Intra-document repetition signals — the Gopher/RefinedWeb-class
    * quality filter that the cross-document passes (boilerplate, the
    * dedup family) deliberately do not cover: how much of a document
    * is ITS OWN repeated content. Three standard signals per doc:
    * duplicate-token fraction (1 − type/token ratio), the modal
    * 2-gram's token share (templated text is dominated by one
    * bigram), and the duplicate-trigram-position fraction (the
    * n-gram form of "the same sentence over and over"). High values
    * mark generator loops, scraped navigation, and log spam — the
    * documents a perplexity filter wrongly LIKES because repetition
    * is easy to predict.
    *
    * Shape at 100 TB: every signal is a pure column expression over
    * the token array — raw (non-deduplicated) n-gram transforms,
    * array_distinct counts, and a single sorted-run fold for the
    * modal bigram — so the operator is ONE corpus scan with ZERO
    * shuffle, the MinHash/SimHash cost class. Width: all micro
    * products are per-document magnitudes (10^6·n_toks wraps only
    * past ~9.2·10^12 tokens in ONE document ≈ 37 TB of text in a
    * single row — not a real document), never corpus-scale counts.
    * The DuckDB twin computes the modal bigram relationally
    * (unnest → count → max) — different evaluation, same exact
    * integers, so the micro values hash-match.
    */
  def repetition(s: SparkSession, d: String): DataFrame =
    repetitionOf(documents(s, d))

  /** The signal projection over an explicit documents frame — spec
    * entry point for constructed corpora (RepetitionSpec).
    */
  private[ops] def repetitionOf(docs: DataFrame): DataFrame = {
    // raw n-grams: one string per POSITION (Dedup.ngrams deduplicates,
    // which would erase exactly the multiplicity this operator counts)
    def rawNgrams(t: Column, n: Int): Column =
      when(size(t) >= n, transform(
        sequence(lit(0), size(t) - n),
        i => concat_ws(" ", (1 to n).map(k => element_at(t, i + k)): _*)))
        .otherwise(array().cast("array<string>"))
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_toks"),
        size(array_distinct(col("t"))).cast("long").as("n_dist"),
        rawNgrams(col("t"), 2).as("bg"),
        rawNgrams(col("t"), 3).as("tri"))
    // modal bigram count = longest run in the SORTED bigram array —
    // a row-local fold, no per-doc groupBy shuffle. The zero's
    // prev = "" can never match a real bigram (concat_ws always
    // emits the separator, so every bigram has length ≥ 1).
    val best = aggregate(
      array_sort(col("bg")),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    base
      .withColumn("best", best)
      .withColumn("n_tri", size(col("tri")).cast("long"))
      .withColumn("n_tri_d", size(array_distinct(col("tri"))).cast("long"))
      .select(col("doc_id"), col("n_toks"),
        expr("(1000000 * (n_toks - n_dist)) DIV n_toks")
          .as("dup_token_micro"),
        // overlapping occurrences can cover > n tokens ("a a a": the
        // modal bigram occurs twice over 3 tokens) — cap at 1.0
        expr("least(1000000, (1000000 * 2 * best) DIV n_toks)")
          .as("top_bigram_micro"),
        expr("CASE WHEN n_tri > 0 THEN" +
          " (1000000 * (n_tri - n_tri_d)) DIV n_tri ELSE 0 END")
          .as("dup_trigram_micro"))
  }

  /** Composite corpus pipeline: quality filter → exact dedup
    * (first-doc survivor) → per-language counts — the end-to-end shape
    * of a training-data preparation job, as one declarative plan.
    */
  def corpusPipeline(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    documents(s, d)
      .filter(size(toks(col("text"))) >= 20)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toks(col("text"))).cast("long")).as("n_tokens"))
  }

  /** N-gram novelty / memorization-risk score: the share of a
    * document's distinct word-trigram hashes that no OTHER document
    * carries. Low novelty = the doc is assembled from corpus-common
    * spans (boilerplate, templates, copies — the spans a model would
    * memorize); the complement of the substring-overlap dedup signal,
    * reported per document instead of per pair. Reuses the
    * token-window kernel's deduped (doc, hash) table at W=3: one
    * hash-keyed document-frequency aggregation (map-side combined) +
    * one join back — both linear in total windows, no pair fan-out at
    * all (this is the scale-safe way to ask "how much of this doc is
    * common?" — the pairwise answer needs the capped bucket join).
    * Docs with fewer than 3 tokens carry no windows and drop out, same
    * contract as the substring operator.
    */
  def novelty(s: SparkSession, d: String): DataFrame = {
    val w = graft.ops.Dedup.win(s, d, 3)
    val df = w.groupBy(col("wh")).agg(count(lit(1)).as("docfreq"))
    w.join(df, "wh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("docfreq") > 1L, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("novelty_micro",
        expr("(1000000 * (n_grams - n_shared)) DIV n_grams"))
  }

  /** BM25 ranked retrieval (Robertson/Spärck Jones) for a fixed query
    * term set, in the corpus's exact-rational house style: the idf is
    * the raw odds ratio (N − df + ½)/(df + ½) in integer micro-units
    * rather than its logarithm — ln is monotone, so each term's idf
    * ORDERING is textbook-identical, and dropping the transcendental
    * keeps every score a pure integer expression both engines compute
    * bit-for-bit (the tfidf/lm_score lesson). k1 = 6/5 and b = 3/4 are
    * folded into one integer denominator over the ROUNDED average
    * document length A = round(L/N) (half-up, via the doubled-divisor
    * trick):
    *   sat = tf·(k1+1)/(tf + k1·(1 − b + b·dl/A))
    *       = 22·tf·A / (10·tf·A + 3·A + 9·dl).
    *
    * int64 headroom at the 100 TB target (the round-12 form multiplied
    * tf by the UNBOUNDED corpus total L per row — 10^6·44·tf·L blows
    * 2^63 once L reaches ~2·10^11 tokens, a few hundred GB of text;
    * dividing L/N out replaces the corpus-scale factor with the
    * corpus-INVARIANT average, so per-row products depend only on
    * per-doc magnitudes):
    *   - avgdl: 2·L + N < 2^63 holds to L ≈ 4.6·10^18 tokens (~18 EB
    *     of text — two orders past the target), and the value entering
    *     sat is CAPPED at 10^4 (web-scale prose averages are two
    *     orders below; a corpus whose average document tops 10^4
    *     tokens saturates the length normalization — the same
    *     deterministic `least` both engines compute);
    *   - sat: tf entering sat is CAPPED at 10^6 (BM25's tf term is
    *     asymptotically flat — at tf = 10^6 sat is within 1e-5 of its
    *     k1+1 ceiling, so the cap is semantically invisible), giving
    *     the PROVEN bound 10^6·22·tf_c·A_c ≤ 2.2·10^17 < 2^63 with no
    *     prose assumption left (the round-13 form relied on an
    *     undocumented avgdl ≤ 10^4 domain bound);
    *   - idf: 2·10^6·(2N+1) < 2^63 holds to N ≈ 2.3·10^12 docs
    *     (~10 KB/doc ⇒ 10^10 docs at 100 TB — 200× headroom);
    *   - product: idf_micro is CAPPED at 4·10^12 (an odds ratio of
    *     4·10^6 — terms rarer than 1-in-4M docs saturate; beyond that
    *     rarity idf dwarfs the tf term anyway and the cap is the same
    *     deterministic integer both engines compute), so
    *     cap · sat_max = 4·10^12 · 2.2·10^6 = 8.8·10^18 < 2^63.
    *
    * Plan shape: per-doc tf/dl are array expressions straight off the
    * text column — ONE corpus scan, no explode, no shuffle; the global
    * (L, N, df_t) aggregate is one combinable pass broadcast back as a
    * single row; top-k is a TakeOrdered under a total order. At 100 TB
    * this is scan-bandwidth-bound with a constant-size driver state —
    * the best possible shape for scoring.
    */
  private val bm25Terms = Seq("spark", "join", "hash")

  /** avgdl derivation over the global (len_total, n_docs) row: half-up
    * rounded mean document length via the doubled-divisor trick,
    * CAPPED at 10^4 so the per-row sat products keep their proven
    * int64 bound on any corpus (see bm25's headroom argument; the
    * DuckDB twin mirrors it with `//`). Exposed private[ops] so
    * WidthAuditSpec can evaluate the DERIVATION at long-document and
    * exabyte-count literals the fixtures cannot reach.
    */
  private[ops] val avgdlSql: String =
    "least((2 * len_total + n_docs) DIV (2 * n_docs), 10000)"

  /** One term's integer BM25 score over columns (tf_t, df_t, n_docs,
    * avgdl, dl) — idf_micro rounds half-up via the doubled-divisor
    * trick and is capped for int64 headroom (see bm25's Scaladoc); tf
    * is capped where sat is already flat; sat's floor DIV loses < 1
    * micro-unit — all engine-exact integers, mirrored in bm25Sql.
    * Exposed private[ops] so WidthAuditSpec can evaluate it at
    * overflow-regime literals the fixtures cannot reach.
    */
  private[ops] def bm25TermScoreSql(t: String): String =
    s"""CASE WHEN tf_$t > 0 THEN
      (least(
         (2 * 1000000 * (2 * n_docs - 2 * df_$t + 1) + (2 * df_$t + 1))
           DIV (2 * (2 * df_$t + 1)),
         4000000000000)
        * ((1000000 * 22 * least(tf_$t, 1000000) * avgdl)
          DIV (10 * least(tf_$t, 1000000) * avgdl + 3 * avgdl + 9 * dl)))
        DIV 1000000
      ELSE 0 END"""

  def bm25(s: SparkSession, d: String): DataFrame = {
    val perDoc = documents(s, d).select(
      col("doc_id") +:
      size(toks(col("text"))).cast("long").as("dl") +:
      bm25Terms.map(t =>
        size(filter(toks(col("text")), x => x === t)).cast("long")
          .as(s"tf_$t")): _*)
    val globCols = sum(col("dl")).as("len_total") +:
      count(lit(1)).as("n_docs") +:
      bm25Terms.map(t =>
        sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val glob = perDoc.agg(globCols.head, globCols.tail: _*)
      .withColumn("avgdl", expr(avgdlSql))
    val termScore = bm25Terms.map(t => expr(bm25TermScoreSql(t)))
      .reduce(_ + _)
    perDoc.join(broadcast(glob))
      .withColumn("score_micro", termScore)
      .filter(col("score_micro") > 0)
      .select(col("doc_id"), col("dl"), col("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_bm25" -> (bm25 _),
    "q_text_novelty" -> (novelty _),
    "q_text_chunks" -> (chunk _),
    "q_text_cooc" -> (cooccurrence _),
    "q_text_lm_score" -> (lmScore _),
    "q_text_stats" -> (textStats _),
    "q_text_langid" -> (langId _),
    "q_text_fingerprint" -> (fingerprint _),
    "q_text_tokens" -> (tokenCount _),
    "q_text_tfidf" -> (tfidf _),
    "q_text_heavyhitters" -> (heavyHitters _),
    "q_text_postings" -> (postings _),
    "q_text_bigram_lm" -> (bigramLm _),
    "q_text_bpe_step" -> (bpeStep _),
    "q_text_bpe_train" -> ((s: SparkSession, d: String) => bpeTrain(s, d)),
    "q_text_bpe_encode" -> (bpeEncode _),
    "q_text_diversity" -> (diversity _),
    "q_text_vocab_oov" -> (vocabCoverage _),
    "q_text_repetition" -> (repetition _),
    "q_pipeline_corpus" -> (corpusPipeline _),
  )

  /** DuckDB twin of `bm25` — object-level so the hybrid-retrieval
    * oracle (Similarity) can compose it as a parenthesized subquery.
    */
  private[ops] val bm25Sql: String = {
    val perdocCols = bm25Terms.map(t =>
      s"len(list_filter(str_split(text, ' '), x -> x = '$t'))::BIGINT AS tf_$t")
      .mkString(", ")
    val dfCols = bm25Terms.map(t =>
      s"sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END)::BIGINT AS df_$t")
      .mkString(", ")
    val score = bm25Terms.map(t =>
      s"""(CASE WHEN tf_$t > 0 THEN
         |  (least(
         |     (2 * 1000000 * (2 * n_docs - 2 * df_$t + 1) + (2 * df_$t + 1))
         |       // (2 * (2 * df_$t + 1)),
         |     4000000000000)
         |    * ((1000000 * 22 * least(tf_$t, 1000000) * avgdl)
         |      // (10 * least(tf_$t, 1000000) * avgdl + 3 * avgdl + 9 * dl)))
         |    // 1000000
         |  ELSE 0 END)""".stripMargin).mkString(" + ")
    s"""WITH perdoc AS (
       |  SELECT doc_id, len(str_split(text, ' '))::BIGINT AS dl, $perdocCols
       |  FROM documents),
       |totals0 AS (
       |  SELECT sum(dl)::BIGINT AS len_total, count(*)::BIGINT AS n_docs,
       |    $dfCols
       |  FROM perdoc),
       |totals AS (
       |  SELECT *,
       |    least((2 * len_total + n_docs) // (2 * n_docs), 10000) AS avgdl
       |  FROM totals0)
       |SELECT doc_id, dl, score_micro FROM (
       |  SELECT doc_id, dl, $score AS score_micro FROM perdoc, totals) s
       |WHERE score_micro > 0
       |ORDER BY score_micro DESC, doc_id
       |LIMIT 20""".stripMargin
  }

  private def hitsSql(words: Seq[String]): String =
    s"len(list_filter(t, x -> x IN (${words.map(w => s"'$w'").mkString(",")})))"

  /** DuckDB oracle for the iterative BPE trainer, unrolled to `rounds`
    * CTE stages. The greedy left-to-right non-overlapping merge has a
    * closed form over the exploded (word, pos, sym) table: within each
    * maximal run of CONSECUTIVE pair-match positions (stride-1 runs
    * only arise when left == right), greedy picks the alternating
    * positions starting at the run head — a gaps-and-islands window,
    * no recursion needed. Each stage is pair-count → 1-row argmax
    * (ties (freq desc, left, right)) → islands merge → renumber; an
    * exhausted round has an empty `top` CTE, and the LEFT JOIN carries
    * the state through unchanged — the same early stop as the
    * operator's driver loop. Generated programmatically because the
    * eight stages are textually identical up to the index; the shared
    * prefix also feeds the `bpeEncodeOracle` re-tokenization.
    */
  private def bpeStages(rounds: Int): String = {
    val base =
      """WITH words AS (
        |  SELECT w, count(*)::BIGINT AS cnt FROM (
        |    SELECT unnest(str_split(text, ' ')) AS w FROM documents) x
        |  WHERE length(w) >= 1 GROUP BY w),
        |pos1 AS (
        |  SELECT w AS word_id, cnt, unnest(range(1, length(w) + 1)) AS pos
        |  FROM words),
        |st1 AS (
        |  SELECT word_id, cnt, pos, substr(word_id, pos::INT, 1) AS sym
        |  FROM pos1)""".stripMargin
    val stages = (1 to rounds).map { k =>
      s"""adj$k AS (
         |  SELECT word_id, cnt, pos, sym,
         |    lead(sym) OVER (PARTITION BY word_id ORDER BY pos) AS nxt
         |  FROM st$k),
         |top$k AS (
         |  SELECT sym AS a, nxt AS b, sum(cnt)::BIGINT AS n
         |  FROM adj$k WHERE nxt IS NOT NULL GROUP BY 1, 2
         |  ORDER BY n DESC, a, b LIMIT 1),
         |mrk$k AS (
         |  SELECT j.word_id, j.cnt, j.pos, j.sym, t.a, t.b,
         |    coalesce(j.sym = t.a AND j.nxt = t.b, FALSE) AS m
         |  FROM adj$k j LEFT JOIN top$k t ON TRUE),
         |run$k AS (
         |  SELECT *, CASE WHEN m THEN pos - ROW_NUMBER()
         |    OVER (PARTITION BY word_id, m ORDER BY pos) END AS grp
         |  FROM mrk$k),
         |ms$k AS (
         |  SELECT *, m AND (pos - MIN(pos)
         |    OVER (PARTITION BY word_id, grp)) % 2 = 0 AS ms
         |  FROM run$k),
         |st${k + 1} AS (
         |  SELECT word_id, cnt,
         |    ROW_NUMBER() OVER (PARTITION BY word_id ORDER BY pos) AS pos,
         |    CASE WHEN ms THEN a || b ELSE sym END AS sym
         |  FROM (SELECT *, coalesce(lag(ms)
         |      OVER (PARTITION BY word_id ORDER BY pos), FALSE) AS consumed
         |    FROM ms$k) WHERE NOT consumed)""".stripMargin
    }
    (base +: stages).mkString(",\n")
  }

  private def bpeTrainOracle(rounds: Int): String = {
    val union = (1 to rounds).map { k =>
      s"""SELECT $k::BIGINT AS step, a AS lhs, b AS rhs, n AS freq FROM top$k"""
    }.mkString("\nUNION ALL\n")
    bpeStages(rounds) + "\n" + union
  }

  /** Re-tokenization oracle: the trained state st{rounds+1} holds each
    * word's final symbol rows, so per-word token count is a count per
    * word_id, probed from the re-exploded corpus. Sums cast to BIGINT
    * (uncast DuckDB sums are HUGEINT and hash differently).
    */
  private def bpeEncodeOracle(rounds: Int): String =
    bpeStages(rounds) +
      s""",
         |enc AS (
         |  SELECT word_id, count(*)::BIGINT AS n_bpe
         |  FROM st${rounds + 1} GROUP BY word_id),
         |tok AS (
         |  SELECT source, unnest(str_split(text, ' ')) AS w FROM documents)
         |SELECT t.source, count(*)::BIGINT AS n_words,
         |  sum(length(t.w))::BIGINT AS n_chars,
         |  sum(e.n_bpe)::BIGINT AS n_bpe_tokens,
         |  (sum(length(t.w))::BIGINT * 1000
         |    // sum(e.n_bpe)::BIGINT)::BIGINT AS chars_per_token_milli
         |FROM tok t JOIN enc e ON t.w = e.word_id
         |WHERE length(t.w) >= 1
         |GROUP BY t.source""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_text_bm25" -> bm25Sql,
    // same md5 window hashing + tokenization contract as
    // q_dedup_substring, at W=3; the md5 strings and the 64-bit kernel
    // hashes only meet through counts, so either side may hash its own
    // way as long as both are collision-free on the corpus
    "q_text_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> len(t) > 0) AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |win AS (
        |  SELECT DISTINCT doc_id, wh FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, greatest(len(tk) - 2, 0) + 1),
        |        i -> md5(array_to_string(tk[i : i + 2], ' ')))) AS wh
        |    FROM toks WHERE len(tk) >= 3) u),
        |df AS (SELECT wh, count(*) AS docfreq FROM win GROUP BY wh)
        |SELECT doc_id, n_grams, n_shared,
        |  (1000000 * (n_grams - n_shared)) // n_grams AS novelty_micro
        |FROM (
        |  SELECT w.doc_id, count(*)::BIGINT AS n_grams,
        |    sum(CASE WHEN df.docfreq > 1 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_shared
        |  FROM win w JOIN df USING (wh) GROUP BY w.doc_id) t""".stripMargin,
    "q_text_bpe_train" -> bpeTrainOracle(8),
    "q_text_bpe_encode" -> bpeEncodeOracle(8),
    "q_text_vocab_oov" ->
      """WITH tok AS (
        |  SELECT source, unnest(str_split(text, ' ')) AS tk FROM documents),
        |v AS (SELECT tk, 1 AS in_v FROM (
        |  SELECT tk, count(*) AS c FROM tok GROUP BY 1
        |  ORDER BY c DESC, tk LIMIT 1000))
        |SELECT source, n_occ, n_oov,
        |  (1000 * ((1000 * n_oov) // n_occ)
        |    + (1000 * ((1000 * n_oov) % n_occ)) // n_occ)::BIGINT
        |    AS oov_micro
        |FROM (
        |  SELECT source, count(*)::BIGINT AS n_occ,
        |    sum(CASE WHEN v.in_v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
        |  FROM tok LEFT JOIN v USING (tk)
        |  GROUP BY source) g""".stripMargin,
    "q_pipeline_corpus" ->
      """SELECT lang, count(*) AS n_docs,
        |  sum(len(str_split(text, ' ')))::BIGINT AS n_tokens
        |FROM (
        |  SELECT lang, text,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents WHERE len(str_split(text, ' ')) >= 20) t
        |WHERE rn = 1 GROUP BY 1""".stripMargin,
    "q_text_stats" ->
      s"""SELECT doc_id, len(t)::BIGINT AS n_tokens,
         |  round((length(text) - (len(t) - 1))::DOUBLE / len(t), 6) AS avg_token_len,
         |  round(${hitsSql(stop("en"))}::DOUBLE / len(t), 6) AS stopword_ratio,
         |  CASE WHEN length(text) > 0 THEN
         |    round(length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE / length(text), 6)
         |  END AS digit_ratio
         |FROM (SELECT doc_id, text, str_split(text, ' ') AS t FROM documents) x""".stripMargin,
    "q_text_langid" ->
      s"""SELECT lang, predicted, count(*) AS n FROM (
         |  SELECT lang,
         |    CASE WHEN ${hitsSql(stop("en"))} >= ${hitsSql(stop("de"))}
         |          AND ${hitsSql(stop("en"))} >= ${hitsSql(stop("es"))}
         |          AND ${hitsSql(stop("en"))} >= ${hitsSql(stop("fr"))}
         |          AND ${hitsSql(stop("en"))} > 0 THEN 'en'
         |         WHEN ${hitsSql(stop("de"))} >= ${hitsSql(stop("es"))}
         |          AND ${hitsSql(stop("de"))} >= ${hitsSql(stop("fr"))}
         |          AND ${hitsSql(stop("de"))} > 0 THEN 'de'
         |         WHEN ${hitsSql(stop("es"))} >= ${hitsSql(stop("fr"))}
         |          AND ${hitsSql(stop("es"))} > 0 THEN 'es'
         |         WHEN ${hitsSql(stop("fr"))} > 0 THEN 'fr'
         |         ELSE 'unk' END AS predicted
         |  FROM (SELECT lang, str_split(text, ' ') AS t FROM documents) x) y
         |GROUP BY 1, 2""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(str_split(text, ' '))), ' ')) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS n
        |FROM documents GROUP BY 1""".stripMargin,
    "q_text_tokens" ->
      """SELECT doc_id, len(str_split(text, ' '))::BIGINT AS ws_tokens,
        |  (length(text) + 3) // 4 AS bpe_est
        |FROM documents""".stripMargin,
    "q_text_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS term
        |        FROM documents) x
        |  GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |tot AS (SELECT count(*) AS n_total FROM documents)
        |SELECT doc_id, term, tf, df, rk FROM (
        |  SELECT doc_id, term, tf, df,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY (tf * n_total / df) DESC, term) AS rk
        |  FROM tf JOIN df USING (term) CROSS JOIN tot) y
        |WHERE rk <= 3""".stripMargin,
    "q_text_heavyhitters" ->
      """SELECT term, count(*) AS n
        |FROM (SELECT unnest(str_split(text, ' ')) AS term FROM documents) x
        |GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin,
    "q_text_bigram_lm" ->
      s"""WITH t AS (SELECT str_split(text, ' ') AS t FROM documents
        |           WHERE len(str_split(text, ' ')) >= 2),
        |pairs AS (
        |  SELECT t[i] AS w1, t[i+1] AS w2
        |  FROM (SELECT t, generate_subscripts(t, 1) AS i FROM t) z
        |  WHERE i < len(t)),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1)
        |SELECT c12.w1, c12.w2, c12.c12,
        |  ${pMicroStaged("c12.c12", "c1.c1", "//")}::BIGINT AS p_micro
        |FROM c12 JOIN c1 USING (w1) WHERE c12.c12 >= 5""".stripMargin,
    "q_text_cooc" ->
      """WITH occ AS (
        |  SELECT DISTINCT doc_id, unnest(list_distinct(str_split(text, ' ')))
        |    AS term
        |  FROM documents),
        |top AS (
        |  SELECT term FROM occ GROUP BY term
        |  ORDER BY count(*) DESC, term LIMIT 20),
        |hits AS (SELECT occ.* FROM occ JOIN top USING (term))
        |SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_docs
        |FROM hits a JOIN hits b
        |  ON a.doc_id = b.doc_id AND a.term < b.term
        |GROUP BY 1, 2""".stripMargin,
    "q_text_chunks" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
        |x AS (SELECT doc_id, t,
        |        unnest(range(((len(t) - 1) // 24) + 1)) AS chunk_idx
        |      FROM t)
        |SELECT doc_id, chunk_idx,
        |  len(t[(chunk_idx*24 + 1):(chunk_idx*24 + 32)]) AS n_tokens,
        |  md5(array_to_string(t[(chunk_idx*24 + 1):(chunk_idx*24 + 32)], ' '))
        |    AS chunk_hash
        |FROM x""".stripMargin,
    "q_text_lm_score" ->
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents
        |           WHERE len(str_split(text, ' ')) >= 2),
        |pairs AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM (SELECT doc_id, t, generate_subscripts(t, 1) AS i FROM t) z
        |  WHERE i < len(t)),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1),
        |lm AS (
        |  SELECT c12.w1, c12.w2,
        |    ${pMicroStaged("c12.c12", "c1.c1", "//")}::BIGINT AS p_micro
        |  FROM c12 JOIN c1 USING (w1) WHERE c12.c12 >= 5),
        |sc AS (
        |  SELECT p.doc_id, count(*) AS n_bigrams,
        |    count(*) FILTER (lm.p_micro IS NULL) AS n_oov,
        |    sum(COALESCE(lm.p_micro, 0))::BIGINT AS score_micro
        |  FROM pairs p LEFT JOIN lm USING (w1, w2)
        |  GROUP BY p.doc_id)
        |SELECT doc_id, n_bigrams, n_oov, score_micro,
        |  (score_micro // n_bigrams)::BIGINT AS avg_micro
        |FROM sc""".stripMargin,
    "q_text_bpe_step" ->
      """SELECT pair, count(*) AS n FROM (
        |  SELECT unnest(list_transform(range(1, length(w)),
        |    i -> substr(w, i::INT, 2))) AS pair
        |  FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents) x
        |  WHERE length(w) >= 2) y
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    // the modal bigram is computed relationally (unnest → count →
    // max) where the engine uses a row-local sorted-run fold — same
    // exact integers either way; bigrams/trigrams are raw (one per
    // position), tokens are the plain space split both engines share
    "q_text_repetition" ->
      """WITH base AS (
        |  SELECT doc_id, str_split(text, ' ') AS t FROM documents
        |  WHERE text IS NOT NULL AND len(str_split(text, ' ')) >= 1),
        |tok AS (
        |  SELECT doc_id, len(t)::BIGINT AS n,
        |    len(list_distinct(t))::BIGINT AS nd
        |  FROM base),
        |bg AS (
        |  SELECT doc_id, max(c)::BIGINT AS best FROM (
        |    SELECT doc_id, g, count(*) AS c FROM (
        |      SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
        |      FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |            FROM base) z) u
        |    GROUP BY doc_id, g) q
        |  GROUP BY doc_id),
        |tri AS (
        |  SELECT doc_id,
        |    greatest(len(t) - 2, 0)::BIGINT AS n_tri,
        |    len(list_distinct(list_transform(
        |      range(1, greatest(len(t) - 2, 0) + 1),
        |      i -> array_to_string(t[i:i+2], ' '))))::BIGINT AS n_tri_d
        |  FROM base)
        |SELECT tok.doc_id, n AS n_toks,
        |  ((1000000 * (n - nd)) // n)::BIGINT AS dup_token_micro,
        |  least(1000000,
        |    (1000000 * 2 * coalesce(best, 0)) // n)::BIGINT
        |    AS top_bigram_micro,
        |  (CASE WHEN n_tri > 0
        |     THEN (1000000 * (n_tri - n_tri_d)) // n_tri
        |     ELSE 0 END)::BIGINT AS dup_trigram_micro
        |FROM tok LEFT JOIN bg USING (doc_id) JOIN tri USING (doc_id)""".stripMargin,
    "q_text_diversity" ->
      """WITH c AS (
        |  SELECT lang, term, count(*) AS c
        |  FROM (SELECT lang, unnest(str_split(text, ' ')) AS term
        |        FROM documents) x
        |  GROUP BY 1, 2),
        |g AS (SELECT lang, sum(c)::BIGINT AS n_tokens,
        |             count(*) AS n_terms,
        |             sum(c::HUGEINT * c) AS sum_c2
        |      FROM c GROUP BY lang)
        |SELECT lang, n_tokens, n_terms,
        |  CAST(round((1.0 - sum_c2::DOUBLE
        |      / (n_tokens::DOUBLE * n_tokens::DOUBLE))
        |    * 1000000.0) AS BIGINT) AS simpson_micro
        |FROM g""".stripMargin,
    "q_text_postings" ->
      """WITH pairs AS (
        |  SELECT DISTINCT doc_id, term
        |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS term
        |        FROM documents) x)
        |SELECT term, count(*) AS df,
        |  array_to_string(list_sort(list(doc_id))[1:20], ',') AS postings
        |FROM pairs GROUP BY term""".stripMargin,
  )
}
