package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{functions => gf}

/** Text-analysis operators for a training-data pipeline over a `documents`
  * table (`doc_id, text, lang, source, n_chars`). Everything is built from
  * codegen'd `org.apache.spark.sql.functions` (no UDFs): a single narrow
  * projection pass per document, embarrassingly parallel at any scale.
  */
object TextAnalysis {

  /** Token counting — whitespace tokens plus a BPE-ish subword estimate
    * (word chunks + digit runs + punctuation, each ≈ one token; long words
    * contribute ceil(len/4) subword tokens, the usual rule of thumb).
    */
  def tokenStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val ws = gf.ws_tokens(t)
    df.withColumn("n_ws_tokens", size(ws))
      .withColumn("n_bpe_tokens",
        aggregate(
          transform(ws, w => ceil(length(w) / lit(4.0)).cast("long")),
          lit(0L), (acc, x) => acc + x))
  }

  /** Quality signals: length, word stats, punctuation/digit/upper ratios,
    * stopword ratio, plus a composite [0,1] score. All ratios are computed
    * against character / token counts of the same row — no shuffle.
    */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("double")
    val toks = gf.ws_tokens(t)
    val nToks = size(toks).cast("double")
    val punct = (nChars - length(regexp_replace(t, "[\\p{Punct}]", ""))) / greatest(nChars, lit(1.0))
    val digits = (nChars - length(regexp_replace(t, "[0-9]", ""))) / greatest(nChars, lit(1.0))
    val uppers = (nChars - length(regexp_replace(t, "[A-Z]", ""))) / greatest(nChars, lit(1.0))
    val stop = size(filter(toks, w => w.isin(Stopwords.en: _*))).cast("double") /
      greatest(nToks, lit(1.0))
    val avgWord = nChars / greatest(nToks, lit(1.0))
    // composite: reward stopword presence and sane word length, punish
    // punctuation/digit noise — the standard Gopher/C4-style heuristics.
    val score =
      when(nToks < 5, lit(0.0)).otherwise(
        greatest(lit(0.0), least(lit(1.0),
          lit(0.4) * least(stop * 4, lit(1.0)) +
          lit(0.3) * when(avgWord.between(3, 12), 1.0).otherwise(0.0) +
          lit(0.3) * (lit(1.0) - least(punct * 5 + digits * 5, lit(1.0))))))
    df.withColumn("n_tokens", nToks.cast("long"))
      .withColumn("punct_ratio", round(punct, 6))
      .withColumn("digit_ratio", round(digits, 6))
      .withColumn("upper_ratio", round(uppers, 6))
      .withColumn("stopword_ratio", round(stop, 6))
      .withColumn("avg_word_len", round(avgWord, 6))
      .withColumn("quality", round(score, 6))
  }

  /** Language ID via stopword-profile overlap: score(lang) = |tokens ∩
    * profile(lang)| / |tokens|, argmax wins, "und" when nothing matches.
    * The n-gram-free variant of the classic Cavnar-Trenkle n-gram
    * profiling; entirely expression-based (array_intersect against literal
    * arrays), so it runs inside whole-stage codegen.
    */
  def languageId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = array_distinct(gf.ws_tokens(col(textCol)))
    val scored = Stopwords.profiles.map { case (lang, words) =>
      struct(
        (size(array_intersect(toks, array(words.map(lit): _*))).cast("double") /
          greatest(size(toks), lit(1)).cast("double")).as("score"),
        lit(lang).as("lang"))
    }
    df.withColumn("lang_scores", array(scored.toSeq: _*))
      .withColumn("best", array_max(col("lang_scores")))
      .withColumn("pred_lang",
        when(col("best.score") > 0.02, col("best.lang")).otherwise(lit("und")))
      .withColumn("pred_score", round(col("best.score"), 6))
      .drop("lang_scores", "best")
  }

  /** Document fingerprinting: 64-bit rolling-hash min-sample of the raw
    * text (see [[graft.functions.kernels.RollingMinHash]]) + a full-text
    * xxhash64 for exact identity.
    */
  def fingerprints(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("exact_hash", xxhash64(col(textCol)))
      .withColumn("fingerprint", gf.doc_fingerprint(col(textCol), 16))
      .withColumn("simhash", gf.simhash64(gf.ws_tokens(col(textCol))))

  /** Corpus vocabulary: global token frequencies, top `k` by
    * (count desc, token asc). Tokens are the same whitespace tokens every
    * other text operator uses. Scale: the explode feeds a hash aggregate
    * with map-side partial combine, so only the VOCABULARY (not the token
    * stream) crosses the shuffle; the top-k plans as
    * `TakeOrderedAndProject` — k rows per partition reach the driver,
    * never a globally sorted corpus.
    */
  def topTokens(df: DataFrame, k: Int, textCol: String = "text"): DataFrame =
    df.select(explode(gf.ws_tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** Approximate heavy-hitter tokens at relative frequency > `support`
    * via Spark's one-pass frequent-items sketch (the Karp-Papadimitriou-
    * Shenker counter family): GUARANTEED to include every token above
    * support (no false negatives), may include some below it. Unlike
    * [[topTokens]] this never ranks the full vocabulary — per-partition
    * state is O(1/support) counters regardless of corpus size, which is
    * the right shape when the vocabulary itself is huge (URLs, hashes,
    * n-grams) and only the dominating items matter.
    */
  def heavyHitterTokens(df: DataFrame, support: Double,
                        textCol: String = "text"): Seq[String] =
    df.select(explode(gf.ws_tokens(col(textCol))).as("token"))
      .stat.freqItems(Seq("token"), support)
      .head().getSeq[String](0)

  /** Corpus-self-trained bigram LM typicality — the model-based quality
    * signal (a lightweight stand-in for LM-perplexity filtering): train an
    * add-k-smoothed bigram model ON the corpus itself (bigram + unigram
    * counts, two map-side-combined aggregates), then score every document
    * by its mean smoothed bigram probability `(c12+k)/(c1+k·V)`. Low
    * scores = atypical phrasing (garbled text, boilerplate soup); high =
    * phrasing the corpus has seen a lot.
    *
    * Engine-portable by construction: each per-bigram probability is
    * quantized to integer micro-units — `floor(1e6·p)` — before the
    * per-doc aggregate, so the sum is exact integer arithmetic (only
    * correctly-rounded IEEE ops feed the floor: +, /, ×), never an
    * order-dependent float sum; the reported score stays in integer
    * micro-units (`floor(mean)`) because rounding a DECIMAL
    * representation sits on half-way boundaries that Spark (HALF_UP on
    * the shortest decimal) and other engines (double rounding) resolve
    * differently. Docs with < 2 tokens have no bigram events and are
    * excluded.
    *
    * Scale shape: the model tables are vocabulary-sized (broadcast-able
    * under AQE when small); the token stream shuffles once per count and
    * once per probability join — the inherent cost of exact counting.
    * Returns (idCol, n_bigrams, typicality).
    */
  def lmTypicality(df: DataFrame, k: Double = 0.5, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val toks = df.select(col(idCol).as("id"), gf.ws_tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= 2)
    val uni = toks.select(explode(col("tk")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val big = toks.select(col("id"), explode(gf.shingles(col("tk"), 2)).as("bg"))
    val cb = big.groupBy("bg").agg(count(lit(1)).as("c12"))
    // |V| rides the plan as a broadcast 1-row aggregate — the former
    // count() action re-ran the tokenize pass that the final plan then
    // computed again. k·|V| is the same IEEE double product either way.
    val vstats = uni.agg(count(lit(1)).as("__v"))
    big.join(cb, Seq("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vstats))
      .withColumn("micro",
        floor(lit(1e6) * (col("c12") + lit(k)) / (col("c1") + lit(k) * col("__v")))
          .cast("long"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        floor(sum(col("micro")) / count(lit(1))).cast("long").as("typicality_micro"))
  }

  /** Stupid-Backoff trigram LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — THE distributed-LM recipe:
    * raw relative frequencies with a fixed backoff factor instead of
    * normalized discounting, because at corpus scale the counts ARE the
    * model). A reference model is trained as three count tables over
    * `train` (unigram/bigram/trigram, each one map-side-combined
    * aggregate); every position of every `score` document then looks up
    * its deepest available n-gram:
    *
    * {{{
    *   S(w | w2 w1) = c3(w2 w1 w) / c2(w2 w1)           if c3 > 0
    *                = 0.4  · c2(w1 w) / c1(w1)           else if c2 > 0
    *                = 0.16 · (c1(w) + 1) / (N + V)       else (add-one floor,
    *                                                       also covers OOV)
    * }}}
    *
    * Unlike [[lmTypicality]] (self-trained bigram), train and score are
    * DIFFERENT frames — the held-out shape real pipelines use for
    * perplexity filtering — so backoff genuinely fires on unseen n-grams.
    *
    * Engine-portable like lmTypicality: every branch is correctly-rounded
    * IEEE ops (integer-to-double division, one multiply by a literal) fed
    * to `floor(1e9·S)`, and per-doc totals are exact integer sums of
    * those nano-units — no transcendentals, no order-dependent float
    * accumulation, so an independent SQL engine reproduces scores bit for
    * bit. (A production variant would report `ln S` sums; the monotone
    * per-position transform is the only difference.)
    *
    * Scale shape: count tables shuffle on 8-byte gram hashes at corpus
    * scale (strings here for oracle parity); the scored position stream
    * joins each count table once — five hash joins, all map-side
    * prunable by Bloom under AQE; the per-doc aggregate is the only
    * position-stream shuffle. Returns (idCol, n_trigrams, sb_nano) where
    * sb_nano = floor(mean position score in nano-units).
    */
  def stupidBackoffScore(train: DataFrame, score: DataFrame,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    def toks(df: DataFrame) = df
      .select(col(idCol), gf.ws_tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 3)
    val tr = toks(train)
    val uni = tr.select(explode(col("__tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val big = tr.select(explode(gf.shingles(col("__tk"), 2)).as("g2"))
      .groupBy("g2").agg(count(lit(1)).as("c2"))
    val tri = tr.select(explode(gf.shingles(col("__tk"), 3)).as("g3"))
      .groupBy("g3").agg(count(lit(1)).as("c3"))
    // the unigram-floor scalars ride the plan as a broadcast 1-row
    // aggregate instead of a head() probe: the probe was its own action
    // (a full train tokenize pass) and the final plan recomputed the
    // unigram table anyway — fully lazy now, one pass, same arithmetic
    val floorStats = uni.agg(sum(col("c1")).as("__nt"), count(lit(1)).as("__v"))
    val pos = toks(score)
      .select(col(idCol), explode(gf.shingles(col("__tk"), 3)).as("g3"))
      .withColumn("__p", split(col("g3"), " "))
      .withColumn("w2", col("__p").getItem(0))
      .withColumn("w1", col("__p").getItem(1))
      .withColumn("w", col("__p").getItem(2))
      .withColumn("g2", concat_ws(" ", col("w1"), col("w")))
      .withColumn("ctx2", concat_ws(" ", col("w2"), col("w1")))
      .drop("__p")
    val s = pos
      .join(tri, Seq("g3"), "left")
      .join(big, Seq("g2"), "left")
      .join(big.toDF("ctx2", "c2ctx"), Seq("ctx2"), "left")
      .join(uni, Seq("w"), "left")
      .join(uni.toDF("w1", "c1ctx"), Seq("w1"), "left")
      .crossJoin(broadcast(floorStats))
      .withColumn("__s",
        when(col("c3").isNotNull, col("c3") / col("c2ctx"))
          .when(col("c2").isNotNull, lit(0.4) * (col("c2") / col("c1ctx")))
          .otherwise(lit(0.16) *
            ((coalesce(col("c1"), lit(0L)) + 1L) / (col("__nt") + col("__v")))))
      .withColumn("__nano", floor(lit(1e9) * col("__s")).cast("long"))
    s.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        floor(sum(col("__nano")) / count(lit(1)).cast("double"))
          .cast("long").as("sb_nano"))
  }

  /** CCNet-style language-model quality bucketing (Wenzek et al. 2020,
    * `ccnet`): score the corpus with the train-split Stupid-Backoff LM
    * ([[stupidBackoffScore]] — integer nano-units, engine-exact), then
    * split EACH LANGUAGE at its own score terciles into `head` (most
    * LM-typical), `middle`, `tail` — the buckets CCNet materializes so
    * downstream consumers can choose their quality/recall trade-off
    * per language.
    *
    * Scale shape: the cutoffs are exact discrete percentiles computed
    * by a BOUNDED aggregate (one row per language) and broadcast back
    * for the bucket assignment — never a per-language global sort or a
    * single-partition window. A language's whole corpus never
    * concentrates on one task.
    */
  def pplBuckets(train: DataFrame, score: DataFrame,
                 idCol: String = "doc_id", textCol: String = "text",
                 langCol: String = "lang"): DataFrame = {
    // materialize the LM scoring pass ONCE: it (tokenize + three n-gram
    // count aggregates + five-way join) feeds BOTH the cutoff aggregate
    // and the final bucket join — without a checkpoint the second
    // consumer would recompute the whole pass whenever the physical
    // plans diverge (exchange reuse is an optimization, not a contract).
    // The checkpointed table is narrow (id, counts, lang) and its blocks
    // free when the plan is dropped — no unpersist bookkeeping.
    val scored = stupidBackoffScore(train, score, idCol, textCol)
      .join(score.select(col(idCol), col(langCol)), Seq(idCol))
      .localCheckpoint(true)
    val cuts = scored.groupBy(col(langCol))
      .agg(expr("percentile_disc(0.3333333333333333) WITHIN GROUP (ORDER BY sb_nano)").as("__p33"),
        expr("percentile_disc(0.6666666666666666) WITHIN GROUP (ORDER BY sb_nano)").as("__p67"))
    scored.join(broadcast(cuts), Seq(langCol))
      .withColumn("bucket",
        when(col("sb_nano") <= col("__p33"), lit("tail"))
          .when(col("sb_nano") <= col("__p67"), lit("middle"))
          .otherwise(lit("head")))
      .select(col(idCol), col(langCol), col("sb_nano"), col("bucket"))
  }

  /** Nearest-centroid (Rocchio) text classification — the trainable
    * quality/domain classifier shape every corpus pipeline runs (a
    * deterministic, closed-form stand-in for a fastText-style filter):
    * each class's centroid is its summed term-count vector over the
    * TRAIN split; a scored document takes the class whose centroid has
    * the highest cosine to its term-frequency vector.
    *
    * Fully engine-portable: the dot product is an EXACT integer sum
    * (tf·count products), both norms are `sqrt` of exact integer sums
    * (sqrt is IEEE-correctly-rounded, hence portable — unlike `pow`/`ln`),
    * and the score quantizes to micro-units with two more
    * correctly-rounded ops — so predictions and scores hash-match an
    * independent SQL engine exactly. Ties break to the lexicographically
    * smaller label.
    *
    * Scale shape: the centroid table is (label × vocab)-sized and joins
    * the scored (doc, token, tf) stream on token — the BM25/DSIR shuffle
    * shape; the per-doc argmax is the WindowGroupLimit rank-filter.
    * Documents sharing no token with any centroid yield no row (no
    * evidence → no prediction).
    */
  def nearestCentroid(train: DataFrame, score: DataFrame, labelCol: String,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val trTf = train
      .select(col(labelCol).as("__lbl"), explode(gf.ws_tokens(col(textCol))).as("__w"))
      .groupBy("__lbl", "__w").agg(count(lit(1)).as("__c"))
    val classNorm = trTf.groupBy("__lbl")
      .agg(sqrt(sum(col("__c") * col("__c")).cast("double")).as("__cn"))
    val docTf = score
      .select(col(idCol), explode(gf.ws_tokens(col(textCol))).as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__tf"))
    val docNorm = docTf.groupBy(col(idCol))
      .agg(sqrt(sum(col("__tf") * col("__tf")).cast("double")).as("__dn"))
    val dots = docTf.join(trTf, Seq("__w"))
      .groupBy(col(idCol), col("__lbl"))
      .agg(sum(col("__tf") * col("__c")).as("__dot"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__cos_micro").desc, col("__lbl").asc)
    dots.join(docNorm, Seq(idCol)).join(classNorm, Seq("__lbl"))
      .withColumn("__cos_micro",
        floor((lit(1e6) * col("__dot")) / (col("__dn") * col("__cn"))).cast("long"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col(idCol), col("__lbl").as("pred_label"),
        col("__cos_micro").as("cos_micro"))
  }

  /** Corpus n-gram frequencies, top `k` — same plan shape as
    * [[topTokens]] over word n-gram shingles. Documents shorter than `n`
    * tokens are excluded (their shingle is degenerate).
    */
  def topNgrams(df: DataFrame, n: Int, k: Int, textCol: String = "text"): DataFrame =
    // tokenize once per row into an aliased projection: higher-order
    // functions run interpreted with no common-subexpression elimination,
    // so inlining `ws_tokens` into each of shingles' references would
    // re-run the regex split several times per row (~2× end-to-end).
    // CollapseProject keeps non-cheap aliases that are referenced twice+.
    df.select(gf.ws_tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= n)
      .select(explode(gf.shingles(col("__tk"), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(k)

  /** Vocabulary coverage / out-of-vocabulary rate: per-document counts of
    * token occurrences outside the corpus top-`vocabSize` vocabulary — the
    * standard "will my tokenizer cover this corpus" health check. The
    * vocabulary is tiny by construction (top-k), so it rides a broadcast;
    * the only shuffle is the per-document aggregate.
    */
  def oovRate(df: DataFrame, vocabSize: Int, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val vocab = topTokens(df, vocabSize)
      .select(col("token"), lit(true).as("__in_vocab"))
    df.select(col(idCol), explode(gf.ws_tokens(col(textCol))).as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__in_vocab").isNull, 1)).as("n_oov"))
      .withColumn("oov_rate", round(col("n_oov") / col("n_tokens"), 6))
  }

  /** Cross-document bigram novelty — the "how much of this document's
    * phrasing is unique to it" signal used to spot boilerplate-heavy vs
    * original text. For each document: its distinct word bigrams, and the
    * fraction of them that occur in NO other document (corpus document
    * frequency 1).
    *
    * Plan shape for scale: only the per-document DISTINCT bigram
    * vocabulary crosses the shuffle (not the token stream), and the
    * document-frequency side is reduced to just the grams with df >= 2
    * before joining back — in a real corpus most bigrams are unique, so
    * the join's build side is a small fraction of the vocabulary. A gram
    * is novel iff it finds no match in that reduced set (left join, null
    * probe), so the full df table never re-joins the corpus.
    */
  def bigramNovelty(df: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val grams = df
      .select(col(idCol), gf.ws_tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(col(idCol),
        explode(array_distinct(gf.shingles(col("__tk"), 2))).as("gram"))
    // grams appearing in 2+ documents; per-doc distinct above makes the
    // count a document frequency
    val shared = grams.groupBy("gram")
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2)
      .select(col("gram"), lit(true).as("__shared"))
    grams.join(shared, Seq("gram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("__shared").isNull, 1)).as("n_novel"))
      .withColumn("novelty", round(col("n_novel") / col("n_bigrams"), 4))
  }

  /** PII scrubbing: emails and phone-like numbers replaced with typed
    * placeholders, with per-document match counts. Patterns stay inside
    * the regex subset Java (Spark) and RE2 (DuckDB/replay engines) agree
    * on — no backrefs, no lookaround — so redaction is reproducible across
    * engines. Pure projection, linear at any scale. Phones are counted on
    * the email-redacted text so an address's digits are never double-
    * counted.
    */
  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
    val phone = "[0-9][0-9][0-9]-[0-9][0-9]+"
    val deEmailed = regexp_replace(col(textCol), email, "<EMAIL>")
    df.withColumn("n_emails", regexp_count(col(textCol), lit(email)).cast("long"))
      .withColumn("n_phones", regexp_count(deEmailed, lit(phone)).cast("long"))
      .withColumn("redacted", regexp_replace(deEmailed, phone, "<PHONE>"))
  }

  /** Within-document repetition — the repeated-n-gram fraction used by
    * corpus quality filters (C4/Gopher-style "repetitive text" signal):
    * of a document's word n-grams, what fraction are repeats of a gram
    * seen earlier in the same document. Pure per-row projection — no
    * shuffle, linear at any scale. Only meaningful for docs with at least
    * n tokens (shorter docs get a degenerate single-gram shingle; filter
    * them out caller-side, as the oracle does).
    */
  def repetition(df: DataFrame, textCol: String = "text", n: Int = 3): DataFrame =
    // stage the gram array behind an alias (see topNgrams: interpreted
    // HOFs get no CSE, so both size() references would re-shingle the row)
    df.withColumn("__grams", gf.shingles(gf.ws_tokens(col(textCol)), n))
      .withColumn("n_grams", size(col("__grams")).cast("long"))
      .withColumn("n_distinct_grams", size(array_distinct(col("__grams"))).cast("long"))
      .withColumn("dup_gram_ratio",
        round((col("n_grams") - col("n_distinct_grams")) / col("n_grams"), 4))
      .drop("__grams")

  /** BM25 ranked retrieval (Okapi form, k1 = 1.2, b = 0.75) of the corpus
    * against a small set of query strings — the relevance-ranking shape a
    * corpus search / decontamination audit runs at scale (Robertson &
    * Walker's probabilistic weighting; the same surface an inverted-index
    * engine serves, expressed relationally).
    *
    * Engine-portable scoring: the idf factor uses the RATIONAL Robertson
    * argument (N - df + 0.5) / (df + 0.5) instead of its log (a per-term
    * monotone transform — no engine-divergent `ln`), and every factor is
    * quantized to exact integer milli-units computed with integer
    * `div` only, so scores hash-match an independent SQL engine bit for
    * bit (the `lmTypicality` portability pattern, taken fully integral):
    * {{{
    *   dl_norm  = (1000 * dl * N) div A                 // A = total tokens
    *   idf      = (1000 * (2N - 2df + 1)) div (2df + 1)
    *   denom    = 1000*tf + 300 + (900 * dl_norm) div 1000   // k1(1-b), k1*b
    *   contrib  = (idf * 2200 * tf) div denom               // tf*(k1+1)
    * }}}
    * At synthetic test scale the BIGINT headroom is ~1e14; a production
    * deployment at web scale would swap the rational idf for double `ln`
    * (scores then differ from this oracle only by the monotone transform).
    *
    * Scale path: the token stream is semi-joined against the BROADCAST
    * query-term set BEFORE anything shuffles — only matching tokens (a
    * vanishing fraction of a 100-TB corpus) reach the (doc, term) count;
    * document length rides the explode so no second corpus pass joins it
    * back; per-term document frequencies are a second tiny broadcast; and
    * the per-query top-k rank window executes as WindowGroupLimit
    * (partial top-k per partition before the one small shuffle).
    *
    * Returns (q_id, rank, doc_id, score_milli), ranks 1..k per query,
    * ties broken by ascending doc id.
    */
  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard hybrid-
    * retrieval combiner: each input ranking contributes
    * `1e9 div (rrfK + rank)` (integer nano-units, so fused scores are
    * EXACT and engine-portable — float 1/(k+r) sums would hash-differ by
    * addition order) and documents are re-ranked by the summed
    * contribution, ties by ascending id.
    *
    * Inputs are SHORTLISTS — (qIdCol, rank, idCol) with ranks 1..n from
    * [[bm25TopK]], a dense ANN probe, or any other retriever — so every
    * stage here is small by construction: the union holds ≤ Σ nᵢ rows
    * per query and the per-query rank window partitions are shortlist-
    * sized (WindowGroupLimit semantics, nothing corpus-scale shuffles).
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60,
              qIdCol: String = "q_id", idCol: String = "doc_id"): DataFrame = {
    require(rankings.nonEmpty && k >= 1 && rrfK >= 0)
    val contribs = rankings.map(_.select(col(qIdCol), col(idCol),
      expr(s"1000000000 div ($rrfK + rank)").as("contrib")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col(qIdCol), col(idCol))
      .agg(sum(col("contrib")).cast("long").as("rrf_nano"))
    import org.apache.spark.sql.expressions.Window
    fused
      .withColumn("rank", row_number().over(Window.partitionBy(qIdCol)
        .orderBy(col("rrf_nano").desc, col(idCol))).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col(idCol), col("rrf_nano"))
      .orderBy(qIdCol, "rank")
  }

  def bm25TopK(df: DataFrame, queries: Seq[String], k: Int,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(queries.nonEmpty && k >= 1, "bm25TopK: need >= 1 query and k >= 1")
    val qterms = queries.zipWithIndex
      .toDF("q_text", "q_id")
      .select(col("q_id").cast("long").as("q_id"),
        explode(array_distinct(gf.ws_tokens(col("q_text")))).as("term"))
    // one corpus pass: dl rides the explode; scan-side broadcast semi join
    // drops every non-query token before the (doc, term) count shuffles
    val toks = df
      .select(col(idCol).as("id"), gf.ws_tokens(col(textCol)).as("__tk"))
      .select(col("id"), size(col("__tk")).cast("long").as("dl"),
        explode(col("__tk")).as("term"))
      .join(broadcast(qterms.select("term").distinct()), Seq("term"), "left_semi")
    val tf = toks.groupBy("id", "dl", "term")
      .agg(count(lit(1)).cast("long").as("tf"))
    // the two corpus scalars ride the plan as a broadcast 1-row
    // aggregate (the [[keywords]] stance) instead of a dedicated
    // head() action — bm25TopK is now fully lazy, so a caller's single
    // action runs everything and the former scalar-probe pass stops
    // being scheduled separately; arithmetic is unchanged exact-integer
    val st = df.agg(count(lit(1)).cast("long").as("__nd"),
      sum(size(gf.ws_tokens(col(textCol)))).cast("long").as("__na"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("long").as("dft"))
    val scored = tf
      .join(broadcast(dfreq), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(st))
      .withColumn("idf_milli",
        expr("(1000 * (2 * __nd - 2 * dft + 1)) div (2 * dft + 1)"))
      .withColumn("dl_norm_milli", expr("(1000 * dl * __nd) div __na"))
      .withColumn("contrib_milli",
        expr("(idf_milli * 2200 * tf) div (1000 * tf + 300 + (900 * dl_norm_milli) div 1000)"))
      .groupBy("q_id", "id")
      .agg(sum(col("contrib_milli")).cast("long").as("score_milli"))
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("score_milli").desc, col("id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("id").as(idCol), col("score_milli"))
      .orderBy("q_id", "rank")
  }

  /** Per-document keyword extraction: each document's top-`k` terms by
    * TF·IDF — the salient-term summary a corpus browser / topic audit
    * wants per row. The idf is the same RATIONAL Robertson argument as
    * [[bm25TopK]] (`(1000*(2N - 2df + 1)) div (2df + 1)`, integer `div`
    * only — no engine-divergent `ln`), so scores hash-match an
    * independent SQL engine exactly; the transform is monotone in the
    * classic log idf, so the RANKING is the textbook one.
    *
    * Scale shape: one corpus pass to (doc, term, tf) with map-side
    * combine; document frequencies are a second aggregate over the
    * (vocab-bounded) tf table joined back on the term key; the corpus
    * doc count is a broadcast 1-row aggregate riding the same plan (no
    * separate action); per-doc top-k is a rank window that
    * executes as WindowGroupLimit (partial top-k per partition before
    * the doc-keyed shuffle). Ties break toward the lexicographically
    * smaller term.
    */
  def keywords(df: DataFrame, k: Int, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    require(k >= 1)
    // corpus doc count rides the plan as a broadcast 1-row aggregate —
    // no separate count() action / second scan of the corpus
    val nd = df.agg(count(lit(1)).as("__nd"))
    val tf = df.select(col(idCol).as("id"),
        explode(gf.ws_tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).cast("long").as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("long").as("dft"))
    import org.apache.spark.sql.expressions.Window
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nd))
      .withColumn("score_milli",
        expr("tf * ((1000 * (2 * __nd - 2 * dft + 1)) div (2 * dft + 1))"))
      .withColumn("rank", row_number().over(Window.partitionBy("id")
        .orderBy(col("score_milli").desc, col("term"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id").as(idCol), col("rank"), col("term"), col("score_milli"))
  }

  /** Collocation extraction: the corpus's top-`k` adjacent word pairs by
    * a PMI-monotone association score — the classic "new york"/"machine
    * learning" phrase miner. The score is the PMI ARGUMENT in exact
    * integer milli-units, `(1000 * n_ab * N) div (n_a * n_b)` with
    * `N` = total tokens: a per-pair monotone transform of
    * `log(p_ab / (p_a p_b))` (no `ln`, so the whole result hash-matches
    * an independent SQL engine). `minCount` applies the standard
    * low-frequency guard — a hapax pair otherwise scores arbitrarily
    * high. BIGINT headroom: `1000 * n_ab * N` caps the usable corpus at
    * ~10^7 pair occurrences × 10^9 tokens; past that, pre-scale the
    * milli factor down (the ordering is unchanged).
    *
    * Scale shape: unigram and bigram counts are two map-side-combined
    * aggregates over one tokenized scan each; the count join shuffles on
    * the WORD key (vocab-bounded, never corpus-bounded); the final top-k
    * is a `TakeOrderedAndProject` — per-partition heads, k rows to one
    * reducer.
    */
  def collocations(df: DataFrame, k: Int, minCount: Long = 5L,
                   textCol: String = "text"): DataFrame = {
    require(k >= 1 && minCount >= 1)
    val toks = df.select(gf.ws_tokens(col(textCol)).as("tk"))
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("long").as("cw"))
    val total = uni.agg(sum(col("cw")).cast("long").as("nn"))
    val bi = toks.filter(size(col("tk")) >= 2)
      .select(posexplode(slice(col("tk"), lit(1), size(col("tk")) - 1))
        .as(Seq("i", "w1")), col("tk"))
      .select(col("w1"), element_at(col("tk"), col("i") + 2).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).cast("long").as("n_ab"))
      .filter(col("n_ab") >= minCount)
    bi.join(uni.select(col("w").as("w1"), col("cw").as("ca")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cw").as("cb")), Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("score_milli", expr("(1000 * n_ab * nn) div (ca * cb)"))
      .select("w1", "w2", "n_ab", "score_milli")
      .orderBy(col("score_milli").desc, col("n_ab").desc, col("w1"), col("w2"))
      .limit(k)
  }
}

object Stopwords {
  val en: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "that", "this", "was", "for", "on", "with", "as", "at", "by")
  val es: Seq[String] = Seq("el", "la", "los", "las", "un", "una", "y", "o",
    "de", "en", "es", "que", "por", "con", "para", "del", "se", "no")
  val fr: Seq[String] = Seq("le", "la", "les", "un", "une", "et", "ou", "de",
    "en", "est", "que", "pour", "dans", "par", "avec", "du", "au", "ne")
  val de: Seq[String] = Seq("der", "die", "das", "ein", "eine", "und", "oder",
    "von", "zu", "ist", "dass", "mit", "auf", "im", "den", "nicht")
  val profiles: Map[String, Seq[String]] =
    Map("en" -> en, "es" -> es, "fr" -> fr, "de" -> de)
}
