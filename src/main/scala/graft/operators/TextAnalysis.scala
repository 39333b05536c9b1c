package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.EngineNeutral._
import graft.syntax._

/** Text-analysis operators for training-data pipelines, over `documents`.
  * Everything is `org.apache.spark.sql.functions` expressions (no UDFs):
  * whole-stage codegen keeps these scan-speed at 100 TB, and each has an
  * exact DuckDB twin in OracleSql.
  */
object TextAnalysis {

  /** Language heuristics: tiny per-language stopword lists. On real data
    * these separate scripts/languages; on any data the scoring + argmax
    * chain is deterministic in both engines. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "une", "dans", "que"),
    "zh" -> Seq("的", "是", "在", "了", "不", "我", "有", "他", "这"))

  private def stopwordHits(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(words))).cast("long")

  /** Token counting: whitespace tokens + BPE-ish word pieces + chars.
    * The "bpe-ish" regex splits runs of letters / digits / other — a
    * deterministic proxy for subword token counts. */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(lower($"text"))
    Tables.documents(s, dir).select(
      $"doc_id",
      size(toks).cast("long").as("n_tokens"),
      size(regexp_extract_all($"text", lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .cast("long").as("n_bpeish"),
      length($"text").cast("long").as("n_chars_measured"))
  }

  /** TOKEN FERTILITY PER SOURCE — the tokenizer-economics report a
    * training-budget plan is priced from: per source, exact word /
    * BPE-ish-token / char totals and the three derived rates — subword
    * FERTILITY (tokens per word: high fertility flags sources the
    * tokenizer fragments, e.g. code or non-English, which consume
    * budget faster than their text volume suggests), chars per token
    * (compression of the byte stream into the context window), and
    * tokens per document (how many documents a token budget actually
    * buys from this source). [[tokenStats]] is the per-document view;
    * THIS is the per-source planning artifact next to
    * [[corpusMix]]-style quota decisions.
    *
    * Shape: one projection + one partial-aggregated shuffle of ≤
    * |sources| rows; counts are exact BIGINTs, each rate is one rounded
    * division (engine-identical), zero-token sources report null rates
    * on both engines. */
  def tokenFertility(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select($"source",
        size(wsTokens(lower($"text"))).cast("long").as("w"),
        size(regexp_extract_all($"text",
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
          .cast("long").as("b"),
        length($"text").cast("long").as("c"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"w").as("n_words"), sum($"b").as("n_bpeish"),
        sum($"c").as("n_chars"))
      .select($"source", $"n_docs", $"n_words", $"n_bpeish", $"n_chars",
        when($"n_words" > 0,
          round($"n_bpeish".cast("double") / $"n_words".cast("double"), 6))
          .as("fertility"),
        when($"n_bpeish" > 0,
          round($"n_chars".cast("double") / $"n_bpeish".cast("double"), 6))
          .as("chars_per_token"),
        round($"n_bpeish".cast("double") / $"n_docs".cast("double"), 6)
          .as("tokens_per_doc"))

  /** The three quality signals over a `text` column, as
    * (punct_ratio, stopword_ratio, composite quality) — shared by
    * [[qualityScore]] and [[qualityFilterFrom]] so the score the filter
    * gates on is definitionally the score the scorer reports. */
  private def qualitySignals: (Column, Column, Column) = {
    val toks = wsTokens(lower($"text"))
    val nTok = size(toks).cast("double")
    val alnum = length(regexp_replace($"text", "[^A-Za-z0-9\\s]", "")).cast("double")
    val punctRatio = (length($"text").cast("double") - alnum) / length($"text").cast("double")
    val enHits = size(filter(toks, t => t.isInCollection(stopwords.head._2))).cast("double")
    val stopRatio = when(nTok > 0, enHits / nTok).otherwise(lit(0.0))
    val lenScore = least(nTok / lit(64.0), lit(1.0))
    (punctRatio, stopRatio,
      lenScore * 0.4 + (lit(1.0) - punctRatio) * 0.3 + stopRatio * 0.3)
  }

  /** Quality scoring: length / punctuation / stopword signals composed
    * into one 0..1 score. Formula is written identically in OracleSql —
    * double arithmetic order matters for bit-equality. */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val (punctRatio, stopRatio, quality) = qualitySignals
    Tables.documents(s, dir).select(
      $"doc_id",
      round(punctRatio, 6).as("punct_ratio"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(quality, 6).as("quality"))
  }

  /** QUALITY FILTERING — keep a document iff its quality score clears
    * its source's EXACT median (the relative gate a curation pipeline
    * uses when sources differ in style: an absolute threshold keeps all
    * of one crawl and none of another; a per-source median keeps the
    * better half of each).
    *
    * The median is computed the scale-safe way: sort within the
    * `source` hash partition (one exchange), `row_number` + partition
    * count, then average the middle one/two values with an
    * unbounded-frame window — never a `percentile` ImperativeAggregate
    * that buffers every value of a group in one aggregation buffer (a
    * billion-row source would OOM it at 100 TB; a sort scales). All
    * three window functions share the single `source` exchange. The
    * middle-two average equals `quantile_cont(q, 0.5)`, which is the
    * DuckDB twin — caveat: on an even count DuckDB interpolates
    * ((a+b)*0.5) while Spark averages (sum/2); the two can differ in
    * the last ulp BEFORE the round(…, 6), so a boundary value sitting
    * exactly on a rounding edge could in principle hash-differ. Rank
    * positions are kept as LONGs so the median math itself never
    * overflows; the real per-source row cap is `row_number`'s int
    * return (~2.1B rows per source — beyond it, switch the rank to a
    * sum-over-sorted-window long). */
  def qualityFilter(s: SparkSession, dir: String): DataFrame =
    qualityFilterFrom(Tables.documents(s, dir))

  def qualityFilterFrom(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (_, _, quality) = qualitySignals
    val byQ = Window.partitionBy($"source").orderBy($"quality".asc, $"doc_id".asc)
    val whole = Window.partitionBy($"source")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // middle positions: (n+1) div 2 and (n+2) div 2 — equal when n is
    // odd (single middle), adjacent when even (quantile_cont midpoint);
    // kept as longs (row_number's int return is the real ~2.1B cap)
    val lo = floor(($"n" + lit(1L)) / lit(2.0)).cast("long")
    val hi = floor(($"n" + lit(2L)) / lit(2.0)).cast("long")
    docs
      .select($"doc_id", $"source", round(quality, 6).as("quality"))
      .withColumn("rn", row_number().over(byQ))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("median_q",
        round(avg(when($"rn" === lo || $"rn" === hi, $"quality")).over(whole), 6))
      .filter($"quality" >= $"median_q")
      .select($"doc_id", $"source", $"quality", $"median_q")
  }

  /** Language ID: stopword-hit argmax with a fixed preference order. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(lower($"text"))
    val hits = stopwords.map { case (lang, words) => lang -> stopwordHits(toks, words) }
    // deterministic argmax: nested CASE, earlier lang wins ties
    val Seq(en, de, es, fr, zh) = hits.map(_._2)
    val lang = when(en >= de && en >= es && en >= fr && en >= zh, "en")
      .when(de >= es && de >= fr && de >= zh, "de")
      .when(es >= fr && es >= zh, "es")
      .when(fr >= zh, "fr")
      .otherwise("zh")
    Tables.documents(s, dir).select(
      $"doc_id",
      en.as("s_en"), de.as("s_de"), es.as("s_es"), fr.as("s_fr"), zh.as("s_zh"),
      when(en + de + es + fr + zh === 0, "und").otherwise(lang).as("lang_guess"))
  }

  /** Language-profile size (top-K grams per language) and the absence
    * penalty; doc profiles are capped at [[DocProfK]]. Cavnar–Trenkle's
    * published defaults are 300/oop-max — kept here. */
  private[graft] val LangProfK = 300
  private[graft] val DocProfK = 64

  /** Char trigrams of lower(text) at every position 1..len-2 — the
    * n-gram family language ID models are built from (Cavnar &
    * Trenkle 1994 §3 use 1..5-grams; trigrams alone carry most of the
    * signal; spaces/punctuation are KEPT — " th"/"he " word-boundary
    * grams are among the strongest language cues). Empty below 3
    * chars. Via the [[graft.functions.CharNgramsExpr]] kernel so
    * lower(text) runs once per row, not once per gram (the
    * lambda-captured HOF pitfall documented on that expression). */
  private def charTrigrams(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.CharNgramsExpr(
      Bridge.expression(lower(text)), 3))
  }

  /** TRAINED N-GRAM LANGUAGE ID (Cavnar & Trenkle, SDAIR 1994): the
    * standard curation gate a multilingual crawl runs before language
    * routing — rank-profile classification with NO external weights:
    * the model is trained on the corpus's own labeled 80% split
    * (doc_id % 5 != 0), so the twin can rebuild it exactly in SQL.
    * Per language: the top-[[LangProfK]] char trigrams by (count desc,
    * gram asc) with their ranks. Per document: its own
    * top-[[DocProfK]] ranked trigram profile. Score = out-of-place
    * distance Σ |doc_rank − lang_rank| with penalty [[LangProfK]] for
    * grams absent from the language profile — exact integers end to
    * end, so both engines agree bit-for-bit. Prediction = argmin with
    * (dist asc, lang asc) tie-break; sub-trigram docs emit 'und' with
    * null dist/margin. margin = runner-up distance − best distance,
    * the abstention signal a routing gate thresholds on.
    *
    * Shape at 100 TB: the model aggregate's (lang, gram) key space is
    * bounded by |langs| × charset³, NOT corpus size, so its exchange
    * collapses under partial agg to a profile of O(|langs|·K) rows —
    * broadcast to both the langs cross join and the rank lookup.
    * Document profiles use the [[tfidfTopTerms]] shape (explode →
    * partial-agged (doc_id, gram) count → per-doc rank window →
    * top-[[DocProfK]]); scoring is the broadcast left join fanned out
    * |langs|× on ≤ [[DocProfK]] rows per doc, rolled up by one
    * partial-agged (doc_id, lang) sum, and argmin'd by a bounded
    * per-doc sort_array over ≤ |langs| collected structs — every
    * exchange is keyed on doc_id with per-doc row counts bounded by
    * constants, and nothing ever joins doc-to-doc. (A per-row HOF
    * profile was tried and rejected: the nested lambda tree re-inlines
    * its subtrees once per language distance, and optimizer + eval
    * time explodes combinatorially.) */
  def langIdNgram(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    langIdNgramFrom(docs.filter($"doc_id" % 5 =!= 0), docs)
  }

  /** The trained model half of [[langIdNgram]]: per-language
    * top-[[LangProfK]] trigram rank profiles (lang, gram, lrank) from
    * the labeled training frame — O(|langs|·K) rows, pinned so the
    * training scan doesn't rerun per consumer. Also feeds the
    * streaming router ([[graft.streaming.Streams.langIdRouter]]). */
  def langProfileOf(train: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    train.filter($"lang".isNotNull)
      .select($"lang", explode(charTrigrams($"text")).as("gram"))
      .groupBy($"lang", $"gram").agg(count(lit(1)).as("n"))
      .withColumn("lrank", row_number().over(
        Window.partitionBy($"lang").orderBy($"n".desc, $"gram".asc)))
      .filter($"lrank" <= LangProfK)
      .select($"lang", $"gram", $"lrank")
      .localCheckpoint(true)
  }

  /** Core of [[langIdNgram]]: train on `train` (labeled), score `docs`. */
  def langIdNgramFrom(train: DataFrame, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val langProf = langProfileOf(train)
    val langs = langProf.select($"lang").distinct()
    val docProf = docs
      .select($"doc_id", explode(charTrigrams($"text")).as("gram"))
      .groupBy($"doc_id", $"gram").agg(count(lit(1)).as("n"))
      .withColumn("drank", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"n".desc, $"gram".asc)))
      .filter($"drank" <= DocProfK)
      .select($"doc_id", $"gram", $"drank")
    val best = docProf
      .crossJoin(broadcast(langs))
      .join(broadcast(langProf), Seq("lang", "gram"), "left")
      .groupBy($"doc_id", $"lang")
      .agg(sum(coalesce(abs($"drank" - $"lrank").cast("long"),
        lit(LangProfK.toLong))).as("dist"))
      // argmin + runner-up in ONE bounded agg: ≤ |langs| structs per
      // doc, sort_array's struct order IS the (dist asc, lang asc)
      // tie-break
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"dist", $"lang"))).as("sc"))
      .select($"doc_id",
        element_at($"sc", 1)("lang").as("p1"),
        element_at($"sc", 1)("dist").as("d1"),
        try_element_at($"sc", lit(2))("dist").as("d2"))
    docs.select($"doc_id", $"lang".as("lang_label"), $"source")
      .join(best, Seq("doc_id"), "left")
      .select($"doc_id", $"lang_label", $"source",
        coalesce($"p1", lit("und")).as("lang_pred"),
        $"d1".as("best_dist"),
        ($"d2" - $"d1").as("margin"))
  }

  /** PER-SOURCE LANGUAGE-MIX / CONTAMINATION REPORT off [[langIdNgram]]:
    * for each (source, predicted language), document count, how many
    * agree with the shipped label, and the share of the source — the
    * one-page answer to "which sources are contaminated with
    * off-target languages, and does the labeling pipeline agree with
    * content?". A source whose share mass sits on an unexpected
    * language (or whose n_label_agree lags n_docs) is quarantined
    * before tokenization. Shape: the row-local scoring scan above plus
    * ONE partial-agged exchange of ≤ |sources|·|langs| rows and a
    * window over the tiny rollup. */
  def langIdMix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    langIdNgram(s, dir)
      // The model was FIT on the train split (doc_id % 5 != 0), so
      // label-agreement there is inflated by training accuracy. Carry
      // the split so the contamination gate reads agreement on holdout
      // rows while train rows stay visible (the train−holdout gap is
      // itself the overfit signal). Shares are within (source, split)
      // so each split's mix sums to 1 per source.
      .withColumn("split",
        when($"doc_id" % 5 === 0, "holdout").otherwise("train"))
      .groupBy($"source", $"split", $"lang_pred")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"lang_label" === $"lang_pred", 1L).otherwise(0L))
          .as("n_label_agree"))
      .withColumn("share", round($"n_docs".cast("double") /
        sum($"n_docs").over(Window.partitionBy($"source", $"split")), 6))
  }

  /** CONFUSION AUDIT of the trained router — per (label, prediction)
    * cell: document count, the cell's share of its LABEL row (recall
    * when label = pred) and of its PREDICTION column (precision when
    * label = pred). [[langIdMix]] says where predicted mass sits per
    * source; THIS says whether the router can be trusted at all — the
    * model-quality gate before its routing decisions quarantine data
    * (a de→nl-style systematic confusion shows up as one heavy
    * off-diagonal cell; label noise shows up as a smeared row).
    * Shape: the scoring scan + one ≤ |langs|²-row partial-agged
    * exchange + two windows over that tiny rollup. */
  def langIdConfusion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    langIdNgram(s, dir)
      // Gate semantics: the trust decision MUST be read on the holdout
      // split (doc_id % 5 == 0) — the model saw the other 80%, so that
      // diagonal is inflated by training accuracy. Both splits are
      // emitted (shares computed within-split) so the holdout matrix
      // is the gate and the train−holdout diagonal gap prices overfit.
      .withColumn("split",
        when($"doc_id" % 5 === 0, "holdout").otherwise("train"))
      .groupBy($"split", $"lang_label", $"lang_pred")
      .agg(count(lit(1)).as("n_docs"))
      .select($"split", $"lang_label", $"lang_pred", $"n_docs",
        round($"n_docs".cast("double") /
          sum($"n_docs").over(Window.partitionBy($"split", $"lang_label")), 6)
          .as("share_of_label"),
        round($"n_docs".cast("double") /
          sum($"n_docs").over(Window.partitionBy($"split", $"lang_pred")), 6)
          .as("share_of_pred"))
  }

  /** VOCABULARY-COVERAGE CURVE — the vocab-size tuning artifact a
    * tokenizer decision is priced from: for vocab budgets V ∈ {1k, 4k,
    * 16k}, what fraction of the corpus's BPE-ish token OCCURRENCES the
    * top-V token types cover (rank by count desc, token asc — a total
    * order, so the V-boundary cut is deterministic on both engines),
    * and the residual OOV rate a subword fallback must absorb. Pairs
    * with [[tokenFertility]] (cost per source) and [[zipfFit]] (the
    * head's power law): this is the curve that says whether 4k types
    * already cover 95% or the tail forces 16k.
    *
    * Shape at 100 TB: one explode + ONE token-keyed partial-agged
    * count exchange (Zipf heads collapse map-side), then
    * TakeOrderedAndProject keeps only the top max(V) = 16,384 types —
    * the global "sort" never materializes beyond the bounded head —
    * plus a 1-row total aggregate; the curve itself is arithmetic over
    * a 16k-row frame. */
  def vocabCoverage(s: SparkSession, dir: String,
                    budgets: Seq[Int] = Seq(1024, 4096, 16384)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgets.nonEmpty && budgets == budgets.sorted,
      "vocab budgets must be ascending")
    val counts = Tables.documents(s, dir)
      .select(explode(regexp_extract_all(lower($"text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum($"n").as("total_tokens"),
      count(lit(1)).as("n_types")).localCheckpoint(true)
    val head = counts
      .orderBy($"n".desc, $"tok".asc).limit(budgets.max)
      .withColumn("rank", row_number().over(
        Window.orderBy($"n".desc, $"tok".asc)))
      .localCheckpoint(true) // <= max(V) rows, probed once per budget
    budgets.map { v =>
      head.filter($"rank" <= v)
        .agg(sum($"n").as("covered_tokens"))
        .crossJoin(broadcast(totals))
        .select(lit(v.toLong).as("vocab_size"),
          coalesce($"covered_tokens", lit(0L)).as("covered_tokens"),
          $"total_tokens", $"n_types",
          round(coalesce($"covered_tokens", lit(0L)).cast("double")
            / $"total_tokens", 6).as("coverage"),
          round(($"total_tokens" - coalesce($"covered_tokens", lit(0L)))
            .cast("double") / $"total_tokens", 6).as("oov_rate"))
    }.reduce(_ unionAll _)
  }

  /** Number of BPE merge rounds the trainer runs (and the twin chains). */
  private[graft] val BpeK = 32

  /** Shared word-type frame for the BPE trainer: ONE corpus-scale
    * exchange (token explode → groupBy(token) count) collapses the
    * corpus to its TYPE table — bounded by Heaps' law, not corpus size —
    * then every merge round works over types weighted by count. Each
    * word is carried as its canonical symbol string: single characters
    * joined and fenced by single spaces (" h e l l o "), the
    * representation both the pair counting and the merge application
    * read. Symbols never contain whitespace (the tokenizer splits on
    * it), so the space-delimited form is unambiguous. */
  private def bpeWordTypes(docs: DataFrame): DataFrame =
    docs
      .select(explode(regexp_extract_all(lower($"text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
      // tok is carried through every merge round so consumers
      // (bpeFertility) can map a corpus token to its trained
      // segmentation without re-deriving the chain
      .select($"tok", concat(lit(" "),
        concat_ws(" ", regexp_extract_all($"tok", lit("."), lit(0))),
        lit(" ")).as("s"), $"n")

  /** One BPE merge applied to a canonical symbol string — greedy
    * left-to-right, non-overlapping, EXACTLY the classic algorithm —
    * expressed as three literal `replace` scans shared verbatim with the
    * DuckDB twin:
    *  1. double every delimiter space, so each adjacent pair owns a
    *     private "half" of each boundary gap (plain replace of " a b "
    *     would consume the shared space and miss the next occurrence in
    *     "a b a b");
    *  2. replace " a  b " with " ab " — left-to-right non-overlapping is
    *     precisely BPE's greedy merge order within a word;
    *  3. collapse double spaces back to the canonical single-space form.
    */
  private def bpeApplyMerge(s: Column, a: String, b: String): Column = {
    def rep(c: Column, find: String, repl: String): Column =
      call_function("replace", c, lit(find), lit(repl))
    rep(rep(rep(s, " ", "  "), s" $a  $b ", s" $a$b "), "  ", " ")
  }

  /** Adjacent symbol pairs of a word-type frame, weighted by type count:
    * (a, b, cnt). Counts every adjacent occurrence (including
    * overlapping, as BPE training does); one partial-agged exchange
    * keyed on the pair. */
  private def bpePairCounts(w: DataFrame): DataFrame =
    w.select($"n", split(trim($"s"), " ").as("l"))
      .filter(size($"l") >= 2)
      .select($"n", explode(arrays_zip(
        slice($"l", lit(1), size($"l") - 1).as("a"),
        slice($"l", lit(2), size($"l") - 1).as("b"))).as("p"))
      .groupBy($"p.a".as("a"), $"p.b".as("b"))
      .agg(sum($"n").as("cnt"))

  /** DISTRIBUTED BPE MERGE TRAINER — the operator that turns the vocab
    * pricing suite ([[vocabCoverage]] "is 4k or 16k enough",
    * [[tokenFertility]] cost per source, [[zipfFit]] the head's power
    * law) into an actual tokenizer decision: the learned merge table
    * itself. Classic byte-pair encoding over word types: count adjacent
    * symbol pairs weighted by word frequency, merge the most frequent
    * pair, repeat — k rounds or until no pair reaches `minCount`.
    * Output: (merge_rank, sym_a, sym_b, merged, pair_count), the merge
    * list a tokenizer ships.
    *
    * Exactly twin-reproducible by the langid recipe: integer counts end
    * to end, argmax tie-break (count desc, sym_a asc, sym_b asc) — a
    * total order, so both engines pick the same merge every round — and
    * the greedy merge application is three literal string replaces the
    * twin chains verbatim (see [[bpeApplyMerge]]).
    *
    * Shape at 100 TB: the corpus is touched ONCE ([[bpeWordTypes]]'s
    * token-count exchange — the same shape vocabCoverage already runs);
    * every merge round after that is over the TYPE table (Heaps-bounded,
    * ~|V| rows regardless of corpus size) — one pair-count partial agg +
    * a TakeOrdered(1), with the chosen pair the only thing that ever
    * reaches the driver (O(k) rows total, the k-means‖ driver-policy
    * contract). Each round's type frame is eagerly checkpointed so round
    * r never replays rounds 1..r-1's replaces (O(k) total work, not
    * O(k²)). Caveat shared with the twin: characters are UTF-16 code
    * units on Spark and code points in DuckDB — identical on the BMP;
    * the corpus is ASCII (judge-verified at all sfs). */
  def bpeMerges(s: SparkSession, dir: String,
                k: Int = BpeK, minCount: Long = 2L): DataFrame =
    bpeMergesFrom(Tables.documents(s, dir), k, minCount)._1

  /** Core of [[bpeMerges]]: returns (merge table, final word-type frame)
    * so [[bpeCompression]] can price the result without retraining. */
  private[graft] def bpeMergesFrom(docs: DataFrame, k: Int, minCount: Long)
      : (DataFrame, DataFrame) = {
    require(k >= 1, s"bpe: k must be >= 1, got $k")
    require(minCount >= 1L, s"bpe: minCount must be >= 1, got $minCount")
    val spark = docs.sparkSession
    var w = bpeWordTypes(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var r = 1
    var stop = false
    while (r <= k && !stop) {
      // O(1) rows to the driver: the argmax pair of this round
      val top = bpePairCounts(w)
        .filter($"cnt" >= minCount)
        .orderBy($"cnt".desc, $"a".asc, $"b".asc)
        .limit(1).collect()
      if (top.isEmpty) stop = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        merges += ((r.toLong, a, b, a + b, top(0).getLong(2)))
        w = w.select($"tok", bpeApplyMerge($"s", a, b).as("s"), $"n")
          .localCheckpoint(true)
        r += 1
      }
    }
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("merge_rank", LongType, nullable = false),
      StructField("sym_a", StringType, nullable = false),
      StructField("sym_b", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    val rows = merges.toSeq.map { case (rk, a, b, m, c) =>
      org.apache.spark.sql.Row(rk, a, b, m, c) }
    (spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema),
      w)
  }

  /** FERTILITY UNDER THE TRAINED TOKENIZER — per source: how many BPE
    * pieces the [[bpeMerges]]-trained segmentation actually spends per
    * token and per character. [[tokenFertility]] prices cost with a
    * regex PROXY; this is the same decision number under the merges the
    * trainer just learned — the artifact that says "source X costs 1.4×
    * the pieces of source Y under OUR tokenizer", which is what a
    * token-budget mix is actually priced in.
    *
    * Shape: the trainer (type-table bounded, see [[bpeMerges]]) + one
    * (source, token) count exchange + a token-keyed join against the
    * final type table (each token's piece count is `size(split(s))` on
    * its trained segmentation) + a per-source rollup. */
  def bpeFertility(s: SparkSession, dir: String,
                   k: Int = BpeK, minCount: Long = 2L): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (_, wk) = bpeMergesFrom(docs, k, minCount)
    val pieces = wk.select($"tok",
      size(split(trim($"s"), " ")).cast("long").as("np"))
    val st = docs
      .select($"source", explode(regexp_extract_all(lower($"text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("cnt"))
    st.join(pieces, "tok")
      .groupBy($"source")
      .agg(sum($"cnt").as("n_tokens"),
        sum($"cnt" * length($"tok")).as("n_chars"),
        sum($"cnt" * $"np").as("n_pieces"))
      .select($"source", $"n_tokens", $"n_chars", $"n_pieces",
        round($"n_pieces".cast("double") / $"n_tokens", 6)
          .as("pieces_per_token"),
        round($"n_chars".cast("double") / $"n_pieces", 6)
          .as("chars_per_piece"))
  }

  /** PER-DOCUMENT PIECE PRICING UNDER THE TRAINED TOKENIZER — the
    * document-grain companion of [[bpeFertility]]: for every doc, how
    * many tokens the trainer's regex sees and how many BPE pieces the
    * learned merges spend on them — the number a per-document token
    * budget (packing, truncation, billing) is actually priced in.
    * Declarative path: one (doc_id, token) explode joined to the final
    * type table's piece counts, one doc-keyed partial agg, completion
    * left-join so token-less docs price as zero. The streaming twin
    * ([[graft.streaming.Streams.bpeRouter]]) prices the SAME number at
    * ingestion via the [[graft.functions.BpeCountExpr]] per-row kernel
    * — parity is exact because the kernel applies each merge as one
    * greedy pass in rank order, the trainer's application discipline. */
  def bpeDocPieces(s: SparkSession, dir: String,
                   k: Int = BpeK, minCount: Long = 2L): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (_, wk) = bpeMergesFrom(docs, k, minCount)
    val pieces = wk.select($"tok",
      size(split(trim($"s"), " ")).cast("long").as("np"))
    val ag = docs
      .select($"doc_id", explode(regexp_extract_all(lower($"text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("tok"))
      .join(pieces, "tok")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("nt"), sum($"np").as("npc"))
    docs.select($"doc_id")
      .join(ag, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"nt", lit(0L)).as("n_tokens"),
        coalesce($"npc", lit(0L)).as("n_pieces"),
        when(coalesce($"nt", lit(0L)) > 0L,
          round($"npc".cast("double") / $"nt", 6))
          .otherwise(lit(null).cast("double")).as("pieces_per_token"))
  }

  /** NB vocabulary budget: global top-K train-split tokens by
    * (count desc, token asc) — a total order, so the cut is
    * deterministic on both engines. */
  private[graft] val NbVocabK = 2048

  /** TRAINED SOURCE/QUALITY CLASSIFIER — multinomial Naive Bayes over
    * integer token counts, the trained-classifier head the curation
    * suite's heuristic gates (Gopher rules, CCNet buckets, DSIR weights)
    * feed into in a real pipeline. This instance predicts `source` (the
    * provenance-contamination question: "does this doc look like where
    * it claims to come from?"); the same head distills any label column
    * — e.g. gopherRules' pass bit — into a cheap scorer.
    *
    * Training (doc_id % 5 != 0, the langid split): the MODEL is exact
    * integers end to end — class doc counts (prior), per-(class, token)
    * counts over the top-[[NbVocabK]] train vocabulary, per-class token
    * totals, and the vocab size V for +1 Laplace smoothing. Each model
    * entry's log-likelihood is QUANTIZED ONCE to integer micro-nats:
    * w(t,c) = round(10⁶·(ln(n_tc+1) − ln(n_c+V))), prior_µ(c) =
    * round(10⁶·(ln n_docs_c − ln N)). From there scoring is exact
    * integer arithmetic — score_µ(c,d) = prior_µ(c) + Σ_t cnt_dt·w(t,c)
    * — so the per-doc sum is ORDER-INDEPENDENT (a raw double sum would
    * differ across engines/partitionings in the last ULPs and round-6
    * could straddle a boundary at this magnitude; integer sums cannot),
    * and the argmax tie-break (score desc, class asc) is exact. The ln
    * inputs are exact integers, so both engines quantize the same
    * double (the zipf/PMI/KL libm precedent); ±0.5 µnat per term is
    * noise against class gaps. Out-of-vocab tokens are ignored
    * (deterministic); a doc with no in-vocab tokens scores prior-only
    * on every class.
    *
    * Shape at 100 TB: the model aggregates are bounded by |classes| ×
    * V, NOT corpus size — partial agg collapses the (class, token)
    * exchange, and the model broadcasts to the scoring join. Document
    * side: one (doc_id, token) count exchange, a broadcast fan-out of
    * ≤ |classes| per token row, one (doc_id, class) partial-agged sum,
    * and a bounded per-doc argmax (≤ |classes| structs) — the langid
    * scoring shape exactly; nothing joins doc-to-doc. */
  def sourceNb(s: SparkSession, dir: String): DataFrame =
    sourceNbFrom(Tables.documents(s, dir))

  /** Core of [[sourceNb]] over any (doc_id, text, source) frame. */
  private[graft] def sourceNbFrom(docs: DataFrame): DataFrame =
    nbClassifyFrom(docs.select($"doc_id", $"text", $"source".as("label")))
      .withColumnRenamed("label", "source_label")
      .withColumnRenamed("pred", "source_pred")

  /** Generic integer micro-nat NB head over any (doc_id, text, label)
    * frame — [[sourceNb]] and [[qualityNb]] are this with different
    * label columns. Output: (doc_id, label, split, pred,
    * best_score_micro, margin_micro). */
  private def nbClassifyFrom(docs: DataFrame): DataFrame = {
    def nbToks(c: Column): Column =
      regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))
    val train = docs.filter($"doc_id" % 5 =!= 0)
    val trainToks = train.select($"label", explode(nbToks($"text")).as("tok"))
    // vocabulary: the train split's global head (the model must not see
    // holdout tokens)
    val vocab = trainToks.groupBy($"tok").agg(count(lit(1)).as("vn"))
      .orderBy($"vn".desc, $"tok".asc).limit(NbVocabK)
      .select($"tok").localCheckpoint(true)
    val vsize = vocab.agg(count(lit(1)).as("v"))
    // exact-integer model: priors, per-(class, token) counts, class totals
    val priors = train.groupBy($"label".as("cls"))
      .agg(count(lit(1)).as("ndc")).localCheckpoint(true)
    val nTrain = priors.agg(sum($"ndc").as("n_train"))
    val ntc = trainToks.join(broadcast(vocab), "tok")
      .groupBy($"label".as("cls"), $"tok").agg(count(lit(1)).as("ntc"))
      .localCheckpoint(true)
    val ncl = ntc.groupBy($"cls").agg(sum($"ntc").as("ncl"))
    // per-doc in-vocab token counts: ONE doc-keyed exchange
    val dtc = docs.select($"doc_id", explode(nbToks($"text")).as("tok"))
      .join(broadcast(vocab), "tok")
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("cnt"))
    // token contribution per (doc, class): broadcast-model fan-out of
    // integer micro-nat weights — the per-doc sum is exact
    val model = ncl.crossJoin(broadcast(vsize)) // (cls, ncl, v)
    val perClassTok = dtc
      .crossJoin(broadcast(model))
      .join(broadcast(ntc), Seq("cls", "tok"), "left")
      .groupBy($"doc_id", $"cls")
      .agg(sum($"cnt" *
        round((log(coalesce($"ntc", lit(0L)) + lit(1L)) - log($"ncl" + $"v"))
          * lit(1e6), 0).cast("long"))
        .as("ts"))
    // completion: every (doc, class) pair gets prior + token sum —
    // docs with no in-vocab tokens still score prior-only
    val scored = docs.select($"doc_id", $"label")
      .crossJoin(broadcast(priors.crossJoin(nTrain)))
      .join(perClassTok.withColumnRenamed("cls", "cls_t")
          .withColumnRenamed("doc_id", "doc_id_t"),
        $"doc_id" === $"doc_id_t" && $"cls" === $"cls_t", "left")
      .select($"doc_id", $"label", $"cls",
        (round((log($"ndc".cast("double")) - log($"n_train".cast("double")))
          * lit(1e6), 0).cast("long") +
          coalesce($"ts", lit(0L))).as("score_micro"))
    // bounded argmax: ≤ |classes| structs per doc; (-score asc, cls asc)
    // == (score desc, cls asc), exact over integers
    scored
      .groupBy($"doc_id", $"label")
      .agg(sort_array(collect_list(struct((-$"score_micro").as("ns"), $"cls")))
        .as("sc"))
      .select($"doc_id", $"label",
        when($"doc_id" % 5 === 0, "holdout").otherwise("train").as("split"),
        element_at($"sc", 1)("cls").as("pred"),
        (-element_at($"sc", 1)("ns")).as("best_score_micro"),
        (try_element_at($"sc", lit(2))("ns") -
          element_at($"sc", 1)("ns")).as("margin_micro"))
  }

  /** Collected integer micro-nat NB model from a labeled train frame,
    * for the streaming router ([[graft.streaming.Streams.nbRouter]]):
    * (ascending classes, per-class prior_µ, dense token → per-class
    * weight_µ rows over the train vocabulary). Bounded O(C + V·C)
    * values — the model-rollout collect, the langid-router contract.
    * Quantization mirrors the batch join pipeline EXACTLY:
    * StrictMath.log (Spark's log() is StrictMath, bit-verified — it
    * differs from Math.log by 1 ULP at e.g. x = 3.0) and
    * BigDecimal HALF_UP at scale 0, Spark's round() semantics. */
  private[graft] def sourceNbModelOf(train: DataFrame)
      : (IndexedSeq[String], IndexedSeq[Long], Map[String, IndexedSeq[Long]]) = {
    def nbToks(c: Column): Column =
      regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))
    def micro(d: Double): Long = java.math.BigDecimal.valueOf(d * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    def slog(d: Double): Double = java.lang.StrictMath.log(d)
    val trainToks = train.select($"source", explode(nbToks($"text")).as("tok"))
    val vocab = trainToks.groupBy($"tok").agg(count(lit(1)).as("vn"))
      .orderBy($"vn".desc, $"tok".asc).limit(NbVocabK).select($"tok")
      .localCheckpoint(true)
    val vocabArr = vocab.collect().map(_.getString(0))
    val v = vocabArr.length.toLong
    val priorRows = train.groupBy($"source").agg(count(lit(1)).as("ndc")).collect()
    if (priorRows.isEmpty)
      return (IndexedSeq.empty, IndexedSeq.empty, Map.empty)
    val classes = priorRows.map(_.getString(0)).sorted.toIndexedSeq
    val ndc = priorRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTrain = ndc.values.sum
    val ntc = trainToks.join(broadcast(vocab), "tok")
      .groupBy($"source", $"tok").agg(count(lit(1)).as("ntc")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ncl = classes.map(c =>
      c -> ntc.collect { case ((cc, _), n) if cc == c => n }.sum).toMap
    val priors = classes.map(c =>
      micro(slog(ndc(c).toDouble) - slog(nTrain.toDouble)))
    val weights = vocabArr.map { t =>
      t -> classes.map(c =>
        micro(slog(ntc.getOrElse((c, t), 0L).toDouble + 1.0)
          - slog((ncl(c) + v).toDouble)))
    }.toMap
    (classes, priors, weights)
  }

  /** CONFUSION AUDIT of the trained source classifier — the
    * [[langIdConfusion]] shape on [[sourceNb]]'s predictions: per
    * (split, label, prediction) cell with within-split row/column
    * shares. The holdout matrix is the gate; the train−holdout diagonal
    * gap prices overfit. */
  def sourceNbConfusion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    sourceNb(s, dir)
      .groupBy($"split", $"source_label", $"source_pred")
      .agg(count(lit(1)).as("n_docs"))
      .select($"split", $"source_label", $"source_pred", $"n_docs",
        round($"n_docs".cast("double") /
          sum($"n_docs").over(Window.partitionBy($"split", $"source_label")), 6)
          .as("share_of_label"),
        round($"n_docs".cast("double") /
          sum($"n_docs").over(Window.partitionBy($"split", $"source_pred")), 6)
          .as("share_of_pred"))
  }

  /** DISTILLED QUALITY CLASSIFIER — the second instance of the trained
    * NB head ([[sourceNb]] is the first): train on the MEDIAN QUALITY
    * GATE'S OWN VERDICTS (pass = above the per-source quality median,
    * the [[qualityFilter]] keep/cut decision — a balanced teacher by
    * construction), score every document. This is how real pipelines
    * distill a composite quality stack into a cheap token-level scorer
    * (fastText-style quality classifiers are trained exactly this way).
    * The holdout diagonal is the distillation audit: high holdout
    * recall means the NB head can stand in for the full score-and-rank
    * gate at ingestion (via [[graft.streaming.Streams.nbRouter]], which
    * is label-agnostic); a smeared holdout matrix means token counts
    * can't reproduce the gate and it must stay feature-based. Same
    * integer micro-nat arithmetic, split column, and scale shape as
    * [[sourceNb]] — see there; the teacher adds [[qualityFilter]]'s
    * per-source rank window, one exchange. */
  def qualityNb(s: SparkSession, dir: String): DataFrame =
    qualityNbFrom(Tables.documents(s, dir))

  /** Core of [[qualityNb]]: labels derived from the same
    * quality-vs-per-source-median decision [[qualityFilterFrom]]
    * applies (identical expressions, no drift), kept unfiltered so
    * every doc is labeled. */
  private[graft] def qualityNbFrom(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (_, _, quality) = qualitySignals
    val byQ = Window.partitionBy($"source").orderBy($"quality".asc, $"doc_id".asc)
    val whole = Window.partitionBy($"source")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val lo = floor(($"n" + lit(1L)) / lit(2.0)).cast("long")
    val hi = floor(($"n" + lit(2L)) / lit(2.0)).cast("long")
    // label side stays NARROW (doc_id, source, quality — the
    // qualityFilterFrom discipline): the per-source rank window must
    // never sort full document text through its exchange; text joins
    // back doc-keyed afterwards
    val verdicts = docs
      .select($"doc_id", $"source", round(quality, 6).as("quality"))
      .withColumn("rn", row_number().over(byQ))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("median_q",
        round(avg(when($"rn" === lo || $"rn" === hi, $"quality")).over(whole), 6))
      .select($"doc_id",
        when($"quality" >= $"median_q", "pass").otherwise("fail").as("label"))
    // the NB head scans its labeled input ~5 times (vocab, priors,
    // (class, token) counts, doc counts, completion) — checkpoint so
    // the teacher (score + rank window + join) runs ONCE, not per scan
    val labeled = docs.select($"doc_id", $"text")
      .join(verdicts, "doc_id")
      .select($"doc_id", $"text", $"label")
      .localCheckpoint(true)
    nbClassifyFrom(labeled)
      .withColumnRenamed("label", "quality_label")
      .withColumnRenamed("pred", "quality_pred")
  }

  /** CONFUSION AUDIT of the distilled quality classifier — per
    * (split, label, pred) cell; holdout is the gate; on the diagonal,
    * share_of_label is the distillation recall per class. */
  def qualityNbConfusion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    qualityNb(s, dir)
      .groupBy($"split", $"quality_label", $"quality_pred")
      .agg(count(lit(1)).as("n_docs"))
      .select($"split", $"quality_label", $"quality_pred", $"n_docs",
        round($"n_docs".cast("double") /
          sum($"n_docs").over(Window.partitionBy($"split", $"quality_label")), 6)
          .as("share_of_label"),
        round($"n_docs".cast("double") /
          sum($"n_docs").over(Window.partitionBy($"split", $"quality_pred")), 6)
          .as("share_of_pred"))
  }

  /** BPE COMPRESSION REPORT — the one-row pricing artifact next to the
    * merge table: symbol occurrences before any merge (= corpus
    * characters under the tokenizer), after all k merges, the
    * compression ratio those merges buy, and the corpus scale they were
    * fit on. This is the number a vocab-budget decision trades against
    * [[vocabCoverage]]'s OOV curve. Cost: the trainer (above) + two
    * single-row aggregates over type frames. */
  def bpeCompression(s: SparkSession, dir: String,
                     k: Int = BpeK, minCount: Long = 2L): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (merges, wk) = bpeMergesFrom(docs, k, minCount)
    val base = bpeWordTypes(docs)
      .agg(sum($"n" * size(split(trim($"s"), " "))).as("base_symbols"),
        sum($"n").as("n_tokens"), count(lit(1)).as("n_word_types"))
    val fin = wk
      .agg(sum($"n" * size(split(trim($"s"), " "))).as("merged_symbols"))
    val nm = merges.agg(count(lit(1)).as("n_merges"))
    base.crossJoin(fin).crossJoin(nm)
      .select($"n_merges", $"n_word_types", $"n_tokens",
        $"base_symbols", $"merged_symbols",
        round($"merged_symbols".cast("double") / $"base_symbols", 6)
          .as("compression_ratio"))
  }

  /** TF-IDF top terms: the classic corpus-statistics operator — document
    * frequencies via one explode+groupBy, idf broadcast back onto the
    * per-doc term counts, top-3 terms per doc by tf-idf with
    * deterministic tiebreaks. Shuffle shape: one aggregate on term, one
    * window on doc_id. */
  def tfidfTopTerms(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select($"doc_id", wsTokens(lower($"text")).as("toks"))
    // corpus size as a broadcast 1-row aggregate — no collect-to-driver
    val nd = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val tf = docs.select($"doc_id", size($"toks").cast("double").as("len"),
        explode($"toks").as("term"))
      .groupBy($"doc_id", $"term", $"len")
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.select($"term", $"doc_id").distinct()
      .groupBy($"term").agg(count(lit(1)).cast("double").as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"tfidf".desc, $"term".asc)
    tf.join(df, "term")
      .join(broadcast(nd))
      .withColumn("tfidf", round(($"tf" / $"len") * log($"n_docs" / $"df"), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= k)
      .select($"doc_id", $"term", $"tfidf", $"rnk")
  }

  /** N-GRAM VOCABULARY COUNTS — the corpus-frequency pass a tokenizer /
    * vocab builder runs: every word n-gram in the corpus, counted, top-k
    * by count. The n-grams are built from ONE materialized token array
    * per row (`tk` is multi-referenced, so CollapseProject keeps the
    * split out of the gram expressions — a lambda-captured tokenizer
    * would re-split per gram) by `zip_with`-folding n shifted slices:
    * pure argument-position array ops, whole-stage codegen end to end.
    * Count is a partial (map-side) aggregate on gram; the final top-k is
    * `TakeOrderedAndProject`, never a global sort — at 100 TB the only
    * full-width shuffle is the gram-keyed count, which is the job. Ties
    * at the k boundary break on the gram itself, so the top-k SET is
    * deterministic across engines and partitionings. */
  def ngramCounts(s: SparkSession, dir: String, n: Int = 2, k: Int = 20): DataFrame =
    ngramCountsFrom(Tables.documents(s, dir), n, k)

  /** All word n-grams of a token-array column, non-distinct, in order —
    * zip_with fold of n shifted slices (argument-position only; see
    * [[ngramCounts]] for why the token array must be a multi-referenced
    * alias, not an expression captured in a lambda). */
  private[graft] def wordNgramsOf(tk: Column, n: Int): Column = {
    val nGrams = greatest(size(tk) - (n - 1), lit(0))
    val shifted = (0 until n).map(m => slice(tk, lit(m + 1), nGrams))
    shifted.reduce((acc, p) => zip_with(acc, p, (a, b) => concat_ws(" ", a, b)))
  }

  def ngramCountsFrom(docs: DataFrame, n: Int, k: Int): DataFrame = {
    require(n >= 1 && k >= 1, s"need n >= 1 and k >= 1, got n=$n k=$k")
    docs
      .select(wsTokens(lower($"text")).as("tk"))
      .select(explode(wordNgramsOf($"tk", n)).as("gram"))
      .groupBy($"gram").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"gram".asc)
      .limit(k)
  }

  /** Deterministic hash-based train/val/test split — THE sampling
    * primitive of a training pipeline: assignment is a pure function of
    * doc_id (reproducible across runs, engines, and cluster sizes; no
    * RNG state, no sampling-order dependence). 80/10/10 by hash60 mod. */
  def hashSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select($"doc_id", $"n_chars",
        (hash60($"doc_id".cast("string")) % 10L).as("bucket"))
      .withColumn("split",
        when($"bucket" < 8L, "train").when($"bucket" < 9L, "val").otherwise("test"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))

  /** Deterministic STRATIFIED SAMPLING — the corpus down-weighting step
    * every training pipeline runs (keep 100% of a curated source, 10% of
    * a crawl): keep a document iff its hash fraction falls below its
    * source's rate. Like [[hashSplit]] (the 3-way special case), the
    * decision is a PURE FUNCTION of doc_id — reproducible across runs,
    * engines, partitionings and cluster sizes, no RNG state, and
    * MONOTONE in the rate (raising a source's rate only ever adds
    * documents, so samples at different rates nest). The hash is salted
    * ("#strat") so sampling stays independent of the hashSplit buckets —
    * otherwise "train" docs would be systematically over-sampled. */
  def stratifiedSampleFrom(docs: DataFrame, rates: Map[String, Double],
                           defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      s"sampling rates must be in [0,1], got $rates default=$defaultRate")
    val frac =
      pmod(hash60(concat($"doc_id".cast("string"), lit("#strat"))), lit(1000000L))
        .cast("double") / 1000000.0
    val rate = rates.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0.0))) { case (acc, (src, r)) =>
        acc.when($"source" === src, lit(r))
      }
      .otherwise(lit(defaultRate))
    docs.filter(frac < rate)
  }

  /** Registered form: pinned per-source rates over `documents`. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    stratifiedSampleFrom(
      Tables.documents(s, dir),
      rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.0),
      defaultRate = 0.1)
      .select($"doc_id", $"source", $"n_chars")

  /** Deterministic WEIGHTED SAMPLING — exact-k per source, inclusion
    * probability proportional to document weight (here n_chars: longer
    * documents carry more training signal per row, the standard
    * length-weighted corpus draw). PRIORITY SAMPLING (Duffield, Lund &
    * Thorup, JACM 2007): each doc gets priority w / u with u a uniform
    * in (0, 1], and the k highest priorities per source are the sample.
    *
    * u comes from the salted engine-neutral hash ("#wsample" — see
    * [[stratifiedSampleFrom]] for why salts keep the draws independent),
    * mapped to the integer grid (hash mod 1e6) + 1 — and the priority is
    * then ONE long→double cast and ONE division, both of which IEEE 754
    * requires to be exactly rounded. No transcendentals (an
    * Efraimidis–Spirakis u^(1/w) key would hinge on pow/log agreeing to
    * the last ulp across engines — not guaranteed by either libm), so
    * the priority DOUBLES are bit-identical in Spark and DuckDB and the
    * selected SET is too, which is what makes a hash-twin possible at
    * all. Reproducible across runs, engines, partitionings.
    *
    * Shuffle shape: one exchange on `source` + per-partition sort (the
    * same single-window shape as [[qualityFilterFrom]]); for extreme
    * per-source cardinalities the bounded-heap
    * [[graft.functions.TopKAgg]] path the sim_* queries use applies
    * here too — the window form is kept because it emits the rank. */
  def weightedSampleFrom(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"sample size must be >= 1, got $k")
    val u = pmod(hash60(concat($"doc_id".cast("string"), lit("#wsample"))),
      lit(1000000L)) + lit(1L)
    val w = greatest($"n_chars", lit(1L)).cast("double")
    val byP = Window.partitionBy($"source")
      .orderBy($"priority".desc, $"doc_id".asc)
    docs
      .select($"doc_id", $"source", $"n_chars",
        (w / u.cast("double")).as("priority"))
      .withColumn("rk", row_number().over(byP).cast("long"))
      .filter($"rk" <= k)
      .select($"doc_id", $"source", $"n_chars",
        round($"priority", 6).as("priority"), $"rk")
  }

  /** Registered form: 10 length-weighted docs per source. */
  def weightedSample(s: SparkSession, dir: String): DataFrame =
    weightedSampleFrom(Tables.documents(s, dir), k = 10)

  /** REPETITION SCORING — the Gopher-style (Rae et al. 2021, §A1.1)
    * repeated-content signals every pretraining filter runs: fraction of
    * duplicate tokens, fraction of duplicate bigrams, and the share of
    * all bigrams taken by the single most frequent one. Everything is
    * per-row higher-order-function work over the token array — ZERO
    * shuffles, scan-speed at 100 TB. The top-bigram count is a sorted
    * max-run fold (sort the row's bigrams, count the longest run of
    * equal neighbours) instead of an explode+groupBy — the per-doc
    * aggregation never leaves the row. */
  def repetitionScore(s: SparkSession, dir: String): DataFrame =
    repetitionScoreFrom(Tables.documents(s, dir))

  /** Repetition core over any (doc_id, text) frame — unit-testable. */
  def repetitionScoreFrom(docs: DataFrame): DataFrame = {
    val base = docs
      .select($"doc_id", wsTokens(lower($"text")).as("tk"))
    // bigrams as a multi-referenced alias (single references get
    // re-inlined and a captured expression re-evaluates per element)
    val bg = when(size($"tk") >= 2,
        zip_with(
          slice($"tk", lit(1), size($"tk") - 1),
          slice($"tk", lit(2), size($"tk") - 1),
          (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val withBg = base.select($"doc_id", $"tk", bg.as("bg"))
    // longest equal-neighbour run over the SORTED bigrams = the max
    // bigram multiplicity, computed without leaving the row
    val topRun = aggregate(
      array_sort($"bg"),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    def frac(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))
    withBg.select(
      $"doc_id",
      round(when(size($"tk") > 0,
          lit(1.0) - size(array_distinct($"tk")).cast("double") / size($"tk").cast("double"))
        .otherwise(lit(0.0)), 6).as("dup_token_frac"),
      round(when(size($"bg") > 0,
          lit(1.0) - size(array_distinct($"bg")).cast("double") / size($"bg").cast("double"))
        .otherwise(lit(0.0)), 6).as("dup_bigram_frac"),
      round(frac(topRun, size($"bg")), 6).as("top_bigram_frac"))
  }

  /** TOKEN-BUDGET CORPUS MIXING — the mixture-weighting step a
    * pretraining run configures as "N billion tokens of source X, M of
    * source Y": keep each source's documents, in the deterministic
    * salted-hash order (reproducible, engine-neutral, no RNG state —
    * the same order contract as [[packSequences]]), until the source's
    * token budget is reached. A document is kept iff the tokens BEFORE
    * it fit the budget (`cum - n_tok < budget`), so the kept set always
    * crosses the budget by at most one document and is never empty for
    * a positive budget — the fixed-offset analogue of the packing rule,
    * and monotone in the budget (raising a quota only adds documents).
    * One window per source partition; no global sort, no driver state.
    * Unlisted sources default to `defaultBudget` (0 = drop). */
  def tokenBudgetMix(s: SparkSession, dir: String): DataFrame =
    tokenBudgetMixFrom(
      Tables.documents(s, dir),
      budgets = Map("src0" -> 4000L, "src1" -> 2000L, "src2" -> 500L, "src3" -> 0L),
      defaultBudget = 1000L)

  /** Core of [[tokenBudgetMix]] over any (doc_id, source, text) frame. */
  def tokenBudgetMixFrom(docs: DataFrame, budgets: Map[String, Long],
                         defaultBudget: Long): DataFrame = {
    require((budgets.values ++ Seq(defaultBudget)).forall(_ >= 0L),
      s"token budgets must be non-negative, got $budgets default=$defaultBudget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"hk".asc, $"doc_id".asc)
    val budget = budgets.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (src, b)) =>
        acc.when($"source" === src, lit(b))
      }
      .otherwise(lit(defaultBudget))
    docs
      .select($"doc_id", $"source",
        size(wsTokens(lower($"text"))).cast("long").as("n_tok"),
        hash60(concat($"doc_id".cast("string"), lit("#mix"))).as("hk"))
      .withColumn("cum", sum($"n_tok").over(w))
      .filter($"cum" - $"n_tok" < budget)
      .select($"doc_id", $"source", $"n_tok", $"cum")
  }

  /** TOKEN-BALANCED SHARD PLAN — the training-export step after
    * curation: assign every document to a shard of ~`targetChars`
    * content each, in a deterministic hash order (so the plan is
    * reproducible and shard membership is stable under re-runs). The
    * complement of [[graft.sources.Layout.writeShards]]: that sink
    * fixes the shard COUNT by hashing doc ids (shard sizes then follow
    * the data); this fixes the shard SIZE and derives the count — what
    * a fixed-sequence-budget pretraining job wants.
    *
    * Scale shape: shard = floor(exclusive-prefix-sum / target) over the
    * global hash order — but a single global sort+window is exactly the
    * bottleneck a 1000-executor plan must not have. This is the
    * classic TWO-PHASE DISTRIBUTED PREFIX SUM: order by (bucket, hash,
    * id) where bucket = hash % nBuckets; phase 1 computes within-bucket
    * running sums (nBuckets-way parallel window), phase 2 computes the
    * nBuckets exclusive bucket offsets (one tiny single-partition window
    * over nBuckets rows) and broadcasts them back. The DuckDB twin IS
    * the single global window — the gate proves the decomposition exact.
    * Shard boundaries may straddle one document (a doc is assigned
    * wholly to the shard its START offset falls in), so every shard
    * overshoots by < its last document — the packing-rule analogue. */
  def shardPlan(s: SparkSession, dir: String,
                targetChars: Long = 100000L, nBuckets: Int = 32): DataFrame =
    shardPlanFrom(Tables.documents(s, dir), targetChars, nBuckets)

  /** Core of [[shardPlan]] over any (doc_id, n_chars) frame. */
  def shardPlanFrom(docs: DataFrame, targetChars: Long, nBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(targetChars >= 1L, s"targetChars must be positive, got $targetChars")
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    val d = docs.select($"doc_id", $"n_chars",
        hash60(concat($"doc_id".cast("string"), lit("#shard"))).as("hk"))
      .withColumn("bkt", pmod($"hk", lit(nBuckets.toLong)))
    val wIn = Window.partitionBy($"bkt").orderBy($"hk".asc, $"doc_id".asc)
    val inBkt = d.withColumn("cum_in", sum($"n_chars").over(wIn))
    // exclusive bucket offsets: nBuckets rows through one tiny window
    val wOff = Window.orderBy($"bkt".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy($"bkt").agg(sum($"n_chars").as("tot"))
      .withColumn("off", coalesce(sum($"tot").over(wOff), lit(0L)))
      .select($"bkt", $"off")
    inBkt.join(broadcast(offsets), Seq("bkt"))
      .withColumn("gcum", $"off" + $"cum_in")
      .select($"doc_id", $"n_chars",
        expr(s"(gcum - n_chars) div $targetChars").as("shard"))
  }

  /** END-TO-END CURATION MANIFEST — the three curation stages a
    * pretraining data job actually chains, as ONE declarative plan
    * Catalyst optimizes whole: per-source median quality gate
    * ([[qualityFilterFrom]], as a left-semi membership join) → exact
    * content dedup keeping the min doc per normalized fingerprint (the
    * same fingerprint [[Dedup.exact]] groups on) → sequence packing of
    * the survivors ([[packSequencesFrom]]). Output is the final pack
    * manifest. The point of registering the COMPOSITION (each stage
    * already has its own gate query) is that stage seams are where
    * pipelines break — a column renamed, a filter applied to the wrong
    * side — so the composed result is oracle-checked end to end too.
    * Shuffle budget: source exchange (median windows) + fp exchange
    * (dedup) + source exchange (packing) — three, each keyed by the
    * stage's own grain; nothing global. */
  def curationManifest(s: SparkSession, dir: String, budget: Long = 256L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val kept = qualityFilterFrom(docs).select($"doc_id")
    val highQ = docs.join(kept, Seq("doc_id"), "left_semi")
    val wFp = Window.partitionBy($"fp").orderBy($"doc_id".asc)
    val survivors = highQ
      .withColumn("fp", md5(regexp_replace(lower($"text"), "[^a-z0-9]", "")))
      .withColumn("rn", row_number().over(wFp))
      .filter($"rn" === 1)
      .select($"doc_id", $"source", $"text")
    packSequencesFrom(survivors, budget)
  }

  /** SEQUENCE PACKING — the concat-and-chunk step that turns a filtered
    * corpus into fixed-budget training sequences: documents are laid out
    * in a DETERMINISTIC pseudo-random order (salted hash of doc_id — the
    * global shuffle every training run needs, reproducible across runs
    * and cluster sizes, no RNG state) and cut into packs of ~`budget`
    * tokens by a running token count. Packing is PER SOURCE, so the
    * window partitions by source and the sort never goes global — at
    * 100 TB each source's packing is an independent shard (a global
    * single-partition sort would be the classic scale bug). A document
    * is assigned to the pack its FIRST token lands in (fixed-offset
    * binning: pack_id = floor(tokens_before_doc / budget)), so a pack
    * can run over budget by up to one document — deterministic,
    * single-window-pass, and oracle-twinnable, unlike true greedy
    * packing which needs a sequential carry. Output is the per-pack
    * manifest. */
  def packSequences(s: SparkSession, dir: String, budget: Long = 256L): DataFrame =
    packSequencesFrom(Tables.documents(s, dir), budget)

  /** Packing core over any (doc_id, source, text) frame — unit-testable
    * (budget-overrun bound: pack_tokens <= budget + max doc tokens - 1). */
  def packSequencesFrom(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"hk".asc, $"doc_id".asc)
    docs
      .select($"doc_id", $"source",
        size(wsTokens(lower($"text"))).cast("long").as("n_tok"),
        hash60(concat($"doc_id".cast("string"), lit("#pack"))).as("hk"))
      .withColumn("cum", sum($"n_tok").over(w))
      // pack of the FIRST token: cum-n_tok is the tokens laid out before
      // this doc; values < 2^52 so the double floor-div is exact
      .withColumn("pack_id",
        floor(($"cum" - $"n_tok") / lit(budget.toDouble)).cast("long"))
      .groupBy($"source", $"pack_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("pack_tokens"))
  }

  /** PII REDACTION — scan-speed regex scrubbing: replace every match of
    * each named pattern with its placeholder and count the hits (the
    * audit trail a compliance pipeline requires). Patterns apply IN
    * ORDER and each count is taken on the text as already redacted by
    * the earlier patterns, so `n_<name>` is the number of replacements
    * actually made (a digit run inside an address an earlier pattern
    * consumed is not double-counted). Pattern syntax sticks to the
    * RE2∩Java-regex common subset (char classes, bounded repeats,
    * `\b`) so the DuckDB twin matches byte-for-byte. */
  def redactFrom(docs: DataFrame,
                 patterns: Seq[(String, String, String)]): DataFrame = {
    require(patterns.nonEmpty, "need at least one (name, regex, placeholder)")
    val (redacted, counts) =
      patterns.foldLeft(($"text": Column, Vector.empty[Column])) {
        case ((c, acc), (nm, re, ph)) =>
          val n = size(regexp_extract_all(c, lit(re), lit(0)))
            .cast("long").as(s"n_$nm")
          (regexp_replace(c, re, ph), acc :+ n)
      }
    docs.select(($"doc_id" +: counts :+ md5(redacted).as("redacted_md5")): _*)
  }

  /** Registered redaction: emails, long digit runs, and the corpus's
    * stand-in sensitive term (documents are synthetic word streams, so
    * the term pattern is the one that actually fires here; on real data
    * the email/digit patterns do the work). */
  def redact(s: SparkSession, dir: String): DataFrame =
    redactFrom(Tables.documents(s, dir), Seq(
      ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
      ("digits", "[0-9]{4,}", "[NUM]"),
      ("term", "\\bkey\\b", "[TERM]")))

  /** DECONTAMINATION — the eval-overlap check a training corpus needs
    * before any benchmark on it can be trusted: flag corpus documents
    * sharing at least one word w-shingle with a held-out evaluation set,
    * with the count of distinct shared shingles as the evidence trail
    * (the n-gram-overlap rule of Brown et al. 2020 §C / GPT-3's 13-gram
    * filter, parameterized).
    *
    * Shape at 100 TB: the eval side (benchmarks — thousands of docs, not
    * billions) collapses to a distinct set of shingle hashes and
    * BROADCASTS; the corpus side is one scan-speed explode probing the
    * broadcast map, so the only shuffle is the final per-doc count over
    * the (rare) matching rows. If an eval set ever outgrows the
    * broadcast budget, dropping the hint degrades it to a shuffle join
    * with identical results. */
  def decontaminate(s: SparkSession, dir: String,
                    evalSource: String = "src19", w: Int = 3): DataFrame = {
    val d = Tables.documents(s, dir)
    decontaminateFrom(
      d.filter($"source" =!= evalSource),
      d.filter($"source" === evalSource), w)
  }

  /** Core over any corpus/eval (doc_id, text) frames — unit-testable. */
  def decontaminateFrom(corpus: DataFrame, evalSet: DataFrame, w: Int): DataFrame = {
    // tk aliased per frame so the split runs once per row (the captured
    // form re-splits per element — see EngineNeutral.wordShinglesOf)
    def gramHashes: Column =
      array_distinct(transform(wordShinglesOf($"tk", w), g => hash60(g)))
    val evalGrams = evalSet
      .select(wsTokens(lower($"text")).as("tk"))
      .select(explode(gramHashes).as("g")).distinct()
    corpus
      .select($"doc_id", wsTokens(lower($"text")).as("tk"))
      .select($"doc_id", explode(gramHashes).as("g"))
      .join(broadcast(evalGrams), "g")
      .groupBy($"doc_id")
      // per-doc grams are already distinct (array_distinct above), so a
      // plain count IS the distinct shared-shingle count
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** REPEATED-SPAN / BOILERPLATE detection (the corpus-level counterpart
    * of [[repetitionScore]]'s within-doc signals — the "substring
    * duplication" diagnostic of Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better", at shingle grain): a word
    * w-shingle appearing in >= minDf distinct documents is boilerplate
    * (navigation chrome, license headers, templated spans); each
    * document reports how much of it is made of such spans. A doc with a
    * high `common_frac` is template, not content — the signal that a
    * quality gate combines with [[qualityScore]].
    *
    * Shape at 100 TB: per-doc DISTINCT shingle hashes (so the document
    * frequency is a plain count), ONE partial-aggregated exchange on the
    * shingle hash, broadcast-sized nothing — the df table rides the same
    * equi-join shape as [[tfidfTopTerms]]' df, then one per-doc
    * aggregate. Docs shorter than w tokens have no shingles and emit no
    * row — in both engines identically. */
  def commonSpans(s: SparkSession, dir: String, w: Int = 5, minDf: Int = 3): DataFrame =
    commonSpansFrom(Tables.documents(s, dir), w, minDf)

  /** PER-SOURCE KL DIVERGENCE from the corpus unigram distribution —
    * KL(source ‖ corpus) = Σ_t p_t·ln(p_t/q_t) over the source's
    * vocabulary: the corpus-drift audit behind mixture decisions (a
    * source whose token distribution diverges hard from the pooled
    * corpus either deserves its own quality gates or is contaminating
    * the mix — the same signal family DSIR importance weights
    * [[dsirWeights]] act on per document, here aggregated to the
    * source grain a curation dashboard ranks). q_t > 0 wherever
    * p_t > 0 by construction (the corpus pools the sources), so the
    * sum is total.
    *
    * Determinism: counts are integers; each term's contribution is the
    * same IEEE expression on both engines — (c/N_s)·ln((c/N_s)/(C_t/N))
    * — rounded to 12 and summed in DECIMAL(38,12) (order-free), the
    * [[dsirWeights]] ln-parity discipline; the final KL rounds to 6.
    * Shape at 100 TB: one grouped explode for (source, term) counts,
    * one for the corpus df, a broadcast of the per-source totals
    * (sources are few) and the 1-row corpus total — the tfidf df
    * equi-join shape, nothing wider than the vocabulary. */
  def sourceKl(s: SparkSession, dir: String): DataFrame =
    sourceKlFrom(Tables.documents(s, dir))

  /** Core of [[sourceKl]] over any (source, text) frame. */
  def sourceKlFrom(docs: DataFrame): DataFrame = {
    val tf = docs.select($"source", explode(wsTokens(lower($"text"))).as("term"))
    val st = tf.groupBy($"source", $"term").agg(count(lit(1)).as("c"))
    val ct = tf.groupBy($"term").agg(count(lit(1)).as("ctf"))
    val ns = tf.groupBy($"source").agg(count(lit(1)).as("ns"))
    val n = tf.agg(count(lit(1)).as("n"))
    st.join(ct, "term")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(n))
      .select($"source", $"ns",
        round(($"c".cast("double") / $"ns")
          * log(($"c".cast("double") / $"ns") / ($"ctf".cast("double") / $"n")),
          12).cast("decimal(38,12)").as("k"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_terms"), max($"ns").as("n_tokens"),
        round(sum($"k").cast("double"), 6).as("kl_divergence"))
  }

  /** Core of [[commonSpans]] over any (doc_id, text) frame. */
  def commonSpansFrom(docs: DataFrame, w: Int, minDf: Int): DataFrame = {
    require(w >= 1 && minDf >= 1, s"need w >= 1 and minDf >= 1, got w=$w minDf=$minDf")
    // tk aliased so the split runs once per row; shingles are the
    // shifted-slice fold (see EngineNeutral.wordShinglesOf)
    val g = docs
      .select($"doc_id", wsTokens(lower($"text")).as("tk"))
      .select($"doc_id",
        explode(array_distinct(transform(wordShinglesOf($"tk", w), x => hash60(x)))).as("g"))
    val df = g.groupBy($"g").agg(count(lit(1)).as("df"))
    g.join(df, "g")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when($"df" >= minDf, 1L).otherwise(0L)).as("n_common"),
        round(sum(when($"df" >= minDf, 1.0).otherwise(0.0)) / count(lit(1)), 6)
          .as("common_frac"))
  }

  /** UNIGRAM LM SCORING (the CCNet recipe, Wenzek et al. 2020, with the
    * LM reduced to its unigram term): each document's average negative
    * log-probability under the CORPUS unigram distribution — the
    * perplexity-style quality signal that flags documents whose token
    * mix diverges from the corpus (gibberish scores high, plain text
    * low). The "model" is trained and applied in the same plan: corpus
    * term frequencies are one partial-aggregated explode (the tfidf df
    * shape), the corpus total is a broadcast 1-row aggregate, and the
    * per-doc average is one more aggregate on doc_id. Empty documents
    * have no tokens and emit no row — in both engines identically. */
  def unigramLogprob(s: SparkSession, dir: String): DataFrame =
    unigramLogprobFrom(Tables.documents(s, dir))

  /** Core of [[unigramLogprob]] over any (doc_id, text) frame. */
  def unigramLogprobFrom(docs: DataFrame): DataFrame = {
    val tf = docs.select($"doc_id", explode(wsTokens(lower($"text"))).as("term"))
    val corpus = tf.groupBy($"term").agg(count(lit(1)).cast("double").as("ctf"))
    val total = tf.agg(count(lit(1)).cast("double").as("total"))
    tf.join(corpus, "term")
      .join(broadcast(total))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(-log($"ctf" / $"total")), 6).as("avg_neg_logprob"))
  }

  /** DSIR IMPORTANCE WEIGHTS — per-document log importance ratio under
    * hashed unigram bag-of-words models (Xie, Santurkar, Ma & Liang,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): tokens hash into `nBuckets` feature buckets, a
    * TARGET distribution is estimated from the in-domain slice (here
    * lang = 'en' — "select raw data that reads like the target
    * domain"), a RAW distribution from the whole corpus, both with
    * add-one smoothing, and each document scores
    * Σ_tokens log p̂_target(b)/p̂_raw(b). Resampling the corpus with
    * probability ∝ exp(weight) is the DSIR recipe; the weight column is
    * the part a SQL engine owns, and `avg_logratio` is the
    * length-normalized variant a thresholding gate uses directly.
    *
    * Shape at 100 TB: the bucket log-ratio table is at most `nBuckets`
    * rows — built from two partial-agged token scans, broadcast to the
    * per-doc scoring join, so the only exchange carrying data volume is
    * the per-doc aggregate (key-partitioned on doc_id). Determinism:
    * the bucket ratio rounds to 12 and is summed in DECIMAL(38,12)
    * (order-free), the doc total rounds to 6; empty documents have no
    * tokens and emit no row — in both engines identically. */
  def dsirWeights(s: SparkSession, dir: String, nBuckets: Int = 1024,
                  targetLang: String = "en"): DataFrame =
    dsirWeightsFrom(Tables.documents(s, dir), nBuckets, targetLang)

  /** Core of [[dsirWeights]] over any (doc_id, lang, text) frame. */
  def dsirWeightsFrom(docs: DataFrame, nBuckets: Int,
                      targetLang: String): DataFrame = {
    require(nBuckets >= 2, s"need nBuckets >= 2, got $nBuckets")
    val occ = docs
      .select($"doc_id", $"lang", explode(wsTokens(lower($"text"))).as("term"))
      .select($"doc_id", $"lang", (hash60($"term") % nBuckets).as("b"))
    val raw = occ.groupBy($"b").agg(count(lit(1)).as("cr"))
    val tgt = occ.filter($"lang" === targetLang)
      .groupBy($"b").agg(count(lit(1)).as("ct"))
    val nr = occ.agg(count(lit(1)).as("nr"))
    val nt = occ.filter($"lang" === targetLang).agg(count(lit(1)).as("nt"))
    // smoothed log-ratio per OBSERVED bucket (unobserved buckets have no
    // occurrences to score, so only raw-observed buckets matter), built
    // once and broadcast: lr(b) = ln p̂_t(b) − ln p̂_r(b), each p̂ the
    // add-one estimate (c+1)/(N + nBuckets)
    val lr = raw
      .join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
      .select($"b",
        round(
          log((coalesce($"ct", lit(0L)) + lit(1L)).cast("double") /
            ($"nt" + lit(nBuckets.toLong)).cast("double")) -
            log(($"cr" + lit(1L)).cast("double") /
              ($"nr" + lit(nBuckets.toLong)).cast("double")), 12).as("lr"))
    occ.join(broadcast(lr), "b")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        round(sum($"lr".cast("decimal(38,12)")).cast("double"), 6)
          .as("dsir_logratio"),
        round(sum($"lr".cast("decimal(38,12)")).cast("double") / count(lit(1)), 6)
          .as("avg_logratio"))
  }

  /** CCNET PERPLEXITY BUCKETS — the head/middle/tail corpus partition
    * (Wenzek et al., "CCNet: Extracting High Quality Monolingual
    * Datasets from Web Crawl Data", LREC 2020): documents score under
    * the corpus unigram LM ([[unigramLogprobFrom]]), then each
    * LANGUAGE's score distribution is cut at its tertiles — head (most
    * natural third) / middle / tail (most divergent third) — the
    * partition CCNet publishes its crawls in and the standard first
    * axis of an LLM data-mix policy.
    *
    * The tertile cut is the scale-honest histogram form, not a per-lang
    * global sort: scores bin into `nBins` equal-width buckets per
    * language (two broadcast-joined 1-row-per-lang aggregates), the
    * cumulative histogram (a window over the ≤ lang×nBins AGGREGATED
    * rows, never the data) yields the first bin reaching N/3 and 2N/3,
    * and each document labels by INTEGER bin comparison — head strictly
    * below the ⅓ bin, tail at/above the ⅔ bin. Bin-edge granularity
    * (max−min)/nBins is the documented estimate error vs exact ntile —
    * the trade that removes the per-lang sort a 100 TB corpus cannot
    * afford. Determinism: the bin expression is the same left-to-right
    * double chain in both engines ([[graft.operators.Relational
    * .q53HistogramQuantiles]] discipline); threshold compares are
    * integer-vs-integer. */
  def ccnetBuckets(s: SparkSession, dir: String, nBins: Int = 256): DataFrame =
    ccnetBucketsFrom(Tables.documents(s, dir), nBins)

  /** Core of [[ccnetBuckets]] over any (doc_id, lang, text) frame. */
  def ccnetBucketsFrom(docs: DataFrame, nBins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBins >= 3, s"need nBins >= 3, got $nBins")
    val scored = unigramLogprobFrom(docs)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
    val mm = scored.groupBy($"lang")
      .agg(min($"avg_neg_logprob").as("mn"), max($"avg_neg_logprob").as("mx"))
    val binned = scored.join(broadcast(mm), "lang")
      .select($"doc_id", $"lang", $"n_tokens", $"avg_neg_logprob",
        when($"mx" === $"mn", lit(0L))
          .otherwise(least(
            floor(($"avg_neg_logprob" - $"mn") / ($"mx" - $"mn") * nBins)
              .cast("long"),
            lit(nBins - 1L))).as("bin"))
    val hist = binned.groupBy($"lang", $"bin").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"lang").orderBy($"bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum($"n").over(w))
      .join(broadcast(hist.groupBy($"lang").agg(sum($"n").as("n_lang"))), "lang")
    def cutBin(frac: Column): Column = min(when(
      $"cum".cast("double") >= frac, $"bin"))
    val cuts = cum.groupBy($"lang")
      .agg(
        cutBin($"n_lang".cast("double") / lit(3.0)).as("b1"),
        cutBin($"n_lang".cast("double") * lit(2.0) / lit(3.0)).as("b2"))
    binned.join(broadcast(cuts), "lang")
      .select($"doc_id", $"lang", $"n_tokens", $"avg_neg_logprob", $"bin",
        when($"bin" < $"b1", lit("head"))
          .when($"bin" < $"b2", lit("middle"))
          .otherwise(lit("tail")).as("ppl_bucket"))
  }

  /** BIGRAM LM SCORING — [[unigramLogprob]] upgraded one Markov order:
    * each document's average negative log-probability under the corpus
    * BIGRAM model with fixed unigram interpolation,
    * p̂(w2|w1) = 0.7·c(w1 w2)/c(w1) + 0.3·c(w2)/N (Jelinek-Mercer
    * smoothing with a hardcoded λ — 0.7 and 0.3 are written as literals
    * in BOTH engines because 1.0−0.7 is a DIFFERENT double than the
    * literal 0.3). The order-1 term catches what unigrams cannot:
    * shuffled/templated text with a natural token MIX but unnatural
    * token ORDER scores high here and normal there — the
    * contrast column of the CCNet-style quality stack.
    *
    * Shape: model trained and applied in one plan — bigram and unigram
    * counts are partial-agged explodes, the corpus total a broadcast
    * 1-row aggregate; each bigram occurrence joins its three counts by
    * key (all equi-joins on token keys), terms round to 12 and sum in
    * DECIMAL(38,12), the per-doc mean divides once in double. Docs
    * with < 2 tokens keep a (0, 0.0) row via the left join. */
  def bigramLogprob(s: SparkSession, dir: String): DataFrame =
    bigramLogprobFrom(Tables.documents(s, dir))

  /** Core of [[bigramLogprob]] over any (doc_id, text) frame. */
  def bigramLogprobFrom(docs: DataFrame): DataFrame = {
    val t = docs.select($"doc_id", wsTokens(lower($"text")).as("tk"))
    val pairs = when(size($"tk") >= 2,
      transform(sequence(lit(1), size($"tk") - 1),
        i => struct(element_at($"tk", i).as("w1"),
          element_at($"tk", i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val occ = t.select($"doc_id", explode(pairs).as("bg"))
      .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
    val uni = t.select(explode($"tk").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val total = uni.agg(sum($"c").as("n_total"))
    val big = occ.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val phat = lit(0.7) * ($"c12" / $"c1") + lit(0.3) * ($"c2" / $"n_total")
    val perDoc = occ
      .join(big, Seq("w1", "w2"))
      .join(uni.select($"w".as("w1"), $"c".as("c1")), Seq("w1"))
      .join(uni.select($"w".as("w2"), $"c".as("c2")), Seq("w2"))
      .crossJoin(broadcast(total))
      .select($"doc_id", round(-log(phat), 12).cast("decimal(38,12)").as("term"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum($"term").cast("double") / count(lit(1)), 6)
          .as("avg_neg_logprob"))
    docs.select($"doc_id").join(perDoc, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
        coalesce($"avg_neg_logprob", lit(0.0)).as("avg_neg_logprob"))
  }

  /** PMI COLLOCATIONS — the top adjacent word pairs by pointwise mutual
    * information ln(P(xy) / (P(x)·P(y))) (Church & Hanks, Comp.
    * Linguistics 16(1), 1990), minimum pair count 5: the phrases whose
    * words co-occur far beyond their independent rates. On a training
    * corpus this is the templated-phrase detector — boilerplate
    * n-grams, glued entity names, and markup fragments all surface at
    * the PMI head long before a human reads a sample — and the
    * min-count floor is the standard guard against the PMI's
    * rare-pair bias (a hapax pair maxes the score by definition).
    *
    * Shape for scale: bigram and unigram counts are two partial-agged
    * explodes (the [[bigramLogprob]] train-side exchanges); the two
    * 1-row totals broadcast; the score joins land on the BOUNDED
    * surviving-pair set (count >= 5 — vocabulary-sized, not
    * corpus-sized); top-N under the (pmi desc, a, b) total order is
    * TakeOrderedAndProject. Determinism: counts are exact, the PMI
    * divides in one fixed op order and rounds to 6 before ranking. */
  def pmiBigrams(s: SparkSession, dir: String): DataFrame =
    pmiBigramsFrom(Tables.documents(s, dir))

  /** Core of [[pmiBigrams]] over any (doc_id, text) frame. */
  def pmiBigramsFrom(docs: DataFrame, minCount: Int = 5,
                     topN: Int = 50): DataFrame = {
    require(minCount >= 1 && topN >= 1, "need minCount >= 1 and topN >= 1")
    val t = docs.select($"doc_id", wsTokens(lower($"text")).as("tk"))
    val pairs = when(size($"tk") >= 2,
      transform(sequence(lit(1), size($"tk") - 1),
        i => struct(element_at($"tk", i).as("w1"),
          element_at($"tk", i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val occ = t.select(explode(pairs).as("bg"))
      .select($"bg.w1".as("w1"), $"bg.w2".as("w2"))
    val uni = t.select(explode($"tk").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val nTok = uni.agg(sum($"c").as("n_tok"))
    val big = occ.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
      .filter($"c12" >= minCount)
    val nBig = occ.agg(count(lit(1)).as("n_big"))
    big
      .join(uni.select($"w".as("w1"), $"c".as("c1")), Seq("w1"))
      .join(uni.select($"w".as("w2"), $"c".as("c2")), Seq("w2"))
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBig))
      .select($"w1".as("term_a"), $"w2".as("term_b"), $"c12".as("n_pair"),
        round(log(($"c12".cast("double") / $"n_big")
          / (($"c1".cast("double") / $"n_tok")
            * ($"c2".cast("double") / $"n_tok"))), 6).as("pmi"))
      .orderBy($"pmi".desc, $"term_a".asc, $"term_b".asc)
      .limit(topN)
  }

  /** Document fingerprint: md5 over the lowercased alphanumeric skeleton
    * (whitespace/punct-insensitive content identity — the key for exact
    * dedup after normalization). */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      $"doc_id",
      md5(regexp_replace(lower($"text"), "[^a-z0-9]", "")).as("fp"))

  /** True winnowing fingerprints (Schleimer et al., SIGMOD'03): hash the
    * POSITIONAL k-grams, slide a window of `win` consecutive hashes, and
    * keep the minimum of each window; the sketch is the distinct set of
    * selected minima. Guarantees: any shared substring of length >=
    * k + win - 1 yields a shared fingerprint. Docs shorter than one
    * window contribute all their hashes (single-window degenerate case).
    * Output = per-doc fingerprint count + min/max of the sketch. */
  def winnowSketch(s: SparkSession, dir: String, k: Int = 5, win: Int = 4): DataFrame = {
    // hs is materialized as its own multi-referenced alias so the window
    // lambda slices an attribute — a lambda-captured expression would
    // re-hash every gram once per window
    val hashed = Tables.documents(s, dir).select(
      $"doc_id",
      transform(charNgramsOrdered($"text", k), g => hash60(g)).as("hs"))
    val m = size($"hs")
    val fps = array_distinct(
      when(m >= win,
        transform(sequence(lit(1), m - win + 1),
          j => array_min(slice($"hs", j, lit(win)))))
        .otherwise($"hs"))
    hashed.select(
      $"doc_id",
      size(fps).cast("long").as("n_fingerprints"),
      array_min(fps).as("min_fp"),
      array_max(fps).as("max_fp"))
  }

  /** BM25 TOP-K — Okapi BM25 retrieval (Robertson & Walker, SIGIR'94;
    * the Lucene-default idf = ln(1 + (N − df + ½)/(df + ½)) variant)
    * over the documents table for a fixed term query: the ranking a
    * curation pipeline runs to pull topical slices out of a 100 TB
    * corpus, and the retrieval baseline the embedding suite's
    * [[Similarity]] rankers get compared against.
    *
    * Shape: one token explode pre-filtered to the query terms (the
    * scan's pushed predicate — df and tf only ever aggregate the
    * matched postings, never the full token stream), per-term tf/df
    * aggregates, the ≤|terms|-row idf table broadcast back, per-doc
    * score = Σ_t idf·tf·(k1+1)/(tf + k1·(1−b+b·len/avgdl)). Candidate
    * set = docs containing ≥1 query term, so the final rank uses the
    * same two-phase bucket trick as every similarity top-k — no global
    * single-partition sort on the candidate exchange. Determinism: len
    * and tf are integers, avgdl = exact integer sum / count (one fp
    * division), per-term scores round to 9 then sum in DECIMAL
    * (order-free), final score rounds to 6 (ln agrees across engines
    * far past that — the [[unigramLogprob]] precedent). */
  def bm25TopK(s: SparkSession, dir: String,
               terms: Seq[String] = Seq("vector", "spark", "stream", "scan"),
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKFrom(Tables.documents(s, dir), terms, k, k1, b)

  /** Core of [[bm25TopK]] over any (doc_id, text) frame. */
  def bm25TopKFrom(docs: DataFrame, terms: Seq[String], k: Int,
                   k1: Double, b: Double): DataFrame = {
    require(terms.nonEmpty && k >= 1, "need >= 1 query term and k >= 1")
    val toks = docs.select($"doc_id", wsTokens(lower($"text")).as("tk"))
    val lens = toks.select($"doc_id", size($"tk").cast("long").as("len"))
    val corpus = lens.agg(
      count(lit(1)).as("n_docs"),
      (sum($"len").cast("double") / count(lit(1))).as("avgdl"))
    val posting = toks
      .select($"doc_id", explode($"tk").as("term"))
      .filter($"term".isInCollection(terms))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val idf = posting.groupBy($"term")
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(corpus))
      .select($"term",
        log(lit(1.0) + ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)))
          .as("idf"))
    val scored = posting
      .join(broadcast(idf), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(corpus.select($"avgdl")))
      .select($"doc_id",
        round($"idf" * ($"tf" * lit(k1 + 1.0))
          / ($"tf" + lit(k1) * (lit(1.0 - b) + lit(b) * $"len" / $"avgdl")),
          9).cast("decimal(27,10)").as("part"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_terms_hit"),
        round(sum($"part").cast("double"), 6).as("bm25"))
    val bucketed = scored.withColumn("bkt", pmod(hash($"doc_id"), lit(8)))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy($"bkt").orderBy($"bm25".desc, $"doc_id".asc)
    val wFinal = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy($"bm25".desc, $"doc_id".asc)
    bucketed
      .withColumn("rn_local", row_number().over(wLocal))
      .filter($"rn_local" <= k)
      .withColumn("rn", row_number().over(wFinal))
      .filter($"rn" <= k)
      .select($"doc_id", $"n_terms_hit", $"bm25")
  }

  /** DUPLICATED-SPAN REMOVAL — the C4 recipe (Raffel et al., JMLR'20
    * §2.2: "we discarded all but one of any three-sentence span
    * occurring more than once in the data set"), re-expressed over
    * whitespace tokens: every w-token span that occurs more than once
    * CORPUS-WIDE is removed from every document except its canonical
    * first occurrence (min (doc_id, start-pos) — deterministic in both
    * engines), and each document is REBUILT from its surviving tokens.
    * This is the heavy-hammer sibling of [[commonSpans]]: that operator
    * only scores boilerplate; this one excises it and hands back a
    * cleaned corpus — the step between near-dup detection and training.
    *
    * Shape at 100 TB: the shingle stream is O(tokens) rows and rides
    * ONE exchange on the span hash — the canonical-occurrence choice is
    * a window (rank + count) over that exchange, never a self-join.
    * Removed token positions are an explode of the non-canonical spans
    * (bounded by the duplicated-span volume, the thing being removed),
    * and reconstruction is one per-doc aggregate over an anti join —
    * all linear, nothing all-pairs. Overlapping duplicate spans simply
    * union their covered positions; a span duplicated within ONE
    * document keeps only the earlier start. Docs shorter than w tokens
    * contribute no spans and pass through verbatim. */
  def spanDedup(s: SparkSession, dir: String, w: Int = 5): DataFrame =
    spanDedupFrom(Tables.documents(s, dir), w)

  /** Core of [[spanDedup]] over any (doc_id, text) frame. */
  def spanDedupFrom(docs: DataFrame, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(w >= 1, s"need w >= 1, got w=$w")
    val toks = docs.select($"doc_id", wsTokens($"text").as("tk"))
    val occ = toks
      .select($"doc_id", posexplode(wordShinglesOf($"tk", w)).as(Seq("spos", "sh")))
      .select($"doc_id", $"spos", hash60($"sh").as("g"))
    val wg = Window.partitionBy($"g")
    val wRank = wg.orderBy($"doc_id".asc, $"spos".asc)
    val removedSpans = occ
      .withColumn("rn", row_number().over(wRank))
      .withColumn("c", count(lit(1)).over(wg))
      .filter($"c" > 1 && $"rn" > 1)
    val removedPos = removedSpans
      .select($"doc_id", explode(sequence($"spos", $"spos" + lit(w - 1))).as("pos"))
      .distinct()
    val kept = toks
      .select($"doc_id", posexplode($"tk").as(Seq("pos", "tok")))
      .join(removedPos, Seq("doc_id", "pos"), "left_anti")
    val rebuilt = kept.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(array_sort(collect_list(struct($"pos", $"tok"))),
          x => x.getField("tok"))).as("clean_text"))
    toks.select($"doc_id", size($"tk").cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens",
        ($"n_tokens" - coalesce($"n_kept", lit(0L))).as("n_removed"),
        coalesce($"clean_text", lit("")).as("clean_text"))
  }

  /** CHARACTER ENTROPY — per-document Shannon entropy (bits/char) of
    * the character distribution over the lowercased alphanumeric
    * skeleton, with the char totals it derives from. The
    * quality-filter signal the length/punct/stopword trio misses:
    * machine-generated filler, key-mashing and single-char floods sit
    * at pathologically LOW entropy while natural language in any latin
    * script sits near 4-4.7 bits — a threshold on this column is the
    * cheapest "is this text-shaped at all" gate in a curation stack.
    *
    * Shape: one bounded explode (chars of the skeleton — the
    * [[graft.functions.CharNgramsExpr]] codegen kernel at n=1), two
    * partial-agged shuffles on doc_id (per-(doc,char) counts, then
    * per-doc totals), a join back and the entropy aggregate. Per-char
    * terms −p·log2(p) round to 12 and sum in DECIMAL(38,12) — the
    * [[graft.operators.Graph.pageRank]] discipline, so partial-agg
    * order never moves a score. Docs whose skeleton is empty keep a
    * row (entropy 0, 0 chars) via the left join — a totality the
    * filter consuming this column relies on. */
  def charEntropy(s: SparkSession, dir: String): DataFrame =
    charEntropyFrom(Tables.documents(s, dir))

  /** Core of [[charEntropy]] over any (doc_id, text) frame. */
  def charEntropyFrom(docs: DataFrame): DataFrame = {
    val cnts = docs
      .select($"doc_id", explode(charNgramsOrdered($"text", 1)).as("ch"))
      .groupBy($"doc_id", $"ch").agg(count(lit(1)).as("c"))
    val tots = cnts.groupBy($"doc_id")
      .agg(sum($"c").as("n"), count(lit(1)).as("nd"))
    val p = $"c" / $"n"
    val ent = cnts.join(tots, "doc_id")
      .select($"doc_id",
        round(-(p * log2(p)), 12).cast("decimal(38,12)").as("term"))
      .groupBy($"doc_id")
      .agg(round(sum($"term").cast("double"), 6).as("entropy"))
    docs.select($"doc_id")
      .join(tots.join(ent, "doc_id"), Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n", lit(0L)).as("n_chars"),
        coalesce($"nd", lit(0L)).as("n_distinct_chars"),
        coalesce($"entropy", lit(0.0)).as("entropy"))
  }

  /** HEAVY HITTERS — every token whose corpus frequency is at least
    * phi·n (n = total token occurrences), with its exact count and
    * relative frequency. The vocabulary-health report of a curation
    * run: boilerplate markers, template tokens and over-represented
    * stopwords surface here before they skew a tokenizer or a
    * quality model.
    *
    * The answer is EXACT, but the plan never group-bys the full
    * vocabulary: phase 1 is a [[graft.functions.MisraGriesAgg]] sketch
    * pass — bounded state (`cap` counters) per partition, map-side
    * combined, so the exchange carries O(cap) rows however many
    * distinct tokens exist (a trillion-token corpus has billions of
    * singletons; shuffling them to count heavy hitters is the
    * anti-pattern this operator exists to avoid). Misra-Gries
    * guarantees every token with frequency > n/(cap+1) survives ANY
    * update/merge order, so with cap chosen as 2/phi the candidate set
    * is a superset of the answer regardless of how Spark partitions
    * the stream. Phase 2 confirms: a broadcast semi join prunes the
    * token stream to candidates only, one exact count over that
    * residue, and the phi·n threshold filter — deterministic and
    * oracle-equal even though the intermediate sketch is not.
    *
    * The twin is the straight `GROUP BY token HAVING count >= ceil
    * (phi*n)` — exactly the formulation whose shuffle the sketch path
    * dodges; both produce the identical final multiset. */
  def heavyHitters(s: SparkSession, dir: String,
                   phi: Double = 0.002): DataFrame = {
    require(phi > 0.0 && phi <= 0.5, s"phi must be in (0, 0.5], got $phi")
    val cap = math.ceil(2.0 / phi).toInt
    import org.apache.spark.sql.graftbridge.Bridge
    val toks = Tables.documents(s, dir)
      .select(explode(wsTokens(lower($"text"))).as("token"))
    val mg = Bridge.column(
      graft.functions.MisraGriesAgg(
        Bridge.expression($"token"), cap).toAggregateExpression())
    val cands = toks.agg(mg.as("cands"))
      .select(explode($"cands").as("token")).distinct()
    val n = toks.agg(count(lit(1)).as("n_total"))
    toks.join(broadcast(cands), Seq("token"), "left_semi")
      .groupBy($"token").agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(n))
      .filter($"freq" >= ceil(lit(phi) * $"n_total"))
      .select($"token", $"freq", $"n_total",
        round($"freq" / $"n_total", 6).as("rel_freq"))
  }

  /** COUNT-MIN SKETCH ESTIMATE — the d×w counter-matrix frequency
    * sketch (Cormode & Muthukrishnan, J. Algorithms 2005), audited
    * against exact counts. [[heavyHitters]] answers "which tokens are
    * heavy" with bounded state; CMS answers "how often is token X"
    * for ANY token from a fixed d·w-cell summary — the point-query
    * sketch a curation fleet ships between runs instead of a
    * vocabulary-sized histogram. This operator builds the sketch over
    * the corpus, probes it with the exact heavy-hitter set, and
    * reports estimate vs truth — the calibration artifact that tells
    * you whether d×w is sized right for the corpus before you trust
    * the sketch on cold tokens.
    *
    * Mergeability IS the aggregation: cell counts sum, so Spark's
    * partial aggregate (map-side combine per partition, one exchange
    * of ≤ d·w rows per partition) is exactly the sketch-merge rule —
    * at 100 TB the exchange carries O(d·w) rows per partition however
    * many distinct tokens the corpus holds, and two corpora's sketches
    * union by the same groupBy. The d probe hashes reuse the
    * engine-neutral md5 kernel (seeded by suffix, the MinHash
    * discipline), so both engines build bit-identical matrices and the
    * twin is a hash match — the sketch is deterministic even though it
    * is approximate. CMS guarantees estimate ≥ truth (counters only
    * ever over-count on collisions); with w=4096 the expected
    * overshoot is ≤ e·n/w with prob 1−e^−d. Probing with the heavy
    * set keeps the report small and self-calibrating: heavy tokens
    * have the largest absolute counts, so their relative error bounds
    * the sketch's useful resolution. */
  def cmsEstimate(s: SparkSession, dir: String,
                  depth: Int = 4, width: Int = 4096): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape: $depth x $width")
    val toks = Tables.documents(s, dir)
      .select(explode(wsTokens(lower($"text"))).as("token"))
    val js = array((0 until depth).map(lit): _*)
    def bucketOf(tok: Column, j: Column): Column =
      hash60(concat(tok, lit("#cms"), j.cast("string"))) % width
    val sketch = toks.select($"token", explode(js).as("j"))
      .select($"j", bucketOf($"token", $"j").as("bucket"))
      .groupBy($"j", $"bucket").agg(count(lit(1)).as("cnt"))
    val probes = heavyHitters(s, dir).select($"token", $"freq")
      .select($"token", $"freq", explode(js).as("j"))
      .withColumn("bucket", bucketOf($"token", $"j"))
    probes.join(sketch, Seq("j", "bucket"))
      .groupBy($"token", $"freq")
      .agg(min($"cnt").as("cms_est"))
      .select($"token", $"freq", $"cms_est",
        ($"cms_est" - $"freq").as("overestimate"))
  }

  /** ZIPF FIT — the power-law exponent of the token rank-frequency
    * curve: least-squares slope/intercept/R² of ln(freq) against
    * ln(rank) over the top `nTerms` tokens. THE one-number corpus
    * health statistic: natural language sits near slope −1 (Zipf's
    * law); a corpus drifting toward 0 is template-flooded (flat head),
    * one steepening far past −1 is dominated by a tiny vocabulary —
    * either way the tokenizer and the quality model see it here first,
    * and a per-source or per-ingestion-run fit is the drift monitor.
    *
    * Shape: one token count (partial-aggregated exchange), a
    * TakeOrderedAndProject head under the (freq desc, token asc) total
    * order — the full vocabulary never sorts globally — then closed-
    * form least squares over ≤ nTerms rows: per-term ln values rounded
    * to 8 (the [[Graph.pageRank]] double discipline — libm ULP
    * differences between engines vanish at 8 dp), per-term products
    * also rounded to 8, all five sums in DECIMAL(38,12) so partial-agg
    * order never moves the fit, finals rounded to 6. At 100 TB the
    * only data-sized step is the token count every text operator
    * already pays; the regression itself is a ≤ nTerms-row reduction.
    */
  def zipfFit(s: SparkSession, dir: String, nTerms: Int = 200): DataFrame = {
    require(nTerms >= 3, s"need >= 3 points to fit, got $nTerms")
    val freqs = Tables.documents(s, dir)
      .select(explode(wsTokens(lower($"text"))).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"token".asc)
      .limit(nTerms)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"freq".desc, $"token".asc)
    val xy = freqs
      .withColumn("rnk", row_number().over(w))
      .select(
        round(log($"rnk"), 8).as("x"),
        round(log($"freq"), 8).as("y"))
      .select($"x", $"y",
        round($"x" * $"x", 8).as("xx"),
        round($"y" * $"y", 8).as("yy"),
        round($"x" * $"y", 8).as("xyp"))
    def dec(c: Column) = sum(c.cast("decimal(38,12)")).cast("double")
    xy.agg(
        count(lit(1)).as("n_terms"),
        dec($"x").as("sx"), dec($"y").as("sy"),
        dec($"xx").as("sxx"), dec($"yy").as("syy"), dec($"xyp").as("sxy"))
      .select($"n_terms",
        round(($"n_terms" * $"sxy" - $"sx" * $"sy") /
          ($"n_terms" * $"sxx" - $"sx" * $"sx"), 6).as("slope"),
        round(($"sy" - ($"n_terms" * $"sxy" - $"sx" * $"sy") /
          ($"n_terms" * $"sxx" - $"sx" * $"sx") * $"sx") / $"n_terms", 6)
          .as("intercept"),
        round(
          (($"n_terms" * $"sxy" - $"sx" * $"sy") *
            ($"n_terms" * $"sxy" - $"sx" * $"sy")) /
            (($"n_terms" * $"sxx" - $"sx" * $"sx") *
              ($"n_terms" * $"syy" - $"sy" * $"sy")), 6).as("r2"))
  }

  /** DEDUP IMPACT REPORT — what exact dedup DOES to the corpus, in one
    * row: document / token / type counts before and after keeping the
    * min-doc_id survivor per normalized fingerprint (the
    * [[graft.operators.Dedup.exact]] grouping), plus the KL divergence
    * of the survivors' unigram distribution from the full corpus's.
    * Removal counts alone undersell or oversell a dedup pass — dropping
    * a million copies of one boilerplate page barely moves the
    * distribution (KL ≈ 0: safe), while dropping a few huge documents
    * can tilt it hard (the curation decision that needs a human) — so
    * the report prices the DISTRIBUTIONAL cost next to the row savings,
    * the number data-curation writeups publish alongside dedup rates.
    *
    * Determinism: counts are exact; per-term KL contributions use the
    * [[sourceKl]] discipline — one fixed IEEE op order, round(12),
    * DECIMAL(38,12) sum, round(6). Survivor terms are a subset of
    * corpus terms, so no zero denominators exist. Shape: one
    * fingerprint exchange (the dedup pass itself), one semi join, two
    * token-count exchanges, broadcast 1-row totals — every aggregate
    * partial-agged, output is ONE row. */
  def dedupImpact(s: SparkSession, dir: String): DataFrame =
    dedupImpactFrom(Tables.documents(s, dir))

  /** Core of [[dedupImpact]] over any (doc_id, text) frame. */
  def dedupImpactFrom(docs: DataFrame): DataFrame = {
    val kept = docs
      .select($"doc_id",
        md5(regexp_replace(lower($"text"), "[^a-z0-9]", "")).as("fp"))
      .groupBy($"fp").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
    val keptDocs = docs.join(kept, Seq("doc_id"), "left_semi")
    def tf(d: DataFrame) = d.select(explode(wsTokens(lower($"text"))).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("c"))
    val full = tf(docs).localCheckpoint(true)
    val keptTf = tf(keptDocs)
    val nFull = full.agg(sum($"c").as("n"), count(lit(1)).as("types"))
    val nKept = keptTf.agg(sum($"c").as("nk"), count(lit(1)).as("types_k"))
    val kl = keptTf.select($"term", $"c".as("ck"))
      .join(full, "term")
      .crossJoin(broadcast(nKept.select($"nk")))
      .crossJoin(broadcast(nFull.select($"n")))
      .select(round(($"ck".cast("double") / $"nk")
        * log(($"ck".cast("double") / $"nk") / ($"c".cast("double") / $"n")),
        12).cast("decimal(38,12)").as("k"))
      .agg(round(sum($"k").cast("double"), 6).as("kl_kept_vs_full"))
    docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(keptDocs.agg(count(lit(1)).as("n_docs_kept"))))
      .crossJoin(broadcast(nFull.select($"n".as("n_tokens"), $"types".as("n_types"))))
      .crossJoin(broadcast(nKept.select($"nk".as("n_tokens_kept"),
        $"types_k".as("n_types_kept"))))
      .crossJoin(broadcast(kl))
  }

  /** HEAPS' LAW FIT — the vocabulary-growth exponent: least-squares fit
    * of ln(V) against ln(N) where V is the distinct-type count and N
    * the token count after each doc_id-ordered corpus prefix (Heaps,
    * "Information Retrieval", 1978: V ≈ K·N^β, natural text β ≈
    * 0.4–0.6). The companion drift monitor to [[zipfFit]]'s static
    * rank curve: a corpus whose β collapses toward 0 between two
    * ingestion runs has stopped contributing NEW vocabulary — the
    * template-flood / dedup-failure signal at one number — while β
    * near 1 says near-disjoint token streams (ids, hashes, codes).
    *
    * Scale shape: the x-axis needs a GLOBAL prefix sum, so the doc
    * grain is first aggregated to ≤ nPoints+1 doc_id-range buckets
    * (step = max_id div nPoints + 1, broadcast 1-row max) — per-bucket
    * token totals and new-type counts are two partial-agged exchanges
    * (new types via min-doc_id first occurrence, the standard
    * first-touch trick), and ONLY the bounded bucket frame flows
    * through the cumulative window (the [[shardPlan]] concern solved
    * the histogram-quantile way: never a window over row-grain data).
    * Fit arithmetic is [[zipfFit]]'s verbatim: ln/products rounded to
    * 8 before DECIMAL(38,12) sums, finals rounded to 6. */
  def heapsFit(s: SparkSession, dir: String, nPoints: Int = 64): DataFrame =
    heapsFitFrom(Tables.documents(s, dir), nPoints)

  /** Core of [[heapsFit]] over any (doc_id, text) frame. */
  def heapsFitFrom(docs: DataFrame, nPoints: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nPoints >= 3, s"need >= 3 prefix points, got $nPoints")
    val t = docs.select($"doc_id", wsTokens(lower($"text")).as("tk"))
    val mx = docs.agg(max($"doc_id").as("mxid"))
    val perDocTok = t.select($"doc_id", size($"tk").cast("long").as("nt"))
    val newTypes = t.select($"doc_id", explode($"tk").as("token"))
      .groupBy($"token").agg(min($"doc_id").as("fd"))
      .groupBy($"fd").agg(count(lit(1)).as("nv"))
    val buckets = perDocTok
      .join(newTypes, $"doc_id" === $"fd", "left")
      .crossJoin(broadcast(mx))
      .select(expr(s"doc_id div (mxid div $nPoints + 1)").as("g"),
        $"nt", coalesce($"nv", lit(0L)).as("nv"))
      .groupBy($"g").agg(sum($"nt").as("bt"), sum($"nv").as("bv"))
    val wCum = Window.orderBy($"g".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = buckets
      .select($"g", sum($"bt").over(wCum).as("cn"), sum($"bv").over(wCum).as("cv"))
      .filter($"cn" > 0 && $"cv" > 0)
      .select(round(log($"cn"), 8).as("x"), round(log($"cv"), 8).as("y"))
      .select($"x", $"y",
        round($"x" * $"x", 8).as("xx"),
        round($"y" * $"y", 8).as("yy"),
        round($"x" * $"y", 8).as("xyp"))
    def dec(c: Column) = sum(c.cast("decimal(38,12)")).cast("double")
    pts.agg(
        count(lit(1)).as("n_points"),
        dec($"x").as("sx"), dec($"y").as("sy"),
        dec($"xx").as("sxx"), dec($"yy").as("syy"), dec($"xyp").as("sxy"))
      .select($"n_points",
        round(($"n_points" * $"sxy" - $"sx" * $"sy") /
          ($"n_points" * $"sxx" - $"sx" * $"sx"), 6).as("beta"),
        round(($"sy" - ($"n_points" * $"sxy" - $"sx" * $"sy") /
          ($"n_points" * $"sxx" - $"sx" * $"sx") * $"sx") / $"n_points", 6)
          .as("ln_k"),
        round(
          (($"n_points" * $"sxy" - $"sx" * $"sy") *
            ($"n_points" * $"sxy" - $"sx" * $"sy")) /
            (($"n_points" * $"sxx" - $"sx" * $"sx") *
              ($"n_points" * $"syy" - $"sy" * $"sy")), 6).as("r2"))
  }

  /** N-GRAM NOVELTY CURVE — per document, the fraction of its distinct
    * word 5-gram fingerprints that first appear THERE in doc_id order
    * (first occurrence = min doc_id holding the gram — the same
    * first-touch aggregate [[heapsFit]] uses at type grain). The
    * per-document complement of the corpus-level Heaps curve: a late
    * document with near-zero novelty is TEMPLATE/REHASH material even
    * if no single earlier document matches it pairwise (its grams are
    * scattered across many predecessors — exactly the case the
    * pairwise dedup family cannot flag), while a novelty spike inside
    * an otherwise-flat ingestion run marks a genuinely new source.
    *
    * Shape: one gram explode (doc-distinct, the [[commonSpans]]
    * stream), one gram-keyed min aggregate, one equi-join back, one
    * per-doc rollup — all partial-aggregated, nothing wider than the
    * gram stream. Short docs (< 5 tokens) have no grams and report 0
    * novelty over 0 grams (left-join totality, the [[bigramLogprob]]
    * convention). */
  def ngramNovelty(s: SparkSession, dir: String, w: Int = 5): DataFrame =
    ngramNoveltyFrom(Tables.documents(s, dir), w)

  /** Core of [[ngramNovelty]] over any (doc_id, text) frame. */
  def ngramNoveltyFrom(docs: DataFrame, w: Int): DataFrame = {
    require(w >= 1, s"need w >= 1, got $w")
    val g = docs
      .select($"doc_id", wsTokens(lower($"text")).as("tk"))
      .select($"doc_id",
        explode(array_distinct(transform(wordShinglesOf($"tk", w), x => hash60(x))))
          .as("gram"))
    val fd = g.groupBy($"gram").agg(min($"doc_id").as("fdoc"))
    val perDoc = g.join(fd, "gram")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"fdoc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
      .select($"doc_id", $"n_grams", $"n_novel",
        round($"n_novel".cast("double") / $"n_grams", 6).as("novelty_frac"))
    docs.select($"doc_id").join(perDoc, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_grams", lit(0L)).as("n_grams"),
        coalesce($"n_novel", lit(0L)).as("n_novel"),
        coalesce($"novelty_frac", lit(0.0)).as("novelty_frac"))
  }

  /** LEXICAL DIVERSITY — per-document vocabulary-richness signals:
    * type-token ratio, hapax fraction (types occurring once), and
    * Yule's K = 10⁴·(Σ_t cnt_t² − N)/N² (Yule, "The Statistical Study
    * of Literary Vocabulary", 1944) — the repetition characteristic
    * that, unlike TTR, is robust to document length. The curation
    * reading: machine-generated / template text shows low TTR and HIGH
    * K (few types doing all the work); keyword-stuffed spam shows the
    * opposite skew; both tails are filter candidates that the
    * n-gram-repetition score ([[repetitionScore]]) only partially
    * overlaps (K sees BAG repetition at any distance, n-grams only see
    * adjacency).
    *
    * Shape: explode to (doc, token) → two partial-agged doc-keyed
    * aggregates (within-doc type counts, then the per-doc rollup — the
    * second group rides the first's hashpartitioning on the shared
    * doc_id prefix). Integer moments (Σcnt, Σcnt²) are exact longs;
    * each ratio divides once in double and rounds to 6. */
  def lexicalDiversity(s: SparkSession, dir: String): DataFrame =
    lexicalDiversityFrom(Tables.documents(s, dir))

  def lexicalDiversityFrom(docs: DataFrame): DataFrame =
    docs.select($"doc_id", explode(wsTokens(lower($"text"))).as("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id")
      .agg(sum($"cnt").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when($"cnt" === 1L, 1L).otherwise(0L)).as("n_hapax"),
        sum($"cnt" * $"cnt").as("sum_cnt_sq"))
      .select($"doc_id", $"n_tokens", $"n_types",
        round($"n_types".cast("double") / $"n_tokens", 6).as("ttr"),
        round($"n_hapax".cast("double") / $"n_types", 6).as("hapax_frac"),
        round(lit(10000.0) * ($"sum_cnt_sq" - $"n_tokens").cast("double") /
          ($"n_tokens".cast("double") * $"n_tokens".cast("double")), 6)
          .as("yule_k"))

  /** GOPHER QUALITY RULES — the published MassiveWeb rule set (Rae et
    * al., "Scaling Language Models: Methods, Analysis & Insights from
    * Training Gopher", 2021, App. A1.1) as per-document flags: word
    * count in [50, 100k], mean word length in [3, 10], hash/ellipsis
    * symbol-to-word ratio ≤ 0.1, < 90% of lines bullet-started, ≤ 30%
    * of lines ellipsis-ended, ≥ 80% of words containing an alphabetic
    * character, and ≥ 2 distinct stop words from the paper's 8-word
    * list. Where [[qualityScore]] ranks (a continuous composite for
    * threshold sweeps), this GATES — the reproducible fixed rule set a
    * curation run applies before any learned scoring, and the per-rule
    * flags are the audit trail ("which rule killed this document").
    *
    * All signals are codegen expressions over one scan — no shuffle at
    * all; at 100 TB this runs at parquet-read speed and the output
    * partitions like the input. Every ratio is rounded to 6 BEFORE its
    * threshold compare, so the flag is a comparison of engine-identical
    * doubles (the [[qualityFilter]] discipline). */
  def gopherRules(s: SparkSession, dir: String): DataFrame =
    gopherFlagCols(Tables.documents(s, dir))
      .select($"doc_id", $"source", $"n_words", $"mean_word_len",
        $"symbol_ratio", $"bullet_frac", $"ellipsis_line_frac",
        $"alpha_word_frac", $"n_stop_kinds", $"r_word_count",
        $"r_mean_word_len", $"r_symbol", $"r_bullet", $"r_ellipsis",
        $"r_alpha", $"r_stop", $"gopher_pass")

  /** Gopher flags over ANY frame with (doc_id, text) — no other columns
    * required (the registered entry keeps `source`; this variant keeps
    * the minimal-schema contract the scaladoc promises). */
  def gopherRulesFrom(docs: DataFrame): DataFrame =
    gopherFlagCols(docs)
      .select($"doc_id", $"n_words", $"mean_word_len",
        $"symbol_ratio", $"bullet_frac", $"ellipsis_line_frac",
        $"alpha_word_frac", $"n_stop_kinds", $"r_word_count",
        $"r_mean_word_len", $"r_symbol", $"r_bullet", $"r_ellipsis",
        $"r_alpha", $"r_stop", $"gopher_pass")

  /** APPEND the Gopher signal + flag columns to any frame with `text` —
    * the stateless codegen core shared by the batch report and the
    * streaming quality-gate monitor ([[graft.streaming.Streams
    * .qualityGateMonitor]]): the flags a live ingestion window
    * aggregates are definitionally the flags the batch gate applies. */
  private[graft] def gopherFlagCols(docs: DataFrame): DataFrame = {
    val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val toks = wsTokens(lower($"text"))
    val nW = size(toks).cast("long")
    val nWd = nW.cast("double")
    val meanLen = round(when(nW > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nWd)
      .otherwise(lit(0.0)), 6)
    val nHash = (length($"text") - length(regexp_replace($"text", "#", ""))).cast("double")
    val nEll = size(regexp_extract_all($"text", lit("\\.\\.\\.|…"), lit(0))).cast("double")
    val symRatio = round(when(nW > 0, greatest(nHash, nEll) / nWd)
      .otherwise(lit(0.0)), 6)
    val lines = split($"text", "\n")
    val nLines = size(lines).cast("double")
    val bulletFrac = round(
      size(filter(lines, l => l.rlike("^\\s*[-•*]"))).cast("double") / nLines, 6)
    val ellLineFrac = round(
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("double") / nLines, 6)
    val alphaFrac = round(when(nW > 0,
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / nWd)
      .otherwise(lit(0.0)), 6)
    val nStopKinds = size(array_distinct(
      filter(toks, t => t.isInCollection(gopherStops)))).cast("long")
    docs
      .withColumn("n_words", nW)
      .withColumn("mean_word_len", meanLen)
      .withColumn("symbol_ratio", symRatio)
      .withColumn("bullet_frac", bulletFrac)
      .withColumn("ellipsis_line_frac", ellLineFrac)
      .withColumn("alpha_word_frac", alphaFrac)
      .withColumn("n_stop_kinds", nStopKinds)
      .withColumn("r_word_count", $"n_words" >= 50L && $"n_words" <= 100000L)
      .withColumn("r_mean_word_len",
        $"mean_word_len" >= 3.0 && $"mean_word_len" <= 10.0)
      .withColumn("r_symbol", $"symbol_ratio" <= 0.1)
      .withColumn("r_bullet", $"bullet_frac" <= 0.9)
      .withColumn("r_ellipsis", $"ellipsis_line_frac" <= 0.3)
      .withColumn("r_alpha", $"alpha_word_frac" >= 0.8)
      .withColumn("r_stop", $"n_stop_kinds" >= 2L)
      .withColumn("gopher_pass",
        $"r_word_count" && $"r_mean_word_len" && $"r_symbol" && $"r_bullet"
          && $"r_ellipsis" && $"r_alpha" && $"r_stop")
  }

  /** TEXT-MODEL PERSISTENCE — the text third of the persisted-artifact
    * story ([[graft.operators.Similarity.writeIvfIndex]] is the vector
    * index, [[graft.operators.Dedup.writeLshIndex]] the dedup index):
    * the three trained text models the streaming routers serve — the
    * Cavnar–Trenkle rank profiles ([[langProfileOf]]), the integer
    * micro-nat NB model ([[sourceNbModelOf]]) and the BPE merge list
    * ([[bpeMerges]]) — each get a write/load pair so a router restart
    * loads the model from storage, never from a live upstream plan. All
    * three are BOUNDED tables whatever the corpus (≤|langs|·K profile
    * rows, ≤|classes|·(V+1) model entries, ≤K merges), so each is one
    * tiny single-file parquet written once per (re)train. Every value
    * is BIGINT/INT/VARCHAR — no floating point anywhere in the
    * artifacts — so the round-trip is trivially bit-exact;
    * [[modelRoundtrip]] is the registered, oracle-checked proof. */
  def writeLangProfile(prof: DataFrame, path: String): Unit = {
    val cols = prof.columns.toSet
    require(Set("lang", "gram", "lrank").subsetOf(cols),
      s"langid artifact needs (lang, gram, lrank) columns, got $cols")
    prof.select($"lang", $"gram", $"lrank")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load the rank-profile artifact [[writeLangProfile]] persisted. A
    * 0-row artifact is a valid "no model trained yet" state (the router
    * degrades to 'und' routing); a MISSING path is a deployment error
    * and fails loudly with the parquet read error. */
  def loadLangProfile(s: SparkSession, path: String): DataFrame = {
    val df = s.read.parquet(path)
    val cols = df.columns.toSet
    require(Set("lang", "gram", "lrank").subsetOf(cols),
      s"not a langid profile artifact at $path: columns $cols")
    df.select($"lang".cast("string").as("lang"),
      $"gram".cast("string").as("gram"), $"lrank".cast("int").as("lrank"))
  }

  /** Persist the NB model tuple as one long-format table: per class a
    * ('prior', cls, NULL, prior_micro) row, per (token, class) a
    * ('w', cls, tok, weight_micro) row — the complete |classes|·(V+1)
    * entry set, no sparsity (absent pairs carry the Laplace floor, a
    * REAL weight the scorer needs). */
  def writeNbModel(model: (IndexedSeq[String], IndexedSeq[Long],
                     Map[String, IndexedSeq[Long]]),
                   s: SparkSession, path: String): Unit = {
    val (classes, priors, weights) = model
    require(classes.length == priors.length,
      s"nb model: ${classes.length} classes vs ${priors.length} priors")
    require(weights.values.forall(_.length == classes.length),
      "nb model: weight rows misaligned with classes")
    import s.implicits._
    val rows: Seq[(String, String, String, Long)] =
      classes.indices.map(i =>
        ("prior", classes(i), null: String, priors(i))) ++
        weights.toSeq.flatMap { case (t, ws) =>
          classes.indices.map(i => ("w", classes(i), t, ws(i))) }
    rows.toDF("entry", "cls", "tok", "micro")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load the NB artifact back into [[sourceNbModelOf]]'s tuple shape —
    * classes re-derived in sorted order from the prior rows (the
    * tie-break order [[graft.functions.NbScoreExpr]] requires), weights
    * re-assembled positionally against it. An incomplete weight row
    * (token missing a class) fails loudly: positional weights against
    * a wrong class list would mis-score silently. */
  def loadNbModel(s: SparkSession, path: String)
      : (IndexedSeq[String], IndexedSeq[Long], Map[String, IndexedSeq[Long]]) = {
    val df = s.read.parquet(path)
    val cols = df.columns.toSet
    require(Set("entry", "cls", "tok", "micro").subsetOf(cols),
      s"not an nb model artifact at $path: columns $cols")
    val rows = df.select($"entry".cast("string"), $"cls".cast("string"),
      $"tok".cast("string"), $"micro".cast("long")).collect()
    val pri = rows.filter(_.getString(0) == "prior")
      .map(r => r.getString(1) -> r.getLong(3)).sortBy(_._1)
    val classes = pri.map(_._1).toIndexedSeq
    val priors = pri.map(_._2).toIndexedSeq
    val idx = classes.zipWithIndex.toMap
    val weights = rows.filter(_.getString(0) == "w").groupBy(_.getString(2))
      .map { case (t, rs) =>
        require(rs.length == classes.length,
          s"nb model artifact at $path: token has ${rs.length} weight rows " +
            s"for ${classes.length} classes")
        val arr = new Array[Long](classes.length)
        rs.foreach(r => arr(idx(r.getString(1))) = r.getLong(3))
        t -> (arr.toIndexedSeq: IndexedSeq[Long])
      }
    (classes, priors, weights)
  }

  def writeBpeMerges(merges: DataFrame, path: String): Unit = {
    val cols = merges.columns.toSet
    require(Set("merge_rank", "sym_a", "sym_b").subsetOf(cols),
      s"bpe artifact needs (merge_rank, sym_a, sym_b) columns, got $cols")
    merges.select($"merge_rank", $"sym_a", $"sym_b")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load the merge-list artifact back into the rank-ordered pair list
    * [[graft.streaming.Streams.bpeRouter]] consumes. Order is restored
    * from the persisted ranks, never from file order. */
  def loadBpeMerges(s: SparkSession, path: String): Seq[(String, String)] = {
    val df = s.read.parquet(path)
    val cols = df.columns.toSet
    require(Set("merge_rank", "sym_a", "sym_b").subsetOf(cols),
      s"not a bpe merge artifact at $path: columns $cols")
    df.select($"merge_rank".cast("long"), $"sym_a".cast("string"),
      $"sym_b".cast("string")).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
  }

  /** Scratch root for [[modelRoundtrip]]'s artifacts: one directory per
    * corpus dir (md5-tagged so base and scaled legs never collide),
    * under java.io.tmpdir — the artifacts are KB-sized whatever the
    * corpus. */
  private def modelScratch(dir: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    new java.io.File(new java.io.File(
      sys.props("java.io.tmpdir"), "graft-text-models"),
      new java.io.File(dir).getName + "-" + tag).getPath
  }

  /** TEXT-MODEL PERSISTENCE ROUND-TRIP — registered and oracle-checked:
    * train all three router models on their batch training splits
    * (langid/NB on doc_id % 5 != 0 — the batch operators' split; BPE on
    * the full corpus — the trainer's contract), PERSIST each to
    * parquet, load them back, and serve the HOLDOUT split (doc_id % 5
    * == 0, the docs the models never saw) entirely from the LOADED
    * artifacts through the routers' own per-row kernels
    * ([[graft.functions.LangIdScoreExpr]]/[[graft.functions
    * .NbScoreExpr]]/[[graft.functions.BpeCountExpr]]). One row per
    * holdout doc: language routing, provenance scoring and piece
    * pricing — the complete front-door verdict a 100 TB ingestion
    * pipeline stamps on every arriving document. The DuckDB twin
    * re-derives all three scorings from raw text with no persistence
    * step and no kernels (the batch CTE chains), so a hash match proves
    * BOTH contracts at once: parquet round-tripped models serve
    * bit-identically, and the kernels match the batch operators on the
    * served split. */
  def modelRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val docs = Tables.documents(s, dir)
    val train = docs.filter($"doc_id" % 5 =!= 0)
    val root = modelScratch(dir)
    writeLangProfile(langProfileOf(train), s"$root/langid")
    writeNbModel(sourceNbModelOf(train), s, s"$root/nb")
    writeBpeMerges(bpeMergesFrom(docs, BpeK, 2L)._1, s"$root/bpe")
    val profRows = loadLangProfile(s, s"$root/langid").collect()
    val profiles = profRows.groupBy(_.getString(0)).toSeq
      .map { case (l, rs) =>
        l -> rs.map(r => r.getString(1) -> r.getInt(2)).toMap }
      .sortBy(_._1)
    val (classes, priors, weights) = loadNbModel(s, s"$root/nb")
    val merges = loadBpeMerges(s, s"$root/bpe")
    // the routers' degraded shapes for empty models, as literal structs
    val lid =
      if (profiles.isEmpty) struct(
        lit(null).cast("string").as("lang_pred"),
        lit(null).cast("long").as("best_dist"),
        lit(null).cast("long").as("margin"))
      else Bridge.column(graft.functions.LangIdScoreExpr(
        Bridge.expression($"text"), profiles, LangProfK, DocProfK))
    val nb =
      if (classes.isEmpty) struct(
        lit("und").as("source_pred"),
        lit(null).cast("long").as("best_score_micro"),
        lit(null).cast("long").as("margin_micro"))
      else Bridge.column(graft.functions.NbScoreExpr(
        Bridge.expression($"text"), classes, priors, weights))
    val bp = Bridge.column(graft.functions.BpeCountExpr(
      Bridge.expression($"text"), merges))
    docs.filter($"doc_id" % 5 === 0)
      .select($"doc_id", lid.as("lid"), nb.as("nb"), bp.as("bp"))
      .select($"doc_id",
        coalesce($"lid"("lang_pred"), lit("und")).as("lang_pred"),
        $"lid"("best_dist").as("best_dist"),
        $"lid"("margin").as("margin"),
        $"nb"("source_pred").as("source_pred"),
        $"nb"("best_score_micro").as("best_score_micro"),
        $"nb"("margin_micro").as("margin_micro"),
        $"bp"("n_tokens").as("n_tokens"),
        $"bp"("n_pieces").as("n_pieces"),
        when($"bp"("n_tokens") > 0L,
          round($"bp"("n_pieces").cast("double") / $"bp"("n_tokens"), 6))
          .otherwise(lit(null).cast("double")).as("pieces_per_token"))
  }
}
