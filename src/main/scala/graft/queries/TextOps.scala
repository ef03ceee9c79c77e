package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Text-analysis operators for the LLM-data pipeline: SimHash
  * near-dedup, exact n-gram Jaccard verification, language-ID heuristic,
  * quality scoring, token counting, document fingerprinting.
  *
  * Same determinism contract as [[LlmOps]]: md5 hex strings are the only
  * hash primitive; ratios are exact-integer divisions (bit-identical
  * IEEE ops across engines). Every query is a single scan + narrow
  * shuffle — nothing here is all-pairs or collects to the driver.
  */
object TextOps {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------------
  // q29: SimHash — 16-bit signature over distinct tokens. Bit b is the
  // sign of the sum over tokens of ±1 votes; vote b comes from the b-th
  // hex NIBBLE of ONE md5 per token (nibble >= '8' is the nibble's top
  // bit — an independent uniform coin per position, portable across
  // engines). One digest feeds all 16 bits, and the votes are summed by
  // a codegen'd hash aggregate over EXPLODED token rows (higher-order
  // lambdas are CodegenFallback — interpreted; explode + 16 sum(int)
  // partials stay in WholeStageCodegen and collapse map-side before the
  // shuffle). Near-identical docs flip few votes, so they land in the
  // same bucket; `bucket_n` (a window count over the signature) exposes
  // the collision structure. One scan + one shuffle on doc_id.
  // ---------------------------------------------------------------------
  // qNNBench forms here are the semantic plans; the trailing global
  // orderBy on each qNN exists only for the oracle's ordered hash-compare
  // (same bench/verify split as Relational.q17).
  val q29Bench: Q = (s, dir) => {
    import s.implicits._
    // one digest per token via the custom Md5Chunks expression; vote b is
    // the top bit of hex nibble b, i.e. bit (7-b%8)*4+3 of chunk b/8 —
    // identical to `substring(md5_hex, b+1, 1) >= '8'` (the oracle's
    // form), but pure codegen'd long bit math instead of substring
    // comparisons over a hex string.
    val votes = t(s, dir, "documents")
      .select($"doc_id", explode(array_distinct(split($"text", " "))).as("tok"))
      .withColumn("ch", graft.functions.Md5Chunks.md5Chunks($"tok"))
    val sums = (0 until 16).map { b =>
      val nibble = shiftright(element_at($"ch", b / 8 + 1), (7 - b % 8) * 4)
        .bitwiseAND(lit(15L))
      sum(when(nibble >= 8, 1).otherwise(-1)).as(s"v$b")
    }
    val sh = votes.groupBy($"doc_id").agg(sums.head, sums.tail: _*)
      .select($"doc_id",
        (0 until 16).map(b => when(col(s"v$b") > 0, 1 << b).otherwise(0))
          .reduce(_ + _).as("simhash"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"simhash")
    sh.withColumn("bucket_n", count(lit(1)).over(w))
  }
  val q29: Q = (s, dir) => {
    import s.implicits._
    q29Bench(s, dir).orderBy($"doc_id")
  }
  val q29Sql: String = {
    val bits = (0 until 16).map(b =>
      s"CASE WHEN list_sum(list_transform(tk, x -> CASE WHEN " +
        s"substring(md5(x),${b + 1},1) >= '8' THEN 1 ELSE -1 END)) > 0 " +
        s"THEN ${1 << b} ELSE 0 END").mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_distinct(string_split(text,' ')) AS tk FROM documents),
       |sh AS (SELECT doc_id, $bits AS simhash FROM toks)
       |SELECT doc_id, simhash, COUNT(*) OVER (PARTITION BY simhash) AS bucket_n
       |FROM sh ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q30: exact n-gram Jaccard over the MinHash candidates — the verify
  // stage of near-dedup: LSH (q25) proposes, exact Jaccard on DISTINCT
  // 3-gram shingle sets disposes. Only candidate pairs pay the exact
  // set-intersection cost (the whole point of LSH at 100 TB: the
  // quadratic step runs on thousands of pairs, not trillions).
  //
  // The expensive subtree (tokenize → shingle → 8 min-hashes) is computed
  // ONCE and persisted MEMORY_AND_DISK: the three consumers (band-bucket
  // pair generation + both sides of the shingle-set join) read the cache,
  // so the plan scans `documents` once instead of four times. At 100 TB
  // the persisted signature (ids + 8 hex hashes + shingle set) is the
  // natural intermediate you'd checkpoint between the LSH and verify
  // stages anyway; MEMORY_AND_DISK spills instead of recomputing.
  // ---------------------------------------------------------------------
  val q30: Q = (s, dir) => {
    import s.implicits._
    // the shared persisted LSH signature artifact (see LlmOps.signatures)
    val (sig, mh) = LlmOps.signatures(s, dir)
    // single-pass bucketed pair generation (skew-capped)
    val cand = LlmOps.bucketPairs(LlmOps.bandRows(mh))
    val sa = sig.select($"doc_id".as("doc_a"), $"s".as("sa"))
    val sb = sig.select($"doc_id".as("doc_b"), $"s".as("sb"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("inter", size(array_intersect($"sa", $"sb")))
      .select($"doc_a", $"doc_b",
        ($"inter".cast("double") / (size($"sa") + size($"sb") - $"inter")).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }
  val q30Sql: String = {
    val mins = (0 until LlmOps.B * LlmOps.R)
      .map(h => LlmOps.sqlMinhash(h, "s")).mkString(",\n  ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3),
       |sh AS (SELECT doc_id,
       |  list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk)-1)]) AS s
       |  FROM toks),
       |mh AS (SELECT doc_id, s,
       |  $mins
       |  FROM sh),
       |bands AS (
       |  SELECT doc_id, 0 AS band, m0 || '|' || m1 AS key FROM mh UNION ALL
       |  SELECT doc_id, 1, m2 || '|' || m3 FROM mh UNION ALL
       |  SELECT doc_id, 2, m4 || '|' || m5 FROM mh UNION ALL
       |  SELECT doc_id, 3, m6 || '|' || m7 FROM mh),
       |bcap AS (
       |  SELECT doc_id, band, key FROM (
       |    SELECT doc_id, band, key,
       |      row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
       |    FROM bands) WHERE rn <= ${LlmOps.BucketCap}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bcap a JOIN bcap b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b,
       |  CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
       |    / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jaccard
       |FROM cand JOIN mh sa ON sa.doc_id = doc_a JOIN mh sb ON sb.doc_id = doc_b
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q32: language-ID heuristic — score each doc's distinct-token overlap
  // against small fixed per-language lexicons, argmax with alphabetical
  // tie-break. (On this synthetic corpus the vocabularies overlap, so
  // accuracy is not the point — the operator shape is: N profile scores
  // per doc in one projection, zero shuffles before the output sort.)
  // ---------------------------------------------------------------------
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("join", "sort", "fast", "spark", "column", "query"),
    "en" -> Seq("the", "a", "key", "value", "table", "row"),
    "es" -> Seq("group", "stream", "merge", "slow", "batch", "vector"),
    "fr" -> Seq("agg", "scan", "line", "small", "hash", "customer"),
    "zh" -> Seq("dup", "part", "window", "filter", "order", "data"))

  val q32Bench: Q = (s, dir) => {
    import s.implicits._
    val scored = profiles.foldLeft(
      t(s, dir, "documents").withColumn("tk", array_distinct(split($"text", " ")))) {
      case (df, (l, words)) =>
        df.withColumn(s"s_$l",
          size(array_intersect($"tk", typedLit(words))).cast("double") / size($"tk"))
    }
    val best = greatest(profiles.map { case (l, _) => col(s"s_$l") }: _*)
    val pred = profiles.init.foldRight(lit(profiles.last._1)) {
      case ((l, _), elseCol) => when(col(s"s_$l") === best, l).otherwise(elseCol)
    }
    scored.select($"doc_id", $"lang", pred.as("pred_lang"))
  }
  val q32: Q = (s, dir) => {
    import s.implicits._
    q32Bench(s, dir).orderBy($"doc_id")
  }
  val q32Sql: String = {
    def arr(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")
    val scores = profiles.map { case (l, ws) =>
      s"CAST(len(list_intersect(tk, ${arr(ws)})) AS DOUBLE) / len(tk) AS s_$l"
    }.mkString(",\n  ")
    val branches = profiles.init.map { case (l, _) => s"WHEN s_$l THEN '$l'" }.mkString(" ")
    s"""WITH toks AS (
       |  SELECT doc_id, lang, list_distinct(string_split(text,' ')) AS tk FROM documents),
       |scored AS (SELECT doc_id, lang,
       |  $scores
       |  FROM toks)
       |SELECT doc_id, lang,
       |  CASE GREATEST(${profiles.map("s_" + _._1).mkString(", ")})
       |    $branches ELSE '${profiles.last._1}' END AS pred_lang
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q33: quality scoring — per-doc token count, distinct-token ratio,
  // stopword count, average token length. Pure single-pass projection
  // over one scan, zero shuffle; all ratios are exact-int divisions. The
  // stopword count is the codegen'd [[graft.functions.CountInSet]]
  // expression — the aggregate() lambda it replaces was CodegenFallback
  // (interpreted per token), and the explode+sum alternative measured 7x
  // slower (a corpus-wide per-token hash aggregate + shuffle for what is
  // a scalar over the row's own array). The downstream use is a filter
  // (`WHERE distinct_ratio > θ AND ...`) that pushes to the scan.
  // ---------------------------------------------------------------------
  private val stopwords = Seq("the", "a", "of", "and", "dup")

  val q33Bench: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "documents")
      .withColumn("tk", split($"text", " "))
      .select(
        $"doc_id",
        size($"tk").as("n_tokens"),
        (size(array_distinct($"tk")).cast("double") / size($"tk")).as("distinct_ratio"),
        graft.functions.CountInSet.countInSet($"tk", stopwords).as("n_stop"),
        ($"n_chars".cast("double") / size($"tk")).as("avg_token_len"))
  }
  val q33: Q = (s, dir) => {
    import s.implicits._
    q33Bench(s, dir).orderBy($"doc_id")
  }
  val q33Sql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS tk, n_chars FROM documents)
       |SELECT doc_id, len(tk) AS n_tokens,
       |  CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS distinct_ratio,
       |  CAST(list_sum(list_transform(tk, x -> CASE WHEN x IN
       |    (${stopwords.map(w => s"'$w'").mkString(", ")}) THEN 1 ELSE 0 END)) AS BIGINT) AS n_stop,
       |  CAST(n_chars AS DOUBLE) / len(tk) AS avg_token_len
       |FROM t ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q34: token counting — whitespace tokens vs regex tokens (the BPE-ish
  // pre-tokenizer form: maximal [a-z]+ runs), aggregated per source.
  // Both counts come from the same scan in one pass.
  // ---------------------------------------------------------------------
  val q34: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "documents")
      .withColumn("ws_n", size(split($"text", " ")))
      .withColumn("re_n", size(expr("regexp_extract_all(text, '[a-z]+', 0)")))
      .groupBy($"source")
      .agg(sum($"ws_n").as("ws_tokens"),
           sum($"re_n").as("re_tokens"),
           sum($"n_chars").as("chars"))
      .orderBy($"source")
  }
  val q34Sql: String =
    """SELECT source,
      |  CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS ws_tokens,
      |  CAST(SUM(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS re_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q35: document fingerprinting — mod-sampled shingle hashes (winnowing
  // lite): keep the ~1/16 of distinct 3-gram shingle md5s whose first hex
  // char is '0'. Two docs share a fingerprint iff they share a sampled
  // shingle — a containment (not just similarity) signal, and the
  // fingerprint set is tiny and joinable at corpus scale.
  //
  // Exploded form (replacing transform(md5)+filter lambdas, which are
  // CodegenFallback — interpreted per shingle): shingles explode to rows,
  // md5 + the first-hex-char predicate run inside WholeStageCodegen, and
  // a per-doc aggregate computes the sampled count and min. Docs with
  // zero sampled shingles keep their row because the sample predicate is
  // applied INSIDE the aggregate (sum-of-when / min-of-when, min ignores
  // nulls), not as a row filter. min(string) has no mutable codegen
  // buffer, so the aggregate plans as SortAggregate — the input arrives
  // doc-contiguous from the generate, so the per-partition sort is
  // near-linear, and partial aggregation still collapses to one row per
  // doc before the shuffle; still strictly cheaper than per-element
  // interpreted lambdas.
  // ---------------------------------------------------------------------
  val q35Bench: Q = (s, dir) => {
    import s.implicits._
    val sampled = when(substring($"h", 1, 1) === "0", $"h")
    t(s, dir, "documents")
      .withColumn("tk", split($"text", " "))
      .filter(size($"tk") >= 3)
      .select($"doc_id", explode(array_distinct(LlmOps.shingles3($"tk"))).as("sh"))
      .withColumn("h", md5($"sh"))
      .groupBy($"doc_id")
      .agg(
        sum(when(sampled.isNotNull, 1L).otherwise(0L)).cast("int").as("n_fp"),
        min(sampled).as("min_fp"))
  }
  val q35: Q = (s, dir) => {
    import s.implicits._
    q35Bench(s, dir).orderBy($"doc_id")
  }
  val q35Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text,' ') AS tk FROM documents
      |  WHERE len(string_split(text,' ')) >= 3),
      |sh AS (SELECT doc_id,
      |  list_distinct([array_to_string(tk[i:i+2],' ') for i in range(1, len(tk)-1)]) AS s
      |  FROM toks),
      |fp AS (SELECT doc_id,
      |  list_sort(list_filter(list_transform(s, x -> md5(x)),
      |                        h -> substring(h,1,1) = '0')) AS fps FROM sh)
      |SELECT doc_id, len(fps) AS n_fp,
      |  CASE WHEN len(fps) = 0 THEN NULL ELSE fps[1] END AS min_fp
      |FROM fp ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q59: corpus term statistics — top terms per language by term
  // frequency, with document frequency alongside (the tf/df table every
  // vocabulary/stopword/tokenizer-training step starts from).
  //
  // Scale shape: explode to (lang, token, doc_id) rows; ONE aggregate
  // on (lang, token) computes tf = count and df = exact
  // countDistinct(doc_id). The Expand that countDistinct plans doubles
  // the exploded rows, but partial aggregation collapses BOTH branches
  // map-side, so the single shuffle moves per-partition (lang, token)
  // combos — and the q04-style manual two-phase rewrite (per-(lang,
  // token, doc_id) counts, then sum/count) measured EQUAL-to-slower
  // here (0.74 vs 0.68 s at sf0.1): its first phase is a real shuffle,
  // unlike q04's where the bucketed layout made phase 1 exchange-free.
  // Single shuffle wins when there is no layout to exploit. The top-k
  // per language then ranks VOCAB-sized, already-aggregated input, so
  // the 5-partition ranking window ranks the small side, not the
  // corpus — the cardinality rule from Relational.q03's note applied
  // in reverse.
  // ---------------------------------------------------------------------
  val q59: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"lang").orderBy($"tf".desc, $"token".asc)
    t(s, dir, "documents")
      .select($"lang", $"doc_id", explode(split($"text", " ")).as("token"))
      .groupBy($"lang", $"token")
      .agg(count(lit(1)).as("tf"), countDistinct($"doc_id").as("df_docs"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 10)
      .select($"lang", $"rnk", $"token", $"tf", $"df_docs")
      .orderBy($"lang", $"rnk")
  }
  val q59Sql: String =
    """WITH tok AS (
      |  SELECT lang, doc_id, u.t AS token
      |  FROM documents, unnest(string_split(text, ' ')) AS u(t)),
      |tfdf AS (
      |  SELECT lang, token, COUNT(*) AS tf,
      |    COUNT(DISTINCT doc_id) AS df_docs
      |  FROM tok GROUP BY lang, token),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER
      |    (PARTITION BY lang ORDER BY tf DESC, token ASC) AS rnk
      |  FROM tfdf)
      |SELECT lang, CAST(rnk AS INT) AS rnk, token, tf, df_docs
      |FROM ranked WHERE rnk <= 10
      |ORDER BY lang, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // q61: BENCHMARK DECONTAMINATION — the n-gram-collision eval-set scrub
  // (the GPT-3 appendix-C / Llama method): any training doc sharing a
  // 3-gram shingle with an eval-set doc is flagged, with the overlap
  // count and the contamination ratio as evidence. The "eval set" here
  // is the deterministic doc_id % 97 == 0 slice (a stand-in for an
  // external benchmark table — the operator shape is identical).
  //
  // Scale shape: the eval side of the join is tiny BY DEFINITION (eval
  // suites are KBs against a 100 TB corpus), so its distinct shingle set
  // BROADCASTS and the corpus side never shuffles for the join — exploded
  // corpus shingles stream through the broadcast hash probe and only the
  // HITS reach the per-doc aggregate (itself collapsed map-side on
  // doc-contiguous input). Reuses the persisted q25/q30 signature
  // artifact: the decontamination pass rides the dedup pipeline's
  // shingle computation for free.
  // ---------------------------------------------------------------------
  val q61Bench: Q = (s, dir) => {
    import s.implicits._
    val (sig, _) = LlmOps.signatures(s, dir)
    val ev = sig.filter($"doc_id" % 97 === 0)
      .select(explode($"s").as("sh")).distinct()
    val corpus = sig.filter($"doc_id" % 97 =!= 0)
      .select($"doc_id", size($"s").cast("long").as("n_sh"), explode($"s").as("sh"))
    corpus.join(broadcast(ev), "sh")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_hit"), max($"n_sh").as("n_sh"),
        min($"sh").as("top_hit"))
      .select($"doc_id", $"n_hit", $"n_sh",
        ($"n_hit".cast("double") / $"n_sh").as("hit_ratio"), $"top_hit")
  }
  val q61: Q = (s, dir) => {
    import s.implicits._
    q61Bench(s, dir).orderBy($"doc_id")
  }
  val q61Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text,' ') AS tk FROM documents
      |  WHERE len(string_split(text,' ')) >= 3),
      |sh AS (SELECT doc_id,
      |  list_distinct([array_to_string(tk[i:i+2],' ') for i in range(1, len(tk)-1)]) AS s
      |  FROM toks),
      |ev AS (SELECT list_distinct(flatten(list(s))) AS es FROM sh WHERE doc_id % 97 = 0),
      |hits AS (SELECT doc_id,
      |    len(list_intersect(s, es)) AS n_hit,
      |    len(s) AS n_sh,
      |    list_sort(list_intersect(s, es))[1] AS top_hit
      |  FROM sh, ev WHERE doc_id % 97 <> 0)
      |SELECT doc_id, n_hit, n_sh,
      |  CAST(n_hit AS DOUBLE) / n_sh AS hit_ratio, top_hit
      |FROM hits WHERE n_hit > 0 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q62: UNIGRAM FAMILIARITY scoring — the model-based quality filter's
  // integer-exact stand-in: score every doc by the mean corpus frequency
  // of its tokens (rare-garbage docs score low, boilerplate scores
  // high). Two passes by design — pass 1 builds the corpus tf table
  // (vocab-sized), pass 2 scores docs against it — exactly how a real
  // KenLM-style filter trains-then-scores; persisting the exploded
  // tokens would cost more than the second scan.
  //
  // Scale shape: the tf table broadcasts while vocab fits (calibrate:
  // 10M terms × ~24B ≈ 240 MB — still broadcastable on big executors),
  // and beyond that the join MUST fall back to a shuffle join on token.
  // That flip is deliberately NOT a hard-coded broadcast() hint: the tf
  // table is an aggregate, so AQE sees its ACTUAL runtime bytes at the
  // stage boundary and picks broadcast-hash vs shuffle by the
  // autoBroadcastJoinThreshold — the size check is the engine's, made
  // against real bytes, and "vocab grew past the threshold" degrades to
  // a shuffle join instead of an executor OOM. Both paths are
  // hash-identical (UnigramJoinPathSpec runs the shuffle path by
  // forcing the threshold to -1). All reductions are exact integer sums
  // (< 2^53, so the one double division at the end is bit-identical
  // cross-engine — the same Det scheme as q54's quantization audit).
  // ---------------------------------------------------------------------
  val q62Bench: Q = (s, dir) => {
    import s.implicits._
    val tok = t(s, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("token"))
    val tf = tok.groupBy($"token").agg(count(lit(1)).as("tf"))
    tok.join(tf, "token")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum($"tf").as("sum_tf"))
      .select($"doc_id", $"n_tokens", $"sum_tf",
        ($"sum_tf".cast("double") / $"n_tokens").as("mean_tf"))
  }
  val q62: Q = (s, dir) => {
    import s.implicits._
    q62Bench(s, dir).orderBy($"doc_id")
  }
  val q62Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, u.t AS token
      |  FROM documents, unnest(string_split(text, ' ')) AS u(t)),
      |tf AS (SELECT token, COUNT(*) AS tf FROM tok GROUP BY token)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  CAST(SUM(tf) AS BIGINT) AS sum_tf,
      |  CAST(SUM(tf) AS DOUBLE) / COUNT(*) AS mean_tf
      |FROM tok JOIN tf USING (token)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q117: BIGRAM-LM FAMILIARITY — the perplexity-filter stand-in one
  // level up from q62's unigram frequencies (KenLM-class quality
  // filters score documents by how predictable their text is under a
  // corpus LM; garbage and boilerplate sit at the two tails). The model
  // is the conditional MLE P(w2|w1) = c(w1,w2)/c(w1), with both counts
  // taken over bigram HISTORY positions so the estimate is a proper
  // conditional (Σ_w2 P(w2|w1) = 1). Logs/perplexity are deliberately
  // NOT taken: ln() is not correctly-rounded and diverges across
  // engines, so the score stays in exact integers — per-bigram
  // probability in ppm via integral division (n12·1e6 div n1, positive
  // → truncation == floor == DuckDB's //), summed exactly; the one
  // double is the final mean (exact longs through one IEEE divide, the
  // Det scheme).
  //
  // Scale shape: the q62 posture one key wider — bigrams explode once
  // into the (w1,w2) count table, and the (w1) history table ROLLS UP
  // from it (Σ_w2 c(w1,w2) = c(w1): a vocab-sized agg instead of a
  // second corpus-wide shuffle), then score via joins AQE sizes at
  // runtime (no
  // broadcast hint: the bigram vocab is corpus-dependent and heavy-
  // tailed — exactly the q62 flip argument), and the final per-doc
  // rollup shuffles counts, not text.
  // ---------------------------------------------------------------------
  val q117Bench: Q = (s, dir) => {
    import s.implicits._
    val bg = t(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("a"))
      .filter(size($"a") >= 2)
      .select($"doc_id", explode(expr(
        "arrays_zip(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1))"))
        .as("p"))
      .select($"doc_id", $"p.0".as("w1"), $"p.1".as("w2"))
    val c12 = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("n12"))
    // history counts ROLL UP from the bigram table (Σ_w2 c(w1,w2) =
    // c(w1)): one corpus scan + one vocab-sized agg instead of a third
    // corpus scan + corpus-wide shuffle
    val c1 = c12.groupBy($"w1").agg(sum($"n12").as("n1"))
    bg.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(expr("n12 * 1000000L div n1")).as("sum_p_ppm"))
      .select($"doc_id", $"n_bigrams", $"sum_p_ppm",
        ($"sum_p_ppm".cast("double") / $"n_bigrams").as("mean_p_ppm"))
  }
  val q117: Q = (s, dir) => {
    import s.implicits._
    q117Bench(s, dir).orderBy($"doc_id")
  }
  val q117Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS a FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |bg AS (
      |  SELECT doc_id, a[i] AS w1, a[i+1] AS w2
      |  FROM tok, unnest(generate_series(1, len(a) - 1)) AS u(i)),
      |c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM bg GROUP BY w1, w2),
      |c1 AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c12 GROUP BY w1)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM((n12 * 1000000) // n1) AS BIGINT) AS sum_p_ppm,
      |  CAST(SUM((n12 * 1000000) // n1) AS DOUBLE) / COUNT(*) AS mean_p_ppm
      |FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q63: DATA-MIXTURE REBALANCING — cap every language at N docs,
  // keeping a deterministic hash-ranked subset (the content-stable
  // shuffle key from q50, so the kept set is stable across runs,
  // engines, and partitionings). Served by the custom TopKByScore
  // AGGREGATE, not a ranking window: the window form shuffles EVERY row
  // to its language's reducer to rank it; the bounded aggregate keeps k
  // slots per language per map task, so the shuffle carries
  // maps × langs × N entries regardless of corpus size — the q03-note
  // topology rule (low group cardinality → aggregate wins) applied to
  // the mixture-rebalance shape.
  // ---------------------------------------------------------------------
  private val RebalanceCap = 40

  val q63: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "documents")
      .select($"lang", $"doc_id", LlmOps.hashKey($"doc_id").as("h"))
      .groupBy($"lang")
      .agg(graft.functions.TopKByScore
        .topKByScore(-$"h".cast("double"), $"doc_id", RebalanceCap).as("top"))
      .select($"lang", posexplode($"top"))
      .select($"lang", ($"pos" + 1).cast("int").as("rnk"), $"col.id".as("doc_id"))
      .orderBy($"lang", $"rnk")
  }
  val q63Sql: String =
    s"""WITH h AS (
      |  SELECT lang, doc_id, ${LlmOps.sqlHashKey} AS hv
      |  FROM documents),
      |r AS (SELECT lang, doc_id,
      |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv ASC, doc_id ASC) AS rnk
      |  FROM h)
      |SELECT lang, CAST(rnk AS INT) AS rnk, doc_id
      |FROM r WHERE rnk <= $RebalanceCap
      |ORDER BY lang, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // q65: REPETITION metrics — the Gopher-rule repetition filters adapted
  // to the token corpus: per doc, the fraction of 3-grams claimed by the
  // single most frequent 3-gram (top_gram_frac — catches "looping"
  // generation/boilerplate) and the fraction occurring more than once
  // (dup_gram_frac — catches templated spam). Downstream use is a
  // pushdown-able threshold filter, like q33's quality gate.
  //
  // Scale shape: two-level aggregate — (doc_id, gram) counts collapse
  // map-side on doc-contiguous exploded input, then the per-doc rollup
  // moves one row per distinct gram per doc. All ratios are exact-int
  // divisions; the 3-grams come from the codegen'd Shingles3.
  // ---------------------------------------------------------------------
  val q65Bench: Q = (s, dir) => {
    import s.implicits._
    val per = t(s, dir, "documents")
      .withColumn("tk", split($"text", " "))
      .filter(size($"tk") >= 3)
      .select($"doc_id", explode(LlmOps.shingles3($"tk")).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
    per.groupBy($"doc_id")
      .agg(sum($"c").as("n_grams"), max($"c").as("mx"),
        sum(when($"c" > 1, $"c").otherwise(0L)).as("dup"))
      .select($"doc_id", $"n_grams",
        ($"mx".cast("double") / $"n_grams").as("top_gram_frac"),
        ($"dup".cast("double") / $"n_grams").as("dup_gram_frac"))
  }
  val q65: Q = (s, dir) => {
    import s.implicits._
    q65Bench(s, dir).orderBy($"doc_id")
  }
  val q65Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text,' ') AS tk FROM documents
      |  WHERE len(string_split(text,' ')) >= 3),
      |sh AS (SELECT doc_id,
      |  unnest([array_to_string(tk[i:i+2],' ') for i in range(1, len(tk)-1)]) AS g
      |  FROM toks),
      |per AS (SELECT doc_id, g, COUNT(*) AS c FROM sh GROUP BY doc_id, g),
      |agg AS (SELECT doc_id,
      |    CAST(SUM(c) AS BIGINT) AS n_grams,
      |    MAX(c) AS mx,
      |    CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup
      |  FROM per GROUP BY doc_id)
      |SELECT doc_id, n_grams,
      |  CAST(mx AS DOUBLE) / n_grams AS top_gram_frac,
      |  CAST(dup AS DOUBLE) / n_grams AS dup_gram_frac
      |FROM agg ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q71: EXACT heavy hitters via sketch-then-verify — the two-pass
  // pattern that makes "which tokens exceed 0.5% of the corpus" exact at
  // 100 TB vocabulary scale. Pass 1: the Misra-Gries FreqSketch
  // aggregate (bounded k counters per map task, mergeable partials)
  // produces a CANDIDATE set guaranteed to contain every item with true
  // count > n/(k+1) — order- and partitioning-independent, which is what
  // makes the composition deterministic even though sketch internals
  // aren't. Pass 2: exact counts for candidates only (broadcast semi
  // pass over the token stream), thresholded at 0.5%. k=400 puts the
  // guarantee boundary (n/401) safely under the 0.5% threshold. The
  // DuckDB oracle is a plain GROUP BY ... HAVING — if the sketch ever
  // dropped a true heavy hitter, the hash compare would fail.
  // Contrast: q59 ranks per-language terms with a full exact aggregate
  // (vocab-sized hash tables); this path bounds pass-1 memory at k
  // counters regardless of vocabulary.
  // ---------------------------------------------------------------------
  private val HhSketchK = 400
  private val HhFrac = 0.005

  val q71Bench: Q = (s, dir) => {
    import s.implicits._
    val tok = t(s, dir, "documents")
      .select(explode(split($"text", " ")).as("token"))
    // pass 1: ONE scan yields both the candidate sketch and the total
    // (n rides the same aggregate row, so the threshold costs nothing)
    val cand = tok
      .agg(graft.functions.FreqSketch.freqSketch($"token", HhSketchK).as("sk"),
        count(lit(1)).as("n_total"))
      .select(explode($"sk").as("e"), $"n_total")
      .select($"e.item".as("token"), $"n_total")
    // pass 2: exact counts for candidates only
    tok.join(broadcast(cand), "token")
      .groupBy($"token").agg(count(lit(1)).as("cnt"), max($"n_total").as("n_total"))
      .filter($"cnt".cast("double") > $"n_total" * HhFrac)
      .select($"token", $"cnt")
  }
  val q71: Q = (s, dir) => {
    import s.implicits._
    q71Bench(s, dir).orderBy($"cnt".desc, $"token".asc)
  }
  val q71Sql: String =
    s"""WITH tok AS (
      |  SELECT u.t AS token
      |  FROM documents, unnest(string_split(text, ' ')) AS u(t)),
      |tot AS (SELECT COUNT(*) AS n FROM tok)
      |SELECT token, COUNT(*) AS cnt
      |FROM tok, tot
      |GROUP BY token, tot.n
      |HAVING COUNT(*) > n * $HhFrac
      |ORDER BY cnt DESC, token ASC""".stripMargin

  // ---------------------------------------------------------------------
  // q83: DOCUMENT CHUNKING — the embed-for-retrieval preprocessing step
  // every LLM data pipeline runs between cleaning and embedding: each
  // document becomes overlapping token windows of ChunkSize with stride
  // ChunkStride (overlap = ChunkSize - ChunkStride keeps boundary
  // context in two chunks). Chunk count is 1 + ceil((n - C) / S), so a
  // doc that fits in one window yields exactly one chunk and the last
  // window always reaches the final token — no dropped tail, no
  // degenerate sub-window tail chunks.
  //
  // Scale shape: ZERO shuffles — tokenize, a codegen'd sequence explode
  // (GenerateExec), and a slice projection, all in one WholeStageCodegen
  // stage over the scan; output is ~n/S rows per doc written straight
  // downstream (the embedding batcher). At 100 TB this is the textbook
  // map-only op: cost is the scan, parallelism is input splits, and the
  // only knob that matters is output file sizing. The global orderBy
  // exists solely for the oracle compare (bench variant drops it).
  // ---------------------------------------------------------------------
  private val ChunkSize = 32
  private val ChunkStride = 24

  val q83Bench: Q = (s, dir) => {
    import s.implicits._
    val C = ChunkSize; val St = ChunkStride
    val d = t(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("toks"))
      .withColumn("n", size($"toks"))
    // exact integer ceil((n-C)/S) for n > C (all operands positive)
    val lastChunk = when($"n" <= C, lit(0L))
      .otherwise(floor(($"n" - C + (St - 1)).cast("double") / St).cast("long"))
    d.withColumn("chunk_id", explode(sequence(lit(0L), lastChunk)))
      .select($"doc_id", $"chunk_id".cast("int").as("chunk_id"),
        slice($"toks", $"chunk_id".cast("int") * St + 1, lit(C)).as("w"))
      .select($"doc_id", $"chunk_id",
        size($"w").cast("long").as("n_tokens"),
        array_join($"w", " ").as("chunk"))
  }
  val q83: Q = (s, dir) => {
    import s.implicits._
    q83Bench(s, dir).orderBy($"doc_id", $"chunk_id")
  }
  val q83Sql: String =
    s"""WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |k AS (
      |  SELECT doc_id, toks,
      |    unnest(generate_series(0,
      |      CASE WHEN n <= $ChunkSize THEN 0
      |           ELSE (n - $ChunkSize + ${ChunkStride - 1}) // $ChunkStride
      |      END)) AS chunk_id
      |  FROM d)
      |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
      |  CAST(len(toks[chunk_id * $ChunkStride + 1 :
      |             chunk_id * $ChunkStride + $ChunkSize]) AS BIGINT) AS n_tokens,
      |  array_to_string(toks[chunk_id * $ChunkStride + 1 :
      |                  chunk_id * $ChunkStride + $ChunkSize], ' ') AS chunk
      |FROM k
      |ORDER BY doc_id, chunk_id""".stripMargin

  // ---------------------------------------------------------------------
  // q86: BM25 lexical retrieval — the keyword-ranking half of the
  // retrieval surface (the vector half is q24/q31/q46/q53/q58): score
  // every document against a literal query-term set with the BM25 shape
  //   score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  // (k1 = 1.2, b = 0.75), take the global top 20. This is the first-pass
  // ranker of every RAG / retrieval-training corpus build.
  //
  // Determinism (the house Det contract, q62's scheme extended):
  // classical BM25's ln-idf is the one transcendental in the formula,
  // and ln is NOT bit-guaranteed across libms — so idf here is the
  // rational odds ratio (N − df + 0.5)/(df + 0.5), i.e. the ln's
  // argument, not its log. Per-term monotonicity (rarer term ⇒ larger
  // weight) is preserved; every derived double is then exact-integer
  // casts composed with correctly-rounded IEEE *,/,+ written in
  // IDENTICAL association order in both engines, and the 3-term sum is
  // a fixed-order chain (c0 + c1) + c2 — bit-identical cross-engine.
  //
  // Scale: per-doc (dl, tf_t) comes from ONE hash aggregate over
  // exploded tokens — conditional sums per literal term, NO join with a
  // vocab table (query terms are a literal set, so tf lives in the same
  // codegen stage as the scan). Corpus stats (N, Σdl, df_t) are a 1-row
  // aggregate of that per-doc table, broadcast back as the q78 counter
  // pattern; the ranking is TakeOrdered(20) — maps keep 20 rows each,
  // no global sort. Two passes over documents total (stats, score) —
  // the train-then-score shape, same rationale as q62.
  // ---------------------------------------------------------------------
  private[queries] val Bm25Terms = Seq("spark", "window", "join")
  private val Bm25K = 20

  val q86Bench: Q = (s, dir) => {
    import s.implicits._
    val tok = t(s, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("token"))
    val tfCols = Bm25Terms.zipWithIndex.map { case (term, i) =>
      sum(when($"token" === term, 1L).otherwise(0L)).as(s"tf$i")
    }
    val perDoc = tok.groupBy($"doc_id")
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    val statCols = count(lit(1)).as("n_docs") +: sum($"dl").as("sum_dl") +:
      Bm25Terms.indices.map { i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")
      }
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val scored = perDoc.crossJoin(broadcast(stats))
    val avgdl = $"sum_dl".cast("double") / $"n_docs".cast("double")
    // per-term contribution, association order mirrored in q86Sql exactly
    val contribs = Bm25Terms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val idf = (($"n_docs" - col(s"df$i")).cast("double") + lit(0.5)) /
        (col(s"df$i").cast("double") + lit(0.5))
      idf * ((tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + (lit(0.75) * $"dl".cast("double")) / avgdl)))
    }
    val score = contribs.reduceLeft(_ + _)
    scored.select(
        ($"doc_id" +: $"dl" +:
          Bm25Terms.indices.map(i => col(s"tf$i"))) :+ score.as("score"): _*)
      .orderBy($"score".desc, $"doc_id")
      .limit(Bm25K)
  }
  val q86: Q = q86Bench
  val q86Sql: String = {
    val tfSel = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"SUM(CASE WHEN token = '$t' THEN 1 ELSE 0 END) AS tf$i"
    }.mkString(",\n      |    ")
    val dfSel = Bm25Terms.indices.map { i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i"
    }.mkString(",\n      |    ")
    val contribs = Bm25Terms.indices.map { i =>
      s"""(((CAST(n_docs - df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)) *
         |    ((CAST(tf$i AS DOUBLE) * 2.2) /
         |     (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))""".stripMargin
    }
    val score = contribs.map(c => s"($c)").reduceLeft((a, b) => s"$a + $b")
    // SUM(BIGINT) is HUGEINT in DuckDB — CAST back so the driver's
    // physical-type hash matches Spark's LongType
    val tfOut = Bm25Terms.indices.map(i => s"CAST(tf$i AS BIGINT) AS tf$i").mkString(", ")
    s"""WITH tok AS (
      |  SELECT doc_id, u.t AS token
      |  FROM documents, unnest(string_split(text, ' ')) AS u(t)),
      |per_doc AS (
      |  SELECT doc_id, COUNT(*) AS dl,
      |    $tfSel
      |  FROM tok GROUP BY doc_id),
      |stats AS (
      |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
      |    $dfSel
      |  FROM per_doc)
      |SELECT doc_id, dl, $tfOut,
      |  $score AS score
      |FROM per_doc, stats
      |ORDER BY score DESC, doc_id
      |LIMIT $Bm25K""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q95: sequence packing — assign documents to fixed-size training
  // context windows (C tokens) the concatenate-then-split way: within a
  // shard, documents are laid end to end in deterministic training order
  // (the content-stable shuffle_key of q50, doc_id tiebreak) and each doc
  // belongs to the window its FIRST token falls in (bin = prefix-sum of
  // tokens before it, integer-divided by C). Output is the packing
  // manifest per (shard, bin): how many docs and tokens each context
  // holds — what a sequence-packing dataloader consumes.
  //
  // Scale shape: packing is embarrassingly parallel ACROSS shards and
  // sequential only WITHIN one — exactly a window sum over
  // (partition by shard, order by key). One shuffle into Shards
  // partitions, a sort within each, and the per-bin rollup collapses
  // map-side. Shards scales with the cluster (32 here ~ local[32]);
  // density per bin is shard-count-independent. A global (unsharded)
  // order would serialize 100 TB through one task — the shard column IS
  // the scale knob, and it's content-stable, so the packing reproduces
  // across runs and engines.
  // ---------------------------------------------------------------------
  private val PackCtx = 256L
  private val PackShards = 32L

  val q95Bench: Q = (s, dir) => {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"shard").orderBy($"k", $"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    t(s, dir, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_toks"),
        LlmOps.hashKey($"doc_id").as("k"))
      .withColumn("shard", pmod($"k", lit(PackShards)))
      .withColumn("cb", coalesce(sum($"n_toks").over(w), lit(0L)))
      .groupBy($"shard", expr(s"cb div $PackCtx").as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("tot_tokens"))
  }
  val q95: Q = (s, dir) => {
    import s.implicits._
    q95Bench(s, dir).orderBy($"shard", $"bin")
  }
  val q95Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
       |    ${LlmOps.sqlHashKey} AS k
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_toks, k % $PackShards AS shard,
       |    CAST(COALESCE(SUM(n_toks) OVER (PARTITION BY k % $PackShards
       |      ORDER BY k, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
       |  FROM d)
       |SELECT shard, cb // $PackCtx AS bin, COUNT(*) AS n_docs,
       |  CAST(SUM(n_toks) AS BIGINT) AS tot_tokens
       |FROM c
       |GROUP BY 1, 2
       |ORDER BY shard, bin""".stripMargin

  // ---------------------------------------------------------------------
  // q96: PII redaction — the scrubbing pass every public-web training
  // corpus runs: emails, phone numbers, and IPv4 addresses replaced with
  // type tokens, plus per-doc counts of what was removed (the audit
  // trail). The corpus text is synthetic and PII-free, so the PII is
  // INJECTED deterministically from doc_id (both engines construct the
  // identical string) — the redactor is then proven to find and remove
  // exactly it. Patterns stay in the regex subset with identical
  // semantics in java.util.regex and RE2 (character classes, bounded
  // repetition — no lookaround, no backrefs).
  //
  // Scale shape: pure map — one scan, zero shuffles, regexes inside
  // WholeStageCodegen; the only cost knob is regex complexity per byte.
  // ---------------------------------------------------------------------
  private val ReEmail = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
  private val RePhone = "\\+1-555-[0-9]{4}"
  private val ReIp    = "10\\.[0-9]+\\.[0-9]+\\.[0-9]+"

  val q96Bench: Q = (s, dir) => {
    import s.implicits._
    val pii = concat($"text",
      when($"doc_id" % 3 =!= 0,
        concat(lit(" contact user"), $"doc_id".cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when($"doc_id" % 2 === 0,
        concat(lit(" call +1-555-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      concat(lit(" from 10."), ($"doc_id" % 256).cast("string"), lit(".0.1")))
    t(s, dir, "documents")
      .withColumn("pii_text", pii)
      .select($"doc_id",
        size(regexp_extract_all($"pii_text", lit(ReEmail), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all($"pii_text", lit(RePhone), lit(0))).cast("long").as("n_phones"),
        size(regexp_extract_all($"pii_text", lit(ReIp), lit(0))).cast("long").as("n_ips"),
        regexp_replace(regexp_replace(regexp_replace($"pii_text",
          ReEmail, "<EMAIL>"), RePhone, "<PHONE>"), ReIp, "<IP>").as("redacted"))
  }
  val q96: Q = (s, dir) => {
    import s.implicits._
    q96Bench(s, dir).orderBy($"doc_id")
  }
  val q96Sql: String = {
    // same patterns, RE2 spelling (single backslash), global replace
    val email = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
    val phone = "\\+1-555-[0-9]{4}"
    val ip    = "10\\.[0-9]+\\.[0-9]+\\.[0-9]+"
    s"""WITH p AS (
       |  SELECT doc_id, text
       |    || CASE WHEN doc_id % 3 <> 0
       |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
       |         ELSE '' END
       |    || CASE WHEN doc_id % 2 = 0
       |         THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |         ELSE '' END
       |    || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS pii_text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(pii_text, '$email')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(pii_text, '$phone')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(pii_text, '$ip')) AS BIGINT) AS n_ips,
       |  regexp_replace(regexp_replace(regexp_replace(pii_text,
       |    '$email', '<EMAIL>', 'g'), '$phone', '<PHONE>', 'g'),
       |    '$ip', '<IP>', 'g') AS redacted
       |FROM p
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q97: inverted index build — term -> (document frequency, posting
  // list), the structure behind q86's BM25 and any lexical search over
  // the corpus. df is EXACT (a count, unbounded); the posting list is
  // the first [[PostingsCap]] doc_ids ascending, kept by the bounded
  // TopKByScore aggregate (score = -doc_id), NOT by collect_list —
  // a stop-word's posting list at 100 TB is billions of ids, and an
  // unbounded grouped collect is the classic executor OOM. The bounded
  // buffer keeps the aggregate map-side partial (ObjectHashAggregate)
  // with at most Cap entries per term per partition; full posting lists
  // at scale would instead be WRITTEN AS ROWS partitioned by term-range
  // (the layout, not an in-row array, is the index).
  // ---------------------------------------------------------------------
  private val PostingsCap = 64

  val q97Bench: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", explode(array_distinct(split($"text", " "))).as("term"))
      .groupBy($"term")
      .agg(count(lit(1)).as("df"),
        graft.functions.TopKByScore
          .topKByScore(-$"doc_id".cast("double"), $"doc_id", PostingsCap).as("top"))
      .select($"term", $"df",
        array_join(transform($"top", x => x.getField("id").cast("string")), ",")
          .as("postings"))
  }
  val q97: Q = (s, dir) => {
    import s.implicits._
    q97Bench(s, dir).orderBy($"term")
  }
  val q97Sql: String =
    s"""WITH pairs AS (
       |  SELECT DISTINCT doc_id, term
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |        FROM documents))
       |SELECT term, COUNT(*) AS df,
       |  array_to_string(list_sort(list(doc_id))[1:$PostingsCap], ',') AS postings
       |FROM pairs
       |GROUP BY term
       |ORDER BY term""".stripMargin

  // ---------------------------------------------------------------------
  // q101: HYBRID retrieval — BM25 (q86's lexical leg, reused verbatim)
  // and brute-force cosine (q24's vector leg) fused by reciprocal rank
  // fusion: rrf(d) = Σ_legs 1/(K + rank_leg(d)), K = 60, over each leg's
  // top-20; absent-from-a-leg contributes 0. RRF is THE standard fusion
  // for keyword+vector first-stage retrieval (Cormack et al.) precisely
  // because it needs no score calibration between legs — and it is
  // Det-friendly for free: ranks are integers, so the fusion is a
  // fixed-order sum of two exact IEEE divisions, bit-identical
  // cross-engine even though the leg SCORES live on different scales.
  //
  // Scale shape: each leg is already bounded (TakeOrdered top-20), so
  // the fusion joins two 20-row frames — driver-trivial forever; the
  // legs carry the real cost and keep their own scale stories (q86: two
  // scans + conditional-sum aggregate; q24: one scan + broadcast probe).
  // The single-partition rank windows are over 20-row inputs, bounded
  // by construction.
  // ---------------------------------------------------------------------
  private val RrfC = 60.0
  private val HybridK = 10

  val q101Bench: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.GraftFunctions.dotLong
    val wScore = org.apache.spark.sql.expressions.Window
      .orderBy($"score".desc, $"doc_id".asc)
    val lex = q86Bench(s, dir).select($"doc_id", $"score")
      .withColumn("lex_rank", row_number().over(wScore).cast("long"))
      .drop("score")
    val quant = t(s, dir, "embeddings")
      .select($"vec_id", LlmOps.quantize($"embedding").as("e"))
    val probe = broadcast(quant.filter($"vec_id" === 0).select($"e".as("pe")))
    val wSim = org.apache.spark.sql.expressions.Window
      .orderBy($"sim".desc, $"doc_id".asc)
    val vec = quant.filter($"vec_id" =!= 0).crossJoin(probe)
      .select($"vec_id".as("doc_id"),
        (dotLong($"e", $"pe").cast("double") /
          (sqrt(LlmOps.sqNorm($"e").cast("double")) *
            sqrt(LlmOps.sqNorm($"pe").cast("double")))).as("sim"))
      .orderBy($"sim".desc, $"doc_id".asc).limit(20)
      .withColumn("vec_rank", row_number().over(wSim).cast("long"))
      .drop("sim")
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select($"doc_id", $"lex_rank", $"vec_rank",
        (coalesce(lit(1.0) / (lit(RrfC) + $"lex_rank".cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfC) + $"vec_rank".cast("double")), lit(0.0)))
          .as("rrf"))
      .orderBy($"rrf".desc, $"doc_id".asc).limit(HybridK)
  }
  val q101: Q = q101Bench
  val q101Sql: String = {
    val tfSel = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"SUM(CASE WHEN token = '$t' THEN 1 ELSE 0 END) AS tf$i"
    }.mkString(",\n      |    ")
    val dfSel = Bm25Terms.indices.map { i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i"
    }.mkString(",\n      |    ")
    val contribs = Bm25Terms.indices.map { i =>
      s"""(((CAST(n_docs - df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)) *
         |    ((CAST(tf$i AS DOUBLE) * 2.2) /
         |     (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))""".stripMargin
    }
    val score = contribs.map(c => s"($c)").reduceLeft((a, b) => s"$a + $b")
    s"""WITH tok AS (
      |  SELECT doc_id, u.t AS token
      |  FROM documents, unnest(string_split(text, ' ')) AS u(t)),
      |per_doc AS (
      |  SELECT doc_id, COUNT(*) AS dl,
      |    $tfSel
      |  FROM tok GROUP BY doc_id),
      |stats AS (
      |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
      |    $dfSel
      |  FROM per_doc),
      |lex20 AS (
      |  SELECT doc_id, $score AS score
      |  FROM per_doc, stats
      |  ORDER BY score DESC, doc_id LIMIT 20),
      |lex AS (
      |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
      |  FROM lex20),
      |q AS (
      |  SELECT vec_id,
      |    list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS e
      |  FROM embeddings),
      |probe AS (SELECT e AS pe FROM q WHERE vec_id = 0),
      |vec20 AS (
      |  SELECT vec_id AS doc_id,
      |    CAST(list_sum(list_transform(range(1, len(e)+1), i -> e[i] * pe[i])) AS DOUBLE)
      |      / (sqrt(CAST(list_sum(list_transform(e, x -> x*x)) AS BIGINT)::DOUBLE)
      |       * sqrt(CAST(list_sum(list_transform(pe, x -> x*x)) AS BIGINT)::DOUBLE)) AS sim
      |  FROM q, probe WHERE vec_id <> 0
      |  ORDER BY sim DESC, vec_id LIMIT 20),
      |vec AS (
      |  SELECT doc_id, CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS BIGINT) AS vec_rank
      |  FROM vec20)
      |SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, lex_rank, vec_rank,
      |  COALESCE(CAST(1 AS DOUBLE) / ($RrfC + CAST(lex_rank AS DOUBLE)), CAST(0 AS DOUBLE))
      |    + COALESCE(CAST(1 AS DOUBLE) / ($RrfC + CAST(vec_rank AS DOUBLE)), CAST(0 AS DOUBLE)) AS rrf
      |FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
      |ORDER BY rrf DESC, doc_id LIMIT $HybridK""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q103: CROSS-DOCUMENT LINE DEDUP — the C4/RefinedWeb cleaning step
  // between exact dedup (q22, whole docs) and near-dedup (q25, fuzzy
  // docs): an exact-duplicate SPAN appearing in many documents
  // (boilerplate, licenses, navigation chrome) is removed EVERYWHERE
  // except its global first occurrence, and each document is reassembled
  // from its surviving lines. "Line" here is a non-overlapping
  // LineLen-token span (the corpus has no newlines; the operator is
  // identical for newline-split lines). First occurrence = the minimum
  // (doc_id, line_id) — encoded as ONE integer key doc_id*100000+line_id
  // so the winner is a plain MIN, not a struct argmin, in both engines.
  //
  // Scale shape: two shuffles, both necessary — (1) lines hash-partition
  // by their text for the duplicate-group window (the corpus moves once;
  // the window needs no join-back, unlike a winners-table join which
  // would shuffle the same data AND build a table), (2) surviving lines
  // regroup by doc_id for reassembly (map-side partial aggregation; the
  // per-doc collect_list is bounded by document length, never by corpus
  // size). No driver collection, nothing all-pairs; duplicate-heavy
  // groups are single-key windows — a pathological mega-boilerplate line
  // (billions of copies) would skew one partition, the documented knob
  // being the same salting used by q25's BucketCap.
  //
  // The winner is min(struct(doc_id, line_id)) — lexicographic struct
  // MIN, identical semantics in both engines at ANY doc length (an
  // integer-encoded composite key would silently collide once a
  // document exceeds the encoding's line capacity). A singleton line's
  // min IS its own key, so `keep = key == winner` alone also covers the
  // unique-line case — no occurrence-count window needed.
  // ---------------------------------------------------------------------
  private val LineLen = 10

  val q103Bench: Q = (s, dir) => {
    import s.implicits._
    val L = LineLen
    val lines = t(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("toks"))
      .withColumn("line_id",
        explode(sequence(lit(0),
          floor((size($"toks") - 1).cast("double") / L).cast("int"))))
      .select($"doc_id", $"line_id",
        array_join(slice($"toks", $"line_id" * L + 1, lit(L)), " ").as("line"))
      .withColumn("okey", struct($"doc_id", $"line_id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"line")
    val flagged = lines
      .withColumn("keep", $"okey" === min($"okey").over(w))
    flagged.groupBy($"doc_id").agg(
      sum(when($"keep", 1L).otherwise(0L)).as("n_kept"),
      sum(when($"keep", 0L).otherwise(1L)).as("n_dropped"),
      array_join(
        transform(array_sort(collect_list(when($"keep",
          struct($"line_id", $"line")))), x => x("line")), " ").as("text_dedup"))
  }
  val q103: Q = (s, dir) => {
    import s.implicits._
    q103Bench(s, dir).orderBy($"doc_id")
  }
  val q103Sql: String = {
    val L = LineLen
    s"""WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |l AS (
      |  SELECT doc_id, toks,
      |    unnest(generate_series(0, (len(toks) - 1) // $L)) AS line_id
      |  FROM d),
      |ln AS (
      |  SELECT doc_id, line_id,
      |    array_to_string(toks[line_id * $L + 1 : line_id * $L + $L], ' ') AS line,
      |    {'d': doc_id, 'l': line_id} AS okey
      |  FROM l),
      |g AS (
      |  SELECT *, MIN(okey) OVER (PARTITION BY line) AS wkey
      |  FROM ln)
      |SELECT doc_id,
      |  CAST(SUM(CASE WHEN okey = wkey THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN okey = wkey THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
      |  COALESCE(string_agg(CASE WHEN okey = wkey THEN line END,
      |                      ' ' ORDER BY line_id), '') AS text_dedup
      |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q107: PARETO FRONTIER (skyline) — the multi-objective selection rule
  // data curation actually uses ("keep documents no other document beats
  // on BOTH quality and length") where a single weighted score would
  // bake in an arbitrary trade-off. A doc is on the frontier iff no doc
  // is ≥ in both dimensions and > in at least one. Quality is the
  // integer-scaled distinct-token ratio (q33's metric, Det-safe).
  //
  // NOT all-pairs: dominance against the whole corpus reduces to a
  // per-length aggregate plus one tiny window — (1) `groupBy(len).max
  // (qi)` collapses the corpus to the distinct-length domain with a
  // map-side partial max (kilobytes shuffled, NOT the corpus — the
  // pre-round-10 form shuffled every document by len for a partitioned
  // window; this one never shuffles documents at all), (2) across
  // lengths, a length's maximum survives iff the running max over
  // STRICTLY longer lengths (RANGE frame ending 1 PRECEDING on the
  // desc ordering — integer lengths make "strictly longer" = "≥
  // len+1") is below it. The global window walks per-length maxima
  // only — the aggregation sits below it in the plan, which is exactly
  // the shape GuardRails.groupedDomainWalk admits WITHOUT an
  // allowlist. (3) a broadcast equi-join on (len, qi) recovers every
  // tied document (equal points don't dominate each other); the
  // frontier is ≤ distinct-lengths rows, trivially broadcastable.
  // ---------------------------------------------------------------------
  val q107Bench: Q = (s, dir) => {
    import s.implicits._
    val d = t(s, dir, "documents").select($"doc_id", $"n_chars".as("len"),
      expr("size(array_distinct(split(text, ' '))) * CAST(1000000 AS BIGINT)" +
        " div size(split(text, ' '))").as("qi"))
    val perLen = d.groupBy($"len").agg(max($"qi").as("mq"))
    val wG = org.apache.spark.sql.expressions.Window.orderBy($"len".desc)
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val frontier = perLen.withColumn("m1", max($"mq").over(wG))
      .filter($"m1".isNull || $"m1" < $"mq")
      .select($"len".as("f_len"), $"mq")
    d.join(broadcast(frontier), $"len" === $"f_len" && $"qi" === $"mq")
      .select($"doc_id", $"len", $"qi")
  }
  val q107: Q = (s, dir) => {
    import s.implicits._
    q107Bench(s, dir).orderBy($"len".desc, $"doc_id")
  }
  val q107Sql: String =
    """WITH d AS (
      |  SELECT doc_id, n_chars AS len,
      |    len(list_distinct(string_split(text, ' '))) * 1000000
      |      // len(string_split(text, ' ')) AS qi
      |  FROM documents),
      |c AS (SELECT * FROM d QUALIFY qi = MAX(qi) OVER (PARTITION BY len)),
      |f AS (
      |  SELECT *, MAX(qi) OVER (ORDER BY len DESC
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
      |  FROM c)
      |SELECT doc_id, len, CAST(qi AS BIGINT) AS qi
      |FROM f WHERE m1 IS NULL OR m1 < qi
      |ORDER BY len DESC, doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q108: KMV DISTINCT SKETCHES with SET OPERATIONS — cross-source
  // content overlap without exact distinct-counting. HLL (q39/q68) can
  // union but cannot intersect; a K-Minimum-Values sketch can do both:
  // keep the K smallest hashes of each source's distinct shingle set,
  // merge two sketches by re-taking the K smallest of the union, and
  // estimate Jaccard as |unionKMV ∩ A ∩ B| / K and the union
  // cardinality as (K−1)·2^52 / h_K (hashes are 52-bit so they are
  // EXACT in doubles; Beyer et al., "On Synopses for Distinct-Value
  // Estimation Under Multiset Operations"). Every estimate is a
  // deterministic function of the data — the oracle recomputes the
  // identical sketches, so an approximate structure is exactly checked
  // (the q39/q71 philosophy).
  //
  // Scale shape: per-source distinct hashes (one narrow 8-byte shuffle)
  // feed the BOUNDED TopKByScore aggregate — few groups × large
  // candidate sets is exactly the case its map-side K-slot buffers win
  // (shuffle carries maps × sources × K rows, not the vocabularies).
  // The pairwise stage joins |sources|² sketch ROWS of K longs each —
  // planning-scale data forever, while the corpus is touched once.
  // ---------------------------------------------------------------------
  private val KmvK = 64

  val q108Bench: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.TopKByScore.topKByScore
    val K = KmvK
    val h = t(s, dir, "documents")
      .where(size(split($"text", " ")) >= 3)
      .select($"source",
        explode(array_distinct(LlmOps.shingles3(split($"text", " ")))).as("sh"))
      .select($"source",
        conv(substring(md5(concat(lit("k:"), $"sh")), 1, 13), 16, 10)
          .cast("long").as("h"))
      .distinct()
    val sk = h.groupBy($"source")
      .agg(topKByScore(-$"h".cast("double"), $"h", K).as("arr"))
      .select($"source", transform($"arr", x => x("id")).as("ks"))
    val pairs = sk.as("a").join(sk.as("b"), $"a.source" < $"b.source")
      .select($"a.source".as("src_a"), $"b.source".as("src_b"),
        $"a.ks".as("ka"), $"b.ks".as("kb"))
    // Under-full merged sketch (= both sources' full distinct sets fit
    // in K): the sketch IS the union, so estimates degrade gracefully
    // to EXACT values — denominator |u|, union = |u| — instead of a
    // NULL h_K and a /K Jaccard underestimate.
    val u = slice(array_sort(array_union($"ka", $"kb")), 1, K)
    val inBoth = size(array_intersect($"u", array_intersect($"ka", $"kb")))
    pairs.withColumn("u", u)
      .withColumn("j_est",
        inBoth.cast("double") / least(lit(K), size($"u")).cast("double"))
      .withColumn("union_est",
        when(size($"u") < K, size($"u").cast("double"))
          .otherwise(lit((K - 1) * 4503599627370496.0)
            / element_at($"u", K).cast("double")))
      .select($"src_a", $"src_b", $"j_est", $"union_est",
        ($"j_est" * $"union_est").as("inter_est"))
  }
  val q108: Q = (s, dir) => {
    import s.implicits._
    q108Bench(s, dir).orderBy($"src_a", $"src_b")
  }
  val q108Sql: String = {
    val K = KmvK
    s"""WITH d AS (
      |  SELECT source, string_split(text, ' ') AS tk FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |s AS (
      |  SELECT DISTINCT source,
      |    CAST('0x' || substring(md5('k:' || sh), 1, 13) AS BIGINT) AS h
      |  FROM (SELECT source,
      |          unnest([array_to_string(tk[i:i+2], ' ')
      |                  for i in range(1, len(tk) - 1)]) AS sh
      |        FROM d)),
      |k AS (
      |  SELECT source, list(h ORDER BY h) AS ks
      |  FROM (SELECT source, h,
      |          row_number() OVER (PARTITION BY source ORDER BY h) AS rn
      |        FROM s)
      |  WHERE rn <= $K GROUP BY source),
      |p AS (
      |  SELECT a.source AS src_a, b.source AS src_b, a.ks AS ka, b.ks AS kb
      |  FROM k a JOIN k b ON a.source < b.source),
      |m AS (
      |  SELECT src_a, src_b,
      |    list_sort(list_distinct(ka || kb))[1:$K] AS u,
      |    list_intersect(ka, kb) AS common
      |  FROM p),
      |e AS (
      |  SELECT src_a, src_b,
      |    CAST(len(list_intersect(u, common)) AS DOUBLE)
      |      / CAST(least($K, len(u)) AS DOUBLE) AS j_est,
      |    CASE WHEN len(u) < $K THEN CAST(len(u) AS DOUBLE)
      |         ELSE ${(K - 1) * 4503599627370496.0} / CAST(u[$K] AS DOUBLE)
      |    END AS union_est
      |  FROM m)
      |SELECT src_a, src_b, j_est, union_est, j_est * union_est AS inter_est
      |FROM e ORDER BY src_a, src_b""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q112: BPE TOKENIZER TRAINING — the merge-table computation at the
  // heart of every modern tokenizer (Sennrich et al.): start from
  // characters, repeatedly merge the corpus's most frequent adjacent
  // symbol pair. Five rounds here; output is the merge table (step,
  // left, right, weighted pair count) — the artifact a tokenizer ships.
  //
  // Exactness across engines needs two commitments:
  //  - symbol sequences are '|'-DELIMITED STRINGS ('|h|e|l|l|o|'), so
  //    applying merge (a,b) is replace('|a|b|' → '|ab|') — and both
  //    engines' replace() scans left-to-right non-overlapping, which IS
  //    BPE's greedy merge order ('|l|l|l|' merges once, leftmost);
  //    the closing delimiter consumed by one match correctly blocks
  //    the overlapping next pair.
  //  - the winning pair is argmax by (weighted count DESC, left ASC,
  //    right ASC) — a total order, so ties are deterministic.
  //
  // Scale shape: the corpus is tokenized and counted ONCE (one shuffle
  // to the word-count table); every BPE round then runs on the VOCAB
  // (distinct words × their symbol strings), which is bounded by
  // language, not corpus size — the known property that makes BPE
  // training tractable on 100 TB: cost ∝ |vocab| per round after one
  // corpus pass. The per-round argmax is ONE row to the driver (the
  // merge table is planning data, the same class as IVF centroids);
  // the DuckDB oracle keeps the argmax in-plan via scalar subqueries
  // and must land on the identical 5 merges for the hash to match.
  // ---------------------------------------------------------------------
  private val BpeRounds = 5

  /** Word-count vocab in BPE symbol encoding, as a stamp-keyed cached
    * artifact (the sigCache contract): the corpus pass happens ONCE per
    * dataset snapshot and its lifetime is owned by ArtifactCaches — not
    * a raw never-unpersisted checkpoint per invocation. Words containing
    * the delimiter itself are excluded IN BOTH ENGINES: '|' inside a
    * symbol would make the encoding ambiguous ('|a|||b|' splits into
    * empty symbols and merge patterns that rewrite unrelated words) —
    * the corruption would be oracle-invisible since both sides would
    * compute the same wrong table. Real tokenizers pre-normalize their
    * delimiter the same way. */
  private val bpeCache =
    graft.ArtifactCaches.register(
      new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]())

  private def bpeVocab(s: SparkSession, dir: String): DataFrame = {
    val st = graft.SourceStamp.table(s, dir, "documents")
    graft.SourceStamp.evictStale(bpeCache, s, dir, st)(_.unpersist(): Unit)
    bpeCache.computeIfAbsent((s, dir, st), { _: (SparkSession, String, String) =>
      import s.implicits._
      t(s, dir, "documents")
        .select(explode(split($"text", " ")).as("w"))
        .where(length($"w") > 0 && !$"w".contains("|"))
        .groupBy($"w").agg(count(lit(1)).as("cnt"))
        .select(concat(lit("|"),
          regexp_replace($"w", "(.)", "$1|")).as("s"), $"cnt")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  /** The trained merge table, driver-held and stamp-cached: training
    * runs once per dataset snapshot; q112 ships the table and
    * [[q115Bench]] tokenizes with it (the merge table is planning data,
    * the IVF-centroid class). */
  private val bpeMergeCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), Seq[(Int, String, String, Long)]]()

  def bpeMerges(s: SparkSession, dir: String): Seq[(Int, String, String, Long)] = {
    val st = graft.SourceStamp.table(s, dir, "documents")
    graft.SourceStamp.evictStale(bpeMergeCache, s, dir, st)(_ => ())
    bpeMergeCache.computeIfAbsent((s, dir, st), { _: (SparkSession, String, String) =>
      import s.implicits._
      val words = bpeVocab(s, dir)
      def pairCounts(df: DataFrame): DataFrame = {
        val arr = split(expr("substring(s, 2, length(s) - 2)"), "\\|")
        df.select($"cnt", arr.as("a"))
          .select($"cnt", expr(
            "explode(arrays_zip(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1)))")
            .as("p"))
          .groupBy($"p.0".as("l"), $"p.1".as("r"))
          .agg(sum($"cnt").as("pc"))
      }
      var vocab = words
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      var step = 1
      var exhausted = false
      while (step <= BpeRounds && !exhausted) {
        pairCounts(vocab)
          .orderBy($"pc".desc, $"l".asc, $"r".asc).limit(1).collect()
          .headOption match {
          case None =>
            // degenerate corpus (single-symbol words only): stop with the
            // merges found so far rather than crash mid-training
            exhausted = true
          case Some(best) =>
            val (l, r, pc) = (best.getString(0), best.getString(1), best.getLong(2))
            merges += ((step, l, r, pc))
            // symbols are corpus-derived: lit() columns, never string-
            // interpolated SQL (a quote or backslash in a symbol must be
            // data, not a parse error)
            vocab = vocab.withColumn("s", call_function("replace",
              $"s", lit(s"|$l|$r|"), lit(s"|$l$r|")))
            step += 1
        }
      }
      merges.result()
    })
  }

  val q112Bench: Q = (s, dir) => {
    import s.implicits._
    bpeMerges(s, dir).toDF("step", "left", "right", "pair_count")
  }
  val q112: Q = (s, dir) => {
    import s.implicits._
    q112Bench(s, dir).orderBy($"step")
  }
  /** Shared oracle CTE chain for BPE training: word-count vocab `w0`,
    * then per round the winning pair `p$i` and the merged vocab `w$i` —
    * used by both the trainer's output (q112) and the apply side
    * (q115), so the cross-engine merge table is one proof. */
  private def bpeTrainCtes: String = {
    def round(i: Int) =
      s"""p$i AS (
         |  SELECT a[j] AS l, a[j+1] AS r, CAST(SUM(cnt) AS BIGINT) AS pc
         |  FROM (SELECT cnt, string_split(s[2:-2], '|') AS a FROM w${i - 1}),
         |       unnest(generate_series(1, len(a) - 1)) AS u(j)
         |  GROUP BY 1, 2 ORDER BY pc DESC, l ASC, r ASC LIMIT 1),
         |w$i AS (
         |  SELECT cnt, replace(s,
         |    '|' || (SELECT l FROM p$i) || '|' || (SELECT r FROM p$i) || '|',
         |    '|' || (SELECT l FROM p$i) || (SELECT r FROM p$i) || '|') AS s
         |  FROM w${i - 1})""".stripMargin
    val rounds = (1 to BpeRounds).map(round).mkString(",\n")
    s"""w0 AS (
       |  SELECT '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS s,
       |         COUNT(*) AS cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 AND w NOT LIKE '%|%' GROUP BY 1),
       |$rounds""".stripMargin
  }

  val q112Sql: String = {
    val out = (1 to BpeRounds).map { i =>
      s"SELECT $i AS step, l AS \"left\", r AS \"right\", pc AS pair_count FROM p$i"
    }.mkString("\nUNION ALL ")
    s"""WITH $bpeTrainCtes
       |SELECT * FROM ($out) ORDER BY step""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q115: BPE APPLY — tokenize the corpus with q112's trained merge
  // table, the 100 TB-hot half of a tokenizer (train once, encode
  // everything). Encoding is the trainer's own representation lifted to
  // whole documents: every character (spaces included) becomes a
  // '|'-delimited symbol, then the merges apply IN TRAINING ORDER as
  // chained replace('|l|r|' → '|lr|') — the same left-to-right
  // non-overlapping semantics both engines proved in q112. Merges can
  // never cross a word boundary: the space symbol appears in no trained
  // pair (training was per-word), so a '|l|r|' pattern containing or
  // spanning a space cannot match. Whole-doc encode therefore equals
  // per-word encode, with ZERO shuffle: one projection — regexp split,
  // five codegen'd replaces, arithmetic on lengths — then the oracle's
  // orderBy. BPE token count = (#symbols) − (#space symbols);
  // whitespace-token count rides along as the q34-style baseline the
  // compression is measured against. Docs containing the delimiter
  // itself are excluded exactly as training excludes such words.
  //
  // Scale: pure map work (cost ∝ corpus bytes × rounds); the merge
  // table is driver-held planning data (bpeMerges cache), so encoding
  // 100 TB is embarrassingly parallel with no join and no state.
  // ---------------------------------------------------------------------
  private def countIn(c: Column, needle: String): Column =
    length(c) - length(call_function("replace", c, lit(needle), lit("")))

  val q115Bench: Q = (s, dir) => {
    import s.implicits._
    val merges = bpeMerges(s, dir) // ordered by step
    val enc0 = concat(lit("|"), regexp_replace($"text", "(.)", "$1|"))
    // ONE expression for the whole merge table (plan depth constant in
    // vocabulary size — the chained-replace form it is spec-pinned
    // equal to would stack 32k nodes at a production vocabulary)
    val encoded = graft.functions.BpeEncode.bpeEncode(enc0,
      merges.map { case (_, l, r, _) => (l, r) })
    t(s, dir, "documents")
      .filter(!$"text".contains("|"))
      .select($"doc_id",
        (countIn(encoded, "|") - lit(1) - countIn($"text", " "))
          .cast("long").as("n_bpe_tokens"),
        size(filter(split($"text", " "), w => length(w) > 0))
          .cast("long").as("n_ws_tokens"))
  }
  val q115: Q = (s, dir) => {
    import s.implicits._
    q115Bench(s, dir).orderBy($"doc_id")
  }
  val q115Sql: String = {
    // the merge table re-derives in-plan (q112's CTE chain), then each
    // round's winning pair applies to the doc encoding via the same
    // scalar subqueries the trainer uses
    def round(i: Int) =
      s"""e$i AS (
         |  SELECT doc_id, n_sp, n_ws, replace(s,
         |    '|' || (SELECT l FROM p$i) || '|' || (SELECT r FROM p$i) || '|',
         |    '|' || (SELECT l FROM p$i) || (SELECT r FROM p$i) || '|') AS s
         |  FROM e${i - 1})""".stripMargin
    val rounds = (1 to BpeRounds).map(round).mkString(",\n")
    s"""WITH ${bpeTrainCtes},
       |e0 AS (
       |  SELECT doc_id,
       |    '|' || regexp_replace(text, '(.)', '\\1|', 'g') AS s,
       |    len(text) - len(replace(text, ' ', '')) AS n_sp,
       |    len(list_filter(string_split(text, ' '), w -> len(w) > 0)) AS n_ws
       |  FROM documents WHERE text NOT LIKE '%|%'),
       |$rounds
       |SELECT doc_id,
       |  CAST(len(s) - len(replace(s, '|', '')) - 1 - n_sp AS BIGINT) AS n_bpe_tokens,
       |  CAST(n_ws AS BIGINT) AS n_ws_tokens
       |FROM e$BpeRounds
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q113: COMPRESSION-RATIO quality signal — deflate(text)/len(text),
  // the corpus-cleaning metric run beside q65's repetition ratios
  // (Gopher/FineWeb class): templated boilerplate compresses far below
  // natural prose and near-random noise barely compresses, so one
  // codegen-adjacent pass separates both tails with no tokenization.
  // Ratio is integer ppm (compressed·1e6 div raw bytes). JVM-
  // deterministic (every deflate knob pinned — see DeflateSize) but not
  // SQL-expressible, so this is a rows-only driver entry (the q39/q49/
  // q68 class); the real verification is DeflateSizeSpec (golden sizes,
  // the repetitive ≪ prose ≪ random ordering, determinism) plus the
  // within-corpus sanity pinned there over this very query.
  //
  // Scale shape: pure projection + one bounded TakeOrdered (most-
  // repetitive 50 docs); the text column never shuffles.
  // ---------------------------------------------------------------------
  val q113Bench: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.DeflateSize.deflateSize
    t(s, dir, "documents")
      .select($"doc_id", deflateSize($"text").as("comp_len"),
        length($"text").cast("long").as("raw_len"))
      .select($"doc_id", $"comp_len",
        expr("comp_len * CAST(1000000 AS BIGINT) div raw_len").as("ratio_ppm"))
      .orderBy($"ratio_ppm".asc, $"doc_id".asc).limit(50)
  }
  val q113: Q = q113Bench // the top-50 sort is the semantics

  // ---------------------------------------------------------------------
  // q121: EXACT SUBSTRING DEDUP — the position-level duplicate-SPAN
  // remover (the ExactSubstr step of Lee et al., "Deduplicating Training
  // Data Makes Language Models Better"): any K-token window whose text
  // appears anywhere else in the corpus — another document OR earlier in
  // the same document — is a duplicated occurrence unless it is the
  // global first occurrence; overlapping/adjacent duplicated windows
  // merge into maximal spans, and each document is reassembled from the
  // tokens outside its spans. Finer than q103 (which drops only ALIGNED
  // non-overlapping lines): a shared phrase at ANY offset is caught,
  // which is what boilerplate/licenses/injected templates look like in
  // the wild. K is the minimum duplicated-run length (the paper's 50
  // tokens; 8 here for the synthetic doc lengths).
  //
  // Scale shape — the distributed answer to the paper's suffix array
  // (which is single-machine): (1) one corpus scan explodes overlapping
  // K-gram STARTS and shuffles md5(gram) + (doc,pos) — 40 bytes per
  // token position regardless of K, never the text; the first-occurrence
  // rule is min(struct(doc,pos)) per gram (q103's winner scheme), so a
  // boilerplate gram with a billion copies is one window key (skew knob
  // = q25's salting, same as q103). (2) duplicated starts — typically a
  // small fraction — regroup by doc_id for the gaps-and-islands merge
  // (lag + running sum; per-doc windows, never global). (3) token rows
  // join spans per doc (spans are merged-disjoint, so each token matches
  // at most one) and the reassembly groupBy reuses the doc_id
  // partitioning. Nothing all-pairs, no driver collection; both engines
  // hash grams with md5, so even a collision (2^-64-class) agrees
  // cross-engine.
  // ---------------------------------------------------------------------
  private val SubK = 8

  val q121Bench: Q = (s, dir) => {
    import s.implicits._
    val K = SubK
    val toksDf = t(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("toks"))
    // overlapping K-gram starts; docs shorter than K contribute no grams
    // (guarded: Spark's sequence() would COUNT DOWN for start > stop)
    val grams = toksDf
      .withColumn("pos",
        explode(when(size($"toks") >= K, sequence(lit(0), size($"toks") - K))
          .otherwise(array().cast("array<int>"))))
      .select($"doc_id", $"pos",
        md5(array_join(slice($"toks", $"pos" + 1, lit(K)), " ")).as("gkey"))
      .withColumn("okey", struct($"doc_id", $"pos"))
    val wg = org.apache.spark.sql.expressions.Window.partitionBy($"gkey")
    val dup = grams
      .withColumn("wkey", min($"okey").over(wg))
      .where($"okey" =!= $"wkey")
      .select($"doc_id", $"pos")
    // gaps-and-islands: a new span starts when the previous duplicated
    // start is too far back to overlap or touch ([pos,pos+K-1] windows)
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    val spans = dup
      .withColumn("prev", lag($"pos", 1).over(wd))
      .withColumn("ni", when($"prev".isNull || $"pos" > $"prev" + K, 1).otherwise(0))
      .withColumn("island", sum($"ni").over(
        wd.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"doc_id", $"island")
      .agg(min($"pos").as("s"), (max($"pos") + lit(K - 1)).as("e"))
      .select($"doc_id".as("s_doc"), $"s", $"e")
    val tokens = toksDf.select($"doc_id", posexplode($"toks").as(Seq("tpos", "tok")))
    tokens
      .join(spans, tokens("doc_id") === spans("s_doc") &&
        $"tpos" >= $"s" && $"tpos" <= $"e", "left")
      .groupBy($"doc_id").agg(
        count(lit(1)).as("n_tokens"),
        countDistinct($"s").as("n_spans"),
        sum(when($"s".isNotNull, 1L).otherwise(0L)).as("dup_tokens"),
        array_join(transform(array_sort(collect_list(when($"s".isNull,
          struct($"tpos", $"tok")))), x => x("tok")), " ").as("text_clean"))
  }
  val q121: Q = (s, dir) => {
    import s.implicits._
    q121Bench(s, dir).orderBy($"doc_id")
  }
  val q121Sql: String = {
    val K = SubK
    s"""WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(generate_series(0, len(toks) - $K)) AS pos, toks
      |  FROM d),
      |gr AS (
      |  SELECT doc_id, pos,
      |    md5(array_to_string(toks[pos + 1 : pos + $K], ' ')) AS gkey,
      |    {'d': doc_id, 'p': pos} AS okey
      |  FROM g),
      |dup AS (
      |  SELECT doc_id, pos FROM (
      |    SELECT doc_id, pos, okey, MIN(okey) OVER (PARTITION BY gkey) AS wkey
      |    FROM gr) WHERE okey <> wkey),
      |isl AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
      |           OR pos > LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) + $K
      |         THEN 1 ELSE 0 END AS ni
      |  FROM dup),
      |isl2 AS (
      |  SELECT doc_id, pos, SUM(ni) OVER (
      |    PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
      |  FROM isl),
      |spans AS (
      |  SELECT doc_id AS s_doc, MIN(pos) AS s, MAX(pos) + ${K - 1} AS e
      |  FROM isl2 GROUP BY doc_id, island),
      |tok AS (
      |  SELECT doc_id, unnest(generate_series(0, len(toks) - 1)) AS tpos, toks
      |  FROM d),
      |tok2 AS (SELECT doc_id, tpos, toks[tpos + 1] AS tok FROM tok),
      |j AS (
      |  SELECT t.doc_id, t.tpos, t.tok, s.s
      |  FROM tok2 t LEFT JOIN spans s
      |    ON t.doc_id = s.s_doc AND t.tpos BETWEEN s.s AND s.e)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(DISTINCT s) AS BIGINT) AS n_spans,
      |  CAST(SUM(CASE WHEN s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS dup_tokens,
      |  COALESCE(string_agg(CASE WHEN s IS NULL THEN tok END, ' ' ORDER BY tpos),
      |           '') AS text_clean
      |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q29_simhash"        -> q29,
    "q30_jaccard_verify" -> q30,
    "q32_lang_id"        -> q32,
    "q33_quality_score"  -> q33,
    "q34_token_count"    -> q34,
    "q35_fingerprint"    -> q35,
    "q59_top_terms"      -> q59,
    "q61_decontaminate"  -> q61,
    "q62_unigram_score"  -> q62,
    "q117_bigram_lm"     -> q117,
    "q63_lang_rebalance" -> q63,
    "q65_repetition"     -> q65,
    "q71_heavy_hitters"  -> q71,
    "q83_chunking"       -> q83,
    "q86_bm25"           -> q86,
    "q95_seq_pack"       -> q95,
    "q96_pii_redact"     -> q96,
    "q97_postings"       -> q97,
    "q101_hybrid_rrf"    -> q101,
    "q103_line_dedup"    -> q103,
    "q107_pareto"        -> q107,
    "q108_kmv_overlap"   -> q108,
    "q112_bpe_merges"    -> q112,
    "q113_comp_ratio"    -> q113,
    "q115_bpe_encode"    -> q115,
    "q121_substr_dedup"  -> q121)

  val oracles: Map[String, String] = Map(
    "q29_simhash"        -> q29Sql,
    "q30_jaccard_verify" -> q30Sql,
    "q32_lang_id"        -> q32Sql,
    "q33_quality_score"  -> q33Sql,
    "q34_token_count"    -> q34Sql,
    "q35_fingerprint"    -> q35Sql,
    "q59_top_terms"      -> q59Sql,
    "q61_decontaminate"  -> q61Sql,
    "q62_unigram_score"  -> q62Sql,
    "q117_bigram_lm"     -> q117Sql,
    "q63_lang_rebalance" -> q63Sql,
    "q65_repetition"     -> q65Sql,
    "q71_heavy_hitters"  -> q71Sql,
    "q83_chunking"       -> q83Sql,
    "q86_bm25"           -> q86Sql,
    "q95_seq_pack"       -> q95Sql,
    "q96_pii_redact"     -> q96Sql,
    "q97_postings"       -> q97Sql,
    "q101_hybrid_rrf"    -> q101Sql,
    "q103_line_dedup"    -> q103Sql,
    "q107_pareto"        -> q107Sql,
    "q108_kmv_overlap"   -> q108Sql,
    "q112_bpe_merges"    -> q112Sql,
    "q115_bpe_encode"    -> q115Sql,
    "q121_substr_dedup"  -> q121Sql)

  /** Bench-time overrides minus determinism-only global sorts (see
    * [[Relational.benchVariants]]). Verify runs the sorted forms. */
  val benchVariants: Map[String, Q] = Map(
    "q29_simhash"        -> q29Bench,
    "q32_lang_id"        -> q32Bench,
    "q33_quality_score"  -> q33Bench,
    "q35_fingerprint"    -> q35Bench,
    "q61_decontaminate"  -> q61Bench,
    "q62_unigram_score"  -> q62Bench,
    "q117_bigram_lm"     -> q117Bench,
    "q65_repetition"     -> q65Bench,
    "q71_heavy_hitters"  -> q71Bench,
    "q83_chunking"       -> q83Bench,
    "q95_seq_pack"       -> q95Bench,
    "q96_pii_redact"     -> q96Bench,
    "q97_postings"       -> q97Bench,
    "q103_line_dedup"    -> q103Bench,
    "q107_pareto"        -> q107Bench,
    "q108_kmv_overlap"   -> q108Bench,
    "q121_substr_dedup"  -> q121Bench)
}
